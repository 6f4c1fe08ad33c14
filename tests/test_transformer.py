"""Parity tests for the DETR transformer utilities and gaussian targets.

Each test builds a torch transcription of the reference semantics
(/root/reference/radet/models/utils/{transformer,positional_encoding,
gaussian_target}.py), loads identical weights into the flax modules, and
compares outputs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from radet_tpu.models.transformer import (
    DETRTransformer,
    FFN,
    LearnedPositionalEncoding,
    MultiheadAttention,
    TransformerEncoderLayer,
    sine_positional_encoding,
)
from radet_tpu.ops.gaussian_target import gaussian_radius, gen_gaussian_target


def _torch_sine_pos(mask, num_feats, temperature=10000, normalize=False,
                    scale=2 * math.pi, eps=1e-6):
    # transcription of reference positional_encoding.py:49-80
    mask = torch.as_tensor(mask, dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


@pytest.mark.parametrize("normalize", [False, True])
def test_sine_positional_encoding_matches_torch(normalize):
    rs = np.random.RandomState(0)
    mask = rs.rand(2, 7, 9) > 0.7  # ragged padding
    mask[:, :5, :6] = False
    ref = _torch_sine_pos(mask, num_feats=8, normalize=normalize).numpy()
    got = np.asarray(sine_positional_encoding(mask, 8, normalize=normalize))
    # ours is NHWC; reference NCHW
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_learned_positional_encoding_layout():
    mod = LearnedPositionalEncoding(num_feats=4, row_num_embed=10,
                                    col_num_embed=12)
    mask = jnp.zeros((2, 5, 6), bool)
    variables = mod.init(jax.random.PRNGKey(0), mask)
    pos = mod.apply(variables, mask)
    assert pos.shape == (2, 5, 6, 8)
    row = variables["params"]["row_embed"]["embedding"]
    col = variables["params"]["col_embed"]["embedding"]
    # channel layout: x (col) embedding first, then y (row)
    # (reference positional_encoding.py:131-136)
    np.testing.assert_allclose(pos[0, 2, 3, :4], col[3], atol=1e-6)
    np.testing.assert_allclose(pos[0, 2, 3, 4:], row[2], atol=1e-6)
    # identical across batch
    np.testing.assert_allclose(pos[0], pos[1], atol=0)


def _copy_mha(torch_mha: tnn.MultiheadAttention, c: int):
    """Split torch's packed in_proj into q/k/v flax Dense params."""
    wq, wk, wv = torch_mha.in_proj_weight.detach().numpy().reshape(3, c, c)
    bq, bk, bv = torch_mha.in_proj_bias.detach().numpy().reshape(3, c)
    wo = torch_mha.out_proj.weight.detach().numpy()
    bo = torch_mha.out_proj.bias.detach().numpy()
    return {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": {"kernel": wo.T, "bias": bo},
    }


def test_multihead_attention_matches_torch():
    torch.manual_seed(0)
    c, heads, b, lq, lk = 16, 4, 2, 5, 7
    tm = tnn.MultiheadAttention(c, heads)
    rs = np.random.RandomState(1)
    q = rs.randn(lq, b, c).astype(np.float32)
    k = rs.randn(lk, b, c).astype(np.float32)
    v = rs.randn(lk, b, c).astype(np.float32)
    qpos = rs.randn(lq, b, c).astype(np.float32)
    kpos = rs.randn(lk, b, c).astype(np.float32)
    pad = rs.rand(b, lk) > 0.7
    pad[:, 0] = False  # keep at least one key per row

    # reference MultiheadAttention.forward (transformer.py:71-94):
    # adds pos to q/k, runs torch MHA, residual + out
    with torch.no_grad():
        out_t = tm(
            torch.as_tensor(q + qpos),
            torch.as_tensor(k + kpos),
            torch.as_tensor(v),
            key_padding_mask=torch.as_tensor(pad),
        )[0].numpy() + q

    fm = MultiheadAttention(embed_dims=c, num_heads=heads)
    params = {"params": jax.tree.map(jnp.asarray, _copy_mha(tm, c))}
    out_f = fm.apply(
        params,
        jnp.asarray(q.transpose(1, 0, 2)),
        jnp.asarray(k.transpose(1, 0, 2)),
        jnp.asarray(v.transpose(1, 0, 2)),
        query_pos=jnp.asarray(qpos.transpose(1, 0, 2)),
        key_pos=jnp.asarray(kpos.transpose(1, 0, 2)),
        key_padding_mask=jnp.asarray(pad),
    )
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(1, 0, 2), out_t, atol=1e-5
    )


class _TorchEncoderLayer(tnn.Module):
    """Transcription of reference TransformerEncoderLayer (post-norm)."""

    def __init__(self, c, heads, ffn_c):
        super().__init__()
        self.attn = tnn.MultiheadAttention(c, heads)
        self.fc0 = tnn.Linear(c, ffn_c)
        self.fc1 = tnn.Linear(ffn_c, c)
        self.norm0 = tnn.LayerNorm(c)
        self.norm1 = tnn.LayerNorm(c)

    def forward(self, x, pos, pad):
        q = x + pos
        x = x + self.attn(q, q, x, key_padding_mask=pad)[0]
        x = self.norm0(x)
        x = x + self.fc1(torch.relu(self.fc0(x)))
        return self.norm1(x)


def _encoder_layer_params(tl: _TorchEncoderLayer, c: int):
    def lin(m):
        return {"kernel": m.weight.detach().numpy().T,
                "bias": m.bias.detach().numpy()}

    def ln(m):
        return {"scale": m.weight.detach().numpy(),
                "bias": m.bias.detach().numpy()}

    return {
        "self_attn": _copy_mha(tl.attn, c),
        "ffn": {"fc0": lin(tl.fc0), "fc1": lin(tl.fc1)},
        "norm0": ln(tl.norm0),
        "norm1": ln(tl.norm1),
    }


def test_encoder_layer_matches_torch():
    torch.manual_seed(2)
    c, heads, ffn_c, b, l = 16, 4, 32, 2, 6
    tl = _TorchEncoderLayer(c, heads, ffn_c)
    rs = np.random.RandomState(3)
    x = rs.randn(l, b, c).astype(np.float32)
    pos = rs.randn(l, b, c).astype(np.float32)
    pad = rs.rand(b, l) > 0.7
    pad[:, 0] = False
    with torch.no_grad():
        ref = tl(torch.as_tensor(x), torch.as_tensor(pos),
                 torch.as_tensor(pad)).numpy()

    fl = TransformerEncoderLayer(embed_dims=c, num_heads=heads,
                                 feedforward_channels=ffn_c)
    params = {"params": jax.tree.map(jnp.asarray, _encoder_layer_params(tl, c))}
    got = fl.apply(
        params,
        jnp.asarray(x.transpose(1, 0, 2)),
        pos=jnp.asarray(pos.transpose(1, 0, 2)),
        key_padding_mask=jnp.asarray(pad),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), ref, atol=1e-5
    )


def test_detr_transformer_shapes_and_mask_invariance():
    c, heads = 16, 4
    mod = DETRTransformer(
        embed_dims=c, num_heads=heads, num_encoder_layers=2,
        num_decoder_layers=3, feedforward_channels=32,
        return_intermediate_dec=True,
    )
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 4, 5, c).astype(np.float32))
    qe = jnp.asarray(rs.randn(7, c).astype(np.float32))
    mask = np.zeros((2, 4, 5), bool)
    mask[:, 3:, :] = True  # padded bottom row
    pos = sine_positional_encoding(mask, c // 2, normalize=True)

    variables = mod.init(jax.random.PRNGKey(0), x, jnp.asarray(mask), qe, pos)
    out_dec, memory = mod.apply(variables, x, jnp.asarray(mask), qe, pos)
    assert out_dec.shape == (3, 2, 7, c)
    assert memory.shape == (2, 4, 5, c)
    assert np.isfinite(np.asarray(out_dec)).all()

    # padded-content invariance: junk under the padding mask must not change
    # the decoder output (the encoder memory AT padded positions may differ)
    x2 = np.asarray(x).copy()
    x2[:, 3:, :, :] = 123.0
    out_dec2, _ = mod.apply(
        variables, jnp.asarray(x2), jnp.asarray(mask), qe, pos
    )
    np.testing.assert_allclose(
        np.asarray(out_dec), np.asarray(out_dec2), atol=1e-4
    )

    # non-intermediate mode returns (1, B, Q, C) = last intermediate
    mod1 = DETRTransformer(
        embed_dims=c, num_heads=heads, num_encoder_layers=2,
        num_decoder_layers=3, feedforward_channels=32,
        return_intermediate_dec=False,
    )
    out_last, _ = mod1.apply(variables, x, jnp.asarray(mask), qe, pos)
    assert out_last.shape == (1, 2, 7, c)
    np.testing.assert_allclose(
        np.asarray(out_last[0]), np.asarray(out_dec[-1]), atol=1e-5
    )


def test_detr_transformer_pre_norm_runs():
    c = 8
    mod = DETRTransformer(
        embed_dims=c, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, feedforward_channels=16, pre_norm=True,
    )
    x = jnp.zeros((1, 3, 3, c))
    mask = jnp.zeros((1, 3, 3), bool)
    qe = jnp.ones((4, c))
    pos = sine_positional_encoding(mask, c // 2)
    variables = mod.init(jax.random.PRNGKey(0), x, mask, qe, pos)
    out_dec, memory = mod.apply(variables, x, mask, qe, pos)
    assert out_dec.shape == (1, 1, 4, c)
    assert np.isfinite(np.asarray(out_dec)).all()
    # pre-norm encoder applies a FINAL norm (reference transformer.py:446-448)
    assert "encoder_norm" in variables["params"]


def test_ffn_no_residual():
    ffn = FFN(embed_dims=4, feedforward_channels=8, add_residual=False)
    x = jnp.ones((2, 3, 4))
    variables = ffn.init(jax.random.PRNGKey(0), x)
    out = ffn.apply(variables, x)
    assert out.shape == x.shape


# ---------------------------------------------------------------- gaussian


def _py_gaussian_radius(height, width, min_overlap):
    # transcription of reference gaussian_target.py:166-185
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = math.sqrt(b1**2 - 4 * a1 * c1)
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = math.sqrt(b2**2 - 4 * a2 * c2)
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = math.sqrt(b3**2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / (2 * a3)
    return min(r1, r2, r3)


def test_gaussian_radius_matches_reference_math():
    rs = np.random.RandomState(5)
    hw = rs.uniform(4, 120, (32, 2)).astype(np.float32)
    for overlap in (0.3, 0.7):
        ref = np.array(
            [_py_gaussian_radius(h, w, overlap) for h, w in hw], np.float32
        )
        got = np.asarray(gaussian_radius(hw, overlap))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def _py_gen_gaussian(heatmap, center, radius, k=1):
    # transcription of reference gaussian_target.py:6-64 (numpy)
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    xs = np.arange(-radius, radius + 1, dtype=np.float32)[None, :]
    ys = np.arange(-radius, radius + 1, dtype=np.float32)[:, None]
    g = np.exp(-(xs * xs + ys * ys) / (2 * sigma * sigma))
    g[g < np.finfo(np.float32).eps * g.max()] = 0
    x, y = center
    h, w = heatmap.shape
    left, right = min(x, radius), min(w - x, radius + 1)
    top, bottom = min(y, radius), min(h - y, radius + 1)
    out = heatmap.copy()
    out[y - top:y + bottom, x - left:x + right] = np.maximum(
        heatmap[y - top:y + bottom, x - left:x + right],
        g[radius - top:radius + bottom, radius - left:radius + right] * k,
    )
    return out


def test_gen_gaussian_target_matches_reference_loop():
    rs = np.random.RandomState(6)
    h, w, n = 24, 32, 6
    heatmap = rs.rand(h, w).astype(np.float32) * 0.1
    centers = np.stack(
        [rs.randint(0, w, n), rs.randint(0, h, n)], axis=1
    )
    centers[0] = [0, 0]          # corner clipping
    centers[1] = [w - 1, h - 1]  # corner clipping
    radii = rs.randint(1, 8, n)
    ref = heatmap.copy()
    for c, r in zip(centers, radii):
        ref = _py_gen_gaussian(ref, c, int(r), k=1)
    got = np.asarray(gen_gaussian_target(heatmap, centers, radii))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gen_gaussian_target_valid_mask_and_k():
    heatmap = np.zeros((16, 16), np.float32)
    centers = np.array([[8, 8], [2, 2]])
    radii = np.array([3, 3])
    out = np.asarray(
        gen_gaussian_target(
            heatmap, centers, radii, k=0.5, valid=np.array([True, False])
        )
    )
    assert out[8, 8] == pytest.approx(0.5)
    assert out[2, 2] == 0.0  # masked-out center contributes nothing
    # untouched negative pixels stay negative (outside any kernel)
    neg = np.full((16, 16), -1.0, np.float32)
    out2 = np.asarray(gen_gaussian_target(neg, centers[:1], radii[:1]))
    assert out2[0, 15] == -1.0
    assert out2[8, 8] == pytest.approx(1.0)
