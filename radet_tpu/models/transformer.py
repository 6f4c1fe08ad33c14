"""DETR transformer utilities, TPU-native (batch-first, MXU einsum attention).

Re-designs the reference's ``radet/models/utils/transformer.py`` (744 lines,
seq-first ``torch.nn.MultiheadAttention`` wrappers) and
``positional_encoding.py``:

- ``MultiheadAttention``    (reference transformer.py:9-102)
- ``FFN``                   (reference transformer.py:104-165)
- ``TransformerEncoderLayer``/``TransformerDecoderLayer``
                            (reference transformer.py:167-400)
- ``TransformerEncoder``/``TransformerDecoder``
                            (reference transformer.py:401-596)
- ``DETRTransformer``       (reference transformer.py:597-744, ``Transformer``)
- ``sine_positional_encoding`` / ``LearnedPositionalEncoding``
                            (reference positional_encoding.py:11-150)

TPU-first choices, vs the reference:

- Batch-first ``(B, L, C)`` everywhere (the reference is ``(L, B, C)``);
  attention is two ``einsum`` contractions that tile directly onto the MXU
  instead of the reshape/bmm choreography inside torch MHA.
- Softmax accumulates in f32 regardless of compute dtype.
- Masks are additive ``-inf`` biases folded into one tensor before the
  softmax (``key_padding_mask`` is True at PADDED positions, torch
  convention), so the kernel body is branch-free.
- Decoder intermediate outputs are stacked with ``jnp.stack`` into a single
  static-shape ``(num_layers, B, Q, C)`` array.

Nothing the reference ships invokes these (SURVEY §2.2 marks them dead code
reachable only through mmdet registries), but they complete the
``models/utils`` surface so DETR-family heads can be built on this framework.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# Additive pre-softmax mask value.  Deliberate deviation from torch
# nn.MultiheadAttention: a row whose keys are ALL padded yields uniform
# attention over the padded keys here, where torch produces NaN — the
# degenerate input gets a finite (garbage but non-propagating) output,
# which is the TPU-friendly behavior (NaNs poison whole fused kernels).
NEG_INF = -1e9


def sine_positional_encoding(
    mask,
    num_feats: int,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
):
    """Sine/cosine positional encoding (reference positional_encoding.py:11-91).

    Args:
        mask: (B, H, W) bool/int — nonzero marks PADDED positions (torch
            ``key_padding_mask`` convention).
    Returns:
        (B, H, W, 2*num_feats) f32, channels-last (the reference returns
        NCHW; this framework is NHWC throughout).
    """
    not_mask = 1.0 - jnp.asarray(mask, jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    pos_x = x_embed[..., None] / dim_t  # (B, H, W, num_feats)
    pos_y = y_embed[..., None] / dim_t
    # interleave sin(even) / cos(odd), exactly the reference's stack+flatten
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionalEncoding(nn.Module):
    """Learned row/col embeddings (reference positional_encoding.py:94-150).

    ``__call__(mask)`` with mask (B, H, W) returns (B, H, W, 2*num_feats)
    channels-last: ``concat([col_embed[x], row_embed[y]])`` like the
    reference (x-embedding first on the channel axis).
    """

    num_feats: int
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, mask):
        b, h, w = mask.shape
        # U[0,1) init matches the reference's mmcv uniform_init on these
        # embeddings (positional_encoding.py:129-132) for from-scratch parity
        emb_init = nn.initializers.uniform(scale=1.0)
        row = nn.Embed(
            self.row_num_embed, self.num_feats, embedding_init=emb_init,
            name="row_embed",
        )(jnp.arange(h))  # (H, F)
        col = nn.Embed(
            self.col_num_embed, self.num_feats, embedding_init=emb_init,
            name="col_embed",
        )(jnp.arange(w))  # (W, F)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats)),
                jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_feats))


class MultiheadAttention(nn.Module):
    """Multi-head attention with DETR's residual + positional-encoding
    contract (reference transformer.py:9-102), batch-first.

    ``__call__(x, key, value, residual, query_pos, key_pos, attn_mask,
    key_padding_mask)`` — all (B, L, C); returns ``residual + attn_out``.
    """

    embed_dims: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        key=None,
        value=None,
        residual=None,
        query_pos=None,
        key_pos=None,
        attn_mask=None,
        key_padding_mask=None,
        deterministic: bool = True,
    ):
        assert self.embed_dims % self.num_heads == 0
        head_dim = self.embed_dims // self.num_heads
        query = x
        if key is None:
            key = query
        if value is None:
            value = key
        if residual is None:
            residual = x
        if key_pos is None and query_pos is not None:
            if query_pos.shape == key.shape:  # reference :79-82
                key_pos = query_pos
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos

        # xavier-uniform matches the reference Transformer.init_weights
        # (transformer.py:677-682: xavier_init on every >1-dim weight) so
        # from-scratch training starts from the same distribution
        dense = lambda name: nn.Dense(
            self.embed_dims,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            name=name,
        )
        b, lq, _ = query.shape
        lk = key.shape[1]
        q = dense("q_proj")(query).reshape(b, lq, self.num_heads, head_dim)
        k = dense("k_proj")(key).reshape(b, lk, self.num_heads, head_dim)
        v = dense("v_proj")(value).reshape(b, lk, self.num_heads, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)
        logits = logits.astype(jnp.float32)
        if attn_mask is not None:  # (Lq, Lk), True/nonzero = disallowed
            logits = logits + jnp.where(
                jnp.asarray(attn_mask, bool)[None, None], NEG_INF, 0.0
            )
        if key_padding_mask is not None:  # (B, Lk), True = padded
            logits = logits + jnp.where(
                jnp.asarray(key_padding_mask, bool)[:, None, None, :], NEG_INF, 0.0
            )
        weights = nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(
            b, lq, self.embed_dims
        )
        out = dense("out_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return residual + out


class FFN(nn.Module):
    """Feed-forward block with residual (reference transformer.py:104-165)."""

    embed_dims: int
    feedforward_channels: int
    num_fcs: int = 2
    dropout: float = 0.0
    add_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, deterministic: bool = True):
        assert self.num_fcs >= 2
        out = x
        for i in range(self.num_fcs - 1):
            out = nn.Dense(
                self.feedforward_channels,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"fc{i}",
            )(out)
            out = nn.relu(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(
            self.embed_dims,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            name=f"fc{self.num_fcs - 1}",
        )(out)
        if not self.add_residual:
            return out
        if residual is None:
            residual = x
        return residual + nn.Dropout(self.dropout)(
            out, deterministic=deterministic
        )


def _layer_norm(name):
    return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=name)


class TransformerEncoderLayer(nn.Module):
    """One DETR encoder layer (reference transformer.py:167-264).

    ``order`` follows the reference: post-norm
    ``('selfattn','norm','ffn','norm')`` or pre-norm
    ``('norm','selfattn','norm','ffn')``.
    """

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    dropout: float = 0.0
    order: Tuple[str, ...] = ("selfattn", "norm", "ffn", "norm")
    num_fcs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, pos=None, attn_mask=None, key_padding_mask=None,
        deterministic: bool = True,
    ):
        assert len(self.order) == 4 and set(self.order) == {
            "selfattn", "norm", "ffn",
        }
        pre_norm = self.order[0] == "norm"
        attn = MultiheadAttention(
            self.embed_dims, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )
        ffn = FFN(
            self.embed_dims, self.feedforward_channels, self.num_fcs,
            self.dropout, dtype=self.dtype, name="ffn",
        )
        norm_cnt = 0
        inp_residual = x
        for layer in self.order:
            if layer == "selfattn":
                x = attn(
                    x, x, x,
                    inp_residual if pre_norm else None,
                    query_pos=pos, key_pos=pos,
                    attn_mask=attn_mask, key_padding_mask=key_padding_mask,
                    deterministic=deterministic,
                )
                inp_residual = x
            elif layer == "norm":
                x = _layer_norm(f"norm{norm_cnt}")(x)
                norm_cnt += 1
            else:  # ffn
                x = ffn(x, inp_residual if pre_norm else None,
                        deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """One DETR decoder layer (reference transformer.py:266-400): self-attn
    over queries, cross-attn into encoder memory, FFN, each with its norm."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    dropout: float = 0.0
    order: Tuple[str, ...] = (
        "selfattn", "norm", "multiheadattn", "norm", "ffn", "norm",
    )
    num_fcs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        memory,
        memory_pos=None,
        query_pos=None,
        memory_attn_mask=None,
        target_attn_mask=None,
        memory_key_padding_mask=None,
        target_key_padding_mask=None,
        deterministic: bool = True,
    ):
        assert len(self.order) == 6 and set(self.order) == {
            "selfattn", "norm", "multiheadattn", "ffn",
        }
        pre_norm = self.order[0] == "norm"
        self_attn = MultiheadAttention(
            self.embed_dims, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )
        cross_attn = MultiheadAttention(
            self.embed_dims, self.num_heads, self.dropout, dtype=self.dtype,
            name="multihead_attn",
        )
        ffn = FFN(
            self.embed_dims, self.feedforward_channels, self.num_fcs,
            self.dropout, dtype=self.dtype, name="ffn",
        )
        norm_cnt = 0
        inp_residual = x
        for layer in self.order:
            if layer == "selfattn":
                x = self_attn(
                    x, x, x,
                    inp_residual if pre_norm else None,
                    query_pos=query_pos, key_pos=query_pos,
                    attn_mask=target_attn_mask,
                    key_padding_mask=target_key_padding_mask,
                    deterministic=deterministic,
                )
                inp_residual = x
            elif layer == "multiheadattn":
                x = cross_attn(
                    x, memory, memory,
                    inp_residual if pre_norm else None,
                    query_pos=query_pos, key_pos=memory_pos,
                    attn_mask=memory_attn_mask,
                    key_padding_mask=memory_key_padding_mask,
                    deterministic=deterministic,
                )
                inp_residual = x
            elif layer == "norm":
                x = _layer_norm(f"norm{norm_cnt}")(x)
                norm_cnt += 1
            else:  # ffn
                x = ffn(x, inp_residual if pre_norm else None,
                        deterministic=deterministic)
        return x


class DETRTransformer(nn.Module):
    """The DETR transformer (reference transformer.py:597-744).

    ``__call__(x, mask, query_embed, pos_embed)`` with channels-last
    ``x``/``pos_embed`` (B, H, W, C) and ``mask`` (B, H, W) (True = padded)
    returns ``(out_dec, memory)``:

    - ``out_dec``: (num_decoder_layers, B, num_query, C) when
      ``return_intermediate_dec`` else (1, B, num_query, C) — the
      reference's shape contract.
    - ``memory``: (B, H, W, C) encoder output.
    """

    embed_dims: int = 512
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 2048
    dropout: float = 0.0
    num_fcs: int = 2
    pre_norm: bool = False
    return_intermediate_dec: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, query_embed, pos_embed,
                 deterministic: bool = True):
        b, h, w, c = x.shape
        assert c == self.embed_dims
        if self.pre_norm:
            enc_order = ("norm", "selfattn", "norm", "ffn")
            dec_order = (
                "norm", "selfattn", "norm", "multiheadattn", "norm", "ffn",
            )
        else:
            enc_order = ("selfattn", "norm", "ffn", "norm")
            dec_order = (
                "selfattn", "norm", "multiheadattn", "norm", "ffn", "norm",
            )

        seq = x.reshape(b, h * w, c)
        pos = pos_embed.reshape(b, h * w, c)
        pad = jnp.asarray(mask, bool).reshape(b, h * w)

        memory = seq
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                self.dropout, enc_order, self.num_fcs, dtype=self.dtype,
                name=f"encoder_layer{i}",
            )(memory, pos=pos, key_padding_mask=pad,
              deterministic=deterministic)
        if self.pre_norm:  # reference TransformerEncoder:446 final norm
            memory = _layer_norm("encoder_norm")(memory)

        q = jnp.broadcast_to(
            query_embed[None], (b,) + query_embed.shape
        )  # (B, num_query, C)
        target = jnp.zeros_like(q)
        # one shared final norm, applied per intermediate
        # (reference TransformerDecoder:570-580)
        dec_norm = _layer_norm("decoder_norm")
        intermediates = []
        for i in range(self.num_decoder_layers):
            target = TransformerDecoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                self.dropout, dec_order, self.num_fcs, dtype=self.dtype,
                name=f"decoder_layer{i}",
            )(
                target, memory,
                memory_pos=pos, query_pos=q,
                memory_key_padding_mask=pad,
                deterministic=deterministic,
            )
            if self.return_intermediate_dec:
                intermediates.append(dec_norm(target))
        if self.return_intermediate_dec:
            out_dec = jnp.stack(intermediates, axis=0)
        else:
            out_dec = dec_norm(target)[None]
        return out_dec, memory.reshape(b, h, w, c)
