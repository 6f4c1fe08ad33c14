"""Fused vote-NMS as a single tiled, batch-chunked Pallas TPU kernel.

Each grid program processes a CHUNK of images (default 8) through the whole
vote-NMS pipeline in VMEM with no HBM round-trips between stages:

  1. tile-sequential greedy suppression: boxes are processed in 128-wide
     tiles in cluster-score order; each tile's keep mask is blocked by the
     already-final keep of earlier tiles (one 128x128 IoU tile + matvec per
     earlier tile) and resolved within the tile by the parallel-greedy
     fixed point (lax.while_loop of masked matrix-vector products).  This
     is EXACTLY sequential greedy NMS: box i's fate depends only on boxes
     before it,
  2. optional global-mode per-label dedup sweep,
  3. lowest-index-seed membership (per 128x128 tile pair),
  4. weighted coordinate voting with the 1-sigma refilter (two masked
     matmul passes per tile pair).

No (K, K) intermediate is ever materialized — every pairwise quantity is
(re)computed per (C, 128, 128) tile inside fori_loops, so Mosaic compiles a
constant-size kernel body regardless of K (the round-1 single-block kernel
compiled the full (K, K) ops inline and Mosaic blew up superlinearly:
K=128 ~9 s, K=256 ~67 s, K=512 timed out; the tiled kernel compiles in
~10 s at any K).

Why the chunk axis: grid programs run SEQUENTIALLY on the TensorCore, and
the round-2 one-image-per-program kernel measured a FLAT ~0.28 ms/image at
batch 8 AND batch 128 — per-program control overhead (fori_loop trips,
while_loop latency chains, matvec latency) dominated the arithmetic, so
large batches lost to the XLA formulation whose (B, K, K) ops batch onto
the MXU (postprocess 16 ms vs 36 ms per batch-128).  Chunking C images into
one program runs the SAME loop structure once per C images: every
elementwise tile op becomes (C, 128, 128) on the VPU and every matvec a
C-batched dot_general, amortizing the control overhead C-fold.  The greedy
fixed point iterates until ALL chunk images converge (a few extra no-op
iterations for early converger images — masked, so semantics are
unchanged).

Measured (v5e, round 3, clustered boxes ~60-100% valid): B=8 K=512 chunked
kernel 2.41 ms/batch vs XLA fast 2.95 ms (1.22x win, checksums equal to f32
vote-boundary tolerance).  At the deploy batch (B=128 K=1024) the XLA
formulation runs 12.2 ms/batch; the chunked kernel's Mosaic compile did not
complete within this harness's 9.5-minute budget (the harness host has one
CPU core; K=1024 means 8x8 tile-pair loops per stage compiled at chunk width
8), so the deploy default remains ``nms_impl='fast'`` and the kernel is the
small-batch / latency path.

Semantics are identical to ops/vote_nms.py::vote_nms_device_fast (same
formulation), which is itself exact-parity-tested against the sequential
C++-semantics oracle (reference /root/reference/radet/ops/vote/
vote_ext.cpp:70-353).  Suppression sets agree EXACTLY between the two;
voted coordinates may differ on a <0.5% tail of 1-sigma boundary flips
(different f32 accumulation orders — both implementations sit ~1.6% from
the f64 oracle on adversarial deep-cluster scenes, dominated by the same
flips).

Inputs must be pre-sorted by descending cluster score with invalid slots
last (models/postprocess.py does a global top-k that returns exactly this).
K must be a multiple of 128 (MXU lane width).  The batch is padded to a
multiple of the chunk size with invalid images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
TILE = 128
CHUNK = 8  # images per grid program


def _matvec(m, v):
    """(C, T, T) @ (C, T) -> (C, T), batched on the MXU.

    Precision.HIGHEST: the MXU multiplies in bf16 by default, which
    quantizes voted coordinates (~1 px at 300 px) — the multi-pass f32
    mode keeps voting exact and these 128x128 products are far from the
    kernel's critical path."""
    return jax.lax.dot_general(
        m, v[..., None], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]


def _matmul(a, b):
    """(C, T, T) @ (C, T, 4) -> (C, T, 4), batched."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _nms_kernel_tiled(
    boxes_ref,  # (C, K, 4) f32, sorted by cluster score desc
    vscore_ref,  # (C, K) f32
    labels_ref,  # (C, K) i32
    valid_ref,  # (C, K) i32 (0/1)
    voted_ref,  # out (C, K, 4) f32
    keep_ref,  # out (C, K) i32
    keep_s,  # scratch (C, K) f32 — greedy keep (pre global-dedup)
    keep2_s,  # scratch (C, K) f32 — final keep
    seed_s,  # scratch (C, K) i32 — seed index per box (K = no seed)
    *,
    iou_threshold: float,
    iou_enable: bool,
    sigma: float,
    global_mode: bool,
):
    c_n, k = vscore_ref.shape
    n_tiles = k // TILE
    # NB masks are carried as f32: Mosaic cannot reshape 1-bit vectors to 2D
    row_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)[None]
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)[None]

    def _tile(t):
        off = pl.multiple_of(t * TILE, TILE)
        b = boxes_ref[:, pl.ds(off, TILE), :]
        lab = labels_ref[:, pl.ds(off, TILE)]
        val = (valid_ref[:, pl.ds(off, TILE)] > 0).astype(jnp.float32)
        return b, lab, val

    def _iou_ok(br, lr, vr, bc, lc, vc):
        """rows = tile r boxes, cols = tile c boxes: (iou, adjacency),
        each (C, TILE, TILE)."""
        xl = jnp.maximum(br[:, :, 0][:, :, None], bc[:, :, 0][:, None, :])
        yt = jnp.maximum(br[:, :, 1][:, :, None], bc[:, :, 1][:, None, :])
        xr = jnp.minimum(br[:, :, 2][:, :, None], bc[:, :, 2][:, None, :])
        yb = jnp.minimum(br[:, :, 3][:, :, None], bc[:, :, 3][:, None, :])
        inter = jnp.maximum(xr - xl, 0.0) * jnp.maximum(yb - yt, 0.0)
        ar = jnp.maximum(br[:, :, 2] - br[:, :, 0], 0.0) * jnp.maximum(
            br[:, :, 3] - br[:, :, 1], 0.0
        )
        ac = jnp.maximum(bc[:, :, 2] - bc[:, :, 0], 0.0) * jnp.maximum(
            bc[:, :, 3] - bc[:, :, 1], 0.0
        )
        iou = inter / jnp.maximum(ar[:, :, None] + ac[:, None, :] - inter, 1e-12)
        same = (lr[:, :, None] == lc[:, None, :]).astype(jnp.float32)
        ok = (
            (iou > iou_threshold).astype(jnp.float32)
            * same
            * vr[:, :, None]
            * vc[:, None, :]
        )
        return iou, ok

    # ------------------------------------------------------------------
    # Phase A — tile-sequential greedy keep.  Box i depends only on boxes
    # j < i, so resolving tiles in score order with earlier tiles' FINAL
    # keep is exactly sequential greedy NMS.
    # ------------------------------------------------------------------
    def _phase_a(t, carry):
        bt, lt, vt = _tile(t)
        off_t = pl.multiple_of(t * TILE, TILE)

        def _earlier(s, blocked):
            bs, ls, vs = _tile(s)
            ks = keep_s[:, pl.ds(pl.multiple_of(s * TILE, TILE), TILE)]
            _, ok = _iou_ok(bt, lt, vt, bs, ls, vs)
            return blocked + _matvec(ok, ks)

        blocked = jax.lax.fori_loop(
            0, t, _earlier, jnp.zeros((c_n, TILE), jnp.float32)
        )
        base = vt * (blocked < 0.5).astype(jnp.float32)

        _, ok_tt = _iou_ok(bt, lt, vt, bt, lt, vt)
        blockers = ok_tt * (col_i < row_i).astype(jnp.float32)

        def _cond(state):
            return state[1]

        def _body(state):
            kp, _ = state
            blk = _matvec(blockers, kp)
            nk = base * (blk < 0.5).astype(jnp.float32)
            return nk, jnp.any(nk != kp)

        kp, _ = jax.lax.while_loop(_cond, _body, (base, True))
        keep_s[:, pl.ds(off_t, TILE)] = kp
        return carry

    jax.lax.fori_loop(0, n_tiles, _phase_a, 0)

    # ------------------------------------------------------------------
    # Global mode: drop kept boxes whose label was already emitted by an
    # earlier kept box (computed from the PRE-dedup keep, matching
    # vote_nms_device_fast / global_vote_nms semantics).
    # ------------------------------------------------------------------
    if global_mode:

        def _dedup(t, carry):
            bt, lt, vt = _tile(t)
            off_t = pl.multiple_of(t * TILE, TILE)
            kp_t = keep_s[:, pl.ds(off_t, TILE)]
            row_g = t * TILE + row_i  # (1, TILE, TILE) global row ids

            def _scan(s, dup):
                _, ls, _ = _tile(s)
                ks = keep_s[:, pl.ds(pl.multiple_of(s * TILE, TILE), TILE)]
                same = (lt[:, :, None] == ls[:, None, :]).astype(jnp.float32)
                col_g = s * TILE + col_i
                earlier = (col_g < row_g).astype(jnp.float32)
                return dup + _matvec(same * earlier, ks)

            dup = jax.lax.fori_loop(
                0, t + 1, _scan, jnp.zeros((c_n, TILE), jnp.float32)
            )
            keep2_s[:, pl.ds(off_t, TILE)] = kp_t * (dup < 0.5).astype(jnp.float32)
            return carry

        jax.lax.fori_loop(0, n_tiles, _dedup, 0)
    else:
        keep2_s[:, :] = keep_s[:, :]

    # ------------------------------------------------------------------
    # Membership: seed(j) = lowest-index kept i <= j with ok(i, j).
    # ------------------------------------------------------------------
    def _seeds(c, carry):
        bc, lc, vc = _tile(c)
        off_c = pl.multiple_of(c * TILE, TILE)

        def _scan(r, best):
            br, lr, vr = _tile(r)
            kr = keep2_s[:, pl.ds(pl.multiple_of(r * TILE, TILE), TILE)]
            _, ok = _iou_ok(br, lr, vr, bc, lc, vc)
            row_g = r * TILE + row_i
            col_g = c * TILE + col_i
            cand = ok * (row_g <= col_g).astype(jnp.float32) * kr[:, :, None]
            # forced self-membership: a kept box always seeds itself even
            # when IoU(i, i) fails the threshold (zero-area boxes) —
            # matches vote_nms_device_fast's cand.at[idx, idx].set(keep)
            cand = jnp.maximum(
                cand, (row_g == col_g).astype(jnp.float32) * kr[:, :, None]
            )
            cand_seed = jnp.where(cand > 0.5, row_g, k)
            return jnp.minimum(best, jnp.min(cand_seed, axis=1))

        best = jax.lax.fori_loop(
            0, c + 1, _scan, jnp.full((c_n, TILE), k, jnp.int32)
        )
        seed_s[:, pl.ds(off_c, TILE)] = best
        return carry

    jax.lax.fori_loop(0, n_tiles, _seeds, 0)

    # ------------------------------------------------------------------
    # Voting: per row (seed) tile, two passes over col tiles >= r —
    # pass 1 accumulates weighted mean/variance, pass 2 the 1-sigma
    # inlier-refiltered weighted mean.
    # ------------------------------------------------------------------
    def _vote(r, carry):
        br, lr, vr = _tile(r)
        off_r = pl.multiple_of(r * TILE, TILE)
        kr = keep2_s[:, pl.ds(off_r, TILE)]
        row_g = r * TILE + row_i

        def _member_w(c):
            bc, lc, vc = _tile(c)
            iou, ok = _iou_ok(br, lr, vr, bc, lc, vc)
            col_g = c * TILE + col_i
            cand = ok * (row_g <= col_g).astype(jnp.float32) * kr[:, :, None]
            # forced self-membership (see _seeds): zero-area kept boxes
            # must vote with their own coordinates, not collapse to (0,)*4
            cand = jnp.maximum(
                cand, (row_g == col_g).astype(jnp.float32) * kr[:, :, None]
            )
            seed_c = seed_s[:, pl.ds(pl.multiple_of(c * TILE, TILE), TILE)]
            member = (row_g == seed_c[:, None, :]).astype(jnp.float32) * cand
            vs_c = vscore_ref[:, pl.ds(pl.multiple_of(c * TILE, TILE), TILE)]
            w = member * vs_c[:, None, :]
            if iou_enable:
                w = w * jnp.exp(-((1.0 - iou) ** 2) / sigma)
            return w, bc

        def _pass1(c, acc):
            accw, accb, accsq = acc
            w, bc = _member_w(c)
            accw = accw + _matvec(w, jnp.ones((c_n, TILE), jnp.float32))
            accb = accb + _matmul(w, bc)
            accsq = accsq + _matmul(w, bc * bc)
            return accw, accb, accsq

        accw, accb, accsq = jax.lax.fori_loop(
            r,
            n_tiles,
            _pass1,
            (
                jnp.zeros((c_n, TILE), jnp.float32),
                jnp.zeros((c_n, TILE, 4), jnp.float32),
                jnp.zeros((c_n, TILE, 4), jnp.float32),
            ),
        )
        wsum = jnp.maximum(accw, 1e-12)[:, :, None]
        mean = accb / wsum
        sq = accsq / wsum
        sig = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
        lo = mean - sig
        hi = mean + sig

        def _pass2(c, acc):
            den, num = acc
            w, bc = _member_w(c)
            dcols, ncols = [], []
            for coord in range(4):
                xc = bc[:, :, coord]
                inlier = (
                    (xc[:, None, :] >= lo[:, :, coord][:, :, None])
                    & (xc[:, None, :] <= hi[:, :, coord][:, :, None])
                ).astype(jnp.float32)
                w2 = w * inlier
                dcols.append(_matvec(w2, jnp.ones((c_n, TILE), jnp.float32)))
                ncols.append(_matvec(w2, xc))
            return den + jnp.stack(dcols, -1), num + jnp.stack(ncols, -1)

        den, num = jax.lax.fori_loop(
            r,
            n_tiles,
            _pass2,
            (
                jnp.zeros((c_n, TILE, 4), jnp.float32),
                jnp.zeros((c_n, TILE, 4), jnp.float32),
            ),
        )
        voted = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), mean)
        voted_ref[:, pl.ds(off_r, TILE), :] = voted
        keep_ref[:, pl.ds(off_r, TILE)] = kr.astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, n_tiles, _vote, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "max_out", "iou_enable", "sigma", "global_mode",
        "chunk", "interpret",
    ),
)
def vote_nms_pallas(
    boxes,  # (B, K, 4) SORTED by cluster score desc, invalid last
    cluster_scores,  # (B, K)
    vote_scores,  # (B, K)
    labels,  # (B, K) int32
    valid,  # (B, K) bool
    *,
    iou_threshold: float = 0.65,
    max_out: int = 100,
    iou_enable: bool = False,
    sigma: float = 0.025,
    global_mode: bool = False,
    chunk: int = CHUNK,
    interpret: bool = False,
):
    """Batched fused vote-NMS. Same outputs as vote_nms_device_fast (vmapped):
    (boxes (B,max_out,4), labels, scores, valid)."""
    b, k, _ = boxes.shape
    assert k % TILE == 0, f"K must be a multiple of {TILE}, got {k}"
    c = min(chunk, b)
    pad = (-b) % c
    bp = b + pad

    def _pad(x, fill=0):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    kernel = functools.partial(
        _nms_kernel_tiled,
        iou_threshold=iou_threshold,
        iou_enable=iou_enable,
        sigma=sigma,
        global_mode=global_mode,
    )
    voted, keep = pl.pallas_call(
        kernel,
        grid=(bp // c,),
        in_specs=[
            pl.BlockSpec((c, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k, 4), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, k), jnp.float32),  # keep (pre-dedup)
            pltpu.VMEM((c, k), jnp.float32),  # keep (final)
            pltpu.VMEM((c, k), jnp.int32),  # seed index per box
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        _pad(boxes.astype(jnp.float32)),
        _pad(vote_scores.astype(jnp.float32)),
        _pad(labels.astype(jnp.int32)),
        _pad(valid.astype(jnp.int32)),
    )
    voted = voted[:b]
    keep = keep[:b] > 0  # (B, K)

    # pack kept seeds (already score-ordered by index) into max_out slots
    rank = jnp.cumsum(keep, axis=1) - 1
    slot = jnp.where(keep & (rank < max_out), rank, max_out)

    def pack(values, fill, dtype):
        out = jnp.full((b, max_out + 1) + values.shape[2:], fill, dtype)
        bidx = jnp.arange(b)[:, None].repeat(k, 1)
        return out.at[bidx, slot].set(values)[:, :max_out]

    out_boxes = pack(jnp.where(keep[..., None], voted, 0.0), 0.0, jnp.float32)
    out_scores = pack(jnp.where(keep, cluster_scores, 0.0), 0.0, jnp.float32)
    out_labels = pack(jnp.where(keep, labels, -1), -1, jnp.int32)
    out_valid = pack(keep, False, bool)
    return out_boxes, out_labels, out_scores, out_valid
