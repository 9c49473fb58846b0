"""Stacked-layer pallas megakernels: a WHOLE decoder/encoder stack in ONE
``pallas_call`` with the layer index as the outer grid dimension.

Motivation (BENCH_NOTES round-2 kernel anatomy): each per-layer fused kernel
(ops/pallas_decoder_layer) pays ~25-30 us of fixed cost (kernel entry + the
first weight fetch) per launch.  The SA decode runs 6 layers x 6 rounds = 36
launches per batch; the NA fill and the encoder 6 each.  Moving the layer
loop INTO the grid removes all but one launch per pass:

    grid = (n_layers, B // G)        # layer outer, batch-block inner

Weight streaming: the layers' weights cannot ride the automatic pipeline —
Mosaic double-buffers any input whose block index varies across the grid,
and 2 x ~7 MB of projection matrices would blow the ~16 MB of VMEM.  Instead
every layer's matrices are packed into ONE ``[NL, ROWS, 512]`` HBM-resident
blob (``memory_space=ANY``; w1 stored TRANSPOSED so every matrix keeps the
512-lane layout) and the kernel issues three manual ``make_async_copy``s per
layer (self-attn / cross-attn / FFN row ranges) into a single VMEM scratch
at the layer's first batch block.  The waits are staggered — self before the
self-attention dots, cross before cross-attention, FFN before the FFN — so
only the first ~2 MB copy's latency is ever exposed; the rest lands under
compute.  Biases and norm params are tiny and ride the normal pipeline as
``[NL, rows, .]`` inputs.

Activations are carried across layers in a persistent VMEM scratch (scratch
outlives grid steps): block i is loaded from the input ref at layer 0,
updated in place each layer, and emitted to the output ref at the last
layer.

The windowed variant (SA fill) additionally moves the per-layer K/V-cache
scatter IN-KERNEL: the caller passes the copy window's block-diagonal
one-hot ``[B//G, G*L, G*W]`` (exactly one 1.0 per in-window row) and the
kernel merges ``new_cache = cache * (1 - rowsum) + onehot @ kv_new`` — exact
(multiplies by literal 0.0/1.0), and it replaces the 2 x n_layers XLA
einsum+where scatters the per-layer path runs between kernel launches.
Caches are stacked ``[NL, B, L, D]`` arrays aliased input->output.

Numerics are IDENTICAL to the per-layer kernels (same ``_refnorm`` / dot /
mask arithmetic, bf16 rounds in the same places); equivalence is tested in
interpret mode and on-device.

Reference provenance: reference DecoderLayer/EncoderLayer
(captioning/models/TransformerModel.py:1366-1413) and core_SAIC's
full-decoder-per-phrase loop (:1878-1986) — this file is the TPU-native
re-expression of those stacks for inference.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decoder_layer import MASK_FILL, _refnorm

D_LANE = 512  # production blob lane width == d_model (Mosaic wants the
              # last dim 128-aligned on hardware; interpret mode is free)

# Batch-block size G per grid step (grid = (n_layers, B // G)).  The fixed
# per-grid-step cost dominates at small G (B=64, G=8 -> 48 steps of only
# G*W rows each), but the block-diagonal attention's wasted score FLOPs
# grow linearly with G, and the kernel's VMEM footprint (weight blob +
# activations + block-diagonal masks + FFN intermediate) must stay under
# ~16 MB.  Swept on v5e at B=64, d=512 with bf16 masks (BENCH_NOTES.md):
# the narrow window is flat across 8/16 (~0.47-0.49 ms) and worse at 32;
# the wide (W=L) variant only fits at 8.  Env overrides for re-sweeps.
WIN_BLOCK_B = int(os.environ.get("BOFICAP_WIN_BLOCK_B", "16"))
WIN_WIDE_BLOCK_B = int(os.environ.get("BOFICAP_WIN_WIDE_BLOCK_B", "8"))
DEC_BLOCK_B = int(os.environ.get("BOFICAP_DEC_BLOCK_B", "8"))
ENC_BLOCK_B = int(os.environ.get("BOFICAP_ENC_BLOCK_B", "8"))


# ---------------------------------------------------------------------------
# Weight packing: per-layer dicts (pack_layer_weights / pack_encoder_weights
# pack_one) -> one [NL, ROWS, 512] blob + small stacked bias/norm tensors.
# Row layouts (row offsets in units of d_model=512 rows):
#   dec  (full-width): wq wk wv wo wq2 wk2 wv2 wo2 | w1T(2048) w2(2048)
#   win  (windowed)  : wq wk wv wo wq2 wo2         | w1T(2048) w2(2048)
#   enc              : wq wk wv wo                 | w1T(2048) w2(2048)
# ---------------------------------------------------------------------------

_B512 = {
    "dec": ("bqh", "bkh", "bvh", "bo", "bq2h", "bk2h", "bv2h", "bo2",
            "s0", "b0", "s1", "b1", "s2", "b2", "bf2"),
    "win": ("bqh", "bkh", "bvh", "bo", "bq2h", "bo2",
            "s0", "b0", "s1", "b1", "s2", "b2", "bf2"),
    "enc": ("bqh", "bkh", "bvh", "bo", "s0", "b0", "s1", "b1", "bf2"),
}
_MATS = {
    "dec": ("wqh", "wkh", "wvh", "woh", "wq2h", "wk2h", "wv2h", "wo2h"),
    "win": ("wqh", "wkh", "wvh", "woh", "wq2h", "wo2h"),
    "enc": ("wqh", "wkh", "wvh", "woh"),
}


def _layout(variant: str, d_model: int, d_ff: int):
    n_sq = len(_MATS[variant])
    r_self = 4 * d_model                     # wq wk wv wo
    r_cross = n_sq * d_model                 # + cross projections (if any)
    rows = n_sq * d_model + 2 * d_ff
    return r_self, r_cross, rows


def pack_stack(packed: List[Dict[str, Any]], variant: str):
    """Per-layer packed weight dicts -> stacked kernel operands.

    Returns {'blob': [NL, ROWS, D], 'b512': [NL, nb, D],
             'b2048': [NL, 1, d_ff]} in the packed dtype."""
    assert variant in _MATS, variant
    d_model = packed[0]["wqh"].shape[0]
    d_ff = packed[0]["w1"].shape[1]
    blobs = []
    for lp in packed:
        mats = [lp[n] for n in _MATS[variant]]
        mats.append(lp["w1"].T)              # [d_ff, D] — keep 512 lanes
        mats.append(lp["w2"])                # [d_ff, D]
        blobs.append(jnp.concatenate(mats, axis=0))
    b512 = jnp.stack([jnp.stack([lp[n] for n in _B512[variant]])
                      for lp in packed])
    b2048 = jnp.stack([lp["bf1"][None, :] for lp in packed])
    return {"blob": jnp.stack(blobs), "b512": b512, "b2048": b2048}


def _chunk_rows(B: int, G: int, cap: int = 128) -> int:
    """Largest multiple of G that divides B and is <= cap: the batch-chunk
    height for the persistent activation scratch.  At B <= cap this is B
    (one chunk — the original unchunked grid); beyond it the kernels run a
    (B//GB, NL, GB//G) grid re-fetching weights once per chunk."""
    if B <= cap:
        return B
    best = G
    d = G
    while d <= cap:
        if B % d == 0:
            best = d
        d += G
    n_chunks = B // best
    if n_chunks > (B + cap - 1) // cap * 2:
        # no good divisor under the cap (e.g. B=136, G=8 -> 17 chunks of
        # 8): each chunk re-fetches the ~7 MB weight blob per layer — a
        # silent performance cliff vs a batch padded to a friendlier size
        import warnings
        warnings.warn(
            f"pallas_stack: batch {B} chunks into {n_chunks} x {best} rows "
            f"(no multiple of {G} <= {cap} divides it); each chunk re-"
            "fetches the full weight blob per layer. Pad the batch to a "
            f"multiple of {cap} (or any size with a divisor near {cap}) "
            "or use the per-layer kernel route.", stacklevel=3)
    return best


def _wslice(wbuf, k: int, d_model: int):
    """k-th [D, D] matrix in the blob scratch."""
    return wbuf[k * d_model:(k + 1) * d_model, :]


def _heads_ctx(q_all, k_all, v_all, mask, fill, dtype, num_heads: int):
    """Per-head block-diagonal-batched attention over pre-projected
    activations; returns the concatenated head contexts [N, D].  Masks ride
    VMEM as bf16 0/1 (half the s32 footprint Mosaic gives bool inputs)."""
    Dh = q_all.shape[1] // num_heads
    scale = 1.0 / math.sqrt(Dh)
    mask = mask != 0
    ctxs = []
    for h in range(num_heads):
        q = q_all[:, h * Dh:(h + 1) * Dh]
        k = k_all[:, h * Dh:(h + 1) * Dh]
        v = v_all[:, h * Dh:(h + 1) * Dh]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sc = jnp.where(mask, sc, fill)
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        ctxs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(dtype))
    return jnp.concatenate(ctxs, axis=-1)


def _proj(x, wbuf, k: int, b512, b_i, dtype):
    """x @ blob-matrix k + bias row b_i, rounded like nn.Dense(dtype)."""
    D = x.shape[1]
    return (jnp.dot(x, _wslice(wbuf, k, D),
                    preferred_element_type=jnp.float32)
            .astype(dtype) + b512[b_i])


def _sliced_mha(x, n_q, kv_src, wbuf, b512, qk, kk, vk, ok, bq_i, bk_i, bv_i,
                bo_i, mask, fill, dtype, num_heads):
    """Multi-head attention reading projections from the blob scratch.
    Same arithmetic as pallas_decoder_layer._mha.  Returns x + attn + bo."""
    D = x.shape[1]
    q_all = _proj(n_q, wbuf, qk, b512, bq_i, dtype)
    k_all = _proj(kv_src, wbuf, kk, b512, bk_i, dtype)
    v_all = _proj(kv_src, wbuf, vk, b512, bv_i, dtype)
    ctx = _heads_ctx(q_all, k_all, v_all, mask, fill, dtype, num_heads)
    att = jnp.dot(ctx, _wslice(wbuf, ok, D),
                  preferred_element_type=jnp.float32)
    return x + (att.astype(dtype) + b512[bo_i])


def _sliced_ffn(x, wbuf, b512, b2048, r_ffn, s_i, b_i, bf2_i, dtype, d_ff):
    n2 = _refnorm(x, b512[s_i], b512[b_i], dtype)
    D = x.shape[1]
    w1t = wbuf[r_ffn:r_ffn + d_ff, :]                     # [d_ff, D] = w1.T
    w2 = wbuf[r_ffn + d_ff:r_ffn + 2 * d_ff, :]           # [d_ff, D]
    f = jnp.maximum(
        jax.lax.dot_general(n2, w1t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        .astype(dtype) + b2048[0], 0)
    f = (jnp.dot(f, w2, preferred_element_type=jnp.float32)
         .astype(dtype) + b512[bf2_i])
    return x + f


class _WeightDMAs:
    """The three staggered weight copies (self-attn / cross-attn / FFN row
    ranges) for one layer.  Descriptors are created lazily per start/wait so
    every created descriptor is used (pallas warns on unused ones)."""

    def __init__(self, blob_ref, wbuf, sems, l, r_self, r_cross, rows):
        spans = [(0, r_self)]
        if r_cross > r_self:
            spans.append((r_self, r_cross - r_self))
        spans.append((r_cross, rows - r_cross))
        self._mk = lambda j: pltpu.make_async_copy(
            blob_ref.at[l, pl.ds(*spans[j])],
            wbuf.at[pl.ds(*spans[j])], sems.at[j])
        self.n = len(spans)

    def start_all(self):
        for j in range(self.n):
            self._mk(j).start()

    def wait(self, j):
        self._mk(j).wait()


def _blockfill(N, M, Lq, Lk):
    """Two-level mask fill for block-diagonal-batched scores (see
    pallas_decoder_layer._mha): own-sample masked keys MASK_FILL,
    cross-sample blocks 2*MASK_FILL."""
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) // Lq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) // Lk
    return jnp.where(row_blk == col_blk, MASK_FILL, 2.0 * MASK_FILL)


# ---------------------------------------------------------------------------
# Full-width decoder stack (NA fill / NNAIC fill)
# ---------------------------------------------------------------------------


def _dec_stack_kernel(x_ref, mem_ref, tm_ref, sm_ref, b512_ref, b2048_ref,
                      blob_ref, o_ref, xc_ref, wbuf, sems, *,
                      num_heads: int, n_layers: int, d_ff: int,
                      r_self: int, r_cross: int, rows: int,
                      chunked: bool = False):
    # chunked (B > 128): grid = (C, NL, GB//G) — the batch is processed in
    # chunks of GB rows so the persistent activation scratch is [GB, L, D]
    # instead of [B, L, D] (which blows the 16 MB VMEM scope at B=256 by
    # 44 KB).  Each chunk re-fetches the layer weights (the DMA fires at
    # i == 0 of every (chunk, layer) pair) — ~7 MB of extra HBM traffic per
    # extra chunk, overlapped by the same staggered waits.
    if chunked:
        l = pl.program_id(1)
        i = pl.program_id(2)
    else:
        l = pl.program_id(0)
        i = pl.program_id(1)
    G, Lq, D = x_ref.shape
    R = mem_ref.shape[1]
    dtype = x_ref.dtype
    N = G * Lq

    dmas = _WeightDMAs(blob_ref, wbuf, sems, l, r_self, r_cross, rows)

    @pl.when(i == 0)
    def _fetch_weights():
        dmas.start_all()
        dmas.wait(0)                       # self-attn rows, before first use

    @pl.when(l == 0)
    def _load_x():
        xc_ref[pl.ds(i * G, G)] = x_ref[:]

    x = xc_ref[pl.ds(i * G, G)].reshape(N, D)
    b512 = b512_ref[0]
    b2048 = b2048_ref[0]

    n0 = _refnorm(x, b512[8], b512[9], dtype)
    x = _sliced_mha(x, n0, n0, wbuf, b512, 0, 1, 2, 3, 0, 1, 2, 3,
                    tm_ref[0], _blockfill(N, N, Lq, Lq), dtype, num_heads)

    @pl.when(i == 0)
    def _wait_cross():
        dmas.wait(1)

    n1 = _refnorm(x, b512[10], b512[11], dtype)
    mem = mem_ref[:].reshape(G * R, D)
    x = _sliced_mha(x, n1, mem, wbuf, b512, 4, 5, 6, 7, 4, 5, 6, 7,
                    sm_ref[0], _blockfill(N, G * R, Lq, R), dtype, num_heads)

    @pl.when(i == 0)
    def _wait_ffn():
        dmas.wait(2)

    x = _sliced_ffn(x, wbuf, b512, b2048, r_cross, 12, 13, 14, dtype, d_ff)

    xc_ref[pl.ds(i * G, G)] = x.reshape(G, Lq, D)

    @pl.when(l == n_layers - 1)
    def _emit():
        o_ref[:] = x.reshape(G, Lq, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def _dec_stack_call(x, memory, tm_big, sm_big, blob, b512, b2048,
                    num_heads: int, block_b: int = 8,
                    interpret: bool = False):
    B, L, D = x.shape
    R = memory.shape[1]
    NL = blob.shape[0]
    d_ff = b2048.shape[-1]
    r_self, r_cross, rows = _layout("dec", D, d_ff)
    G = math.gcd(B, block_b)
    tm_big = tm_big.astype(jnp.bfloat16)    # 0/1; halves the mask VMEM
    sm_big = sm_big.astype(jnp.bfloat16)
    GB = _chunk_rows(B, G)
    if GB == B:
        def il(l, i):
            return (jnp.where(l == 0, i, 0), 0, 0)

        def ii(l, i):
            return (i, 0, 0)

        def ll(l, i):
            return (l, 0, 0)

        grid = (NL, B // G)
        chunked = False
    else:
        K = GB // G

        def il(c, l, i):
            return (jnp.where(l == 0, c * K + i, 0), 0, 0)

        def ii(c, l, i):
            return (c * K + i, 0, 0)

        def ll(c, l, i):
            return (l, 0, 0)

        grid = (B // GB, NL, K)
        chunked = True

    return pl.pallas_call(
        functools.partial(_dec_stack_kernel, num_heads=num_heads,
                          n_layers=NL, d_ff=d_ff, r_self=r_self,
                          r_cross=r_cross, rows=rows, chunked=chunked),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, L, D), il, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * L, G * L), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * L, G * R), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b512.shape[1], D), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_ff), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, L, D), ii, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((GB, L, D), x.dtype),
            pltpu.VMEM((rows, D), blob.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, memory, tm_big, sm_big, b512, b2048, blob)


def fused_decoder_stack_forward(x, memory, tgt_mask, src_mask, stacked,
                                final_norm, num_heads: int,
                                block_b: int = None,
                                interpret: bool = False):
    """Whole Decoder stack in one kernel + final RefLayerNorm.  Drop-in for
    pallas_decoder_layer.fused_decoder_forward given ``stacked`` from
    ``pack_stack(packed, 'dec')``."""
    from .pallas_decoder_layer import _block_diag_masks
    if block_b is None:
        block_b = DEC_BLOCK_B
    if src_mask is None:
        src_mask = jnp.ones(memory.shape[:2], bool)
    B = x.shape[0]
    G = math.gcd(B, block_b)
    tm_big, sm_big = _block_diag_masks(tgt_mask, src_mask, G)
    h = _dec_stack_call(x, memory, tm_big, sm_big, stacked["blob"],
                        stacked["b512"], stacked["b2048"],
                        num_heads=num_heads, block_b=block_b,
                        interpret=interpret)
    s, b = final_norm
    return _refnorm(h, s, b, h.dtype)


# ---------------------------------------------------------------------------
# Encoder stack
# ---------------------------------------------------------------------------


def _enc_stack_kernel(x_ref, m_ref, b512_ref, b2048_ref, blob_ref,
                      o_ref, xc_ref, wbuf, sems, *,
                      num_heads: int, n_layers: int, d_ff: int,
                      r_self: int, r_cross: int, rows: int,
                      chunked: bool = False):
    # see _dec_stack_kernel: chunked grids keep the activation scratch at
    # [GB, R, D] for B > 128
    if chunked:
        l = pl.program_id(1)
        i = pl.program_id(2)
    else:
        l = pl.program_id(0)
        i = pl.program_id(1)
    G, R, D = x_ref.shape
    dtype = x_ref.dtype
    N = G * R

    dmas = _WeightDMAs(blob_ref, wbuf, sems, l, r_self, r_cross, rows)

    @pl.when(i == 0)
    def _fetch_weights():
        dmas.start_all()
        dmas.wait(0)

    @pl.when(l == 0)
    def _load_x():
        xc_ref[pl.ds(i * G, G)] = x_ref[:]

    x = xc_ref[pl.ds(i * G, G)].reshape(N, D)
    b512 = b512_ref[0]
    b2048 = b2048_ref[0]

    n0 = _refnorm(x, b512[4], b512[5], dtype)
    x = _sliced_mha(x, n0, n0, wbuf, b512, 0, 1, 2, 3, 0, 1, 2, 3,
                    m_ref[0], _blockfill(N, N, R, R), dtype, num_heads)

    @pl.when(i == 0)
    def _wait_ffn():
        dmas.wait(1)

    x = _sliced_ffn(x, wbuf, b512, b2048, r_cross, 6, 7, 8, dtype, d_ff)

    xc_ref[pl.ds(i * G, G)] = x.reshape(G, R, D)

    @pl.when(l == n_layers - 1)
    def _emit():
        o_ref[:] = x.reshape(G, R, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def _enc_stack_call(x, m_big, blob, b512, b2048, num_heads: int,
                    block_b: int = 8, interpret: bool = False):
    B, R, D = x.shape
    NL = blob.shape[0]
    d_ff = b2048.shape[-1]
    r_self, r_cross, rows = _layout("enc", D, d_ff)
    G = math.gcd(B, block_b)
    m_big = m_big.astype(jnp.bfloat16)      # 0/1; halves the mask VMEM
    GB = _chunk_rows(B, G)
    if GB == B:
        def il(l, i):
            return (jnp.where(l == 0, i, 0), 0, 0)

        def ii(l, i):
            return (i, 0, 0)

        def ll(l, i):
            return (l, 0, 0)

        grid = (NL, B // G)
        chunked = False
    else:
        K = GB // G

        def il(c, l, i):
            return (jnp.where(l == 0, c * K + i, 0), 0, 0)

        def ii(c, l, i):
            return (c * K + i, 0, 0)

        def ll(c, l, i):
            return (l, 0, 0)

        grid = (B // GB, NL, K)
        chunked = True

    return pl.pallas_call(
        functools.partial(_enc_stack_kernel, num_heads=num_heads,
                          n_layers=NL, d_ff=d_ff, r_self=r_self,
                          r_cross=r_cross, rows=rows, chunked=chunked),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, R, D), il, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * R, G * R), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b512.shape[1], D), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_ff), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, R, D), ii, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((GB, R, D), x.dtype),
            pltpu.VMEM((rows, D), blob.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, m_big, b512, b2048, blob)


def fused_encoder_stack_forward(x, src_mask, stacked, final_norm,
                                num_heads: int, block_b: int = None,
                                interpret: bool = False):
    """Whole Encoder stack in one kernel + final RefLayerNorm."""
    from .pallas_decoder_layer import _block_diag_masks
    if block_b is None:
        block_b = ENC_BLOCK_B
    B, R, _ = x.shape
    if src_mask is None:
        src_mask = jnp.ones((B, R), bool)
    G = math.gcd(B, block_b)
    m_big, _ = _block_diag_masks(
        jnp.broadcast_to(src_mask[:, None, :], (B, R, R)), src_mask, G)
    h = _enc_stack_call(x, m_big, stacked["blob"], stacked["b512"],
                        stacked["b2048"], num_heads=num_heads,
                        block_b=block_b, interpret=interpret)
    s, b = final_norm
    return _refnorm(h, s, b, h.dtype)


# ---------------------------------------------------------------------------
# Windowed decoder stack with per-layer K/V caches (SA fill): one kernel per
# ROUND, in-kernel cache scatter.
# ---------------------------------------------------------------------------


def _win_stack_kernel(x_ref, kc_ref, vc_ref, k2_ref, v2_ref, tm_ref, sm_ref,
                      oh_ref, b512_ref, b2048_ref, blob_ref,
                      o_ref, kco_ref, vco_ref, xc_ref, wbuf, sems, *,
                      num_heads: int, n_layers: int, d_ff: int,
                      r_self: int, r_cross: int, rows: int):
    l = pl.program_id(0)
    i = pl.program_id(1)
    G, W, D = x_ref.shape
    L = kc_ref.shape[2]
    R = k2_ref.shape[2]
    dtype = x_ref.dtype
    H = num_heads
    Lk = L + W
    N = G * W

    dmas = _WeightDMAs(blob_ref, wbuf, sems, l, r_self, r_cross, rows)

    @pl.when(i == 0)
    def _fetch_weights():
        dmas.start_all()
        dmas.wait(0)

    @pl.when(l == 0)
    def _load_x():
        xc_ref[pl.ds(i * G, G)] = x_ref[:]

    x = xc_ref[pl.ds(i * G, G)].reshape(N, D)
    b512 = b512_ref[0]
    b2048 = b2048_ref[0]

    # ---- self-attention: keys = cache ++ fresh window (cf. _win_kernel)
    n0 = _refnorm(x, b512[6], b512[7], dtype)
    q_all = _proj(n0, wbuf, 0, b512, 0, dtype)
    k_new = _proj(n0, wbuf, 1, b512, 1, dtype)
    v_new = _proj(n0, wbuf, 2, b512, 2, dtype)

    # in-kernel cache scatter: oh [G*L, G*W] has EXACTLY one 1.0 per
    # in-window row, so cache*(1-rowsum) + oh@new is an exact replacement
    # (oh rides VMEM as bf16: 0/1 and one-term sums are exact in any dtype)
    oh = oh_ref[0]
    rs = jnp.sum(oh, axis=1, keepdims=True)               # [G*L, 1] 0/1
    kc_flat = kc_ref[0].reshape(G * L, D)
    vc_flat = vc_ref[0].reshape(G * L, D)
    oh_d = oh.astype(k_new.dtype)          # 0/1: exact in any dtype
    k_scat = jnp.dot(oh_d, k_new,
                     preferred_element_type=jnp.float32).astype(dtype)
    v_scat = jnp.dot(oh_d, v_new,
                     preferred_element_type=jnp.float32).astype(dtype)
    one = jnp.ones((), jnp.float32)
    kco_ref[0] = (kc_flat * (one - rs.astype(jnp.float32)).astype(dtype)
                  + k_scat).reshape(G, L, D)
    vco_ref[0] = (vc_flat * (one - rs.astype(jnp.float32)).astype(dtype)
                  + v_scat).reshape(G, L, D)

    k_all = jnp.concatenate(
        [kc_ref[0], k_new.reshape(G, W, D)], axis=1).reshape(G * Lk, D)
    v_all = jnp.concatenate(
        [vc_ref[0], v_new.reshape(G, W, D)], axis=1).reshape(G * Lk, D)

    ctx = _heads_ctx(q_all, k_all, v_all, tm_ref[0],
                     _blockfill(N, G * Lk, W, Lk), dtype, H)
    att = jnp.dot(ctx, _wslice(wbuf, 3, D),
                  preferred_element_type=jnp.float32)
    x = x + (att.astype(dtype) + b512[3])

    @pl.when(i == 0)
    def _wait_cross():
        dmas.wait(1)

    # ---- cross-attention (pre-projected K/V)
    n1 = _refnorm(x, b512[8], b512[9], dtype)
    q2_all = _proj(n1, wbuf, 4, b512, 4, dtype)
    ctx2 = _heads_ctx(q2_all, k2_ref[0].reshape(G * R, D),
                      v2_ref[0].reshape(G * R, D), sm_ref[0],
                      _blockfill(N, G * R, W, R), dtype, H)
    att2 = jnp.dot(ctx2, _wslice(wbuf, 5, D),
                   preferred_element_type=jnp.float32)
    x = x + (att2.astype(dtype) + b512[5])

    @pl.when(i == 0)
    def _wait_ffn():
        dmas.wait(2)

    x = _sliced_ffn(x, wbuf, b512, b2048, r_cross, 10, 11, 12, dtype, d_ff)

    xc_ref[pl.ds(i * G, G)] = x.reshape(G, W, D)

    @pl.when(l == n_layers - 1)
    def _emit():
        o_ref[:] = x.reshape(G, W, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def _win_stack_call(x_win, k_caches, v_caches, k2s, v2s, tm_big, sm_big,
                    oh_big, blob, b512, b2048, num_heads: int,
                    block_b: int = 8, interpret: bool = False):
    B, W, D = x_win.shape
    NL, _, L, _ = k_caches.shape
    R = k2s.shape[2]
    d_ff = b2048.shape[-1]
    r_self, r_cross, rows = _layout("win", D, d_ff)
    G = math.gcd(B, block_b)
    tm_big = tm_big.astype(jnp.bfloat16)    # 0/1; halves the mask VMEM
    sm_big = sm_big.astype(jnp.bfloat16)

    def il(l, i):
        return (jnp.where(l == 0, i, 0), 0, 0)

    def ii(l, i):
        return (i, 0, 0)

    def ili(l, i):
        return (l, i, 0, 0)

    def im(l, i):
        return (i, 0, 0)

    def ll(l, i):
        return (l, 0, 0)

    return pl.pallas_call(
        functools.partial(_win_stack_kernel, num_heads=num_heads,
                          n_layers=NL, d_ff=d_ff, r_self=r_self,
                          r_cross=r_cross, rows=rows),
        grid=(NL, B // G),
        in_specs=[
            pl.BlockSpec((G, W, D), il, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * (L + W)), im,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * R), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * L, G * W), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b512.shape[1], D), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_ff), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((G, W, D), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), ili, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, D), x_win.dtype),
            jax.ShapeDtypeStruct((NL, B, L, D), k_caches.dtype),
            jax.ShapeDtypeStruct((NL, B, L, D), v_caches.dtype),
        ),
        input_output_aliases={1: 1, 2: 2},
        scratch_shapes=[
            pltpu.VMEM((B, W, D), x_win.dtype),
            pltpu.VMEM((rows, D), blob.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x_win, k_caches, v_caches, k2s, v2s, tm_big, sm_big, oh_big,
      b512, b2048, blob)


def _win_wide_stack_kernel(x_ref, k2_ref, v2_ref, tm_ref, sm_ref,
                           b512_ref, b2048_ref, blob_ref,
                           o_ref, kco_ref, vco_ref, xc_ref, wbuf, sems, *,
                           num_heads: int, n_layers: int, d_ff: int,
                           r_self: int, r_cross: int, rows: int):
    """Wide (W == L) window round: the window covers every position, so the
    K/V cache would be fully masked — this variant drops the cache keys
    (self-attn key width W, not L+W) and emits the fresh K/V directly as the
    new caches (the scatter one-hot is the identity at w_start == 0)."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    G, W, D = x_ref.shape
    R = k2_ref.shape[2]
    dtype = x_ref.dtype
    H = num_heads
    N = G * W

    dmas = _WeightDMAs(blob_ref, wbuf, sems, l, r_self, r_cross, rows)

    @pl.when(i == 0)
    def _fetch_weights():
        dmas.start_all()
        dmas.wait(0)

    @pl.when(l == 0)
    def _load_x():
        xc_ref[pl.ds(i * G, G)] = x_ref[:]

    x = xc_ref[pl.ds(i * G, G)].reshape(N, D)
    b512 = b512_ref[0]
    b2048 = b2048_ref[0]

    n0 = _refnorm(x, b512[6], b512[7], dtype)
    q_all = _proj(n0, wbuf, 0, b512, 0, dtype)
    k_new = _proj(n0, wbuf, 1, b512, 1, dtype)
    v_new = _proj(n0, wbuf, 2, b512, 2, dtype)
    kco_ref[0] = k_new.reshape(G, W, D)
    vco_ref[0] = v_new.reshape(G, W, D)

    ctx = _heads_ctx(q_all, k_new, v_new, tm_ref[0],
                     _blockfill(N, N, W, W), dtype, H)
    att = jnp.dot(ctx, _wslice(wbuf, 3, D),
                  preferred_element_type=jnp.float32)
    x = x + (att.astype(dtype) + b512[3])

    @pl.when(i == 0)
    def _wait_cross():
        dmas.wait(1)

    n1 = _refnorm(x, b512[8], b512[9], dtype)
    q2_all = _proj(n1, wbuf, 4, b512, 4, dtype)
    ctx2 = _heads_ctx(q2_all, k2_ref[0].reshape(G * R, D),
                      v2_ref[0].reshape(G * R, D), sm_ref[0],
                      _blockfill(N, G * R, W, R), dtype, H)
    att2 = jnp.dot(ctx2, _wslice(wbuf, 5, D),
                   preferred_element_type=jnp.float32)
    x = x + (att2.astype(dtype) + b512[5])

    @pl.when(i == 0)
    def _wait_ffn():
        dmas.wait(2)

    x = _sliced_ffn(x, wbuf, b512, b2048, r_cross, 10, 11, 12, dtype, d_ff)

    xc_ref[pl.ds(i * G, G)] = x.reshape(G, W, D)

    @pl.when(l == n_layers - 1)
    def _emit():
        o_ref[:] = x.reshape(G, W, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def _win_wide_stack_call(x_win, k2s, v2s, tm_big, sm_big,
                         blob, b512, b2048, num_heads: int,
                         block_b: int = 8, interpret: bool = False):
    B, W, D = x_win.shape
    NL = blob.shape[0]
    R = k2s.shape[2]
    d_ff = b2048.shape[-1]
    r_self, r_cross, rows = _layout("win", D, d_ff)
    G = math.gcd(B, block_b)
    tm_big = tm_big.astype(jnp.bfloat16)
    sm_big = sm_big.astype(jnp.bfloat16)

    def il(l, i):
        return (jnp.where(l == 0, i, 0), 0, 0)

    def ii(l, i):
        return (i, 0, 0)

    def ili(l, i):
        return (l, i, 0, 0)

    def im(l, i):
        return (i, 0, 0)

    def ll(l, i):
        return (l, 0, 0)

    return pl.pallas_call(
        functools.partial(_win_wide_stack_kernel, num_heads=num_heads,
                          n_layers=NL, d_ff=d_ff, r_self=r_self,
                          r_cross=r_cross, rows=rows),
        grid=(NL, B // G),
        in_specs=[
            pl.BlockSpec((G, W, D), il, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * W), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * R), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b512.shape[1], D), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_ff), ll, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((G, W, D), ii, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, W, D), ili, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, W, D), ili, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, D), x_win.dtype),
            jax.ShapeDtypeStruct((NL, B, W, D), x_win.dtype),
            jax.ShapeDtypeStruct((NL, B, W, D), x_win.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, W, D), x_win.dtype),
            pltpu.VMEM((rows, D), blob.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x_win, k2s, v2s, tm_big, sm_big, b512, b2048, blob)


def fused_window_wide_stack(x_win, k2s, v2s, tgt_mask_big, sm_big, stacked,
                            final_norm, num_heads: int, block_b: int = None,
                            interpret: bool = False):
    """Wide (W == L) SA fill round: whole windowed decoder stack in one
    kernel with NO cache keys; the fresh per-layer K/V come back as the new
    caches (exactly what the general kernel's identity-one-hot scatter
    produces at w_start == 0, without the 2x self-attn key width)."""
    if block_b is None:
        block_b = WIN_WIDE_BLOCK_B
    h, kc, vc = _win_wide_stack_call(
        x_win, k2s, v2s, tgt_mask_big, sm_big,
        stacked["blob"], stacked["b512"], stacked["b2048"],
        num_heads=num_heads, block_b=block_b, interpret=interpret)
    s, b = final_norm
    return _refnorm(h, s, b, h.dtype), kc, vc


def _block_diag_f32(m3, G: int):
    """[B, Lq, Lk] f32 -> [B//G, G*Lq, G*Lk] block-diagonal (f32 analogue of
    pallas_decoder_layer._block_diag_one)."""
    B, Lq, Lk = m3.shape
    nb = B // G
    eye = jnp.eye(G, dtype=m3.dtype)
    m = m3.reshape(nb, G, Lq, Lk)
    return (eye[None, :, None, :, None]
            * m[:, :, :, None, :]).reshape(nb, G * Lq, G * Lk)


def fused_window_decoder_stack(x_win, oh_lw, k_caches, v_caches, k2s, v2s,
                               tm_big, sm_big, stacked, final_norm,
                               num_heads: int, block_b: int = None,
                               interpret: bool = False):
    """One SA fill ROUND: the whole windowed decoder stack in one kernel,
    cache scatter included.

    x_win [B, W, D]; oh_lw [B, L, W] f32 one-hot (row p has a single 1.0 at
    window column p-start when p is inside the window, else all-zero —
    exactly the transpose of the ``ohw_f`` gather one-hot sa_decode already
    builds); k_caches/v_caches [NL, B, L, D] stacked per-layer caches;
    k2s/v2s [NL, B, R, D] pre-projected cross K/V; tm_big/sm_big as in
    fused_window_decoder_layer.

    Returns (h_win [B, W, D] after final norm, new k_caches, new v_caches).
    """
    if block_b is None:
        block_b = WIN_BLOCK_B
    B = x_win.shape[0]
    G = math.gcd(B, block_b)
    oh_big = _block_diag_f32(oh_lw.astype(jnp.bfloat16), G)
    h, kc, vc = _win_stack_call(
        x_win, k_caches, v_caches, k2s, v2s, tm_big, sm_big, oh_big,
        stacked["blob"], stacked["b512"], stacked["b2048"],
        num_heads=num_heads, block_b=block_b, interpret=interpret)
    s, b = final_norm
    return _refnorm(h, s, b, h.dtype), kc, vc
