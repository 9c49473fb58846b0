"""Pallas TPU fused decoder LAYER: one kernel per layer instead of ~15 ops.

Profiling the NA fill pass (BENCH_NOTES.md) shows each decoder layer costs
~0.25 ms on a v5e at BoFiCap's shapes while its actual FLOPs are ~15 us of
MXU time — the cost is per-op fixed overhead (norms, projections, masking,
softmax, residuals each lower to separate XLA thunks).  This kernel runs a
whole DecoderLayer (reference TransformerModel.py:1398-1413: pre-norm
self-attention + pre-norm cross-attention + pre-norm FFN, residuals) in one
``pallas_call``:

    x  = x + SelfAttn(RefNorm(x))        (blockwise/causal tgt mask)
    x  = x + CrossAttn(RefNorm(x), mem)  (src padding mask)
    x  = x + FFN(RefNorm(x))

Numerics match models/layers.py exactly in structure: RefLayerNorm (f32,
UNBIASED variance, eps added OUTSIDE the sqrt — torch ``std`` semantics),
attention scores scaled by 1/sqrt(Dh) and masked with a finite -1e9 fill,
softmax in f32.  Matmuls accumulate in f32 and cast back to the compute
dtype; bf16 results agree with the unfused path to bf16 tolerance (tested),
f32 results to ~1e-5.

Mosaic-friendly structure: attention is BLOCK-DIAGONAL-BATCHED — the G
samples of a grid step are flattened to one [G*L, D] matrix, Q/K/V/O
projections run as FULL-WIDTH [.,D]@[D,D] dots (4 MXU lane tiles at D=512),
and only the score/context dots loop over heads on lane-slices of the
projected activations, with the cross-sample score blocks masked off by a
pre-arranged [G*L, G*Lk] visibility mask (built OUTSIDE the kernel by
``_block_diag_masks``).  At BoFiCap's tiny L this wastes (G-1)/G of the
score FLOPs — a few MFLOP, irrelevant next to the MXU's throughput — and in
exchange the kernel is a handful of large dots per sublayer instead of H*G
small ones: ~60 Mosaic ops per layer instead of ~400, which compiles
minutes faster through the axon AOT tunnel and runs faster (per-layer
device time 250 us unfused -> 187 us head-split -> 139 us full-width).

Inference only (no dropout); the training path keeps the unfused modules.

Weights are packed OUTSIDE the kernel (``pack_layer_weights``): cast to the
compute dtype, so one grid step holds ~8.5 MB of weights in VMEM (v5e VMEM
~16 MB).  Their BlockSpec index maps are constant, so Mosaic fetches them
once and keeps them resident across grid steps.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e9
NORM_EPS = 1e-6

# weight tensors, in kernel argument order
_WNAMES = ("s0", "b0", "wqh", "bqh", "wkh", "bkh", "wvh", "bvh", "woh", "bo",
           "s1", "b1", "wq2h", "bq2h", "wk2h", "bk2h", "wv2h", "bv2h",
           "wo2h", "bo2", "s2", "b2", "w1", "bf1", "w2", "bf2")


def _refnorm(x, scale, bias, dtype):
    """RefLayerNorm (models/layers.py RefLayerNorm): f32, unbiased var,
    eps OUTSIDE the sqrt."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).sum(-1, keepdims=True) / (d - 1)
    y = (xf - mean) / (jnp.sqrt(var) + NORM_EPS)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def _mha(n_q, kv_src, wq, bq, wk, bk, wv, bv, wo, mask, Lq, Lk, dtype,
         num_heads: int):
    """Block-diagonal-batched multi-head attention.

    n_q [N, D] normed queries (N = G*Lq), kv_src [M, D] normed K/V source
    (M = G*Lk), wq/wk/wv/wo [D, D] packed projections, bq/bk/bv [D],
    mask bool [N, M] (True = attend; cross-sample blocks already False).

    Projections run as FULL-WIDTH dots ([N,D]@[D,D] — 4 MXU lane tiles at
    D=512) instead of per-head [D,Dh] slices (half-empty at Dh=64); only the
    score/context dots loop over heads on lane-slices of the projected
    matrices.

    Masked fill is TWO-LEVEL: own-sample masked keys get MASK_FILL (matching
    the unfused path, where a fully-masked row's scores are ALL MASK_FILL and
    softmax goes uniform over the sample's own keys), cross-sample blocks get
    2*MASK_FILL so they stay at zero probability even then.

    Returns the pre-bias attention output, f32 [N, D]."""
    H = num_heads
    D = wq.shape[1]
    Dh = D // H
    N, M = n_q.shape[0], kv_src.shape[0]
    scale = 1.0 / math.sqrt(Dh)
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) // Lq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) // Lk
    fill = jnp.where(row_blk == col_blk, MASK_FILL, 2.0 * MASK_FILL)
    q_all = (jnp.dot(n_q, wq, preferred_element_type=jnp.float32)
             .astype(dtype) + bq)                          # [N, D]
    k_all = (jnp.dot(kv_src, wk, preferred_element_type=jnp.float32)
             .astype(dtype) + bk)                          # [M, D]
    v_all = (jnp.dot(kv_src, wv, preferred_element_type=jnp.float32)
             .astype(dtype) + bv)
    ctxs = []
    for h in range(H):
        q = q_all[:, h * Dh:(h + 1) * Dh]
        k = k_all[:, h * Dh:(h + 1) * Dh]
        v = v_all[:, h * Dh:(h + 1) * Dh]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [N, M]
        sc = jnp.where(mask, sc, fill)
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        ctxs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(dtype))
    ctx = jnp.concatenate(ctxs, axis=-1)                   # [N, D]
    return jnp.dot(ctx, wo, preferred_element_type=jnp.float32)


def _kernel(x_ref, mem_ref, tm_ref, sm_ref,
            s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
            s1, b1, wq2h, bq2h, wk2h, bk2h, wv2h, bv2h, wo2h, bo2,
            s2, b2, w1, bf1, w2, bf2,
            o_ref, *, num_heads: int):
    G, Lq, D = x_ref.shape
    R = mem_ref.shape[1]
    dtype = x_ref.dtype

    x = x_ref[:].reshape(G * Lq, D)

    # ---- self-attention sublayer
    n0 = _refnorm(x, s0[:], b0[:], dtype)
    att = _mha(n0, n0, wqh[:], bqh[:], wkh[:], bkh[:],
               wvh[:], bvh[:], woh[:], tm_ref[0], Lq, Lq, dtype, num_heads)
    x = x + (att.astype(dtype) + bo[:])

    # ---- cross-attention sublayer
    # the reference normalizes only the query side of cross-attention
    # (memory is already encoder-normed), same as DecoderLayer.__call__
    n1 = _refnorm(x, s1[:], b1[:], dtype)
    mem = mem_ref[:].reshape(G * R, D)
    att2 = _mha(n1, mem, wq2h[:], bq2h[:], wk2h[:], bk2h[:],
                wv2h[:], bv2h[:], wo2h[:], sm_ref[0], Lq, R, dtype,
                num_heads)
    x = x + (att2.astype(dtype) + bo2[:])

    # ---- FFN sublayer
    n2 = _refnorm(x, s2[:], b2[:], dtype)
    f = jnp.maximum(
        jnp.dot(n2, w1[:], preferred_element_type=jnp.float32)
        .astype(dtype) + bf1[:], 0)
    f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
         .astype(dtype) + bf2[:])
    x = x + f

    o_ref[:] = x.reshape(G, Lq, D)


def pack_layer_weights(lp: Dict[str, Any], dtype) -> Dict[str, jnp.ndarray]:
    """DecoderLayer param subtree (params['layer{i}']) -> packed kernel
    weights in the compute dtype ([D, D] projections kept whole — the
    kernel's projections are full-width dots and heads are lane-slices of
    the projected activations)."""

    def kb(mod, name):
        p = lp[mod][name]
        return p["kernel"].astype(dtype), p["bias"].astype(dtype)

    def attn(mod):
        wq, bq = kb(mod, "wq")
        wk, bk = kb(mod, "wk")
        wv, bv = kb(mod, "wv")
        wo, bo = kb(mod, "wo")
        return {"wq": wq, "bq": bq, "wk": wk, "bk": bk,
                "wv": wv, "bv": bv, "wo": wo, "bo": bo}

    sa, ca = attn("self_attn"), attn("src_attn")

    def nsb(sub):
        n = lp[sub]["norm"]
        return n["scale"].astype(dtype), n["bias"].astype(dtype)

    s0, b0 = nsb("sub0")
    s1, b1 = nsb("sub1")
    s2, b2 = nsb("sub2")
    return {
        "s0": s0, "b0": b0,
        "wqh": sa["wq"], "bqh": sa["bq"], "wkh": sa["wk"], "bkh": sa["bk"],
        "wvh": sa["wv"], "bvh": sa["bv"], "woh": sa["wo"], "bo": sa["bo"],
        "s1": s1, "b1": b1,
        "wq2h": ca["wq"], "bq2h": ca["bq"], "wk2h": ca["wk"],
        "bk2h": ca["bk"], "wv2h": ca["wv"], "bv2h": ca["bv"],
        "wo2h": ca["wo"], "bo2": ca["bo"],
        "s2": s2, "b2": b2,
        "w1": lp["ffn"]["Dense_0"]["kernel"].astype(dtype),
        "bf1": lp["ffn"]["Dense_0"]["bias"].astype(dtype),
        "w2": lp["ffn"]["Dense_1"]["kernel"].astype(dtype),
        "bf2": lp["ffn"]["Dense_1"]["bias"].astype(dtype),
    }


def pack_decoder_weights(decoder_params: Dict[str, Any], dtype):
    """Whole Decoder subtree (params['params']['decoder{k}']) -> (list of
    per-layer packed weights, final-norm (scale, bias)).  Pack once per
    decode call, OUTSIDE any while_loop, so the transposes/casts don't rerun
    per loop iteration."""
    n_layers = sum(1 for k in decoder_params if k.startswith("layer"))
    packed = [pack_layer_weights(decoder_params[f"layer{i}"], dtype)
              for i in range(n_layers)]
    fn = decoder_params["norm"]
    return packed, (fn["scale"], fn["bias"])


def _block_diag_masks(tgt_mask, src_mask, G: int):
    """Pre-arrange the per-sample masks as per-grid-step block-diagonal
    visibility matrices (built with plain jnp, fused by XLA):

    tgt_mask bool [B, L, L], src_mask bool [B, R] ->
      tm_big [B//G, G*L, G*L], sm_big [B//G, G*L, G*R]
    where block (i, j) of a grid step is tgt/src visibility if i == j and
    all-False otherwise (samples never attend across each other; fully-masked
    rows are handled by the kernel's two-level fill — see ``_mha``)."""
    B, Lq, _ = tgt_mask.shape
    R = src_mask.shape[1]
    sm3 = jnp.broadcast_to(src_mask[:, None, :], (B, Lq, R))
    return _block_diag_one(tgt_mask, G), _block_diag_one(sm3, G)


def _block_diag_one(m3, G: int):
    """One [B, Lq, Lk] per-sample mask -> [B//G, G*Lq, G*Lk] block-diagonal
    (the tgt half of ``_block_diag_masks``; exposed so loop-variant and
    loop-invariant masks can be built separately — the src mask never
    changes across a decode's rounds and is hoisted out of while_loops)."""
    B, Lq, Lk = m3.shape
    nb = B // G
    eye = jnp.eye(G, dtype=bool)
    m = m3.reshape(nb, G, Lq, Lk)
    return (eye[None, :, None, :, None]
            & m[:, :, :, None, :]).reshape(nb, G * Lq, G * Lk)


def fused_decoder_forward(x, memory, tgt_mask, src_mask, packed, final_norm,
                          num_heads: int, block_b: int = 8,
                          interpret: bool = False):
    """Full Decoder stack (N fused layer kernels + final RefLayerNorm).

    Equivalent to models/layers.py Decoder.__call__ at deterministic=True
    (reference Decoder, TransformerModel.py:1379-1396).  ``packed`` /
    ``final_norm`` from ``pack_decoder_weights``.

    block_b=8 measured best on v5e at B=64 with the full-width-projection
    kernel (decoder stack 0.83 ms at 8 vs 0.90 at 16; 32 exceeds VMEM)."""
    if src_mask is None:
        src_mask = jnp.ones(memory.shape[:2], bool)
    B = x.shape[0]
    G = math.gcd(B, block_b)
    tm_big, sm_big = _block_diag_masks(tgt_mask, src_mask, G)
    for w in packed:
        x = fused_decoder_layer(x, memory, tm_big, sm_big, w,
                                num_heads=num_heads, block_b=block_b,
                                interpret=interpret)
    s, b = final_norm
    return _refnorm(x, s, b, x.dtype)


# ---------------------------------------------------------------------------
# Windowed variant with per-layer K/V caches: the SA fill's incremental
# rounds (reference core_SAIC, TransformerModel.py:1878-1986, re-runs the
# FULL decoder per phrase; blockwise finality means finalized positions'
# K/V never change, so each round only needs to decode the new slot's
# W-wide window against cached keys).
# ---------------------------------------------------------------------------

_WIN_WNAMES = ("s0", "b0", "wqh", "bqh", "wkh", "bkh", "wvh", "bvh", "woh",
               "bo", "s1", "b1", "wq2h", "bq2h", "wo2h", "bo2",
               "s2", "b2", "w1", "bf1", "w2", "bf2")


def _win_kernel(x_ref, kc_in, vc_in, k2_ref, v2_ref,
                tm_ref, sm_ref,
                s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
                s1, b1, wq2h, bq2h, wo2h, bo2,
                s2, b2, w1, bf1, w2, bf2,
                o_ref, kn_ref, vn_ref, *, num_heads: int):
    """One decoder layer on a [G, W, D] window of NEW positions.

    Self-attention keys/values are the CONCATENATION of the [G, L, D]
    caches (finalized positions) and the window's freshly computed K/V —
    no dynamic-offset stores (Mosaic requires sublane-aligned vector
    stores, and window starts are arbitrary).  The mask (built outside
    from per-row visibility bounds) masks the stale in-window cache
    columns so every key participates exactly once; the caller scatters
    the returned k_new/v_new into the caches in XLA.  Cross-attention K/V
    arrive pre-projected (loop-invariant per decode), so this kernel
    carries neither wk2/wv2 weights nor their per-round projections."""
    G, W, D = x_ref.shape
    L = kc_in.shape[1]
    R = k2_ref.shape[1]
    dtype = x_ref.dtype
    H = num_heads
    Dh = D // H
    Lk = L + W

    x = x_ref[:].reshape(G * W, D)

    # ---- self-attention sublayer (keys = cache ++ fresh window)
    n0 = _refnorm(x, s0[:], b0[:], dtype)
    q_all = (jnp.dot(n0, wqh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bqh[:])
    k_new = (jnp.dot(n0, wkh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bkh[:])
    v_new = (jnp.dot(n0, wvh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bvh[:])
    kn_ref[:] = k_new.reshape(G, W, D)
    vn_ref[:] = v_new.reshape(G, W, D)
    k_all = jnp.concatenate([kc_in[:], k_new.reshape(G, W, D)],
                            axis=1).reshape(G * Lk, D)
    v_all = jnp.concatenate([vc_in[:], v_new.reshape(G, W, D)],
                            axis=1).reshape(G * Lk, D)

    scale = 1.0 / math.sqrt(Dh)
    N, M = G * W, G * Lk
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) // W
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) // Lk
    fill = jnp.where(row_blk == col_blk, MASK_FILL, 2.0 * MASK_FILL)
    tm = tm_ref[0]
    ctxs = []
    for h in range(H):
        q = q_all[:, h * Dh:(h + 1) * Dh]
        k = k_all[:, h * Dh:(h + 1) * Dh]
        v = v_all[:, h * Dh:(h + 1) * Dh]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sc = jnp.where(tm, sc, fill)
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        ctxs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(dtype))
    att = jnp.dot(jnp.concatenate(ctxs, axis=-1), woh[:],
                  preferred_element_type=jnp.float32)
    x = x + (att.astype(dtype) + bo[:])

    # ---- cross-attention sublayer (pre-projected K/V)
    n1 = _refnorm(x, s1[:], b1[:], dtype)
    q2_all = (jnp.dot(n1, wq2h[:], preferred_element_type=jnp.float32)
              .astype(dtype) + bq2h[:])
    k2_all = k2_ref[:].reshape(G * R, D)
    v2_all = v2_ref[:].reshape(G * R, D)
    M2 = G * R
    row_blk2 = jax.lax.broadcasted_iota(jnp.int32, (N, M2), 0) // W
    col_blk2 = jax.lax.broadcasted_iota(jnp.int32, (N, M2), 1) // R
    fill2 = jnp.where(row_blk2 == col_blk2, MASK_FILL, 2.0 * MASK_FILL)
    sm = sm_ref[0]
    ctxs2 = []
    for h in range(H):
        q = q2_all[:, h * Dh:(h + 1) * Dh]
        k = k2_all[:, h * Dh:(h + 1) * Dh]
        v = v2_all[:, h * Dh:(h + 1) * Dh]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sc = jnp.where(sm, sc, fill2)
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        ctxs2.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                     .astype(dtype))
    att2 = jnp.dot(jnp.concatenate(ctxs2, axis=-1), wo2h[:],
                   preferred_element_type=jnp.float32)
    x = x + (att2.astype(dtype) + bo2[:])

    # ---- FFN sublayer
    n2 = _refnorm(x, s2[:], b2[:], dtype)
    f = jnp.maximum(
        jnp.dot(n2, w1[:], preferred_element_type=jnp.float32)
        .astype(dtype) + bf1[:], 0)
    f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
         .astype(dtype) + bf2[:])
    x = x + f
    o_ref[:] = x.reshape(G, W, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def fused_window_decoder_layer(x_win, k_cache, v_cache, k2, v2,
                               tm_big, sm_big, weights, num_heads: int,
                               block_b: int = 8, interpret: bool = False):
    """One windowed DecoderLayer round.

    x_win [B, W, D] window activations, k_cache/v_cache [B, L, D] self-attn
    caches, k2/v2 [B, R, D] pre-projected cross K/V, tm_big
    [B//G, G*W, G*(L+W)] (keys = cache columns then window columns) /
    sm_big [B//G, G*W, G*R] block-diagonal visibility masks.
    Returns (x_out [B, W, D], k_new [B, W, D], v_new [B, W, D]); the
    caller scatters k_new/v_new into the caches at the window positions."""
    B, W, D = x_win.shape
    L = k_cache.shape[1]
    R = k2.shape[1]
    G = math.gcd(B, block_b)

    def rows(i):
        return (i, 0, 0)

    w_list = [weights[n] for n in _WIN_WNAMES]

    def _zero_idx(i, *, n):
        return (0,) * n

    w_specs = [pl.BlockSpec(w.shape, functools.partial(_zero_idx, n=w.ndim),
                            memory_space=pltpu.VMEM)
               for w in w_list]

    return pl.pallas_call(
        functools.partial(_win_kernel, num_heads=num_heads),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, W, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * (L + W)), rows,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * W, G * R), rows, memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((G, W, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W, D), rows, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, D), x_win.dtype),
            jax.ShapeDtypeStruct((B, W, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B, W, D), v_cache.dtype),
        ),
        interpret=interpret,
    )(x_win, k_cache, v_cache, k2, v2, tm_big, sm_big, *w_list)


def project_cross_kv(packed, memory):
    """Pre-project each layer's cross-attention K/V from the encoder memory
    (loop-invariant per decode — the reference recomputes them every
    decoder pass).  Returns ([k2_l], [v2_l]) lists of [B, R, D]."""
    ks, vs = [], []
    for w in packed:
        ks.append(jnp.einsum("brd,de->bre", memory, w["wk2h"]) + w["bk2h"])
        vs.append(jnp.einsum("brd,de->bre", memory, w["wv2h"]) + w["bv2h"])
    return ks, vs


def fused_window_decoder_forward(x_win, starts, k_caches, v_caches,
                                 k2s, v2s, tm_big, sm_big, packed,
                                 final_norm, num_heads: int,
                                 block_b: int = 8, interpret: bool = False):
    """Windowed decoder stack: N fused_window_decoder_layer rounds + final
    RefLayerNorm on the window.  k_caches/v_caches are per-layer lists of
    [B, L, D]; after each layer the window's fresh K/V are scattered back
    into the caches at per-sample ``starts`` (fused XLA gather+where —
    Mosaic rejects dynamic sublane-offset stores in-kernel).
    Returns (h_win, new k_caches, new v_caches)."""
    B, W, _ = x_win.shape
    L = k_caches[0].shape[1]
    o = jnp.arange(L)[None, :] - starts[:, None]          # [B, L]
    in_win = ((o >= 0) & (o < W))[..., None]
    # one-hot matmul scatter: a take_along_axis gather over the 512-wide
    # minor dim lowers to a pathologically slow generic gather on TPU
    # (~13 ms/layer measured); a [L, W] one-hot contraction is exact
    # (single 1.0 per row) and rides the MXU
    oh = (jnp.arange(W)[None, None, :]
          == o[:, :, None]).astype(k_caches[0].dtype)     # [B, L, W]

    def scatter(cache, new):
        vals = jnp.einsum("blw,bwd->bld", oh, new)
        return jnp.where(in_win, vals.astype(cache.dtype), cache)

    new_k, new_v = [], []
    for i, w in enumerate(packed):
        x_win, kn, vn = fused_window_decoder_layer(
            x_win, k_caches[i], v_caches[i], k2s[i], v2s[i],
            tm_big, sm_big, w, num_heads=num_heads, block_b=block_b,
            interpret=interpret)
        new_k.append(scatter(k_caches[i], kn))
        new_v.append(scatter(v_caches[i], vn))
    s, b = final_norm
    return _refnorm(x_win, s, b, x_win.dtype), new_k, new_v


# ---------------------------------------------------------------------------
# Encoder variant: self-attention + FFN only (reference EncoderLayer,
# TransformerModel.py:1366-1377), same block-diagonal batching
# ---------------------------------------------------------------------------

_ENC_WNAMES = ("s0", "b0", "wqh", "bqh", "wkh", "bkh", "wvh", "bvh", "woh",
               "bo", "s1", "b1", "w1", "bf1", "w2", "bf2")


def _enc_kernel(x_ref, m_ref,
                s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
                s1, b1, w1, bf1, w2, bf2,
                o_ref, *, num_heads: int):
    G, R, D = x_ref.shape
    dtype = x_ref.dtype
    x = x_ref[:].reshape(G * R, D)

    n0 = _refnorm(x, s0[:], b0[:], dtype)
    att = _mha(n0, n0, wqh[:], bqh[:], wkh[:], bkh[:],
               wvh[:], bvh[:], woh[:], m_ref[0], R, R, dtype, num_heads)
    x = x + (att.astype(dtype) + bo[:])

    n1 = _refnorm(x, s1[:], b1[:], dtype)
    f = jnp.maximum(
        jnp.dot(n1, w1[:], preferred_element_type=jnp.float32)
        .astype(dtype) + bf1[:], 0)
    f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
         .astype(dtype) + bf2[:])
    x = x + f
    o_ref[:] = x.reshape(G, R, D)


def pack_encoder_weights(encoder_params: Dict[str, Any], dtype):
    """Encoder subtree (params['params']['encoder']) -> (per-layer packed
    weights, final-norm (scale, bias))."""
    n_layers = sum(1 for k in encoder_params if k.startswith("layer"))

    def pack_one(lp):
        def kb(name):
            p = lp["self_attn"][name]
            return p["kernel"].astype(dtype), p["bias"].astype(dtype)

        wq, bq = kb("wq")
        wk, bk = kb("wk")
        wv, bv = kb("wv")
        wo, bo = kb("wo")
        out = {
            "wqh": wq, "bqh": bq,
            "wkh": wk, "bkh": bk,
            "wvh": wv, "bvh": bv,
            "woh": wo, "bo": bo,
            "w1": lp["ffn"]["Dense_0"]["kernel"].astype(dtype),
            "bf1": lp["ffn"]["Dense_0"]["bias"].astype(dtype),
            "w2": lp["ffn"]["Dense_1"]["kernel"].astype(dtype),
            "bf2": lp["ffn"]["Dense_1"]["bias"].astype(dtype),
        }
        for i, sub in enumerate(("sub0", "sub1")):
            n = lp[sub]["norm"]
            out[f"s{i}"] = n["scale"].astype(dtype)
            out[f"b{i}"] = n["bias"].astype(dtype)
        return out

    packed = [pack_one(encoder_params[f"layer{i}"]) for i in range(n_layers)]
    fn = encoder_params["RefLayerNorm_0"]
    return packed, (fn["scale"], fn["bias"])


def fused_encoder_forward(x, src_mask, packed, final_norm, num_heads: int,
                          block_b: int = 8, interpret: bool = False):
    """Full Encoder stack (N fused layer kernels + final RefLayerNorm) over
    embedded region features x [B, R, D] with padding mask src_mask [B, R].
    Equivalent to models/layers.py Encoder.__call__ at deterministic=True."""
    B, R, D = x.shape
    if src_mask is None:
        src_mask = jnp.ones((B, R), bool)
    G = math.gcd(B, block_b)
    m_big, _ = _block_diag_masks(
        jnp.broadcast_to(src_mask[:, None, :], (B, R, R)), src_mask, G)
    for w in packed:
        x = fused_encoder_layer(x, m_big, w, num_heads=num_heads,
                                block_b=block_b, interpret=interpret)
    s, b = final_norm
    return _refnorm(x, s, b, x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def fused_encoder_layer(x, m_big, weights, num_heads: int, block_b: int = 8,
                        interpret: bool = False):
    """One EncoderLayer forward (inference, no dropout) as one kernel."""
    B, R, D = x.shape
    G = math.gcd(B, block_b)
    grid = (B // G,)

    def rows(i):
        return (i, 0, 0)

    w_list = [weights[n] for n in _ENC_WNAMES]

    def _zero_idx(i, *, n):
        return (0,) * n

    w_specs = [pl.BlockSpec(w.shape, functools.partial(_zero_idx, n=w.ndim),
                            memory_space=pltpu.VMEM)
               for w in w_list]

    return pl.pallas_call(
        functools.partial(_enc_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * R, G * R), rows, memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, D), x.dtype),
        interpret=interpret,
    )(x, m_big, *w_list)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def fused_decoder_layer(x, memory, tm_big, sm_big, weights,
                        num_heads: int, block_b: int = 8,
                        interpret: bool = False):
    """One DecoderLayer forward (inference, no dropout) as one kernel.

    x [B,L,D], memory [B,R,D], tm_big/sm_big from ``_block_diag_masks``
    (bool [B//G, G*L, G*L] / [B//G, G*L, G*R], True=attend), weights from
    ``pack_layer_weights``."""
    B, L, D = x.shape
    R = memory.shape[1]
    G = math.gcd(B, block_b)
    grid = (B // G,)

    def rows(i):
        return (i, 0, 0)

    w_list = [weights[n] for n in _WNAMES]

    def _zero_idx(i, *, n):
        return (0,) * n

    w_specs = [pl.BlockSpec(w.shape, functools.partial(_zero_idx, n=w.ndim),
                            memory_space=pltpu.VMEM)
               for w in w_list]

    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * L, G * L), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * L, G * R), rows, memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(x, memory, tm_big, sm_big, *w_list)


# ---------------------------------------------------------------------------
# Fused greedy generator head: logits + log_softmax + argmax + token-logprob
# + entropy in ONE kernel, streaming over vocab tiles (online max-rescaled
# accumulators, flash-softmax style).  The unfused path materializes the
# full [B, T, V] f32 log-probability tensor (~19 MB at B=64, V=9487) in HBM
# just to take an argmax and two reductions; this kernel never materializes
# it — per vocab tile it updates running (max, sumexp, sum p~*logit, argmax)
# stats and emits only the [B, T] ids / token-logprobs / entropies the
# decode loops actually consume (reference Generator
# TransformerModel.py:1312-1319 + the greedy branch of sample_next_word,
# AttModel.py:33-49).  Greedy ids are EXACTLY the unfused argmax (the
# logits are computed with the same dot + bf16-round + bias arithmetic as
# nn.Dense(dtype) followed by .astype(f32), and the running argmax uses
# strict-greater updates = first-maximum semantics).
# ---------------------------------------------------------------------------


def _head_kernel(x_ref, w_ref, b_ref, ids_ref, lp_ref, ent_ref, lpp_ref,
                 m_sc, s_sc, t_sc, av_sc, ai_sc, p0_sc, *, n_vt: int,
                 vt: int, cast_bf16: bool, pad_id: int):
    j = pl.program_id(1)
    N = x_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, -jnp.inf)
        s_sc[:] = jnp.zeros_like(s_sc)
        t_sc[:] = jnp.zeros_like(t_sc)
        av_sc[:] = jnp.full_like(av_sc, -jnp.inf)
        ai_sc[:] = jnp.zeros_like(ai_sc)

    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if cast_bf16:
        # replicate nn.Dense(dtype=bf16): matmul result rounds to bf16,
        # bias adds in bf16, THEN the cast to f32 (Generator.logits)
        logits = (acc.astype(jnp.bfloat16)
                  + b_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits = acc + b_ref[0].astype(jnp.float32)

    tile_max = jnp.max(logits, axis=-1, keepdims=True)            # [N, 1]
    tile_arg = jnp.argmax(logits, axis=-1, keepdims=True)         # [N, 1]
    m_old = m_sc[:]
    m_new = jnp.maximum(m_old, tile_max)
    # exp(-inf - -inf) guards: m_new is finite once any tile is seen
    scale = jnp.exp(m_old - m_new)
    e = jnp.exp(logits - m_new)                                   # [N, Vt]
    s_sc[:] = s_sc[:] * scale + jnp.sum(e, -1, keepdims=True)
    t_sc[:] = t_sc[:] * scale + jnp.sum(e * logits, -1, keepdims=True)
    m_sc[:] = m_new
    upd = tile_max > av_sc[:]                                     # strict
    ai_sc[:] = jnp.where(upd, tile_arg.astype(jnp.int32) + j * vt, ai_sc[:])
    av_sc[:] = jnp.where(upd, tile_max, av_sc[:])

    @pl.when(j == pad_id // vt)
    def _grab_pad():
        # logit at the fixed pad column (the NA fill's masked tail rows
        # store seq=PAD, so eval's token-logprob there is lp[:, pad_id])
        p0_sc[:] = logits[:, pad_id % vt:pad_id % vt + 1]

    @pl.when(j == n_vt - 1)
    def _emit():
        logz = m_sc[:] + jnp.log(s_sc[:])
        ids_ref[:] = ai_sc[:]
        lp_ref[:] = av_sc[:] - logz
        ent_ref[:] = logz - t_sc[:] / s_sc[:]
        lpp_ref[:] = p0_sc[:] - logz


@functools.partial(jax.jit, static_argnames=("pad_id", "interpret"))
def fused_greedy_head(h, w, b, pad_id: int = 0, interpret: bool = False):
    """Greedy sampling head: h [B, T, D] -> (ids, tok_logprobs, entropy,
    pad_logprobs), each [B, T].  w [D, V] / b [V] are the generator's Dense
    parameters (f32, as stored); vocab is padded to the 512-wide tile
    inside.  ``pad_logprobs`` is lp[:, :, pad_id] (the token-logprob eval
    stores for masked rows whose seq is PAD).

    Equivalent to ``lp = log_softmax(Dense(h)); ids = argmax(lp);
    tok_lp = lp[ids]; ent = -sum(exp(lp) * lp)`` without materializing
    [B, T, V]."""
    B, T, D = h.shape
    N = B * T
    V = w.shape[1]
    # 2048-wide vocab tiles: per-grid-step fixed cost (accumulator updates,
    # MXU ramp) dominates at 512 (19 steps measured 73 us; 5 steps ~flat
    # with the matmul floor)
    VT = 2048
    n_vt = -(-V // VT)
    Vp = n_vt * VT
    cast_bf16 = h.dtype == jnp.bfloat16
    wp = jnp.zeros((D, Vp), h.dtype).at[:, :V].set(w.astype(h.dtype))
    # bias kept 2-D [1, Vp]: 1-D inputs get vendor-variable XLA layouts
    # (T(1024) vs Mosaic's T(512)) and fail layout verification
    bp = jnp.full((1, Vp), MASK_FILL, jnp.float32).at[0, :V].set(
        b.astype(jnp.float32))
    x = h.reshape(N, D)
    # Row blocks capped at 256: the in-kernel f32 [NB, VT] intermediates
    # (logits, e) cost NB*VT*4 bytes each — at NB=1280/VT=2048 that is
    # 2x10 MB and blows the 16 MB scoped-VMEM stack; 256 rows keep the
    # whole working set ~10 MB incl. double-buffered weight tiles.
    if N <= 256:
        NB, Np = N, N
    else:
        NB = next((c for c in (256, 128, 64, 32, 16, 8)
                   if N % c == 0), 256)
        Np = -(-N // NB) * NB
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))

    grid = (Np // NB, n_vt)
    ids, lp, ent, lpp = pl.pallas_call(
        functools.partial(_head_kernel, n_vt=n_vt, vt=VT,
                          cast_bf16=cast_bf16, pad_id=pad_id),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NB, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, VT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((NB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, 1), jnp.float32),
            pltpu.VMEM((NB, 1), jnp.float32),
            pltpu.VMEM((NB, 1), jnp.float32),
            pltpu.VMEM((NB, 1), jnp.float32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, wp, bp)
    return (ids[:N].reshape(B, T), lp[:N].reshape(B, T),
            ent[:N].reshape(B, T), lpp[:N].reshape(B, T))
