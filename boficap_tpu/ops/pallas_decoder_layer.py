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

Mosaic-friendly structure: reshapes never split the minor (lane) dim —
heads live in a LEADING dim of the packed weights ([H, D, Dh]), per-head
projections are separate 2-D dots, and each head's context is folded back
through its own [Dh, D] slice of W_o by accumulation (no head concat).
Scores/softmax/context per (sample, head) are small 2-D ops, like the
proven pallas_attention kernel.

Inference only (no dropout); the training path keeps the unfused modules.

Weights are packed OUTSIDE the kernel (``pack_layer_weights``): cast to the
compute dtype, so one grid step holds ~8.5 MB of weights in VMEM (v5e VMEM
~16 MB).
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


def _mha(n_q, kv_src, S, Lq, Lk, wq, bq, wk, bk, wv, bv, wo, masks, dtype):
    """Multi-head attention, heads as leading weight dim.

    n_q [S*Lq, D] normed queries source, kv_src [S*Lk, D] normed K/V source,
    wq/wk/wv [H, D, Dh], bq/bk/bv [H, Dh], wo [H, Dh, D],
    masks: per-sample bool [Lq, Lk] list (True = attend).
    Returns the pre-bias attention output, f32 [S*Lq, D]."""
    H = wq.shape[0]
    Dh = wq.shape[2]
    D = wq.shape[1]
    scale = 1.0 / math.sqrt(Dh)
    acc = jnp.zeros((S * Lq, D), jnp.float32)
    for h in range(H):
        q = (jnp.dot(n_q, wq[h], preferred_element_type=jnp.float32)
             .astype(dtype) + bq[h])                       # [S*Lq, Dh]
        k = (jnp.dot(kv_src, wk[h], preferred_element_type=jnp.float32)
             .astype(dtype) + bk[h])                       # [S*Lk, Dh]
        v = (jnp.dot(kv_src, wv[h], preferred_element_type=jnp.float32)
             .astype(dtype) + bv[h])
        ctxs = []
        for s in range(S):
            qs = q[s * Lq:(s + 1) * Lq]
            ks = k[s * Lk:(s + 1) * Lk]
            vs = v[s * Lk:(s + 1) * Lk]
            sc = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            sc = jnp.where(masks[s], sc, MASK_FILL)
            p = jax.nn.softmax(sc, axis=-1).astype(dtype)
            ctxs.append(jnp.dot(p, vs,
                                preferred_element_type=jnp.float32)
                        .astype(dtype))
        ctx = jnp.concatenate(ctxs, axis=0)                # [S*Lq, Dh]
        acc = acc + jnp.dot(ctx, wo[h],
                            preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, mem_ref, tm_ref, sm_ref,
            s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
            s1, b1, wq2h, bq2h, wk2h, bk2h, wv2h, bv2h, wo2h, bo2,
            s2, b2, w1, bf1, w2, bf2,
            o_ref, *, num_heads: int):
    S, Lq, D = x_ref.shape
    R = mem_ref.shape[1]
    dtype = x_ref.dtype

    x = x_ref[:].reshape(S * Lq, D)

    # ---- self-attention sublayer
    n0 = _refnorm(x, s0[:], b0[:], dtype)
    tmasks = [tm_ref[s] for s in range(S)]
    att = _mha(n0, n0, S, Lq, Lq, wqh[:], bqh[:], wkh[:], bkh[:],
               wvh[:], bvh[:], woh[:], tmasks, dtype)
    x = x + (att.astype(dtype) + bo[:])

    # ---- cross-attention sublayer
    n1 = _refnorm(x, s1[:], b1[:], dtype)
    mem = mem_ref[:].reshape(S * R, D)
    # the reference normalizes only the query side of cross-attention
    # (memory is already encoder-normed), same as DecoderLayer.__call__
    smasks = [sm_ref[s][None, :] for s in range(S)]        # [1, R] -> bcast
    att2 = _mha(n1, mem, S, Lq, R, wq2h[:], bq2h[:], wk2h[:], bk2h[:],
                wv2h[:], bv2h[:], wo2h[:], smasks, dtype)
    x = x + (att2.astype(dtype) + bo2[:])

    # ---- FFN sublayer
    n2 = _refnorm(x, s2[:], b2[:], dtype)
    f = jnp.maximum(
        jnp.dot(n2, w1[:], preferred_element_type=jnp.float32)
        .astype(dtype) + bf1[:], 0)
    f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
         .astype(dtype) + bf2[:])
    x = x + f

    o_ref[:] = x.reshape(S, Lq, D)


def _split_heads_w(kernel, H):
    """[D, D] projection kernel -> [H, D, Dh] (head h's columns)."""
    D = kernel.shape[0]
    Dh = D // H
    return kernel.reshape(D, H, Dh).transpose(1, 0, 2)


def _split_heads_wo(kernel, H):
    """W_o [D, D] -> [H, Dh, D] (head h's rows)."""
    D = kernel.shape[1]
    Dh = kernel.shape[0] // H
    return kernel.reshape(H, Dh, D)


def pack_layer_weights(lp: Dict[str, Any], dtype, num_heads: int
                       ) -> Dict[str, jnp.ndarray]:
    """DecoderLayer param subtree (params['layer{i}']) -> packed kernel
    weights in the compute dtype, heads split into a leading dim."""
    H = num_heads

    def kb(mod, name):
        p = lp[mod][name]
        return p["kernel"].astype(dtype), p["bias"].astype(dtype)

    def attn(mod):
        wq, bq = kb(mod, "wq")
        wk, bk = kb(mod, "wk")
        wv, bv = kb(mod, "wv")
        wo, bo = kb(mod, "wo")
        Dh = wq.shape[0] // H
        return {
            "wq": _split_heads_w(wq, H), "bq": bq.reshape(H, Dh),
            "wk": _split_heads_w(wk, H), "bk": bk.reshape(H, Dh),
            "wv": _split_heads_w(wv, H), "bv": bv.reshape(H, Dh),
            "wo": _split_heads_wo(wo, H), "bo": bo,
        }

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


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "interpret"))
def fused_decoder_layer(x, memory, tgt_mask, src_mask, weights,
                        num_heads: int, block_b: int = 8,
                        interpret: bool = False):
    """One DecoderLayer forward (inference, no dropout) as one kernel.

    x [B,L,D], memory [B,R,D], tgt_mask bool [B,L,L] (True=attend),
    src_mask bool [B,R], weights from ``pack_layer_weights``."""
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
            pl.BlockSpec((G, L, L), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(x, memory, tgt_mask, src_mask, *w_list)
