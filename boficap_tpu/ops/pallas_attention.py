"""Pallas TPU fused attention core.

One kernel computes scores -> mask -> softmax -> context for ALL heads of a
batch block, replacing the ~6 XLA ops (2 einsums, where, softmax chain) the
unfused path emits per attention call.  At BoFiCap's shapes (L <= 22 keys,
R = 36 regions, Dh = 64) there is nothing to tile — each (sample, head)
attention matrix fits VMEM trivially; the win is kernel-count/fusion, which
dominates the sequential bound/fill decode loops.

The mask is the same bool "visible" tensor the unfused path uses
(models/layers.py attend): [B, Lq, Lk], True = attend.  Softmax runs in f32
with a finite fill (MASK_FILL) so fully-masked rows stay NaN-free.

``attention_core(qh, kh, vh, mask)`` is a drop-in for the inner part of
MultiHeadAttention.attend; enable end to end with cfg.use_pallas = true
(attention dropout must be off — inference paths — otherwise the caller
falls back to the unfused path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e9


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, num_heads: int):
    """Blocks: q [G,H,Lq,Dh], k/v [G,H,Lk,Dh], m [G,Lq,Lk] bool,
    o [G,H,Lq,Dh]."""
    G = q_ref.shape[0]
    Dh = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(Dh)
    for g in range(G):
        mask = m_ref[g]                                   # [Lq, Lk]
        for h in range(num_heads):
            q = q_ref[g, h]                               # [Lq, Dh]
            k = k_ref[g, h]
            v = v_ref[g, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, MASK_FILL)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o_ref[g, h] = jnp.dot(p, v,
                                  preferred_element_type=jnp.float32
                                  ).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def attention_core(qh, kh, vh, mask, block_b: int = 8,
                   interpret: bool = False):
    """qh [B,H,Lq,Dh], kh/vh [B,H,Lk,Dh], mask bool [B,Lq,Lk] (True=attend).
    Returns the attended context [B,H,Lq,Dh] (pre output-projection)."""
    B, H, Lq, Dh = qh.shape
    Lk = kh.shape[2]
    G = math.gcd(B, block_b)
    grid = (B // G,)

    return pl.pallas_call(
        functools.partial(_kernel, num_heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, H, Lq, Dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, Lk, Dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, Lk, Dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lq, Lk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, Lq, Dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), qh.dtype),
        interpret=interpret,
    )(qh, kh, vh, mask)
