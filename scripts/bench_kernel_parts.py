"""In-kernel ablation bench for the windowed decoder layer (dev tool).

Times 6-layer stacks of an ablated copy of _win_kernel with pieces
disabled, to locate where the ~85 us/layer goes.  Parts:
  proj  = q/k/v + out-proj matmuls (self)
  self  = self-attention score/ctx per-head loop + mask/softmax
  cross = cross-attention (q2 proj, per-head loop, o2)
  ffn   = feed-forward
  norm  = the three RefLayerNorms
Run: python scripts/bench_kernel_parts.py
"""

import functools
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from boficap_tpu.config import default_config, finalize  # noqa: E402
from boficap_tpu.decode import bound_fill as bf  # noqa: E402
from boficap_tpu.models.boficap import build_model  # noqa: E402
from boficap_tpu.ops import pallas_decoder_layer as pdl  # noqa: E402

BATCH = 64
W = 8


def _abl_kernel(x_ref, kc_in, vc_in, k2_ref, v2_ref, tm_ref, sm_ref,
                s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
                s1, b1, wq2h, bq2h, wo2h, bo2,
                s2, b2, w1, bf1, w2, bf2,
                o_ref, kn_ref, vn_ref, *, num_heads: int, parts: frozenset):
    G, Wd, D = x_ref.shape
    L = kc_in.shape[1]
    R = k2_ref.shape[1]
    dtype = x_ref.dtype
    H = num_heads
    Dh = D // H
    Lk = L + Wd

    x = x_ref[:].reshape(G * Wd, D)

    def norm(xx, s, b):
        if "norm" in parts:
            return pdl._refnorm(xx, s[:], b[:], dtype)
        return xx

    n0 = norm(x, s0, b0)
    k_new = v_new = None
    if "proj" in parts:
        q_all = (jnp.dot(n0, wqh[:], preferred_element_type=jnp.float32)
                 .astype(dtype) + bqh[:])
        k_new = (jnp.dot(n0, wkh[:], preferred_element_type=jnp.float32)
                 .astype(dtype) + bkh[:])
        v_new = (jnp.dot(n0, wvh[:], preferred_element_type=jnp.float32)
                 .astype(dtype) + bvh[:])
        kn_ref[:] = k_new.reshape(G, Wd, D)
        vn_ref[:] = v_new.reshape(G, Wd, D)
    else:
        q_all = n0
        kn_ref[:] = n0.reshape(G, Wd, D)
        vn_ref[:] = n0.reshape(G, Wd, D)

    if "self" in parts and "proj" in parts:
        k_all = jnp.concatenate([kc_in[:], k_new.reshape(G, Wd, D)],
                                axis=1).reshape(G * Lk, D)
        v_all = jnp.concatenate([vc_in[:], v_new.reshape(G, Wd, D)],
                                axis=1).reshape(G * Lk, D)
        scale = 1.0 / math.sqrt(Dh)
        N, M = G * Wd, G * Lk
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0) // Wd
        col_blk = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1) // Lk
        fill = jnp.where(row_blk == col_blk, pdl.MASK_FILL,
                         2.0 * pdl.MASK_FILL)
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
    elif "proj" in parts:
        x = x + (jnp.dot(q_all, woh[:], preferred_element_type=jnp.float32)
                 .astype(dtype) + bo[:])

    if "cross" in parts:
        n1 = norm(x, s1, b1)
        q2_all = (jnp.dot(n1, wq2h[:], preferred_element_type=jnp.float32)
                  .astype(dtype) + bq2h[:])
        k2_all = k2_ref[:].reshape(G * R, D)
        v2_all = v2_ref[:].reshape(G * R, D)
        N = G * Wd
        M2 = G * R
        scale = 1.0 / math.sqrt(Dh)
        row_blk2 = jax.lax.broadcasted_iota(jnp.int32, (N, M2), 0) // Wd
        col_blk2 = jax.lax.broadcasted_iota(jnp.int32, (N, M2), 1) // R
        fill2 = jnp.where(row_blk2 == col_blk2, pdl.MASK_FILL,
                          2.0 * pdl.MASK_FILL)
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

    if "ffn" in parts:
        n2 = norm(x, s2, b2)
        f = jnp.maximum(
            jnp.dot(n2, w1[:], preferred_element_type=jnp.float32)
            .astype(dtype) + bf1[:], 0)
        f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bf2[:])
        x = x + f
    o_ref[:] = x.reshape(G, Wd, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b", "parts"))
def abl_layer(x_win, k_cache, v_cache, k2, v2, tm_big, sm_big, weights,
              num_heads: int, block_b: int = 8, parts: frozenset = None):
    B, Wd, D = x_win.shape
    L = k_cache.shape[1]
    R = k2.shape[1]
    G = math.gcd(B, block_b)

    def rows(i):
        return (i, 0, 0)

    w_list = [weights[n] for n in pdl._WIN_WNAMES]

    def _zero_idx(i, *, n):
        return (0,) * n

    w_specs = [pl.BlockSpec(w.shape, functools.partial(_zero_idx, n=w.ndim),
                            memory_space=pltpu.VMEM)
               for w in w_list]
    return pl.pallas_call(
        functools.partial(_abl_kernel, num_heads=num_heads, parts=parts),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Wd, G * (L + Wd)), rows,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Wd, G * R), rows, memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Wd, D), x_win.dtype),
            jax.ShapeDtypeStruct((B, Wd, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B, Wd, D), v_cache.dtype),
        ),
    )(x_win, k_cache, v_cache, k2, v2, tm_big, sm_big, *w_list)


def main():
    cfg = default_config()
    cfg.train_mode = "UIC_u"
    cfg.N_enc = cfg.N_dec = 6
    cfg.N_len = 1
    cfg.d_model = 512
    cfg.d_ff = 2048
    cfg.num_att_heads = 8
    cfg.max_boxes = 36
    cfg.id = "bench"
    cfg.dtype = "bfloat16"
    finalize(cfg)
    model = build_model(cfg, 9487)
    B = BATCH

    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(B, 36, 2048).astype(np.float32))
    am = jnp.ones((B, 36), jnp.float32)
    labels = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl_ = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((B,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        att, am, labels, pn, pl_, ps, glat_p=None,
                        deterministic=True)

    @jax.jit
    def encode(att, am):
        return model.apply(params, att, am, deterministic=True,
                           method="encode")

    memory = encode(att, am)
    src = am.astype(bool)
    L = model.max_length
    D = cfg.d_model

    packed_sa, _ = bf._fused_ctx(model, params, "SA")
    k2s, v2s = pdl.project_cross_kv(packed_sa, memory)
    kc = jnp.zeros((B, L, D), model.dtype)
    vc = jnp.zeros((B, L, D), model.dtype)
    x = jnp.ones((B, W, D), model.dtype)
    q_mask = jnp.ones((B, W, L + W), bool)
    tm_big, sm_big = pdl._block_diag_masks(q_mask, src, 8)

    ALL = frozenset({"proj", "self", "cross", "ffn", "norm"})
    variants = [
        ("full", ALL),
        ("no_self", ALL - {"self"}),
        ("no_cross", ALL - {"cross"}),
        ("no_ffn", ALL - {"ffn"}),
        ("no_norm", ALL - {"norm"}),
        ("proj_only", frozenset({"proj"})),
        ("empty", frozenset()),
    ]

    bench.RTT_S = bench._measure_rtt()
    print(f"RTT {bench.RTT_S * 1000:.2f} ms", flush=True)

    for name, parts in variants:
        def stack(mem, srcm, _parts=parts):
            xx = x
            for i in range(6):
                xx, _, _ = abl_layer(xx, kc, vc, k2s[i], v2s[i],
                                     tm_big, sm_big, packed_sa[i],
                                     num_heads=model.num_heads,
                                     parts=_parts)
            return xx.astype(jnp.float32).sum(-1)
        f = jax.jit(stack)
        try:
            bench._fetch(f(memory, src))
            t = bench.timed(lambda a, b, k: f(a, b), *(memory, src))
            print(f"{name:>10}: {t * 1000:7.3f} ms ({t / 6 * 1e6:5.1f} "
                  f"us/layer)", flush=True)
        except Exception as e:
            print(f"{name:>10}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)


# (guard moved to end of file — the hb variant is defined below)


# ---------------------------------------------------------------------------
# head-block-diagonal attention variant: no per-head loop — ONE score dot
# against a block-diagonal K [D, H*M], segment-softmax via indicator
# matmuls, ONE context dot against block-diagonal V [H*M, D].
# ---------------------------------------------------------------------------


def _mha_hb(n_q, kv_src, wq, bq, wk, bk, wv, bv, wo, mask, Lq, Lk, dtype,
            num_heads):
    import jax
    import jax.numpy as jnp
    H = num_heads
    D = wq.shape[1]
    Dh = D // H
    N, M = n_q.shape[0], kv_src.shape[0]
    scale = 1.0 / math.sqrt(Dh)
    q_all = (jnp.dot(n_q, wq, preferred_element_type=jnp.float32)
             .astype(dtype) + bq)
    k_all = (jnp.dot(kv_src, wk, preferred_element_type=jnp.float32)
             .astype(dtype) + bk)
    v_all = (jnp.dot(kv_src, wv, preferred_element_type=jnp.float32)
             .astype(dtype) + bv)

    k_t = k_all.T                                           # [D, M]
    kbig = jnp.tile(k_t, (1, H))                            # [D, H*M]
    rb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M), 0) // Dh
    cb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M), 1) // M
    kbig = jnp.where(rb == cb, kbig, jnp.zeros_like(kbig))
    vbig = jnp.tile(v_all, (H, 1))                          # [H*M, D]
    rb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M, D), 0) // M
    cb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M, D), 1) // Dh
    vbig = jnp.where(rb2 == cb2, vbig, jnp.zeros_like(vbig))

    sc = jax.lax.dot_general(
        q_all, kbig, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # [N, H*M]
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, H * M), 0) // Lq
    col_blk = (jax.lax.broadcasted_iota(jnp.int32, (N, H * M), 1) % M) // Lk
    fill = jnp.where(row_blk == col_blk, pdl.MASK_FILL, 2.0 * pdl.MASK_FILL)
    m01 = jnp.tile(mask.astype(jnp.float32), (1, H))
    sc = jnp.where(m01 > 0.5, sc, fill)
    m = jnp.max(sc, -1, keepdims=True)                      # global row max
    e = jnp.exp(sc - m)                                     # [N, H*M] f32
    ind = (jax.lax.broadcasted_iota(jnp.int32, (H * M, H), 0) // M
           == jax.lax.broadcasted_iota(jnp.int32, (H * M, H), 1)
           ).astype(jnp.float32)
    den_h = jnp.dot(e, ind, preferred_element_type=jnp.float32)   # [N, H]
    den = jnp.dot(den_h, ind.T,
                  preferred_element_type=jnp.float32)             # [N, H*M]
    p = (e / den).astype(dtype)
    ctx = jnp.dot(p, vbig, preferred_element_type=jnp.float32
                  ).astype(dtype)                           # [N, D]
    return jnp.dot(ctx, wo, preferred_element_type=jnp.float32)


def _hb_kernel(x_ref, kc_in, vc_in, k2_ref, v2_ref, tm_ref, sm_ref,
               s0, b0, wqh, bqh, wkh, bkh, wvh, bvh, woh, bo,
               s1, b1, wq2h, bq2h, wo2h, bo2,
               s2, b2, w1, bf1, w2, bf2,
               o_ref, kn_ref, vn_ref, *, num_heads: int):
    """Windowed decoder layer with head-block-diagonal attention."""
    import jax
    import jax.numpy as jnp
    G, Wd, D = x_ref.shape
    L = kc_in.shape[1]
    R = k2_ref.shape[1]
    dtype = x_ref.dtype
    H = num_heads
    Dh = D // H
    Lk = L + Wd

    x = x_ref[:].reshape(G * Wd, D)
    n0 = pdl._refnorm(x, s0[:], b0[:], dtype)
    q_all = (jnp.dot(n0, wqh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bqh[:])
    k_new = (jnp.dot(n0, wkh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bkh[:])
    v_new = (jnp.dot(n0, wvh[:], preferred_element_type=jnp.float32)
             .astype(dtype) + bvh[:])
    kn_ref[:] = k_new.reshape(G, Wd, D)
    vn_ref[:] = v_new.reshape(G, Wd, D)
    k_all = jnp.concatenate([kc_in[:], k_new.reshape(G, Wd, D)],
                            axis=1).reshape(G * Lk, D)
    v_all = jnp.concatenate([vc_in[:], v_new.reshape(G, Wd, D)],
                            axis=1).reshape(G * Lk, D)

    # self-attn (hb): q/k/v pre-projected -> use identity-weight trick is
    # not possible; inline the hb attention on projected tensors
    N, M = G * Wd, G * Lk
    scale = 1.0 / math.sqrt(Dh)
    k_t = k_all.T
    kbig = jnp.tile(k_t, (1, H))
    rb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M), 0) // Dh
    cb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M), 1) // M
    kbig = jnp.where(rb == cb, kbig, jnp.zeros_like(kbig))
    vbig = jnp.tile(v_all, (H, 1))
    rb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M, D), 0) // M
    cb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M, D), 1) // Dh
    vbig = jnp.where(rb2 == cb2, vbig, jnp.zeros_like(vbig))
    sc = jax.lax.dot_general(
        q_all, kbig, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, H * M), 0) // Wd
    col_blk = (jax.lax.broadcasted_iota(jnp.int32, (N, H * M), 1) % M) // Lk
    fill = jnp.where(row_blk == col_blk, pdl.MASK_FILL, 2.0 * pdl.MASK_FILL)
    m01 = jnp.tile(tm_ref[0].astype(jnp.float32), (1, H))
    sc = jnp.where(m01 > 0.5, sc, fill)
    m = jnp.max(sc, -1, keepdims=True)
    e = jnp.exp(sc - m)
    ind = (jax.lax.broadcasted_iota(jnp.int32, (H * M, H), 0) // M
           == jax.lax.broadcasted_iota(jnp.int32, (H * M, H), 1)
           ).astype(jnp.float32)
    den = jnp.dot(jnp.dot(e, ind, preferred_element_type=jnp.float32),
                  ind.T, preferred_element_type=jnp.float32)
    p = (e / den).astype(dtype)
    ctx = jnp.dot(p, vbig, preferred_element_type=jnp.float32).astype(dtype)
    att = jnp.dot(ctx, woh[:], preferred_element_type=jnp.float32)
    x = x + (att.astype(dtype) + bo[:])

    # cross-attn (hb, pre-projected K/V)
    n1 = pdl._refnorm(x, s1[:], b1[:], dtype)
    q2 = (jnp.dot(n1, wq2h[:], preferred_element_type=jnp.float32)
          .astype(dtype) + bq2h[:])
    k2 = k2_ref[:].reshape(G * R, D)
    v2 = v2_ref[:].reshape(G * R, D)
    M2 = G * R
    k2t = k2.T
    kbig2 = jnp.tile(k2t, (1, H))
    rb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M2), 0) // Dh
    cb = jax.lax.broadcasted_iota(jnp.int32, (D, H * M2), 1) // M2
    kbig2 = jnp.where(rb == cb, kbig2, jnp.zeros_like(kbig2))
    vbig2 = jnp.tile(v2, (H, 1))
    rb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M2, D), 0) // M2
    cb2 = jax.lax.broadcasted_iota(jnp.int32, (H * M2, D), 1) // Dh
    vbig2 = jnp.where(rb2 == cb2, vbig2, jnp.zeros_like(vbig2))
    sc2 = jax.lax.dot_general(
        q2, kbig2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (N, H * M2), 0) // Wd
    col_blk = (jax.lax.broadcasted_iota(jnp.int32, (N, H * M2), 1)
               % M2) // R
    fill2 = jnp.where(row_blk == col_blk, pdl.MASK_FILL,
                      2.0 * pdl.MASK_FILL)
    m01b = jnp.tile(sm_ref[0].astype(jnp.float32), (1, H))
    sc2 = jnp.where(m01b > 0.5, sc2, fill2)
    m2 = jnp.max(sc2, -1, keepdims=True)
    e2 = jnp.exp(sc2 - m2)
    ind2 = (jax.lax.broadcasted_iota(jnp.int32, (H * M2, H), 0) // M2
            == jax.lax.broadcasted_iota(jnp.int32, (H * M2, H), 1)
            ).astype(jnp.float32)
    den2 = jnp.dot(jnp.dot(e2, ind2, preferred_element_type=jnp.float32),
                   ind2.T, preferred_element_type=jnp.float32)
    p2 = (e2 / den2).astype(dtype)
    ctx2 = jnp.dot(p2, vbig2,
                   preferred_element_type=jnp.float32).astype(dtype)
    att2 = jnp.dot(ctx2, wo2h[:], preferred_element_type=jnp.float32)
    x = x + (att2.astype(dtype) + bo2[:])

    n2 = pdl._refnorm(x, s2[:], b2[:], dtype)
    f = jnp.maximum(
        jnp.dot(n2, w1[:], preferred_element_type=jnp.float32)
        .astype(dtype) + bf1[:], 0)
    f = (jnp.dot(f, w2[:], preferred_element_type=jnp.float32)
         .astype(dtype) + bf2[:])
    x = x + f
    o_ref[:] = x.reshape(G, Wd, D)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_b"))
def hb_layer(x_win, k_cache, v_cache, k2, v2, tm_big, sm_big, weights,
             num_heads: int, block_b: int = 8):
    B, Wd, D = x_win.shape
    L = k_cache.shape[1]
    R = k2.shape[1]
    G = math.gcd(B, block_b)

    def rows(i):
        return (i, 0, 0)

    w_list = [weights[n] for n in pdl._WIN_WNAMES]

    def _zero_idx(i, *, n):
        return (0,) * n

    w_specs = [pl.BlockSpec(w.shape, functools.partial(_zero_idx, n=w.ndim),
                            memory_space=pltpu.VMEM)
               for w in w_list]
    return pl.pallas_call(
        functools.partial(_hb_kernel, num_heads=num_heads),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Wd, G * (L + Wd)), rows,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Wd, G * R), rows, memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Wd, D), rows, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Wd, D), x_win.dtype),
            jax.ShapeDtypeStruct((B, Wd, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B, Wd, D), v_cache.dtype),
        ),
    )(x_win, k_cache, v_cache, k2, v2, tm_big, sm_big, *w_list)


def main_hb():
    """Head-block variant vs current kernel, W=8 and W=16 6-layer stacks."""
    cfg = default_config()
    cfg.train_mode = "UIC_u"
    cfg.N_enc = cfg.N_dec = 6
    cfg.N_len = 1
    cfg.d_model = 512
    cfg.d_ff = 2048
    cfg.num_att_heads = 8
    cfg.max_boxes = 36
    cfg.id = "bench"
    cfg.dtype = "bfloat16"
    finalize(cfg)
    model = build_model(cfg, 9487)
    B = BATCH

    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(B, 36, 2048).astype(np.float32))
    am = jnp.ones((B, 36), jnp.float32)
    labels = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl_ = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((B, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((B,), 2, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        att, am, labels, pn, pl_, ps, glat_p=None,
                        deterministic=True)

    @jax.jit
    def encode(att, am):
        return model.apply(params, att, am, deterministic=True,
                           method="encode")

    memory = encode(att, am)
    src = am.astype(bool)
    L = model.max_length
    D = cfg.d_model

    packed_sa, _ = bf._fused_ctx(model, params, "SA")
    k2s, v2s = pdl.project_cross_kv(packed_sa, memory)
    kc = jnp.zeros((B, L, D), model.dtype)
    vc = jnp.zeros((B, L, D), model.dtype)

    bench.RTT_S = bench._measure_rtt()
    print(f"RTT {bench.RTT_S * 1000:.2f} ms", flush=True)

    # numeric sanity on one layer: hb vs current windowed kernel
    x8 = jnp.asarray(rng.randn(B, 8, D), model.dtype)
    qm = jnp.ones((B, 8, L + 8), bool)
    tm8, sm8 = pdl._block_diag_masks(qm, src, 8)
    o_cur, kn_c, vn_c = pdl.fused_window_decoder_layer(
        x8, kc, vc, k2s[0], v2s[0], tm8, sm8, packed_sa[0],
        num_heads=model.num_heads)
    o_hb, kn_h, vn_h = hb_layer(x8, kc, vc, k2s[0], v2s[0], tm8, sm8,
                                packed_sa[0], num_heads=model.num_heads)
    d = jnp.abs(o_cur.astype(jnp.float32) - o_hb.astype(jnp.float32)).max()
    print(f"hb-vs-current one-layer max abs diff: {float(d):.6f}",
          flush=True)

    for Wv in (8, 16):
        x_v = jnp.ones((B, Wv, D), model.dtype)
        q_mask_v = jnp.ones((B, Wv, L + Wv), bool)
        tmv, smv = pdl._block_diag_masks(q_mask_v, src, 8)

        def hb_stack(mem, srcm, _x=x_v, _tm=tmv, _sm=smv):
            xx = _x
            for i in range(6):
                xx, _, _ = hb_layer(xx, kc, vc, k2s[i], v2s[i], _tm, _sm,
                                    packed_sa[i], num_heads=model.num_heads)
            return xx.astype(jnp.float32).sum(-1)

        def cur_stack(mem, srcm, _x=x_v, _tm=tmv, _sm=smv):
            xx = _x
            for i in range(6):
                xx, _, _ = pdl.fused_window_decoder_layer(
                    xx, kc, vc, k2s[i], v2s[i], _tm, _sm, packed_sa[i],
                    num_heads=model.num_heads)
            return xx.astype(jnp.float32).sum(-1)

        for name, fn in ((f"hb_w{Wv}", hb_stack), (f"cur_w{Wv}", cur_stack)):
            f = jax.jit(fn)
            try:
                bench._fetch(f(memory, src))
                t = bench.timed(lambda a, b, k: f(a, b), *(memory, src))
                print(f"{name:>10}: {t * 1000:7.3f} ms ({t / 6 * 1e6:5.1f} "
                      f"us/layer)", flush=True)
            except Exception as e:
                print(f"{name:>10}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_PARTS"):
        main()
    else:
        main_hb()
