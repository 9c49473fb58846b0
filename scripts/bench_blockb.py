"""block_b (grid group size) sweep for the fused kernels (dev tool).

Times the 6-layer fused decoder stack (full width), the windowed decoder
stack (W=8 and W=L), and the 6-layer fused encoder stack at
block_b in {8, 16, 32}, B=64, with bench.py's pipelined protocol — both the
per-layer kernel family (ops/pallas_decoder_layer) and the whole-stack
megakernels (ops/pallas_stack, names suffixed ``_st``).
Run: python scripts/bench_blockb.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from boficap_tpu.config import default_config, finalize  # noqa: E402
from boficap_tpu.decode import bound_fill as bf  # noqa: E402
from boficap_tpu.models.boficap import build_model  # noqa: E402
from boficap_tpu.ops import pallas_decoder_layer as pdl  # noqa: E402
from boficap_tpu.ops import pallas_stack as pst  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
GS = tuple(int(g) for g in
           os.environ.get("BENCH_GS", "8,16,32").split(","))


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

    rng = np.random.RandomState(0)
    att = jnp.asarray(rng.randn(BATCH, 36, 2048).astype(np.float32))
    am = jnp.ones((BATCH, 36), jnp.float32)
    labels = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, -1].set(2)
    pl_ = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(4)
    ps = jnp.zeros((BATCH, 22), jnp.int32).at[:, 0].set(1).at[:, 1].set(5)
    pn = jnp.full((BATCH,), 2, jnp.int32)
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
    B = BATCH
    D = cfg.d_model

    packed_na, fnorm = bf._fused_ctx(model, params, "NA")
    packed_sa, fnorm_sa = bf._fused_ctx(model, params, "SA")
    k2s, v2s = pdl.project_cross_kv(packed_sa, memory)

    def dec_stack(g):
        @jax.jit
        def f(memory, src_mask):
            x = jnp.ones((B, L, D), model.dtype)
            mask = jnp.ones((B, L, L), bool)
            return pdl.fused_decoder_forward(
                x, memory, mask, src_mask, packed_na, fnorm,
                num_heads=model.num_heads, block_b=g
            ).astype(jnp.float32).sum(-1)
        return f, (memory, src)

    def win_stack(g, W):
        kc = [jnp.zeros((B, L, D), model.dtype) for _ in range(6)]
        vc = [jnp.zeros((B, L, D), model.dtype) for _ in range(6)]
        starts = jnp.zeros((B,), jnp.int32)

        @jax.jit
        def f(memory, src_mask):
            x = jnp.ones((B, W, D), model.dtype)
            q_mask = jnp.ones((B, W, L + W), bool)
            G = math.gcd(B, g)
            tm_big, sm_big = pdl._block_diag_masks(q_mask, src_mask, G)
            h, _, _ = pdl.fused_window_decoder_forward(
                x, starts, kc, vc, k2s, v2s, tm_big, sm_big,
                packed_sa, fnorm_sa, num_heads=model.num_heads, block_b=g)
            return h.astype(jnp.float32).sum(-1)
        return f, (memory, src)

    def enc_stack(g):
        packed_e, fnorm_e = pdl.pack_encoder_weights(
            params["params"]["encoder"], model.dtype)

        @jax.jit
        def f(att_e, src_mask):
            return pdl.fused_encoder_forward(
                att_e, src_mask, packed_e, fnorm_e,
                num_heads=model.num_heads, block_b=g
            ).astype(jnp.float32).sum(-1)
        x_enc = model.apply(params, att, True, method="embed_att")
        return f, (x_enc, src)

    # ---- whole-stack megakernel variants (ops/pallas_stack) ----
    st_dec = pst.pack_stack(packed_na, "dec")
    st_win = pst.pack_stack(packed_sa, "win")
    packed_e2, fnorm_e2 = pdl.pack_encoder_weights(
        params["params"]["encoder"], model.dtype)
    st_enc = pst.pack_stack(packed_e2, "enc")
    k2st, v2st = jnp.stack(k2s), jnp.stack(v2s)

    def dec_stack_st(g):
        @jax.jit
        def f(memory, src_mask):
            x = jnp.ones((B, L, D), model.dtype)
            mask = jnp.ones((B, L, L), bool)
            return pst.fused_decoder_stack_forward(
                x, memory, mask, src_mask, st_dec, fnorm,
                num_heads=model.num_heads, block_b=g
            ).astype(jnp.float32).sum(-1)
        return f, (memory, src)

    def win_stack_st(g, W):
        kc = jnp.zeros((6, B, L, D), model.dtype)
        vc = jnp.zeros((6, B, L, D), model.dtype)

        @jax.jit
        def f(memory, src_mask):
            x = jnp.ones((B, W, D), model.dtype)
            q_mask = jnp.ones((B, W, L + W), bool)
            G = math.gcd(B, g)
            tm_big, sm_big = pdl._block_diag_masks(q_mask, src_mask, G)
            oh = jnp.zeros((B, L, W), jnp.float32)
            h, _, _ = pst.fused_window_decoder_stack(
                x, oh, kc, vc, k2st, v2st, tm_big, sm_big,
                st_win, fnorm_sa, num_heads=model.num_heads, block_b=g)
            return h.astype(jnp.float32).sum(-1)
        return f, (memory, src)

    def win_wide_st(g):
        @jax.jit
        def f(memory, src_mask):
            x = jnp.ones((B, L, D), model.dtype)
            G = math.gcd(B, g)
            q_mask = jnp.ones((B, L, L), bool)
            tm_big, sm_big = pdl._block_diag_masks(q_mask, src_mask, G)
            h, _, _ = pst.fused_window_wide_stack(
                x, k2st, v2st, tm_big, sm_big, st_win, fnorm_sa,
                num_heads=model.num_heads, block_b=g)
            return h.astype(jnp.float32).sum(-1)
        return f, (memory, src)

    def enc_stack_st(g):
        @jax.jit
        def f(att_e, src_mask):
            return pst.fused_encoder_stack_forward(
                att_e, src_mask, st_enc, (fnorm_e2[0], fnorm_e2[1]),
                num_heads=model.num_heads, block_b=g
            ).astype(jnp.float32).sum(-1)
        x_enc = model.apply(params, att, True, method="embed_att")
        return f, (x_enc, src)

    bench.RTT_S = bench._measure_rtt()
    print(f"RTT {bench.RTT_S * 1000:.2f} ms", flush=True)

    jobs = []
    for g in GS:
        jobs.append((f"dec_full_g{g}", *dec_stack(g)))
        jobs.append((f"win_w8_g{g}", *win_stack(g, 8)))
        jobs.append((f"win_wL_g{g}", *win_stack(g, L)))
        jobs.append((f"enc_g{g}", *enc_stack(g)))
        jobs.append((f"dec_full_g{g}_st", *dec_stack_st(g)))
        jobs.append((f"win_w8_g{g}_st", *win_stack_st(g, 8)))
        jobs.append((f"win_wL_g{g}_st", *win_stack_st(g, L)))
        jobs.append((f"win_wide_g{g}_st", *win_wide_st(g)))
        jobs.append((f"enc_g{g}_st", *enc_stack_st(g)))
    for name, fn, args in jobs:
        try:
            bench._fetch(fn(*args))
            t = bench.timed(lambda a, b, k: fn(a, b), *args)
            print(f"{name:>14}: {t * 1000:7.3f} ms ({t / 6 * 1000:6.3f} "
                  f"ms/layer)", flush=True)
        except Exception as e:  # VMEM OOM etc.
            print(f"{name:>14}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
