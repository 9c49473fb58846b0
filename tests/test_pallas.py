"""Pallas fused attention core vs the unfused reference math (interpret mode
on CPU; the same kernel compiles on TPU via cfg.use_pallas)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boficap_tpu.ops.pallas_attention import attention_core


def unfused(qh, kh, vh, mask):
    Dh = qh.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(Dh)
    s = jnp.where(mask[:, None, :, :], s, -1e9)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(qh.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vh)


@pytest.mark.parametrize("B,H,Lq,Lk,Dh", [(8, 4, 20, 20, 64),
                                          (6, 8, 22, 36, 64),
                                          (4, 2, 1, 22, 32)])
def test_attention_core_matches_unfused(B, H, Lq, Lk, Dh):
    rng = np.random.RandomState(0)
    qh = jnp.asarray(rng.randn(B, H, Lq, Dh).astype(np.float32))
    kh = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))
    vh = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))
    vis = rng.randint(0, Lk + 1, size=(B, Lq))
    mask = jnp.asarray(np.arange(Lk)[None, None, :] < vis[:, :, None])
    # at least one visible key per row so softmax rows are comparable
    mask = mask.at[:, :, 0].set(True)
    got = attention_core(qh, kh, vh, mask, interpret=True)
    want = unfused(qh, kh, vh, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_model_forward_with_pallas_flag():
    """Whole-model decode path with the pallas core (interpret mode)."""
    from boficap_tpu.models.layers import set_pallas_attention
    from tests.test_decode import _setup
    from boficap_tpu.decode import bound_fill as bf
    model, params, memory, src_mask = _setup("UIC", seed=47)
    base = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                        src_mask)
    set_pallas_attention(True, interpret=True)
    try:
        fused = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                             src_mask)
    finally:
        set_pallas_attention(False)
    np.testing.assert_array_equal(np.asarray(base["seq"]),
                                  np.asarray(fused["seq"]))
    for key in ("tok_logprobs", "entropy"):
        np.testing.assert_allclose(np.asarray(base[key]),
                                   np.asarray(fused[key]),
                               rtol=2e-3, atol=1e-4)


def test_fused_decoder_layer_matches_unfused():
    """ops/pallas_decoder_layer vs the flax DecoderLayer (interpret mode):
    one whole decoder layer (self-attn + cross-attn + ffn, pre-norm
    residuals) in a single kernel."""
    from boficap_tpu.ops.pallas_decoder_layer import (
        fused_decoder_forward, pack_decoder_weights)
    from tests.test_decode import _setup

    model, params, memory, src_mask = _setup("UIC", seed=11)
    B, R, D = memory.shape
    L = model.max_length
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    vis = rng.randint(1, L + 1, size=(B, L))
    tgt_mask = jnp.asarray(np.arange(L)[None, None, :] < vis[:, :, None])

    dec_params = params["params"]["decoder0"]
    from boficap_tpu.models.layers import Decoder
    # params are stored float32 regardless of compute dtype; compare the two
    # implementations at f32 (tight) and bf16 (representation-limited)
    for dtype, rtol, atol in ((jnp.float32, 2e-4, 2e-4),
                              (jnp.bfloat16, 0.05, 0.05)):
        ref_dec = Decoder(model.N_dec, model.d_model, model.d_ff,
                          model.num_heads, 0.0, dtype)
        want = ref_dec.apply({"params": dec_params},
                             x.astype(dtype), memory.astype(dtype),
                             src_mask, tgt_mask, True)
        packed, fnorm = pack_decoder_weights(dec_params, dtype)
        got = fused_decoder_forward(x.astype(dtype), memory.astype(dtype),
                                    tgt_mask, src_mask, packed, fnorm,
                                    num_heads=model.num_heads,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("stacked", [False, True])
def test_na_decode_fused_fill_matches_unfused(stacked):
    """na_decode(fused_fill=True) routes the fill through the pallas decoder
    megakernel (per-layer or whole-stack); sequences must be identical and
    logprobs close.  f32 model: the kernel's (equivalent but reordered)
    accumulation makes bf16 argmax ties unstable — dtype drift is covered by
    the layer-level test."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=19)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(19)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)
    base = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                        src_mask)
    fused = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                         src_mask, fused_fill=True, fused_interpret=True,
                         stacked=stacked)
    np.testing.assert_array_equal(np.asarray(base["seq"]),
                                  np.asarray(fused["seq"]))
    for key in ("tok_logprobs", "entropy"):
        np.testing.assert_allclose(np.asarray(base[key]),
                                   np.asarray(fused[key]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("stacked", [False, True])
def test_fused_encoder_matches_unfused(stacked):
    """fused_encode vs BoFiCap.encode (interpret mode): the encoder variant
    of the fused layer (self-attn + ffn, block-diag batched), per-layer and
    whole-stack."""
    import jax.numpy as jnp
    from boficap_tpu.decode.bound_fill import fused_encode
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import tiny_cfg, make_batch

    for dtype, rtol, atol in (("float32", 2e-4, 2e-4),
                              ("bfloat16", 0.05, 0.05)):
        cfg = tiny_cfg("UIC")
        cfg.dtype = dtype
        model = build_model(cfg, 50)
        batch = make_batch(B=4, seed=31)
        att = jnp.asarray(batch["att_feats"])
        am = jnp.asarray(batch["att_masks"])
        params = model.init(
            {"params": jax.random.PRNGKey(31)}, att, am,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
            jnp.asarray(batch["phrase_length"]),
            jnp.asarray(batch["phrase_syn"]), glat_p=-1.0,
            deterministic=True)
        want = model.apply(params, att, am, deterministic=True,
                           method="encode")
        got = fused_encode(model, params, att, am, interpret=True,
                           stacked=stacked)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("stacked", [False, True])
def test_sa_decode_fused_fill_matches_unfused(stacked):
    """sa_decode(fused_fill=True): per-phrase fused decoder passes inside
    the while_loop (weights packed once outside), per-layer or whole-stack
    with in-kernel K/V cache scatter.  f32 model (see NA test)."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=23)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(23)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)
    base = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                        src_mask)
    fused = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                         src_mask, fused_fill=True, fused_interpret=True,
                         stacked=stacked)
    np.testing.assert_array_equal(np.asarray(base["seq"]),
                                  np.asarray(fused["seq"]))
    for key in ("tok_logprobs", "entropy"):
        np.testing.assert_allclose(np.asarray(base[key]),
                                   np.asarray(fused[key]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("stacked", [False, True])
def test_sa_decode_window_width_invariance(stacked):
    """The narrow-window width is a perf tunable; decoded sequences must be
    invariant to it.  window >= max_length removes the narrow branch (every
    round is the wide no-cache fill — the identity short-circuit path)."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=29)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(29)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)
    base = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                        src_mask)
    for window in (4, model.max_length, model.max_length + 7):
        got = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                           src_mask, fused_fill=True, fused_interpret=True,
                           stacked=stacked, window=window)
        np.testing.assert_array_equal(np.asarray(base["seq"]),
                                      np.asarray(got["seq"]),
                                      err_msg=f"window={window}")
        np.testing.assert_allclose(np.asarray(base["tok_logprobs"]),
                                   np.asarray(got["tok_logprobs"]),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"window={window}")


def test_attention_capture():
    """glo-equivalent attention-map capture via flax intermediates."""
    import jax.numpy as jnp
    from boficap_tpu.models.layers import set_capture_attention
    from boficap_tpu.models.boficap import BoFiCap
    from tests.test_decode import _setup
    model, params, memory, src_mask = _setup("AIC", seed=53)
    labels = jnp.zeros((memory.shape[0], 22), jnp.int32).at[:, 0].set(1)
    set_capture_attention(True)
    try:
        import tests.test_model as tm
        batch = tm.make_batch(seed=53)
        out, inter = model.apply(
            params, jnp.asarray(batch["att_feats"]),
            jnp.asarray(batch["att_masks"]),
            jnp.asarray(batch["labels"]), deterministic=True,
            mutable=["intermediates"])
    finally:
        set_capture_attention(False)
    maps = jax.tree_util.tree_leaves(inter["intermediates"])
    assert len(maps) > 0
    # [B, H, Lq, Lk] rows sum to 1
    m = np.asarray(maps[0])
    assert m.ndim == 4
    np.testing.assert_allclose(m.astype(np.float32).sum(-1), 1.0,
                               atol=2e-2)  # probs stored in bf16


@pytest.mark.parametrize("stacked", [False, True])
def test_nnaic_decode_fused_fill_matches_unfused(stacked):
    """nnaic_decode(fused_fill=True): the naive-NA single parallel fill
    through the fused decoder stack (f32 model; see NA test)."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("NNAIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=37)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(37)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)
    base = bf.nnaic_decode(model, params, jax.random.PRNGKey(0), memory,
                           src_mask)
    fused = bf.nnaic_decode(model, params, jax.random.PRNGKey(0), memory,
                            src_mask, fused_fill=True, fused_interpret=True,
                            stacked=stacked)
    np.testing.assert_array_equal(np.asarray(base["seq"]),
                                  np.asarray(fused["seq"]))
    for key in ("tok_logprobs", "entropy"):
        np.testing.assert_allclose(np.asarray(base[key]),
                                   np.asarray(fused[key]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_greedy_head_matches_unfused(dtype):
    """ops/pallas_decoder_layer.fused_greedy_head: ids EXACTLY equal the
    unfused argmax(log_softmax(Dense(h))); token-logprob and entropy agree
    to fp tolerance (reference Generator TransformerModel.py:1312-1319)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boficap_tpu.ops.pallas_decoder_layer import fused_greedy_head

    rng = np.random.RandomState(3)
    B, T, D, V = 4, 5, 128, 1000   # V NOT a multiple of the 512 tile
    dt = jnp.dtype(dtype)
    h = jnp.asarray(rng.randn(B, T, D), dt)
    w = jnp.asarray(rng.randn(D, V).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.01)

    # unfused oracle with the same bf16 rounding Dense(dtype) applies
    if dt == jnp.bfloat16:
        logits = (jnp.dot(h, w.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
                  + b.astype(dt)).astype(jnp.float32)
    else:
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
    lp = jax.nn.log_softmax(logits, axis=-1)
    want_ids = jnp.argmax(lp, -1)
    want_tok = jnp.take_along_axis(lp, want_ids[..., None], -1)[..., 0]
    want_ent = -jnp.sum(jnp.exp(lp) * lp, -1)

    ids, tok, ent, lpp = fused_greedy_head(h, w, b, pad_id=7,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(lpp), np.asarray(lp[..., 7]),
                               atol=2e-2 if dtype == "bfloat16" else 1e-4,
                               rtol=1e-4)
    # bf16: the interpret-mode CPU matmul tiles the per-tile dot
    # differently from the full-width oracle dot, which can flip the
    # bf16 logit rounding by one ulp (~8e-3 at these magnitudes); on the
    # TPU MXU the K-accumulation order is fixed and the paths agree
    # exactly (asserted by the decode-equivalence tests on device)
    tol = 2e-2 if dtype == "bfloat16" else 1e-4
    np.testing.assert_allclose(np.asarray(tok), np.asarray(want_tok),
                               atol=tol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(want_ent),
                               atol=1e-3, rtol=1e-3)


def test_sa_decode_stacked_nondefault_block_b(monkeypatch):
    """The windowed-stack batch-block size (pallas_stack.WIN_BLOCK_B) is a
    perf tunable — decoded sequences must be invariant to it.  sa_decode
    builds its block-diagonal masks from the same constant the kernel
    blocks on, so a mismatch would fail loudly; this pins the agreement at
    a non-default size (G=2 vs the B=4 default gcd(4,8)=4)."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.ops import pallas_stack as pst
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=23)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(23)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)
    base = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                        src_mask)
    monkeypatch.setattr(pst, "WIN_BLOCK_B", 2)
    fused = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                         src_mask, fused_fill=True, fused_interpret=True,
                         stacked=True)
    np.testing.assert_array_equal(np.asarray(base["seq"]),
                                  np.asarray(fused["seq"]))


def test_window_wide_stack_matches_general_stack():
    """fused_window_wide_stack (no cache keys, direct K/V emit) must equal
    the general windowed stack at W == L with the identity scatter one-hot,
    w_start == 0, and a fully-masked cache — the exact configuration every
    wide SA round has."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.ops.pallas_decoder_layer import (_block_diag_one,
                                                      project_cross_kv)
    from boficap_tpu.ops import pallas_stack as pst
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=4, seed=31)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(31)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")

    B, L, D = 4, model.max_length, model.d_model
    G = 2
    packed, fnorm = bf._fused_ctx(model, params, "SA")
    stacked = pst.pack_stack(packed, "win")
    k2_l, v2_l = project_cross_kv(packed, memory)
    k2s, v2s = jnp.stack(k2_l), jnp.stack(v2_l)
    NL = len(packed)

    rng = np.random.RandomState(7)
    x_win = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    vis = jnp.asarray(rng.randint(1, L + 1, size=(B,)))
    m_win = (jnp.arange(L)[None, None, :]
             < vis[:, None, None]) & jnp.ones((B, L, L), bool)
    src_b = am.astype(bool)
    R = memory.shape[1]
    sm_big = _block_diag_one(
        jnp.broadcast_to(src_b[:, None, :], (B, L, R)), G)

    # general kernel: cache keys fully masked, identity one-hot
    m_cache = jnp.zeros((B, L, L), bool)
    tm_gen = _block_diag_one(jnp.concatenate([m_cache, m_win], -1), G)
    oh_lw = jnp.eye(L, dtype=jnp.float32)[None].repeat(B, 0)
    kc = jnp.asarray(rng.randn(NL, B, L, D).astype(np.float32))
    vc = jnp.asarray(rng.randn(NL, B, L, D).astype(np.float32))
    h_gen, kc_gen, vc_gen = pst.fused_window_decoder_stack(
        x_win, oh_lw, kc, vc, k2s, v2s, tm_gen, sm_big, stacked, fnorm,
        num_heads=model.num_heads, block_b=G, interpret=True)

    tm_wide = _block_diag_one(m_win, G)
    h_w, kc_w, vc_w = pst.fused_window_wide_stack(
        x_win, k2s, v2s, tm_wide, sm_big, stacked, fnorm,
        num_heads=model.num_heads, block_b=G, interpret=True)

    np.testing.assert_allclose(np.asarray(h_w), np.asarray(h_gen),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kc_w), np.asarray(kc_gen),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vc_w), np.asarray(vc_gen),
                               rtol=1e-5, atol=1e-5)


def test_use_stacked_batch_guard():
    """Whole-stack kernels only serve batches <= 128 on hardware (the
    [B, L, D] activation scratch overflows scoped VMEM at B=256 —
    BENCH_NOTES); interpret mode is unrestricted."""
    import types
    from boficap_tpu.decode.bound_fill import _use_stacked
    import jax.numpy as jnp
    bf16_model = types.SimpleNamespace(dtype=jnp.bfloat16, d_model=512)
    f32_model = types.SimpleNamespace(dtype=jnp.float32, d_model=512)
    assert _use_stacked(bf16_model, False, 64)
    assert _use_stacked(bf16_model, False, 128)
    assert not _use_stacked(bf16_model, False, 256)
    assert not _use_stacked(f32_model, False, 64)
    assert _use_stacked(f32_model, True, 256)      # interpret: no limits


def test_attention_capture_forces_unfused():
    """With pallas attention enabled, enabling capture must still sow probs
    (the fused kernel never materializes them — capture forces the unfused
    path instead of silently returning empty intermediates)."""
    import jax.numpy as jnp
    from boficap_tpu.models.layers import (set_capture_attention,
                                           set_pallas_attention)
    from tests.test_decode import _setup
    model, params, memory, src_mask = _setup("AIC", seed=53)
    import tests.test_model as tm
    batch = tm.make_batch(seed=53)
    set_capture_attention(True)
    set_pallas_attention(True, interpret=True)
    try:
        out, inter = model.apply(
            params, jnp.asarray(batch["att_feats"]),
            jnp.asarray(batch["att_masks"]),
            jnp.asarray(batch["labels"]), deterministic=True,
            mutable=["intermediates"])
    finally:
        set_pallas_attention(False)
        set_capture_attention(False)
    maps = jax.tree_util.tree_leaves(inter["intermediates"])
    assert len(maps) > 0 and np.asarray(maps[0]).ndim == 4


@pytest.mark.slow
def test_stack_chunked_grid_matches_unchunked(monkeypatch):
    """B > the chunk cap routes the dec/enc stacks through the chunked
    (B//GB, NL, GB//G) grid with a per-chunk activation scratch
    (pallas_stack._chunk_rows) — results must be identical to the
    one-chunk grid.  The cap is shrunk to 4 so B=8 runs 2 chunks in
    interpret mode (on hardware the cap is 128: the B=256 VMEM fix)."""
    import jax.numpy as jnp
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.ops import pallas_stack as pst
    from tests.test_model import tiny_cfg, make_batch

    cfg = tiny_cfg("UIC")
    cfg.dtype = "float32"
    model = build_model(cfg, 50)
    batch = make_batch(B=8, seed=31)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(31)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    src_mask = am.astype(bool)

    base_mem = bf.fused_encode(model, params, att, am, interpret=True,
                               stacked=True)
    base_na = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                           src_mask, fused_fill=True, fused_interpret=True,
                           stacked=True)

    orig = pst._chunk_rows
    monkeypatch.setattr(pst, "_chunk_rows",
                        lambda B, G, cap=128: orig(B, G, cap=4))
    # jit caches key on shapes+statics only; the chunk routing happens at
    # trace time inside _dec/_enc_stack_call which are themselves jit'd on
    # shapes — clear them so the patched cap takes effect
    pst._dec_stack_call.clear_cache()
    pst._enc_stack_call.clear_cache()
    try:
        chunk_mem = bf.fused_encode(model, params, att, am, interpret=True,
                                    stacked=True)
        chunk_na = bf.na_decode(model, params, jax.random.PRNGKey(0),
                                memory, src_mask, fused_fill=True,
                                fused_interpret=True, stacked=True)
    finally:
        pst._dec_stack_call.clear_cache()
        pst._enc_stack_call.clear_cache()
    np.testing.assert_allclose(np.asarray(base_mem), np.asarray(chunk_mem),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(base_na["seq"]),
                                  np.asarray(chunk_na["seq"]))
    for key in ("tok_logprobs", "entropy"):
        np.testing.assert_allclose(np.asarray(base_na[key]),
                                   np.asarray(chunk_na[key]),
                                   rtol=2e-3, atol=2e-4)
