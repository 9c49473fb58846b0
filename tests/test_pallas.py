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
    np.testing.assert_allclose(np.asarray(base["logprobs"]),
                               np.asarray(fused["logprobs"]),
                               rtol=2e-3, atol=1e-4)


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
