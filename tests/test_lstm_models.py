"""FC / UpDown / AoANet captioners: registry construction, XE learning on
synthetic data, greedy + beam decode through the shared AR machinery,
scheduled sampling, and classic SCST step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boficap_tpu.config import default_config, finalize
from boficap_tpu.data.dataset import CaptionData
from boficap_tpu.decode import ar as ar_mod
from boficap_tpu.models import setup as models_setup
from boficap_tpu.rewards import init_scorer
from boficap_tpu.train import optim as optim_mod
from boficap_tpu.train import steps as steps_mod
from boficap_tpu.train.state import create_state


def make_cfg(caption_model):
    cfg = default_config()
    cfg.caption_model = caption_model
    cfg.train_mode = "AIC"
    cfg.input_json = "synthetic"
    cfg.input_att_dir = "synthetic"
    cfg.batch_size = 2
    cfg.max_boxes = 9
    cfg.input_encoding_size = 32
    cfg.rnn_size = 48
    cfg.att_hid_size = 24
    cfg.N_enc = 1
    cfg.num_att_heads = 2
    cfg.noamopt = False
    cfg.d_model = 32
    cfg.d_ff = 64
    cfg.train_sample_n = 2
    cfg.id = "t"
    finalize(cfg)
    return cfg


def setup_lstm(caption_model):
    cfg = make_cfg(caption_model)
    data = CaptionData(cfg)
    model = models_setup(cfg, data.vocab_size)
    batch = data.get_batch("train")
    f = steps_mod._flat(batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["att_feats"]), jnp.asarray(batch["att_masks"]),
        f["labels"], deterministic=True)
    tx = optim_mod.build_optimizer(cfg)
    return cfg, data, model, tx, create_state(params, tx)


@pytest.mark.slow
@pytest.mark.parametrize("cm", ["fc", "updown", "aoa", "att2in2"])
def test_lstm_xe_learns(cm):
    cfg, data, model, tx, state = setup_lstm(cm)
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    losses = []
    for i in range(4):
        state, metrics = steps_mod.run_xe_step(
            step_fn, state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
@pytest.mark.parametrize("cm", ["fc", "updown", "aoa", "att2in2"])
def test_lstm_greedy_and_beam(cm):
    cfg, data, model, tx, state = setup_lstm(cm)
    batch = data.get_batch("val")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    memory = model.apply(state.params, att, am, deterministic=True,
                         method="encode")
    src = am.astype(bool)
    g = ar_mod.ar_sample(model, state.params, jax.random.PRNGKey(0),
                         memory, src)
    assert g["seq"].shape == (att.shape[0], 20)
    b = ar_mod.ar_beam_search(model, state.params, memory, src, beam_size=3)
    assert b["seq"].shape == (att.shape[0], 3, 20)
    assert np.isfinite(np.asarray(b["scores"])).all()


def test_lstm_scheduled_sampling_runs():
    cfg, data, model, tx, state = setup_lstm("fc")
    batch = data.get_batch("train")
    f = steps_mod._flat(batch)
    out = model.apply(state.params, jnp.asarray(batch["att_feats"]),
                      jnp.asarray(batch["att_masks"]), f["labels"],
                      deterministic=True, ss_prob=0.5,
                      rngs={"ss": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out["logprob"])).all()


@pytest.mark.slow
def test_lstm_classic_scst_step():
    cfg, data, model, tx, state = setup_lstm("fc")
    init_scorer("corpus")
    sample_fn = steps_mod.make_rl_sample(model, sample_method="sample",
                                         sample_n=cfg.train_sample_n)
    scst_step = steps_mod.make_scst_step(model, tx, cfg)
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    samples = sample_fn(state.params, jax.random.PRNGKey(0), att, am)
    assert set(samples) == {"sample", "greedy"}
    rewards = steps_mod.rl_host_scores(samples, batch["gts"], cfg,
                                       classic_scst=True)["scst_reward"]
    # scst_step donates its state: snapshot params before stepping
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    state2, metrics = scst_step(state, jax.random.PRNGKey(1), att, am,
                                samples, jnp.asarray(rewards))
    assert np.isfinite(float(metrics["loss"]))
    diff = sum(float(jnp.abs(jnp.asarray(a) - b).sum()) for a, b in
               zip(p0, jax.tree_util.tree_leaves(state2.params)))
    assert diff > 0


@pytest.mark.slow
def test_lstm_precompute_matches_inline():
    """The hoisted loop-invariant projections (p_att / ctx2att / dec_att
    K,V in the AR cache) must produce bit-identical step logprobs to the
    inline per-step computation (pre=None fallback)."""
    for cm in ["updown", "aoa", "att2in2"]:
        cfg, data, model, tx, state = setup_lstm(cm)
        batch = data.get_batch("train")
        att = jnp.asarray(batch["att_feats"][:2])
        am = jnp.asarray(batch["att_masks"][:2])
        memory = model.apply(state.params, att, am, method="encode")
        src_mask = am.astype(bool)
        cache = model.apply(state.params, memory, 8, method="init_ar_cache")
        it = jnp.array([5, 7], jnp.int32)
        lp_pre, _ = model.apply(state.params, it, 0, cache, src_mask,
                                method="ar_step")
        lp_inline, _ = model.apply(
            state.params, it, 0, {**cache, "pre": None}, src_mask,
            method="ar_step")
        np.testing.assert_array_equal(np.asarray(lp_pre),
                                      np.asarray(lp_inline))
