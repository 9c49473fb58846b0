"""Training-step tests: XE step runs and learns on synthetic data for every
train_mode family; RL stage (sample -> host scores -> differentiable
re-score update) runs end to end; schedules match the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boficap_tpu.config import default_config, finalize
from boficap_tpu.data.dataset import CaptionData
from boficap_tpu.models.boficap import build_model
from boficap_tpu.rewards import init_scorer
from boficap_tpu.train import optim as optim_mod
from boficap_tpu.train import steps as steps_mod
from boficap_tpu.train.state import create_state


def make_cfg(train_mode="UIC"):
    cfg = default_config()
    cfg.train_mode = train_mode
    cfg.input_json = "synthetic"
    cfg.input_att_dir = "synthetic"
    cfg.batch_size = 2
    cfg.max_boxes = 9
    cfg.N_enc = cfg.N_dec = 1
    cfg.d_model = 32
    cfg.d_ff = 64
    cfg.num_att_heads = 2
    cfg.noamopt = True
    cfg.noamopt_warmup = 10
    cfg.train_sample_n = 2
    cfg.id = "t"
    finalize(cfg)
    return cfg


def setup(train_mode="UIC"):
    cfg = make_cfg(train_mode)
    data = CaptionData(cfg)
    model = build_model(cfg, data.vocab_size)
    batch = data.get_batch("train")
    f = steps_mod._flat(batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        jnp.asarray(batch["att_feats"]), jnp.asarray(batch["att_masks"]),
        f["labels"], f.get("phrase_num"), f.get("phrase_length"),
        f.get("phrase_syn"), glat_p=-1.0, deterministic=True)
    tx = optim_mod.build_optimizer(cfg)
    state = create_state(params, tx)
    return cfg, data, model, tx, state


@pytest.mark.parametrize("mode", ["AIC", "NNAIC", "SAIC", "NAIC", "UIC", "UIC_s"])
def test_xe_step_learns(mode):
    cfg, data, model, tx, state = setup(mode)
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    # NNAIC: the length-MSE term rides a NO-gradient argmax head (reference
    # quirk, replicated) and jumps discretely — assert on the word loss
    key = "word_loss" if mode == "NNAIC" else "loss"
    losses = []
    for i in range(4):
        state, metrics = steps_mod.run_xe_step(
            step_fn, state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics[key]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]       # same batch: loss must drop


def test_xe_glat_and_drop_worst():
    cfg, data, model, tx, state = setup("UIC")
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    state, m = steps_mod.run_xe_step(step_fn, state, batch,
                                     jax.random.PRNGKey(0), glat_p=0.3,
                                     drop_worst=0.2)
    assert np.isfinite(float(m["loss"]))
    assert "glat_mismatch" in m


def test_rl_stage_end_to_end():
    """Sampler plumbing (shapes) + host scores + rl_step gradient flow.

    An untrained model legitimately emits empty plans (zero advantage, zero
    grad), so the gradient-flow half of the test drives rl_step with
    ground-truth-derived plans and random scores."""
    cfg, data, model, tx, state = setup("UIC")
    cfg.structure_loss_type = "new_self_critical"
    init_scorer("corpus")
    sample_fn = steps_mod.make_rl_sample(model, sample_method="sample",
                                         sample_n=cfg.train_sample_n)
    rl_step = steps_mod.make_rl_step(model, tx, cfg)
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    samples = sample_fn(state.params, jax.random.PRNGKey(0), att, am)
    assert set(samples) == {"sa", "na"}
    assert samples["sa"]["seq"].shape == (
        cfg.batch_size * cfg.train_sample_n, 20)
    scores = steps_mod.rl_host_scores(samples, batch["gts"], cfg)
    assert scores["sa"].shape == (cfg.batch_size, cfg.train_sample_n)

    # gradient-flow: gt-derived plans, non-degenerate random scores
    n = cfg.train_sample_n
    f = steps_mod._flat(batch)
    rows = np.arange(cfg.batch_size) * batch["labels"].shape[1]  # 1 cap/img
    idx = np.repeat(rows, n)
    fake = {
        "sa": {"seq": f["labels"][idx, 1:-1],
               "phrase_length": f["phrase_length"][idx, 1:-1],
               "phrase_syn": f["phrase_syn"][idx, 1:-1]},
        "na": {"seq": f["labels"][idx, 1:-1],
               "phrase_length": f["phrase_length"][idx, 1:-1],
               "phrase_syn": f["phrase_syn"][idx, 1:-1]},
    }
    rand_scores = {k: jnp.asarray(
        np.random.RandomState(3).rand(cfg.batch_size, n).astype(np.float32))
        for k in fake}
    # rl_step donates its state: snapshot params before stepping
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    state2, metrics = rl_step(state, jax.random.PRNGKey(1), att, am,
                              fake, rand_scores)
    assert np.isfinite(float(metrics["loss"]))
    diff = sum(float(jnp.abs(jnp.asarray(a) - b).sum()) for a, b in
               zip(p0, jax.tree_util.tree_leaves(state2.params)))
    assert diff > 0


@pytest.mark.slow
def test_rl_rescore_matches_sampling_logprobs():
    """The differentiable re-score reproduces the sampling loop's stored
    logprobs at supervised positions (the central RL-correctness claim)."""
    cfg, data, model, tx, state = setup("UIC")
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import BoFiCap
    memory = model.apply(state.params, att, am, deterministic=True,
                         method=BoFiCap.encode)
    src = am.astype(bool)
    sa = bf.sa_decode(model, state.params, jax.random.PRNGKey(3), memory,
                      src, sample_method="greedy")
    na = bf.na_decode(model, state.params, jax.random.PRNGKey(4), memory,
                      src, sample_method="greedy")
    lps = steps_mod.rl_rescore(model, state.params, jax.random.PRNGKey(0),
                               att, am, {"sa": sa, "na": na}, sample_n=1,
                               deterministic=True)
    for key, s in (("sa_logprob", sa), ("na_logprob", na)):
        total = np.asarray(s["phrase_length"]).sum(-1)
        got = np.asarray(lps[key])                 # dense [B, L, V]
        seq = np.asarray(s["seq"])
        got_tok = np.take_along_axis(
            got, seq[:, :, None].astype(np.int64), axis=2)[:, :, 0]
        want = np.asarray(s["tok_logprobs"])
        for b in range(got.shape[0]):
            n = int(total[b])
            if n == 0:
                continue
            np.testing.assert_allclose(got_tok[b, :n], want[b, :n],
                                       rtol=2e-2, atol=1e-3)


def test_noam_schedule_matches_reference_formula():
    sched = optim_mod.noam_schedule(512, 1.0, 2000)
    for step in (0, 10, 1999, 2000, 10000):
        s = step + 1
        want = 512 ** -0.5 * min(s ** -0.5, s * 2000 ** -1.5)
        assert float(sched(step)) == pytest.approx(want, rel=1e-6)


def test_plateau_tracker():
    t = optim_mod.PlateauTracker(factor=0.5, patience=1)
    assert t.update(1.0) == 1.0
    assert t.update(0.9) == 1.0          # first bad
    assert t.update(0.8) == 0.5          # second bad -> drop
    assert t.update(2.0) == 0.5          # new best keeps scale


def test_epoch_schedules():
    cfg = make_cfg()
    cfg.learning_rate = 1.0
    cfg.learning_rate_decay_start = 0
    cfg.learning_rate_decay_every = 2
    cfg.learning_rate_decay_rate = 0.5
    assert optim_mod.epoch_lr(cfg, 0) == 1.0
    assert optim_mod.epoch_lr(cfg, 1) == 1.0 * 0.5 ** 0
    assert optim_mod.epoch_lr(cfg, 2) == 0.5
    assert optim_mod.epoch_lr(cfg, 4) == 0.25
    cfg.glancing_token = True
    cfg.unmasked_rate_decay_start = 2
    cfg.unmasked_rate_start = 0.5
    cfg.unmasked_rate_decay_every = 1
    cfg.unmasked_rate_decay_rate = 0.1
    cfg.unmasked_rate_end = 0.2
    assert optim_mod.glat_rate(cfg, 0) == 0.5
    assert optim_mod.glat_rate(cfg, 2) == pytest.approx(0.4)
    assert optim_mod.glat_rate(cfg, 10) == pytest.approx(0.2)


def test_ss_sa_scheduled_sampling_step():
    """UIC scheduled-sampling path: loop + differentiable re-score + loss."""
    cfg, data, model, tx, state = setup("UIC")
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    # xe_step donates its state: snapshot params before stepping
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    state2, m = steps_mod.run_xe_step(step_fn, state, batch,
                                      jax.random.PRNGKey(0), ss_prob=0.25)
    assert np.isfinite(float(m["loss"]))
    diff = sum(float(jnp.abs(jnp.asarray(a) - b).sum()) for a, b in
               zip(p0, jax.tree_util.tree_leaves(state2.params)))
    assert diff > 0


def test_pb_pad_xe_step_learns():
    """Legacy PB_pad family: packed-layout forward + two-term loss."""
    cfg, data, model, tx, state = setup("PB_pad")
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    assert "pb_labels" in batch and "pb_mask" in batch
    # gt packing covers exactly the caption words (+bos col)
    nwords = (batch["labels"].reshape(-1, 22)[:, 1:-1] != 0).sum()
    assert (batch["pb_labels"] != 0).sum() == nwords + batch["pb_labels"].shape[0]
    losses = []
    for i in range(4):
        state, metrics = steps_mod.run_xe_step(
            step_fn, state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_rl_sample_uic_s_three_branches():
    """UIC_s RL sampling returns AR+SA+NA branches and the rl step updates."""
    cfg, data, model, tx, state = setup("UIC_s")
    cfg.structure_loss_type = "new_self_critical"
    init_scorer("corpus")
    sample_fn = steps_mod.make_rl_sample(model, sample_method="sample",
                                         sample_n=cfg.train_sample_n)
    rl_step = steps_mod.make_rl_step(model, tx, cfg)
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    samples = sample_fn(state.params, jax.random.PRNGKey(0), att, am)
    assert set(samples) == {"sa", "na", "sample"}
    scores = steps_mod.rl_host_scores(samples, batch["gts"], cfg)
    state2, metrics = rl_step(state, jax.random.PRNGKey(1), att, am,
                              samples, {k: jnp.asarray(v)
                                        for k, v in scores.items()})
    assert np.isfinite(float(metrics["loss"]))


def test_resume_across_optimizer_change(tmp_path):
    """Stage-2 resume with a different optimizer type (XE noam -> RL plain)
    must load params and fall back to a fresh optimizer state instead of
    crashing on the optax opt_state structure mismatch (the reference's
    NoamOpt wraps outside optimizer.pth, so its stage-2 resume behaves the
    same way)."""
    from boficap_tpu.train.state import (create_state, resume_state,
                                         save_checkpoint)

    cfg1 = make_cfg("AIC")                               # noam stage
    model = build_model(cfg1, 44)
    labels = jnp.zeros((4, 22), jnp.int32).at[:, 0].set(1)
    att = jnp.zeros((2, 9, 2048), jnp.float32)
    am = jnp.ones((2, 9), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, att, am, labels,
                        deterministic=True)
    tx1 = optim_mod.build_optimizer(cfg1)
    st1 = create_state(params, tx1)
    cfg1.checkpoint_path = str(tmp_path)
    save_checkpoint(cfg1, st1, infos={"iter": 1, "epoch": 1,
                                      "opt": dict(cfg1)}, histories={})

    cfg2 = make_cfg("AIC")
    cfg2.noamopt = False                                  # plain stage
    cfg2.start_from = str(tmp_path)
    tx2 = optim_mod.build_optimizer(cfg2)
    st2 = create_state(params, tx2)
    fresh_opt = st2.opt_state
    st2 = resume_state(cfg2, st2)                         # must not raise
    a = jax.tree_util.tree_leaves(st2.params)
    b = jax.tree_util.tree_leaves(params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    assert jax.tree_util.tree_structure(st2.opt_state) == \
        jax.tree_util.tree_structure(fresh_opt)

    # same-optimizer resume still restores the saved opt_state
    cfg3 = make_cfg("AIC")
    cfg3.start_from = str(tmp_path)
    st3 = resume_state(cfg3, create_state(params, optim_mod.build_optimizer(cfg3)))
    assert jax.tree_util.tree_structure(st3.opt_state) == \
        jax.tree_util.tree_structure(st1.opt_state)


def test_uic_s_drop_worst_step():
    """UIC_s + drop-worst used to crash (tuic_loss ignored reduction and
    drop_worst indexed a scalar); now the per-sample 'none' path feeds it."""
    cfg, data, model, tx, state = setup("UIC_s")
    step_fn = steps_mod.make_xe_step(model, tx)
    batch = data.get_batch("train")
    state, m = steps_mod.run_xe_step(step_fn, state, batch,
                                     jax.random.PRNGKey(0), drop_worst=0.25)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_rl_step_mixes_lm_loss_below_weight_one():
    """structure_loss_weight < 1 adds the (1-w)*lm_loss XE term per branch
    (reference loss_wrapper.py:169/220-222) — requires the gt batch and
    reports lm_loss in the metrics."""
    cfg, data, model, tx, state = setup("UIC")
    cfg.structure_loss_type = "new_self_critical"
    cfg.structure_loss_weight = 0.5
    init_scorer("corpus")
    rl_step = steps_mod.make_rl_step(model, tx, cfg)
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    n = cfg.train_sample_n
    f = steps_mod._flat(batch)
    rows = np.arange(cfg.batch_size) * batch["labels"].shape[1]
    idx = np.repeat(rows, n)
    fake = {k: {"seq": f["labels"][idx, 1:-1],
                "phrase_length": f["phrase_length"][idx, 1:-1],
                "phrase_syn": f["phrase_syn"][idx, 1:-1]}
            for k in ("sa", "na")}
    scores = {k: jnp.asarray(np.random.RandomState(3).rand(
        cfg.batch_size, n).astype(np.float32)) for k in fake}
    gt = {k: jnp.asarray(batch[k]) for k in
          ("labels", "phrase_num", "phrase_length", "phrase_syn", "masks")}
    state2, m = rl_step(state, jax.random.PRNGKey(1), att, am, fake,
                        scores, gt=gt)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["lm_loss"])) and float(m["lm_loss"]) > 0
    # without the gt batch the step must refuse, not silently drop the term
    import pytest as _pytest
    state3 = create_state(state2.params, tx)
    with _pytest.raises(ValueError, match="lm_loss"):
        rl_step(state3, jax.random.PRNGKey(2), att, am, fake, scores,
                gt=None)


def test_margin_loss_gets_raw_logits():
    """The margin family consumes raw generator logits (reference
    output_logsoftmax=False): rl_rescore(use_logsoftmax=False) output rows
    must NOT be normalized log-probs."""
    cfg, data, model, tx, state = setup("AIC")
    batch = data.get_batch("train")
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    n = cfg.train_sample_n
    f = steps_mod._flat(batch)
    rows = np.arange(cfg.batch_size) * batch["labels"].shape[1]
    idx = np.repeat(rows, n)
    fake = {"sample": {"seq": f["labels"][idx, 1:-1]}}
    lps = steps_mod.rl_rescore(model, state.params, jax.random.PRNGKey(0),
                               att, am, fake, n, use_logsoftmax=False)
    logits = np.asarray(lps["a_logprob"], np.float32)
    sums = np.exp(logits).sum(-1)
    assert not np.allclose(sums, 1.0, atol=1e-2)       # raw logits
    lps2 = steps_mod.rl_rescore(model, state.params, jax.random.PRNGKey(0),
                                att, am, fake, n, use_logsoftmax=True)
    lp = np.asarray(lps2["a_logprob"], np.float32)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-3)


def test_optimizer_reference_semantics():
    """misc.py:114-130 parity: 'sgd' is PLAIN (p -= lr*(g + wd*p)); 'sgdm'
    adds momentum; adam's weight_decay is torch-style coupled L2 (the decay
    rides the gradient into the moment estimates)."""
    import optax
    from boficap_tpu.config import default_config
    from boficap_tpu.train.optim import make_base_opt
    cfg = default_config()
    cfg.optim = "sgd"
    cfg.weight_decay = 0.1
    p = {"w": jnp.array([2.0])}
    g = {"w": jnp.array([0.5])}
    tx = make_base_opt(cfg, 0.1)
    upd, _ = tx.update(g, tx.init(p), p)
    # plain sgd + coupled L2: -lr * (g + wd*p) = -0.1 * (0.5 + 0.2)
    np.testing.assert_allclose(np.asarray(upd["w"]), [-0.07], rtol=1e-6)
    cfg.optim = "sgdm"
    cfg.weight_decay = 0.0
    txm = make_base_opt(cfg, 0.1)
    st = txm.init(p)
    u1, st = txm.update(g, st, p)
    u2, st = txm.update(g, st, p)
    assert abs(float(u2["w"][0])) > abs(float(u1["w"][0]))  # momentum accumulates
    cfg.optim = "adam"
    cfg.weight_decay = 0.1
    txa = make_base_opt(cfg, 0.1)
    sta = txa.init(p)
    # zero gradient: coupled L2 still drives an update THROUGH adam's
    # normalizer (|update| ~ lr), unlike zero-decay adam (no update)
    ua, _ = txa.update({"w": jnp.zeros(1)}, sta, p)
    assert abs(float(ua["w"][0])) > 1e-3


def test_remat_matches_plain():
    """cfg.remat=1 rematerializes enc/dec layers in the backward pass
    (nn.remat / jax.checkpoint): the parameter TREE must be identical
    (checkpoints interchange), the loss bit-identical, and grads equal to
    reassociation tolerance — remat only changes what is stored vs
    recomputed.  The memory lever for saturating-batch training
    (BENCH_NOTES r3: the b256x5 XE step OOMs on the co-tenant-shared
    chip without it)."""
    import jax
    import jax.numpy as jnp
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.steps import xe_loss_fn

    def make(remat):
        cfg = default_config()
        cfg.train_mode = "UIC"
        cfg.N_enc = cfg.N_dec = 2
        cfg.N_len = 1
        cfg.d_model = 32
        cfg.d_ff = 64
        cfg.num_att_heads = 2
        cfg.remat = remat
        cfg.id = "remat_t"
        finalize(cfg)
        return build_model(cfg, 40)

    r = np.random.RandomState(7)
    B, S = 3, 2
    att = jnp.asarray(r.randn(B, 9, 2048).astype(np.float32))
    am = jnp.ones((B, 9), jnp.float32)
    lab = np.zeros((B, S, 22), np.int32)
    lab[:, :, 0] = 1
    lab[:, :, 1:7] = r.randint(4, 44, (B, S, 6))
    lab[:, :, 7] = 2
    pl = np.zeros((B, S, 22), np.int32)
    pl[:, :, 0] = 1
    pl[:, :, 1] = 3
    pl[:, :, 2] = 3
    ps = np.zeros((B, S, 22), np.int32)
    ps[:, :, 0] = 1
    ps[:, :, 1] = 5
    ps[:, :, 2] = 4
    pn = np.full((B, S), 3, np.int32)
    batch = {"att_feats": att, "att_masks": am, "labels": jnp.asarray(lab),
             "phrase_num": jnp.asarray(pn), "phrase_length": jnp.asarray(pl),
             "phrase_syn": jnp.asarray(ps),
             "masks": jnp.asarray((lab != 0).astype(np.float32))}
    m0, m1 = make(0), make(1)
    init_args = (att, am, jnp.asarray(lab[:, 0]), jnp.asarray(pn[:, 0]),
                 jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]))
    rngs = {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)}
    p0 = m0.init(rngs, *init_args, glat_p=None, deterministic=True)
    p1 = m1.init(rngs, *init_args, glat_p=None, deterministic=True)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def lf(model):
        def f(params):
            l, _ = xe_loss_fn(model, params, batch, jax.random.PRNGKey(2),
                              glat_p=None, deterministic=True)
            return l
        return f

    l0, g0 = jax.value_and_grad(lf(m0))(p0)
    l1, g1 = jax.value_and_grad(lf(m1))(p0)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_remat_training_step_with_dropout():
    """remat must thread the dropout/glat rngs through nn.remat (the
    equivalence test above runs deterministic; this pins the TRAINING path
    — dropout active, glancing on — compiles and optimizes)."""
    import jax
    import jax.numpy as jnp
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import make_xe_step

    cfg = default_config()
    cfg.train_mode = "UIC"
    cfg.N_enc = cfg.N_dec = 2
    cfg.N_len = 1
    cfg.d_model = 32
    cfg.d_ff = 64
    cfg.num_att_heads = 2
    cfg.remat = 1
    cfg.id = "remat_drop"
    finalize(cfg)
    model = build_model(cfg, 40)
    r = np.random.RandomState(1)
    B, S = 3, 2
    att = jnp.asarray(r.randn(B, 9, 2048).astype(np.float32))
    am = jnp.ones((B, 9), jnp.float32)
    lab = np.zeros((B, S, 22), np.int32)
    lab[:, :, 0] = 1
    lab[:, :, 1:7] = r.randint(4, 44, (B, S, 6))
    lab[:, :, 7] = 2
    pl = np.zeros((B, S, 22), np.int32)
    pl[:, :, 0] = 1
    pl[:, :, 1] = 3
    pl[:, :, 2] = 3
    ps = np.zeros((B, S, 22), np.int32)
    ps[:, :, 0] = 1
    ps[:, :, 1] = 5
    ps[:, :, 2] = 4
    pn = np.full((B, S), 3, np.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        att, am, jnp.asarray(lab[:, 0]), jnp.asarray(pn[:, 0]),
        jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]), glat_p=None,
        deterministic=True)
    tx = optax.adam(1e-3)
    state = create_state(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0, params), tx)
    step = make_xe_step(model, tx)
    targs = (att, am) + tuple(jnp.asarray(x) for x in (lab, pn, pl, ps))
    losses = []
    for i in range(4):
        state, m = step(state, *targs, None, jax.random.PRNGKey(5 + i),
                        jnp.float32(0.3))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_fused_adam_matches_optax():
    """fused_adam (flat moments, clip/decay folded) must walk the SAME
    parameter trajectory as the reference-semantics optax chain
    clip -> add_decayed_weights -> adam (see build_optimizer): element math
    is identical, only the layout (one [P] buffer vs 298 leaves) differs."""
    import optax

    from boficap_tpu.train.optim import fused_adam

    r = np.random.RandomState(0)
    params = {"a": jnp.asarray(r.randn(7, 5), jnp.float32),
              "b": {"w": jnp.asarray(r.randn(11), jnp.float32),
                    "s": jnp.asarray(r.randn(1), jnp.float32)}}
    ref_tx = optax.chain(optax.clip(0.1), optax.add_decayed_weights(1e-3),
                         optax.adam(3e-4, b1=0.9, b2=0.98, eps=1e-9))
    fus_tx = fused_adam(3e-4, b1=0.9, b2=0.98, eps=1e-9, clip_value=0.1,
                        weight_decay=1e-3)
    p_ref, p_fus = params, params
    s_ref, s_fus = ref_tx.init(p_ref), fus_tx.init(p_fus)
    for i in range(6):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.RandomState(10 + i).randn(*x.shape) * 0.3,
                jnp.float32), params)
        u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fus, s_fus = fus_tx.update(g, s_fus, p_fus)
        p_fus = optax.apply_updates(p_fus, u_fus)
    for lr, lf in zip(jax.tree_util.tree_leaves(p_ref),
                      jax.tree_util.tree_leaves(p_fus)):
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                                   rtol=1e-6, atol=1e-7)


def test_fused_adam_schedule_matches_optax():
    """Schedule handling: fused_adam(schedule) must consume the same
    pre-increment step count optax.scale_by_schedule does (noamopt path)."""
    import optax

    from boficap_tpu.train.optim import fused_adam, noam_schedule

    sched = noam_schedule(64, 1.0, 20)
    params = {"w": jnp.ones((4, 3), jnp.float32)}
    ref_tx = optax.adam(sched, b1=0.9, b2=0.98, eps=1e-9)
    fus_tx = fused_adam(sched, b1=0.9, b2=0.98, eps=1e-9)
    p_ref = p_fus = params
    s_ref, s_fus = ref_tx.init(p_ref), fus_tx.init(p_fus)
    for i in range(5):
        g = {"w": jnp.full((4, 3), 0.1 * (i + 1), jnp.float32)}
        u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fus, s_fus = fus_tx.update(g, s_fus, p_fus)
        p_fus = optax.apply_updates(p_fus, u_fus)
    np.testing.assert_allclose(np.asarray(p_ref["w"]),
                               np.asarray(p_fus["w"]),
                               rtol=1e-6, atol=1e-7)


def test_grad_accum_matches_monolithic():
    """make_xe_step(grad_accum=G) must produce the SAME update as the
    monolithic step when the stochastic pieces are off (dropout=0, glat
    disabled): the mean XE loss over the batch equals the mean of
    equal-size microbatch means, and averaged microbatch grads equal the
    full-batch grads to reassociation tolerance.  This is bench's (and
    opts.py grad_accum's) single-chip route to large batches — the
    monolithic b256x5 step runs near HBM capacity where XLA auto-remat
    costs ~1.5x (BENCH_NOTES r5)."""
    import jax
    import jax.numpy as jnp
    import optax
    from boficap_tpu.config import default_config, finalize
    from boficap_tpu.models.boficap import build_model
    from boficap_tpu.train.state import create_state
    from boficap_tpu.train.steps import make_xe_step

    cfg = default_config()
    cfg.train_mode = "UIC"
    cfg.N_enc = cfg.N_dec = 2
    cfg.N_len = 1
    cfg.d_model = 32
    cfg.d_ff = 64
    cfg.num_att_heads = 2
    cfg.drop_prob_lm = 0.0       # stochastic masks off: exact comparison
    cfg.dropout = 0.0            # (both knobs — att_embed AND transformer)
    cfg.id = "accum_t"
    finalize(cfg)
    model = build_model(cfg, 40)

    r = np.random.RandomState(11)
    B, S = 4, 2
    att = jnp.asarray(r.randn(B, 9, 2048).astype(np.float32))
    am = jnp.ones((B, 9), jnp.float32)
    lab = np.zeros((B, S, 22), np.int32)
    lab[:, :, 0] = 1
    lab[:, :, 1:7] = r.randint(4, 44, (B, S, 6))
    lab[:, :, 7] = 2
    pl = np.zeros((B, S, 22), np.int32)
    pl[:, :, 0] = 1
    pl[:, :, 1] = 3
    pl[:, :, 2] = 3
    ps = np.zeros((B, S, 22), np.int32)
    ps[:, :, 0] = 1
    ps[:, :, 1] = 5
    ps[:, :, 2] = 4
    pn = np.full((B, S), 3, np.int32)
    targs = (att, am, jnp.asarray(lab), jnp.asarray(pn), jnp.asarray(pl),
             jnp.asarray(ps), None)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "glat": jax.random.PRNGKey(1)},
        att, am, jnp.asarray(lab[:, 0]), jnp.asarray(pn[:, 0]),
        jnp.asarray(pl[:, 0]), jnp.asarray(ps[:, 0]),
        glat_p=-1.0, deterministic=True)
    # SGD: the update is LINEAR in the grads, so the param comparison
    # bounds the grad difference directly (adam's rsqrt amplifies fp-
    # reassociation-level grad noise into ±lr flips near zero moments)
    tx = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(5)

    def run(G):
        step = make_xe_step(model, tx, grad_accum=G)
        st = create_state(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0, params),
            tx)
        st, m = step(st, *targs, rng, None)     # glat disabled
        return st, m

    st1, m1 = run(1)
    st2, m2 = run(2)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    l1 = jax.tree_util.tree_leaves(st1.params)
    l2 = jax.tree_util.tree_leaves(st2.params)
    # atol covers near-zero leaves (embedding/bias grads for rarely-hit
    # vocab rows reassociate across the microbatch boundary; measured
    # residue <=2.1e-5 after the 1e-2-lr sgd step), rtol the O(1)
    # weights.  A semantic difference (e.g. the dropout-mask coupling
    # this test once caught) shows up 4 orders of magnitude larger.
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=5e-5)

    # guard: drop_worst is whole-batch top-k; accumulation must refuse it
    step_bad = make_xe_step(model, tx, grad_accum=2)
    st = create_state(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x) + 0, params), tx)
    with pytest.raises(ValueError, match="drop_worst"):
        step_bad(st, *targs, rng, None, drop_worst=0.2)
