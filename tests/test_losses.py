"""Loss math vs loopy numpy oracles of the reference criteria
(captioning/modules/losses.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boficap_tpu import losses as Lm
from tests.oracles import random_phrase_row

L = 12
V = 30


def _rand_logprob(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def _phrase_batch(rng, B):
    labels, pn, pl, syn = zip(
        *[random_phrase_row(rng, L, vocab=V) for _ in range(B)])
    return (np.stack(labels), np.array(pn, np.int64), np.stack(pl),
            np.stack(syn))


def oracle_lm(logprob, target, mask):
    B, T = logprob.shape[:2]
    tot, den = 0.0, 0.0
    for i in range(B):
        for t in range(T):
            tot += -logprob[i, t, target[i, t]] * mask[i, t]
            den += mask[i, t]
    return tot / den


def test_lm_loss(rng):
    B = 4
    logprob = _rand_logprob(rng, (B, L, V))
    target = rng.randint(0, V, size=(B, L))
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    mask[:, 0] = 1
    got = float(Lm.lm_loss(jnp.array(logprob), jnp.array(target),
                           jnp.array(mask)))
    assert got == pytest.approx(oracle_lm(logprob, target, mask), rel=1e-5)


def test_label_smoothing_matches_lm_at_zero(rng):
    B = 3
    logprob = _rand_logprob(rng, (B, L, V))
    target = rng.randint(0, V, size=(B, L))
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    mask[:, 0] = 1
    a = float(Lm.lm_loss(jnp.array(logprob), jnp.array(target), jnp.array(mask)))
    b = float(Lm.label_smoothing_loss(jnp.array(logprob), jnp.array(target),
                                      jnp.array(mask), smoothing=0.0))
    assert b == pytest.approx(a, rel=1e-5)


def test_label_smoothing_oracle(rng):
    """Full KL(true_dist ‖ model) oracle (losses.py:437-464)."""
    B, sm = 3, 0.1
    logprob = _rand_logprob(rng, (B, L, V))
    target = rng.randint(0, V, size=(B, L))
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    mask[:, 0] = 1
    fill = sm / (V - 1)
    conf = 1.0 - sm
    tot, den = 0.0, 0.0
    for i in range(B):
        for t in range(L):
            td = np.full(V, fill)
            td[target[i, t]] = conf
            kl = (td * (np.log(td) - logprob[i, t])).sum()
            tot += kl * mask[i, t]
            den += mask[i, t]
    got = float(Lm.label_smoothing_loss(jnp.array(logprob), jnp.array(target),
                                        jnp.array(mask), smoothing=sm))
    assert got == pytest.approx(tot / den, rel=1e-4)


def oracle_naic(len_lp, syn_lp, word_lp, pn, pl, syn, labels):
    """losses.py:273-312: word/length/syn NLL, all over the word-mask denom."""
    B = labels.shape[0]
    real = labels[:, 1:-1]
    wl = ll = sl = den = 0.0
    S = len_lp.shape[1]
    for i in range(B):
        nw = int(pl[i].sum()) - 1
        den += nw
        for t in range(nw):
            wl += -word_lp[i, t, real[i, t]]
        for s in range(min(int(pn[i]), S)):
            ll += -len_lp[i, s, pl[i, 1 + s]]
            sl += -syn_lp[i, s, syn[i, 1 + s]]
    return wl / den, ll / den, sl / den


def test_naic_loss(rng):
    B = 5
    labels, pn, pl, syn = _phrase_batch(rng, B)
    S = L + 1
    len_lp = _rand_logprob(rng, (B, S, 20))
    syn_lp = _rand_logprob(rng, (B, S, 10))
    word_lp = _rand_logprob(rng, (B, L, V))
    out = Lm.naic_loss(jnp.array(len_lp), jnp.array(syn_lp),
                       jnp.array(word_lp), jnp.array(pn), jnp.array(pl),
                       jnp.array(syn), jnp.array(labels))
    w, l, s = oracle_naic(len_lp, syn_lp, word_lp, pn, pl, syn, labels)
    assert float(out["word_loss"]) == pytest.approx(w, rel=1e-5)
    assert float(out["length_loss"]) == pytest.approx(l, rel=1e-5)
    assert float(out["syn_loss"]) == pytest.approx(s, rel=1e-5)
    assert float(out["loss"]) == pytest.approx(w + l + s, rel=1e-5)


def test_uic_loss_self_dis(rng):
    """UIC = SA three-term + NA three-term + KL(NA ← SA) (losses.py:315-369)."""
    B = 4
    labels, pn, pl, syn = _phrase_batch(rng, B)
    S = L + 1
    args = {}
    for k in ("sa", "na"):
        args[k] = (_rand_logprob(rng, (B, S, 20)),
                   _rand_logprob(rng, (B, S, 10)),
                   _rand_logprob(rng, (B, L, V)))
    out = Lm.uic_loss(*(jnp.array(a) for a in args["sa"]),
                      *(jnp.array(a) for a in args["na"]),
                      jnp.array(pn), jnp.array(pl), jnp.array(syn),
                      jnp.array(labels), self_dis=True)
    sw, sl, ss = oracle_naic(*args["sa"], pn, pl, syn, labels)
    nw, nl, ns = oracle_naic(*args["na"], pn, pl, syn, labels)
    # KL oracle
    real = labels[:, 1:-1]
    kl = den = 0.0
    for i in range(B):
        nwords = int(pl[i].sum()) - 1
        den += nwords
        for t in range(nwords):
            p_sa = np.exp(args["sa"][2][i, t])
            kl += (p_sa * (args["sa"][2][i, t] - args["na"][2][i, t])).sum()
    expect = sw + sl + ss + nw + nl + ns + kl / den
    assert float(out["kl_loss"]) == pytest.approx(kl / den, rel=1e-4)
    assert float(out["loss"]) == pytest.approx(expect, rel=1e-4)


def test_reward_criterion(rng):
    """losses.py:7-26: mask includes up to & incl. first eos position."""
    B = 4
    lp = _rand_logprob(rng, (B, L, V))
    seq = rng.randint(0, V, size=(B, L))
    seq[:, -3:] = 0
    reward = rng.randn(B, L).astype(np.float32)
    got = float(Lm.reward_criterion(jnp.array(lp), jnp.array(seq),
                                    jnp.array(reward)))
    tot = den = 0.0
    for i in range(B):
        for t in range(L):
            m = 1.0 if t == 0 else float(seq[i, t - 1] > 0)
            tot += -lp[i, t, seq[i, t]] * reward[i, t] * m
            den += m
    assert got == pytest.approx(tot / den, rel=1e-5)


def test_new_self_critical(rng):
    """losses.py:157-176 leave-one-out baseline."""
    n_img, n = 3, 5
    B = n_img * n
    lp = _rand_logprob(rng, (B, L, V))
    seq = rng.randint(1, V, size=(B, L))
    seq[:, -2:] = 0
    scores = rng.randn(n_img, n).astype(np.float32)
    out = Lm.structure_loss(jnp.array(lp), jnp.array(seq), jnp.array(scores),
                            "new_self_critical")
    base = (scores.sum(1, keepdims=True) - scores) / (n - 1)
    adv = (scores - base).reshape(-1)
    tot = den = 0.0
    for i in range(B):
        for t in range(L):
            m = 1.0 if t == 0 else float(seq[i, t - 1] > 0)
            tot += -lp[i, t, seq[i, t]] * adv[i] * m
            den += m
    assert float(out["loss"]) == pytest.approx(tot / den, rel=1e-4)


def test_drop_worst():
    per = jnp.array([1.0, 5.0, 2.0, 9.0])
    # rate 0.5 -> keep 2 lowest: (1+2)/2
    assert float(Lm.drop_worst(per, 0.5)) == pytest.approx(1.5)


def test_structure_loss_entropy_bonus_and_raw_reward(rng):
    """The entropy bonus folds [B] entropies into the [n_img, n] score
    layout (reference entropy.view(-1, seq_per_img), losses.py:59), and
    out['reward'] reports the RAW scores, before the bonus (losses.py:54)."""
    n_img, n = 2, 3
    B = n_img * n
    lp = _rand_logprob(rng, (B, L, V))
    seq = rng.randint(1, V, size=(B, L))
    scores = rng.randn(n_img, n).astype(np.float32)
    out = Lm.structure_loss(jnp.array(lp), jnp.array(seq), jnp.array(scores),
                            "new_self_critical", entropy_reward_weight=0.5)
    np.testing.assert_allclose(np.asarray(out["reward"]), scores)
    base = Lm.structure_loss(jnp.array(lp), jnp.array(seq),
                             jnp.array(scores), "new_self_critical")
    # a non-degenerate entropy bonus changes the advantage, hence the loss
    assert float(out["loss"]) != pytest.approx(float(base["loss"]))


def test_tuic_loss_reduction_none():
    """UIC_s/u criterion under drop-worst: per-sample losses whose mean
    relates to the 'mean' reduction through the per-row mask weights
    (the reference's own 'none' path is broken — losses.py:408-414)."""
    r = np.random.RandomState(4)
    B = 4
    lp = _rand_logprob(r, (B, L, V))
    lenp = _rand_logprob(r, (B, L + 1, 20))
    synp = _rand_logprob(r, (B, L + 1, 10))
    from tests.oracles import random_phrase_row
    labels = np.zeros((B, L + 2), np.int64)
    pls = np.zeros((B, L + 2), np.int64)
    syns = np.zeros((B, L + 2), np.int64)
    nums = np.zeros(B, np.int64)
    for b in range(B):
        labels[b], nums[b], pls[b], syns[b] = random_phrase_row(
            r, L, vocab=V)
    per = Lm.tuic_loss(jnp.array(lenp), jnp.array(synp), jnp.array(lp),
                       jnp.array(lp), jnp.array(lp), jnp.array(nums),
                       jnp.array(pls), jnp.array(syns), jnp.array(labels),
                       reduction="none")["loss"]
    assert per.shape == (B,)
    assert np.isfinite(np.asarray(per)).all()
    # drop_worst consumes it without crashing
    assert np.isfinite(float(Lm.drop_worst(per, 0.25)))
