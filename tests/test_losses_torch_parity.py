"""Loss-criterion parity vs the ACTUAL reference modules
(/root/reference/captioning/modules/losses.py), driven with identical random
inputs.  The existing test_losses.py checks our criteria against hand-written
numpy oracles; this file closes the loop by comparing against the reference's
own torch code directly.

Reference defects encountered (documented in PARITY.md):
  * ``StructureLosses`` uses ``F.softmax``/``F.cross_entropy``/``F.relu``
    without importing ``torch.nn.functional`` — every loss_type except a
    no-entropy ``new_self_critical`` raises NameError as shipped.  The
    parity tests patch ``F`` into the module so the intended algorithm can
    execute (same approach as the dbs ``repeat_tensor`` patch).
  * ``LanguageModelCriterion_UIC`` with ``reduction='none'`` returns
    ``SA_length_loss_mean`` which is only bound in the 'mean' branch
    (losses.py:352-369) — NameError as shipped, so 'none' parity is tested
    for the criteria where the reference's own 'none' path runs.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: torch oracles / subprocesses

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from boficap_tpu import losses as L_ours
from tests.oracles import random_phrase_row

import captioning.modules.losses as ref_losses  # noqa: E402

# StructureLosses needs torch.nn.functional as F (never imported there)
ref_losses.F = torch.nn.functional

L = 20
L2 = L + 2
V = 54          # tgt_vocab (vocab + 4 offsets)
N_IMG = 2
N_SAMPLE = 3
N = N_IMG * N_SAMPLE


def _logsoftmax(rng, *shape):
    x = rng.randn(*shape).astype(np.float32)
    return np.asarray(torch.log_softmax(torch.from_numpy(x), -1))


def _word_inputs(seed=0):
    """(logprob [N,L,V], target [N,L], mask [N,L]) with ragged lengths."""
    rng = np.random.RandomState(seed)
    lp = _logsoftmax(rng, N, L, V)
    tgt = rng.randint(4, V, size=(N, L)).astype(np.int64)
    mask = np.zeros((N, L), np.float32)
    for i in range(N):
        mask[i, : rng.randint(3, L + 1)] = 1.0
    return lp, tgt, mask


def _phrase_inputs(seed=1):
    rng = np.random.RandomState(seed)
    labels = np.zeros((N, L2), np.int64)
    pl = np.zeros((N, L2), np.int64)
    ps = np.zeros((N, L2), np.int64)
    pn = np.zeros(N, np.int64)
    for b in range(N):
        lab, num, plr, syn = random_phrase_row(rng, L, vocab=V)
        labels[b], pn[b], pl[b], ps[b] = lab, num, plr, syn
    word_lp = _logsoftmax(rng, N, L, V)
    len_lp = _logsoftmax(rng, N, L + 1, 20)
    syn_lp = _logsoftmax(rng, N, L + 1, 10)
    return labels, pn, pl, ps, word_lp, len_lp, syn_lp


def test_lm_criterion_parity():
    lp, tgt, mask = _word_inputs(2)
    crit = ref_losses.LanguageModelCriterion()
    for reduction in ("mean", "none"):
        want = crit(torch.from_numpy(lp), torch.from_numpy(tgt),
                    torch.from_numpy(mask), reduction=reduction).numpy()
        got = np.asarray(L_ours.lm_loss(jnp.asarray(lp), jnp.asarray(tgt),
                                        jnp.asarray(mask),
                                        reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_label_smoothing_parity(smoothing):
    lp, tgt, mask = _word_inputs(3)
    crit = ref_losses.LabelSmoothing(smoothing=smoothing)
    for reduction in ("mean", "none"):
        want = crit(torch.from_numpy(lp), torch.from_numpy(tgt),
                    torch.from_numpy(mask), reduction=reduction).numpy()
        got = np.asarray(L_ours.label_smoothing_loss(
            jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(mask),
            smoothing=smoothing, reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nnaic_criterion_parity():
    lp, tgt, mask = _word_inputs(4)
    rng = np.random.RandomState(5)
    length_pred = rng.randint(1, L, size=N).astype(np.float32)
    crit = ref_losses.LanguageModelCriterion_NNAIC()
    for reduction in ("mean", "none"):
        want = crit(torch.from_numpy(length_pred), torch.from_numpy(lp),
                    torch.from_numpy(tgt), torch.from_numpy(mask),
                    reduction=reduction).numpy()
        got = np.asarray(L_ours.nnaic_loss(
            jnp.asarray(length_pred), jnp.asarray(lp), jnp.asarray(tgt),
            jnp.asarray(mask), reduction=reduction)["loss"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_naic_criterion_parity():
    labels, pn, pl, ps, word_lp, len_lp, syn_lp = _phrase_inputs(6)
    crit = ref_losses.LanguageModelCriterion_NAIC()
    want, want_len, want_word, want_syn = crit(
        torch.from_numpy(len_lp), torch.from_numpy(syn_lp),
        torch.from_numpy(word_lp), torch.from_numpy(pn),
        torch.from_numpy(pl), torch.from_numpy(ps),
        torch.from_numpy(labels), reduction="mean")
    got = L_ours.naic_loss(jnp.asarray(len_lp), jnp.asarray(syn_lp),
                           jnp.asarray(word_lp), jnp.asarray(pn),
                           jnp.asarray(pl), jnp.asarray(ps),
                           jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got["loss"]), want.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["length_loss"]),
                               want_len.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["word_loss"]),
                               want_word.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["syn_loss"]),
                               want_syn.numpy(), rtol=1e-5, atol=1e-6)
    # per-sample 'none' (drop-worst path)
    want_none = crit(torch.from_numpy(len_lp), torch.from_numpy(syn_lp),
                     torch.from_numpy(word_lp), torch.from_numpy(pn),
                     torch.from_numpy(pl), torch.from_numpy(ps),
                     torch.from_numpy(labels), reduction="none")[0].numpy()
    got_none = np.asarray(L_ours.naic_loss(
        jnp.asarray(len_lp), jnp.asarray(syn_lp), jnp.asarray(word_lp),
        jnp.asarray(pn), jnp.asarray(pl), jnp.asarray(ps),
        jnp.asarray(labels), reduction="none")["loss"])
    np.testing.assert_allclose(got_none, want_none, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("self_dis", [False, True])
def test_uic_criterion_parity(self_dis):
    labels, pn, pl, ps, sa_word, sa_len, sa_syn = _phrase_inputs(7)
    rng = np.random.RandomState(8)
    na_word = _logsoftmax(rng, N, L, V)
    na_len = _logsoftmax(rng, N, L + 1, 20)
    na_syn = _logsoftmax(rng, N, L + 1, 10)
    crit = ref_losses.LanguageModelCriterion_UIC()
    ref_out = crit(torch.from_numpy(sa_len), torch.from_numpy(sa_syn),
                   torch.from_numpy(sa_word), torch.from_numpy(na_len),
                   torch.from_numpy(na_syn), torch.from_numpy(na_word),
                   torch.from_numpy(pn), torch.from_numpy(pl),
                   torch.from_numpy(ps), torch.from_numpy(labels),
                   reduction="mean", self_dis=self_dis)
    got = L_ours.uic_loss(jnp.asarray(sa_len), jnp.asarray(sa_syn),
                          jnp.asarray(sa_word), jnp.asarray(na_len),
                          jnp.asarray(na_syn), jnp.asarray(na_word),
                          jnp.asarray(pn), jnp.asarray(pl), jnp.asarray(ps),
                          jnp.asarray(labels), self_dis=self_dis)
    np.testing.assert_allclose(np.asarray(got["loss"]), ref_out[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    names = ["sa_length_loss", "sa_word_loss", "sa_syn_loss",
             "na_length_loss", "na_word_loss", "na_syn_loss"]
    for name, want in zip(names, ref_out[1:]):
        np.testing.assert_allclose(np.asarray(got[name]), want.numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_tuic_criterion_parity():
    labels, pn, pl, ps, sa_word, len_lp, syn_lp = _phrase_inputs(9)
    rng = np.random.RandomState(10)
    a_word = _logsoftmax(rng, N, L, V)
    na_word = _logsoftmax(rng, N, L, V)
    crit = ref_losses.LanguageModelCriterion_TUIC()
    ref_out = crit(torch.from_numpy(len_lp), torch.from_numpy(syn_lp),
                   torch.from_numpy(np.exp(a_word)),
                   torch.from_numpy(a_word),
                   torch.from_numpy(np.exp(sa_word)),
                   torch.from_numpy(sa_word), torch.from_numpy(na_word),
                   torch.from_numpy(pn), torch.from_numpy(pl),
                   torch.from_numpy(ps), torch.from_numpy(labels),
                   reduction="mean")
    got = L_ours.tuic_loss(jnp.asarray(len_lp), jnp.asarray(syn_lp),
                           jnp.asarray(a_word), jnp.asarray(sa_word),
                           jnp.asarray(na_word), jnp.asarray(pn),
                           jnp.asarray(pl), jnp.asarray(ps),
                           jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got["loss"]), ref_out[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    names = ["length_loss", "syn_loss", "a_word_loss", "sa_word_loss",
             "na_word_loss", "sa_kl_loss", "na_kl_loss"]
    for name, want in zip(names, ref_out[1:]):
        np.testing.assert_allclose(np.asarray(got[name]), want.numpy(),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def _sampled_seq(rng):
    """Sampled ids with pad tails (the RL criteria mask shape)."""
    seq = rng.randint(4, V, size=(N, L)).astype(np.int64)
    for i in range(N):
        seq[i, rng.randint(2, L):] = 0
    return seq


def test_reward_criterion_parity():
    rng = np.random.RandomState(11)
    lp = _logsoftmax(rng, N, L, V)
    seq = _sampled_seq(rng)
    reward = rng.randn(N, L).astype(np.float32)
    crit = ref_losses.RewardCriterion()
    for reduction in ("mean", "none"):
        want = crit(torch.from_numpy(lp), torch.from_numpy(seq),
                    torch.from_numpy(reward), reduction=reduction).numpy()
        got = np.asarray(L_ours.reward_criterion(
            jnp.asarray(lp), jnp.asarray(seq), jnp.asarray(reward),
            reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class _SLOpt:
    def __init__(self, loss_type, entropy_w=0.0, self_cider_w=0.0):
        self.structure_loss_type = loss_type
        self.train_sample_n = N_SAMPLE
        self.entropy_reward_weight = entropy_w
        self.self_cider_reward_weight = self_cider_w


@pytest.mark.parametrize("loss_type", [
    "seqnll", "risk", "max_margin", "multi_margin", "softmax_margin",
    "real_softmax_margin", "new_self_critical"])
def test_structure_loss_parity(loss_type, monkeypatch):
    rng = np.random.RandomState(12)
    # margin-family losses consume raw logits; the rest log-softmax — pass
    # the same tensor to both sides either way
    if loss_type in ("max_margin", "multi_margin", "real_softmax_margin"):
        lp = rng.randn(N, L, V).astype(np.float32)
    else:
        lp = _logsoftmax(rng, N, L, V)
    seq = _sampled_seq(rng)
    scores = rng.rand(N).astype(np.float32) * 2.0
    monkeypatch.setattr(ref_losses, "get_scores",
                        lambda data_gts, s, opt: scores.copy())
    crit = ref_losses.StructureLosses(_SLOpt(loss_type))
    data_gts = [None] * N_IMG
    want = crit(torch.from_numpy(lp), torch.from_numpy(seq), data_gts,
                reduction="mean")
    got = L_ours.structure_loss(jnp.asarray(lp), jnp.asarray(seq),
                                jnp.asarray(scores.reshape(N_IMG, N_SAMPLE)),
                                loss_type)
    np.testing.assert_allclose(np.asarray(got["loss"]),
                               want["loss"].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["reward"]).reshape(-1),
                               want["reward"].numpy().reshape(-1),
                               rtol=1e-6, atol=1e-7)


def test_structure_loss_entropy_and_self_cider_parity(monkeypatch):
    """new_self_critical with the entropy bonus and self-CIDEr diversity
    reward enabled (reference losses.py:55-59, :167-171)."""
    rng = np.random.RandomState(13)
    lp = _logsoftmax(rng, N, L, V)
    seq = _sampled_seq(rng)
    scores = rng.rand(N).astype(np.float32)
    sc_scores = rng.rand(N_IMG).astype(np.float32)
    monkeypatch.setattr(ref_losses, "get_scores",
                        lambda data_gts, s, opt: scores.copy())
    monkeypatch.setattr(ref_losses, "get_self_cider_scores",
                        lambda data_gts, s, opt: sc_scores.copy())
    crit = ref_losses.StructureLosses(
        _SLOpt("new_self_critical", entropy_w=0.05, self_cider_w=0.2))
    want = crit(torch.from_numpy(lp), torch.from_numpy(seq),
                [None] * N_IMG, reduction="mean")
    got = L_ours.structure_loss(
        jnp.asarray(lp), jnp.asarray(seq),
        jnp.asarray(scores.reshape(N_IMG, N_SAMPLE)), "new_self_critical",
        entropy_reward_weight=0.05,
        self_cider_scores=jnp.asarray(sc_scores),
        self_cider_reward_weight=0.2)
    np.testing.assert_allclose(np.asarray(got["loss"]),
                               want["loss"].numpy(), rtol=1e-5, atol=1e-5)
