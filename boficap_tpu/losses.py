"""Training criteria as pure jnp functions.

Behavioral parity with the reference's criterion modules
(captioning/modules/losses.py); every per-sample Python masking loop there
(e.g. ``phrase_mask[i, 0:sum(phrase_length[i])-1] = True``, losses.py:289)
is a closed-form mask from boficap_tpu.data.phrase_ops here, so every loss
is jit-able end to end.

Conventions shared by all functions:
  * ``*_logprob`` arguments are log-softmax outputs (float32),
  * ``reduction='mean'`` sums each term and divides by the WORD-mask sum
    (the reference normalizes length/syn/KL terms by the word mask too,
    losses.py:307-311, :358-368),
  * losses return plain scalars (or dicts of scalars) — no params/state.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .constants import PAD
from .data import phrase_ops as po


def _gather_logprob(logprob, ids):
    """logprob [..., L, V], ids [..., L] -> [..., L]."""
    return jnp.take_along_axis(logprob, ids[..., None], axis=-1)[..., 0]


def _reduce(per_pos, mask, reduction: str):
    mask = mask.astype(per_pos.dtype)
    per_pos = per_pos * mask
    if reduction == "none":
        return per_pos.sum(-1) / jnp.maximum(mask.sum(-1), 1e-8)
    return per_pos.sum() / jnp.maximum(mask.sum(), 1e-8)


# ---------------------------------------------------------------------------
# Word-level criteria (AR path)
# ---------------------------------------------------------------------------

def lm_loss(logprob, target, mask, reduction: str = "mean"):
    """Masked NLL (reference LanguageModelCriterion, losses.py:181-204)."""
    L = logprob.shape[-2]
    target = target[..., :L]
    mask = mask[..., :L]
    nll = -_gather_logprob(logprob, target)
    return _reduce(nll, mask, reduction)


def label_smoothing_loss(logprob, target, mask, smoothing: float = 0.0,
                         reduction: str = "mean"):
    """KL(true_dist ‖ model) with uniform smoothing mass
    (reference LabelSmoothing, losses.py:426-464: smoothing / (V - 1) on every
    class, confidence on the target class — note the target class gets the
    confidence INSTEAD of its smoothing share, via scatter_)."""
    V = logprob.shape[-1]
    L = logprob.shape[-2]
    target = target[..., :L]
    mask = mask[..., :L]
    confidence = 1.0 - smoothing
    fill = smoothing / (V - 1)

    # sum_c true_dist_c * (log true_dist_c - logprob_c); torch's KLDivLoss
    # treats 0 log 0 as 0.
    tlp = _gather_logprob(logprob, target)
    sum_lp = logprob.sum(-1)
    # cross term: -sum_c true_c * logprob_c
    cross = -(fill * (sum_lp - tlp) + confidence * tlp)
    # entropy term: sum_c true_c * log true_c (0 when fill == 0)
    if smoothing > 0:
        ent = (V - 1) * fill * jnp.log(fill) + confidence * jnp.log(confidence)
    else:
        ent = 0.0
    return _reduce(cross + ent, mask, reduction)


# ---------------------------------------------------------------------------
# Phrase-level criteria
# ---------------------------------------------------------------------------

def _phrase_terms(logprob, labels, phrase_length, L):
    """(per-word NLL [B,L], word mask [B,L]) for a fill decoder output."""
    real = labels[..., 1:-1]
    mask = po.word_loss_mask(phrase_length, L)
    nll = -_gather_logprob(logprob, real)
    return nll, mask


def _slot_terms(len_logprob, syn_logprob, phrase_num, phrase_length,
                phrase_syn):
    """Length/syn NLL over predictor slots (real slots = [..., 1:])."""
    len_tgt = phrase_length[..., 1:]
    syn_tgt = phrase_syn[..., 1:]
    S = len_logprob.shape[-2]
    smask = po.slot_loss_mask(phrase_num, S)
    len_nll = -_gather_logprob(len_logprob, len_tgt[..., :S])
    syn_nll = -_gather_logprob(syn_logprob, syn_tgt[..., :S])
    return len_nll, syn_nll, smask


def naic_loss(len_logprob, syn_logprob, word_logprob, phrase_num,
              phrase_length, phrase_syn, labels, reduction: str = "mean"
              ) -> Dict[str, jnp.ndarray]:
    """NAIC three-term loss (reference LanguageModelCriterion_NAIC,
    losses.py:273-312).  All three terms normalize by the word-mask sum."""
    L = word_logprob.shape[-2]
    nll, wmask = _phrase_terms(word_logprob, labels, phrase_length, L)
    len_nll, syn_nll, smask = _slot_terms(len_logprob, syn_logprob,
                                          phrase_num, phrase_length, phrase_syn)
    wm = wmask.astype(nll.dtype)
    sm = smask.astype(nll.dtype)
    if reduction == "none":
        denom = jnp.maximum(wm.sum(-1), 1e-8)
        total = ((nll * wm).sum(-1) + (len_nll * sm).sum(-1)
                 + (syn_nll * sm).sum(-1)) / denom
        return {"loss": total}
    denom = jnp.maximum(wm.sum(), 1e-8)
    word = (nll * wm).sum() / denom
    length = (len_nll * sm).sum() / denom
    syn = (syn_nll * sm).sum() / denom
    return {"loss": word + length + syn, "word_loss": word,
            "length_loss": length, "syn_loss": syn}


def _kl_term(student_logprob, teacher_logprob, wmask):
    """sum_c p_t (log p_t - log p_s), teacher detached, masked per word
    (reference nn.KLDivLoss(reduction='none') usage, losses.py:336-339)."""
    p_t = jax.lax.stop_gradient(jnp.exp(teacher_logprob))
    lp_t = jax.lax.stop_gradient(teacher_logprob)
    kl = (p_t * (lp_t - student_logprob)).sum(-1)
    return kl * wmask


def uic_loss(sa_len_logprob, sa_syn_logprob, sa_word_logprob,
             na_len_logprob, na_syn_logprob, na_word_logprob,
             phrase_num, phrase_length, phrase_syn, labels,
             self_dis: bool = False, reduction: str = "mean"
             ) -> Dict[str, jnp.ndarray]:
    """UIC six-term SA+NA loss, optional self-distillation KL(NA ← SA)
    (reference LanguageModelCriterion_UIC, losses.py:315-369)."""
    L = sa_word_logprob.shape[-2]
    sa_nll, wmask = _phrase_terms(sa_word_logprob, labels, phrase_length, L)
    na_nll, _ = _phrase_terms(na_word_logprob, labels, phrase_length, L)
    sa_len, sa_syn, smask = _slot_terms(sa_len_logprob, sa_syn_logprob,
                                        phrase_num, phrase_length, phrase_syn)
    na_len, na_syn, _ = _slot_terms(na_len_logprob, na_syn_logprob,
                                    phrase_num, phrase_length, phrase_syn)
    wm = wmask.astype(sa_nll.dtype)
    sm = smask.astype(sa_nll.dtype)
    if reduction == "none":
        denom = jnp.maximum(wm.sum(-1), 1e-8)
        total = ((sa_nll * wm).sum(-1) + (sa_len * sm).sum(-1)
                 + (sa_syn * sm).sum(-1) + (na_nll * wm).sum(-1)
                 + (na_len * sm).sum(-1) + (na_syn * sm).sum(-1)) / denom
        return {"loss": total}
    denom = jnp.maximum(wm.sum(), 1e-8)
    out = {
        "sa_word_loss": (sa_nll * wm).sum() / denom,
        "sa_length_loss": (sa_len * sm).sum() / denom,
        "sa_syn_loss": (sa_syn * sm).sum() / denom,
        "na_word_loss": (na_nll * wm).sum() / denom,
        "na_length_loss": (na_len * sm).sum() / denom,
        "na_syn_loss": (na_syn * sm).sum() / denom,
    }
    total = sum(out.values())
    if self_dis:
        kl = _kl_term(na_word_logprob, sa_word_logprob, wm).sum() / denom
        out["kl_loss"] = kl
        total = total + kl
    out["loss"] = total
    return out


def tuic_loss(len_logprob, syn_logprob, a_word_logprob, sa_word_logprob,
              na_word_logprob, phrase_num, phrase_length, phrase_syn,
              labels, reduction: str = "mean") -> Dict[str, jnp.ndarray]:
    """UIC_s / UIC_u eight-term loss with the always-on KL distillation chain
    SA ← AR, NA ← {SA, AR} (reference LanguageModelCriterion_TUIC,
    losses.py:372-423).

    ``reduction='none'`` (drop-worst) returns per-sample losses: the sum of
    every term's masked row total over the row's word-mask count — the
    reference's own 'none' path is BROKEN (losses.py:408-414 leaves
    ``output`` unbound and returns None means), so this follows the intent
    of its commented-out line :409 extended to all eight terms."""
    L = sa_word_logprob.shape[-2]
    a_nll, wmask = _phrase_terms(a_word_logprob, labels, phrase_length, L)
    sa_nll, _ = _phrase_terms(sa_word_logprob, labels, phrase_length, L)
    na_nll, _ = _phrase_terms(na_word_logprob, labels, phrase_length, L)
    len_nll, syn_nll, smask = _slot_terms(len_logprob, syn_logprob,
                                          phrase_num, phrase_length, phrase_syn)
    wm = wmask.astype(sa_nll.dtype)
    sm = smask.astype(sa_nll.dtype)
    sa_kl_t = _kl_term(sa_word_logprob, a_word_logprob, wm)
    na_kl_t = (_kl_term(na_word_logprob, sa_word_logprob, wm)
               + _kl_term(na_word_logprob, a_word_logprob, wm))
    if reduction == "none":
        per = ((len_nll * sm).sum(-1) + (syn_nll * sm).sum(-1)
               + (a_nll * wm).sum(-1) + (sa_nll * wm).sum(-1)
               + (na_nll * wm).sum(-1) + sa_kl_t.sum(-1) + na_kl_t.sum(-1))
        return {"loss": per / jnp.maximum(wm.sum(-1), 1e-8)}
    denom = jnp.maximum(wm.sum(), 1e-8)
    sa_kl = sa_kl_t.sum() / denom
    na_kl = na_kl_t.sum() / denom
    out = {
        "length_loss": (len_nll * sm).sum() / denom,
        "syn_loss": (syn_nll * sm).sum() / denom,
        "a_word_loss": (a_nll * wm).sum() / denom,
        "sa_word_loss": (sa_nll * wm).sum() / denom,
        "na_word_loss": (na_nll * wm).sum() / denom,
        "sa_kl_loss": sa_kl,
        "na_kl_loss": na_kl,
    }
    out["loss"] = sum(out.values())
    return out


def nnaic_loss(length_pred, word_logprob, target, mask,
               reduction: str = "mean"):
    """NNAIC word NLL + MSE length loss (reference losses.py:206-233)."""
    L = word_logprob.shape[-2]
    target = target[..., :L]
    mask = mask[..., :L].astype(word_logprob.dtype)
    word = -_gather_logprob(word_logprob, target) * mask
    length = mask.sum(-1)
    length_loss = (length - length_pred) ** 2
    if reduction == "none":
        return {"loss": (word.sum(-1) + 0.1 * length_loss)
                / jnp.maximum(mask.sum(-1), 1e-8)}
    denom = jnp.maximum(mask.sum(), 1e-8)
    out = {"word_loss": word.sum() / denom,
           "length_loss": length_loss.sum() / denom}
    # NOTE: the reference's NNAIC length head receives no gradient (argmax
    # with .data, TransformerModel.py:1248-1250), so length_loss moves in
    # discrete jumps — replicated as-is
    out["loss"] = out["word_loss"] + out["length_loss"]
    return out


# ---------------------------------------------------------------------------
# RL criteria (rewards computed on host; see boficap_tpu/rewards)
# ---------------------------------------------------------------------------

def _seq_mask(seq):
    """Include positions up to and including the first eos
    (reference mask shift, losses.py:17-18, :49-50)."""
    m = (seq > PAD)
    return jnp.concatenate(
        [jnp.ones_like(m[..., :1]), m[..., :-1]], axis=-1)


def reward_criterion(sample_logprob, seq, reward, reduction: str = "mean"):
    """Classic SCST policy gradient -logp·reward·mask
    (reference RewardCriterion, losses.py:7-26).

    ``sample_logprob``: [B, L, V] log-probs (gathered here) or [B, L]
    already-gathered per-token log-probs; ``reward`` broadcastable to [B, L].
    """
    if sample_logprob.ndim == seq.ndim + 1:
        lp = _gather_logprob(sample_logprob, seq)
    else:
        lp = sample_logprob
    mask = _seq_mask(seq).astype(lp.dtype)
    reward = jnp.broadcast_to(jnp.reshape(reward, reward.shape + (1,) *
                                          (lp.ndim - reward.ndim)), lp.shape)
    out = -lp * reward * mask
    if reduction == "none":
        return out.sum(-1) / jnp.maximum(mask.sum(-1), 1e-8)
    return out.sum() / jnp.maximum(mask.sum(), 1e-8)


def structure_loss(logprob, seq, scores, loss_type: str,
                   entropy_reward_weight: float = 0.0,
                   self_cider_scores: Optional[jnp.ndarray] = None,
                   self_cider_reward_weight: float = 0.0,
                   reduction: str = "mean") -> Dict[str, jnp.ndarray]:
    """Structure losses over ``train_sample_n`` samples per image
    (reference StructureLosses, losses.py:29-179).

    logprob: [B, L, V] log-softmax (or logits for the margin family — the
    caller is responsible for passing what the loss type expects, exactly as
    the reference does); seq: [B, L] sampled ids; scores: [B] host-computed
    CIDEr-family scores, already laid out as n_img * sample_n rows.
    """
    B = seq.shape[0]
    lp_tok = _gather_logprob(logprob, seq)
    mask = _seq_mask(seq).astype(lp_tok.dtype)

    # reported reward is the raw score, BEFORE the entropy bonus
    # (reference losses.py:54 assigns out['reward'] first)
    out: Dict[str, jnp.ndarray] = {"reward": scores}
    if entropy_reward_weight > 0:
        p = jax.nn.softmax(logprob, axis=-1)
        ent = -(p * jax.nn.log_softmax(logprob, axis=-1)).sum(-1)
        ent = jax.lax.stop_gradient((ent * mask).sum(-1)
                                    / jnp.maximum(mask.sum(-1), 1e-8))
        # [B] entropies fold into the [n_img, sample_n] score layout
        # (reference entropy.view(-1, seq_per_img), losses.py:59)
        scores = scores + entropy_reward_weight * ent.reshape(scores.shape)

    if loss_type == "new_self_critical":
        # leave-one-out baseline (losses.py:157-176); scores [n_img, n]
        n = scores.shape[-1] if scores.ndim == 2 else 1
        sc = scores.reshape(-1, n)
        baseline = (sc.sum(-1, keepdims=True) - sc) / jnp.maximum(n - 1, 1)
        adv = sc - baseline
        if self_cider_scores is not None and self_cider_reward_weight > 0:
            adv = adv + self_cider_reward_weight * self_cider_scores.reshape(-1, 1)
        adv = adv.reshape(B, 1)
        pg = -lp_tok * mask * jax.lax.stop_gradient(adv)
        if reduction == "none":
            out["loss"] = pg.sum(-1) / jnp.maximum(mask.sum(-1), 1e-8)
        else:
            out["loss"] = pg.sum() / jnp.maximum(mask.sum(), 1e-8)
        return out

    n = scores.shape[-1]
    costs = -scores.reshape(-1, n)
    if loss_type in ("risk", "softmax_margin"):
        costs = costs - costs.min(-1, keepdims=True)
        costs = costs / jnp.maximum(costs.max(-1, keepdims=True), 1e-8)

    avg = (lp_tok * mask)
    if loss_type == "risk":
        per_seq = avg.sum(-1).reshape(-1, n)
    else:
        per_seq = (avg.sum(-1) / jnp.maximum(mask.sum(-1), 1e-8)).reshape(-1, n)

    def xent(scores_mat, target):
        lsm = jax.nn.log_softmax(scores_mat, axis=-1)
        return -jnp.take_along_axis(lsm, target[:, None], axis=-1).mean()

    target = jnp.argmin(costs, axis=-1)
    if loss_type == "seqnll":
        out["loss"] = xent(per_seq, target)
    elif loss_type == "risk":
        probs = jax.nn.softmax(jnp.exp(per_seq), axis=-1)
        out["loss"] = (probs * costs).sum(-1).mean()
    elif loss_type in ("max_margin", "multi_margin"):
        costs_star = costs.min(-1, keepdims=True)
        input_star = jnp.take_along_axis(per_seq,
                                         jnp.argmin(costs, -1)[:, None], -1)
        viol = jax.nn.relu(costs - costs_star - input_star + per_seq)
        if loss_type == "max_margin":
            out["loss"] = (viol.max(-1) / 2).mean()
        else:
            out["loss"] = viol.mean()
    elif loss_type in ("softmax_margin", "real_softmax_margin"):
        out["loss"] = xent(per_seq + costs, target)
    else:
        raise ValueError(f"unknown structure loss {loss_type}")
    return out


def drop_worst(per_sample_loss, drop_rate: float):
    """Keep the (1 - rate) lowest-loss samples (reference tools/train.py:216-220
    uses torch.topk largest=False on the per-sample 'none'-reduction loss)."""
    B = per_sample_loss.shape[0]
    k = max(int(B * (1 - drop_rate)), 1)
    vals, _ = jax.lax.top_k(-per_sample_loss, k)
    return -vals.mean()


def pb_pad_loss(packed_labels, word_logprob, packed_mask, phrase_num,
                length_targets, len_logprob, reduction: str = "mean"):
    """PB_pad two-term loss (reference PB_pad_LanguageModelCriterion,
    losses.py:235-271): packed-phrase word NLL + per-slot next-length NLL,
    both normalized by the packed word-mask sum."""
    pm = packed_mask.astype(word_logprob.dtype)
    word_nll = -_gather_logprob(word_logprob, packed_labels) * pm
    S = min(len_logprob.shape[-2], length_targets.shape[-1])
    smask = po.slot_loss_mask(phrase_num, S).astype(word_logprob.dtype)
    len_nll = -_gather_logprob(len_logprob[..., :S, :],
                               length_targets[..., :S]) * smask
    if reduction == "none":
        return {"loss": (word_nll.sum(-1) + len_nll.sum(-1))
                / jnp.maximum(pm.sum(-1), 1e-8)}
    denom = jnp.maximum(pm.sum(), 1e-8)
    out = {"phrase_loss": word_nll.sum() / denom,
           "length_loss": len_nll.sum() / denom}
    out["loss"] = out["phrase_loss"] + out["length_loss"]
    return out
