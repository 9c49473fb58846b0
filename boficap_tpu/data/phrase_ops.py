"""Closed-form phrase-tensor math (the heart of the bound-and-fill data path).

The reference builds these tensors with per-sample Python loops in
``Dataset.collate_func`` (captioning/data/dataloader.py:343-428) and mutates
B×L×L boolean masks step-by-step inside the model
(captioning/models/TransformerModel.py:476-513, :532-565, :1843-1867).  On TPU
every one of those loops is re-expressed here as a closed-form computation
over prefix sums of ``phrase_length`` so that

  * the data path is fully vectorized numpy (no per-sample Python), and
  * the decode path can compute the same quantities **on device** inside
    ``jax.jit`` (every function below is pure and works with either ``numpy``
    or ``jax.numpy`` as the array namespace).

Shape/typing conventions (all static):

  L   = max caption length in words (reference ``seq_length`` = 20)
  L2  = L + 2 (bos/[LEN] slot at 0, eos slot at the end)
  B   = flattened batch (batch_size * seq_per_img)

``phrase_length`` rows always look like ``[1, l_1, ..., l_n, 0, ...]`` of
width L2 — the leading 1 accounts for the bos "phrase", ``l_1..l_n`` are the
real phrase lengths, and ``n + 1 == phrase_num``.
"""

from __future__ import annotations

import numpy as np

from ..constants import BOS, EOS, LEN, PAD

__all__ = [
    "phrase_word_ends",
    "total_words",
    "extend_syn_seq",
    "copy_init_src_indices",
    "copy_init",
    "blockwise_visible",
    "blockwise_mask",
    "bound_prefixes",
    "bound_step_masks",
    "word_loss_mask",
    "slot_loss_mask",
    "pack_label_row",
    "build_phrase_row",
]


def _ns(x):
    """Pick the array namespace (numpy or jax.numpy) from an argument."""
    import sys

    jnp = sys.modules.get("jax.numpy")
    if jnp is not None and not isinstance(x, np.ndarray) and hasattr(x, "aval"):
        return jnp
    if jnp is not None and type(x).__module__.startswith("jax"):
        return jnp
    return np


def _row(xp, n_lead, length):
    """arange(length) broadcastable after n_lead batch dims."""
    return xp.arange(length).reshape((1,) * n_lead + (length,))


# ---------------------------------------------------------------------------
# Prefix-sum helpers
# ---------------------------------------------------------------------------

def phrase_word_ends(phrase_length):
    """Word-space end offsets of each real phrase slot.

    ``ends[..., k]`` = number of words covered by phrases 1..k+1 (the bos
    pseudo-phrase at slot 0 is excluded).  Constant == total beyond slot n.
    Shape: ``[..., L2 - 1]``.
    """
    xp = _ns(phrase_length)
    return xp.cumsum(phrase_length[..., 1:], axis=-1)


def total_words(phrase_length):
    """Number of real words = sum(phrase_length) - 1 (bos slot excluded)."""
    xp = _ns(phrase_length)
    return xp.sum(phrase_length, axis=-1) - 1


def _slot_of(xp, ends, pos):
    """0-based real-phrase slot containing word position ``pos`` [..., T]."""
    return xp.sum(pos[..., :, None] >= ends[..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# extend_phrase_syn_seq (reference dataloader.py:372-375)
# ---------------------------------------------------------------------------

def extend_syn_seq(phrase_length, phrase_syn, L):
    """Word-level expansion of per-phrase syntax ids, with [LEN] at slot 0.

    Output ``[..., L + 2]``: position 0 = LEN marker; position 1 + p carries
    the syn id of the phrase containing word p; positions past the caption
    are PAD.  ``phrase_syn`` rows look like ``[BOS, s_1..s_n, EOS, 0...]``.
    """
    xp = _ns(phrase_length)
    ends = phrase_word_ends(phrase_length)            # [..., P]
    total = total_words(phrase_length)                # [...]
    lead = phrase_length.ndim - 1

    p = _row(xp, lead, L + 1)                         # word positions 0..L
    k = xp.clip(_slot_of(xp, ends, p), 0, ends.shape[-1] - 1)
    syn_of = xp.take_along_axis(phrase_syn[..., 1:], k, axis=-1)
    body = xp.where(p < total[..., None], syn_of, PAD)

    head = xp.full(phrase_length.shape[:-1] + (1,), LEN, dtype=phrase_length.dtype)
    return xp.concatenate([head, body.astype(phrase_length.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Copy-from-previous-phrase decoder input (reference dataloader.py:377-396,
# identically re-implemented at TransformerModel.py:1934-1947 — here a single
# closed-form index map shared by the training collate and the SA decode loop).
# ---------------------------------------------------------------------------

def copy_init_src_indices(phrase_length, L):
    """Source index (into the bos-framed label row) for each extend position.

    For extend position t inside phrase j, the reference either truncates the
    previous phrase's tail (cur <= prev) or round-robin repeats its words
    (cur > prev).  Closed-form inverse of that layout:

      cur <= prev:  src = seq_last + (prev - cur) + o
      cur >  prev:  ct = cur // prev ; pre_less = prev - cur % prev
                    k  = o // ct                                if o <  pre_less * ct
                         pre_less + (o - pre_less*ct) // (ct+1) otherwise
                    src = seq_last + k

    where o = t - phrase_start (offset within phrase j), prev = length of
    phrase j-1 (the bos slot, length 1, serves for j = 1), and seq_last =
    label-space start of phrase j-1 (cumsum of ``phrase_length`` through
    slot j-2; 0 for j = 1 so the first phrase copies bos).

    Returns ``(src, valid)`` of shape ``[..., L]``; ``src`` indexes the
    ``[..., L+2]`` label row; invalid positions get src = 0.
    """
    xp = _ns(phrase_length)
    P = phrase_length.shape[-1] - 1
    ends = phrase_word_ends(phrase_length)             # [..., P]
    total = total_words(phrase_length)                 # [...]
    C = xp.cumsum(phrase_length, axis=-1)              # [..., L2], bos included
    lead = phrase_length.ndim - 1

    t = _row(xp, lead, L)
    k = xp.clip(_slot_of(xp, ends, t), 0, P - 1)       # real slot of t (phrase j = k+1)

    start = xp.where(k > 0,
                     xp.take_along_axis(ends, xp.clip(k - 1, 0, P - 1), axis=-1),
                     0)
    cur = xp.take_along_axis(phrase_length[..., 1:], k, axis=-1)   # pl[k+1]
    prev = xp.take_along_axis(phrase_length, k, axis=-1)           # pl[k] (bos slot for k=0)
    seq_last = xp.where(k > 0,
                        xp.take_along_axis(C, xp.clip(k - 1, 0, C.shape[-1] - 1), axis=-1),
                        0)

    o = t - start
    prev_safe = xp.maximum(prev, 1)
    ct = xp.maximum(cur // prev_safe, 1)
    pre_less = prev - cur % prev_safe
    src_short = seq_last + (prev - cur) + o
    in_head = o < pre_less * ct
    k_src = xp.where(in_head, o // ct, pre_less + (o - pre_less * ct) // (ct + 1))
    src = xp.where(cur <= prev, src_short, seq_last + k_src)

    valid = t < total[..., None]
    src = xp.where(valid, src, 0)
    return src.astype(phrase_length.dtype), valid


def copy_init(labels, phrase_length, L):
    """``extend_phrase_seq``: the SA decoder's copied-word input row [..., L]."""
    xp = _ns(phrase_length)
    src, valid = copy_init_src_indices(phrase_length, L)
    vals = xp.take_along_axis(labels, src, axis=-1)
    return xp.where(valid, vals, PAD)


# ---------------------------------------------------------------------------
# Blockwise phrase-causal attention visibility (reference dataloader.py:394)
# ---------------------------------------------------------------------------

def blockwise_visible(phrase_length, L):
    """Per-row visible-prefix length for the SA decoder's blockwise mask.

    Row q (extend space) may attend keys < end(phrase containing q); overflow
    rows see the full caption.  Returns int ``[..., L]``.
    """
    xp = _ns(phrase_length)
    P = phrase_length.shape[-1] - 1
    ends = phrase_word_ends(phrase_length)
    n = xp.sum(phrase_length[..., 1:] > 0, axis=-1)
    lead = phrase_length.ndim - 1

    q = _row(xp, lead, L)
    k = _slot_of(xp, ends, q)
    k = xp.clip(xp.minimum(k, xp.maximum(n[..., None] - 1, 0)), 0, P - 1)
    vis = xp.take_along_axis(ends, k, axis=-1)
    return xp.where(n[..., None] > 0, vis, 0)


def blockwise_mask(phrase_length, L):
    """Dense bool ``[..., L, L]`` equivalent of ``extend_phrase_seq_mask``."""
    xp = _ns(phrase_length)
    vis = blockwise_visible(phrase_length, L)
    key = _row(xp, vis.ndim - 1, L)[..., None, :]
    return key < vis[..., :, None]


# ---------------------------------------------------------------------------
# Bounding (length predictor) teacher-forcing geometry
# (reference TransformerModel.py:476-513 / :532-565: an O(P) python loop with
#  an incrementally grown mask — here: closed-form per-step visible prefixes)
# ---------------------------------------------------------------------------

def bound_prefixes(phrase_length, steps):
    """Visible-prefix length of the [LEN] query at each teacher-forcing step.

    Step i predicts phrase i+1 after "seeing" phrases 1..i:
    ``cum[i] = 1 + sum(l_1..l_i)`` (clamps itself beyond the last phrase since
    trailing lengths are zero).  Shape ``[..., steps]``.
    """
    xp = _ns(phrase_length)
    ends = phrase_word_ends(phrase_length)
    pre = xp.concatenate(
        [xp.zeros(ends.shape[:-1] + (1,), dtype=ends.dtype), ends[..., : steps - 1]],
        axis=-1,
    )
    return 1 + pre


def bound_step_masks(phrase_length, steps, L2):
    """Full ``[..., steps, L2, L2]`` masks of the teacher-forcing loop.

    Only needed when N_len > 1 (deeper predictors propagate information
    through non-[LEN] rows; with N_len == 1 only the [LEN] row matters and
    ``bound_prefixes`` suffices).  Row 0 at step i sees keys < cum[min(i, n)];
    row q >= 1 sees keys < cum[k*] with k* = min(i, #{m in [0, n) :
    cum[m] <= q}), or only key 0 when k* == 0.
    """
    xp = _ns(phrase_length)
    n = xp.sum(phrase_length[..., 1:] > 0, axis=-1)           # [...]
    cum = bound_prefixes(phrase_length, L2 - 1)               # [..., L2-1]
    lead = phrase_length.ndim - 1

    i = _row(xp, lead, steps)[..., :, None]                   # [..., steps, 1]
    q = _row(xp, lead, L2)[..., None, :]                      # [..., 1, L2]
    m = _row(xp, lead, L2 - 1)                                # [..., L2-1]

    m_valid = m[..., None, :] < n[..., None, None]            # [..., 1, L2-1]
    r = xp.sum((cum[..., None, :] <= q[..., 0, :, None]) & m_valid, axis=-1)  # [..., L2]

    k_star = xp.minimum(i, r[..., None, :])                   # [..., steps, L2]
    k_idx = xp.clip(k_star, 0, cum.shape[-1] - 1)
    cum_b = xp.broadcast_to(cum[..., None, :], cum.shape[:-1] + (steps, cum.shape[-1]))
    vis = xp.take_along_axis(cum_b, k_idx, axis=-1)
    vis = xp.where(k_star >= 1, vis, 1)

    # row 0 override: cum[min(i, n)]
    i0 = xp.clip(xp.minimum(i[..., 0], n[..., None]), 0, cum.shape[-1] - 1)
    vis0 = xp.take_along_axis(cum, i0, axis=-1)               # [..., steps]
    vis = xp.where(_row(xp, lead, L2)[..., None, :] == 0, vis0[..., :, None], vis)

    key = xp.arange(L2).reshape((1,) * lead + (1, 1, L2))
    return key < vis[..., None]


# ---------------------------------------------------------------------------
# Loss masks (reference losses.py:289, :297-298)
# ---------------------------------------------------------------------------

def word_loss_mask(phrase_length, L):
    """Bool ``[..., L]``: positions < sum(phrase_length) - 1 (real words)."""
    xp = _ns(phrase_length)
    total = total_words(phrase_length)
    t = _row(xp, total.ndim, L)
    return t < total[..., None]


def slot_loss_mask(phrase_num, S):
    """Bool ``[..., S]``: slots < phrase_num (length/syn head supervision)."""
    xp = _ns(phrase_num)
    s = _row(xp, phrase_num.ndim, S)
    return s < phrase_num[..., None]


# ---------------------------------------------------------------------------
# Per-caption row builders (host-side collate; numpy only)
# ---------------------------------------------------------------------------

def pack_label_row(words, L):
    """bos-framed label row [L+2]: [BOS, w..., 0-pad, EOS@L+1].

    Note the reference pins EOS at the fixed final slot regardless of caption
    length (dataloader.py:298-303).
    """
    out = np.zeros(L + 2, dtype=np.int32)
    out[0] = BOS
    w = np.asarray(words, dtype=np.int32)[:L]
    out[1 : 1 + len(w)] = w
    out[L + 1] = EOS
    return out


def build_phrase_row(lengths, syns, L):
    """phrase_num (int, = n+1), phrase_length [L+2], phrase_syn [L+2].

    ``lengths``/``syns`` are the caption's real per-phrase values (already
    truncated so that sum(lengths) <= L).
    """
    lengths = np.asarray(lengths, dtype=np.int32)
    syns = np.asarray(syns, dtype=np.int32)
    n = int((lengths > 0).sum())
    pl = np.zeros(L + 2, dtype=np.int32)
    ps = np.zeros(L + 2, dtype=np.int32)
    pl[0] = 1
    ps[0] = BOS
    pl[1 : 1 + n] = lengths[:n]
    ps[1 : 1 + n] = syns[:n]
    ps[1 + n] = EOS
    return n + 1, pl, ps
