"""Behavioral oracles: direct, loopy ports of the reference's phrase-tensor
semantics (captioning/data/dataloader.py:343-428 and
captioning/models/TransformerModel.py:476-513), used only to verify the
vectorized closed-form implementations in boficap_tpu.data.phrase_ops.
"""

import numpy as np

PAD, BOS, EOS, LEN = 0, 1, 2, 3


def oracle_extend_syn(pl, syn, L):
    """dataloader.py:372-375 semantics for one row. pl/syn are [L+2]."""
    out = np.zeros(L + 2, dtype=np.int64)
    out[0] = LEN
    n = int((pl[1:] > 0).sum())
    last = 1
    for j in range(1, n + 1):
        out[last : last + pl[j]] = syn[j]
        last += pl[j]
    return out


def oracle_copy_init(labels, pl, L):
    """dataloader.py:377-396 semantics for one row."""
    out = np.zeros(L, dtype=np.int64)
    phrase_num = int((pl > 0).sum())  # includes bos slot
    seq_last = 0
    phrase_last = 0
    for j in range(1, phrase_num):
        cur, prev = int(pl[j]), int(pl[j - 1])
        if cur <= prev:
            pre_pad = prev - cur
            out[phrase_last : phrase_last + cur] = labels[
                seq_last + pre_pad : seq_last + pre_pad + cur
            ]
        else:
            pre_less = prev - (cur % prev)
            copy_times = cur // prev
            copied = 0
            for k in range(prev):
                times = copy_times if k < pre_less else copy_times + 1
                out[phrase_last + copied : phrase_last + copied + times] = labels[
                    seq_last + k
                ]
                copied += times
        seq_last += prev
        phrase_last += cur
    return out


def oracle_blockwise_mask(pl, L):
    """dataloader.py:394 semantics for one row."""
    mask = np.zeros((L, L), dtype=bool)
    phrase_num = int((pl > 0).sum())
    phrase_last = 0
    for j in range(1, phrase_num):
        mask[phrase_last:, : phrase_last + pl[j]] = True
        phrase_last += pl[j]
    return mask


def oracle_bound_masks(pl, steps, L2):
    """TransformerModel.py:476-513 teacher-forcing mask sequence for one row.

    Returns [steps, L2, L2]; step i's mask is the one used for the predictor
    call whose output lands in slot i+1.
    """
    n = int((pl[1:] > 0).sum())
    tgt = np.zeros((L2, L2), dtype=bool)
    out = np.zeros((steps, L2, L2), dtype=bool)
    last = 1
    tgt[:, 0] = True
    out[0] = tgt
    for i in range(1, steps):
        # reference condition: `if phrase_num[j] <= i: continue` with
        # phrase_num == n + 1, so phrase i is folded in whenever i <= n
        if n >= i:
            tgt[last:, : last + pl[i]] = True
            last += pl[i]
            tgt[0, :last] = True
        out[i] = tgt
    return out


def oracle_word_loss_mask(pl, L):
    """losses.py:289 semantics for one row."""
    m = np.zeros(L, dtype=bool)
    m[: int(pl.sum()) - 1] = True
    return m


def random_phrase_row(rng, L, max_phrases=None, vocab=100):
    """Random valid (labels, phrase_num, pl, syn) row."""
    total = rng.randint(1, L + 1)
    lengths = []
    left = total
    while left > 0:
        li = rng.randint(1, min(left, 6) + 1)
        lengths.append(li)
        left -= li
    if max_phrases is not None and len(lengths) > max_phrases:
        # merge tail
        lengths = lengths[: max_phrases - 1] + [sum(lengths[max_phrases - 1 :])]
    n = len(lengths)
    pl = np.zeros(L + 2, dtype=np.int64)
    pl[0] = 1
    pl[1 : 1 + n] = lengths
    syn = np.zeros(L + 2, dtype=np.int64)
    syn[0] = BOS
    syn[1 : 1 + n] = rng.randint(4, 7, size=n)
    syn[1 + n] = EOS
    labels = np.zeros(L + 2, dtype=np.int64)
    labels[0] = BOS
    labels[1 : 1 + total] = rng.randint(4, vocab, size=total)
    labels[L + 1] = EOS
    return labels, n + 1, pl, syn
