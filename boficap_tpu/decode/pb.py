"""PB_pad inference (reference corePB_pad, TransformerModel.py:2123-2146 +
the AttModel PB sample loop, AttModel.py:469-517).

The packed layout's width changes as phrases are appended, so — exactly like
the reference, whose per-step decoder-input assembly is host-side numpy
(TransformerModel.py:1138-1213) — this loop runs on host and calls jit'd
model pieces per step.  Each distinct packed width compiles once; widths are
bounded by max_length, and this is the legacy ablation variant, so the
recompile cost is accepted rather than engineered away.

Reference defect NOT replicated: corePB_pad packs the decoder with the
CURRENT phrase lengths, so the column for the not-yet-generated phrase has
zero width and the sample loop breaks on the first step with an empty logits
tensor (AttModel.py:507-508 `if phrase_logprobs.shape[1] == 0: break`).
Here the predicted next length is appended to a working copy of the plan
BEFORE packing, which is the evidently intended semantics (it is exactly the
training-time layout for the next phrase).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOS
from ..data.pb_pack import pack_decoder_inputs
from .sampling import sample_next_word


def pb_decode(model, params, rng, att_feats, att_masks, *,
              sample_method: str = "greedy", temperature: float = 1.0
              ) -> Dict[str, Any]:
    """Returns {'seq': [B, L], 'phrase_num': [B], 'phrase_length': [B, L]}
    (frames match the reference's returns, AttModel.py:516-517)."""
    L = model.max_length
    L2 = L + 2
    B = att_feats.shape[0]

    @jax.jit
    def encode(a, m):
        return model.apply(params, a, m, deterministic=True,
                           method="encode")

    @jax.jit
    def predict_len(labels, pn, pl, memory, src_mask):
        return model.apply(params, labels, pn, pl, memory, src_mask, True,
                           method="pb_length_predict")

    @jax.jit
    def decode_packed(ids, slot, labels, pl, memory, src_mask, mask):
        return model.apply(params, ids, slot, labels, pl, memory, src_mask,
                           mask, True, method="pb_decode")

    memory = encode(jnp.asarray(att_feats), jnp.asarray(att_masks))
    src_mask = jnp.asarray(att_masks).astype(bool)

    seq = np.zeros((B, L2), np.int64)
    seq[:, 0] = BOS
    pl = np.zeros((B, L2), np.int64)
    pl[:, 0] = 1
    pn = np.ones(B, np.int64)            # includes the bos phrase
    cur_start = np.ones(B, np.int64)
    unfinished = np.ones(B, bool)

    for _ in range(L):
        len_lp = np.asarray(predict_len(
            jnp.asarray(seq), jnp.asarray(pn), jnp.asarray(pl), memory,
            src_mask))
        nxt = len_lp.argmax(-1)[np.arange(B), pn - 1]

        # append the predicted next phrase to a working plan, then pack
        pl_work = pl.copy()
        pn_work = pn.copy()
        n_eff = np.zeros(B, np.int64)
        for b in range(B):
            if not unfinished[b]:
                continue
            n = int(min(nxt[b], L + 1 - cur_start[b]))
            if int(nxt[b]) + int(cur_start[b]) >= L + 1:
                unfinished[b] = False        # clamped: final phrase
            if n == 0:
                unfinished[b] = False
                continue
            n_eff[b] = n
            pl_work[b, pn_work[b]] = n
            pn_work[b] += 1
        if n_eff.sum() == 0:
            break

        ids, slot, mask = pack_decoder_inputs(seq, pn_work, pl_work)
        logprob = decode_packed(
            jnp.asarray(ids), jnp.asarray(slot), jnp.asarray(seq),
            jnp.asarray(pl_work), memory, src_mask, jnp.asarray(mask))
        rng, k = jax.random.split(rng)
        words, _ = sample_next_word(k, logprob, sample_method, temperature)
        words = np.asarray(words)

        # new phrase's packed column: next-space index = old pn - 1 (alive
        # samples advance in lockstep so they share it)
        max_pn = int(pn_work.max())
        col_max = pl_work[:, 1:][:, :max_pn].max(axis=0)
        col_new = int(pn[unfinished | (n_eff > 0)].max()) - 1 \
            if (unfinished | (n_eff > 0)).any() else 0
        last_start = int(col_max[:col_new].sum())

        for b in range(B):
            n = int(n_eff[b])
            if n == 0:
                continue
            seq[b, cur_start[b]:cur_start[b] + n] = \
                words[b, last_start:last_start + n]
            pl[b] = pl_work[b]
            pn[b] = pn_work[b]
            cur_start[b] = pl[b].sum()
        if not unfinished.any():
            break

    return {"seq": seq[:, 1:-1].astype(np.int32),
            "phrase_num": (pn - 1).astype(np.int32),
            "phrase_length": pl[:, 1:-1].astype(np.int32)}
