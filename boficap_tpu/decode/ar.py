"""Autoregressive decoding: KV-cached sampling loop + batched beam search.

Behavioral parity with the reference's AR paths (captioning/models/
AttModel.py:307-430 sample loop, CaptionModel.py:48-222 beam_search), but
TPU-native:

  * the step function uses a per-layer KV cache (the reference re-runs the
    full decoder on the growing prefix each step, TransformerModel.py:
    1791-1804) and cross-attention K/V projected once per sequence,
  * the sampling loop is a ``lax.while_loop`` with per-sample finished flags
    (early exit when the whole batch has emitted eos),
  * beam search is fully batched: top-k over K·V candidates per step, a
    merged top-K "done" pool instead of Python done-beam lists, and beam
    state gathered with one vectorized index per step.

Gradients: these loops are for inference/sampling only.  RL training gets
log-probs by re-scoring the sampled sequences with the (differentiable)
teacher-forced forward — bit-identical because causal masking makes every
step's computation reproducible from the final sequence.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..constants import BOS, EOS, PAD
from .sampling import NEG_INF, sample_next_word


def length_penalty_fn(spec: str):
    """'' | 'wu_X' | 'avg_X' (reference utils/misc.py:133-157)."""
    if not spec:
        return lambda length, logp: logp
    kind, alpha = spec.split("_")
    alpha = float(alpha)
    if kind == "wu":
        return lambda length, logp: logp / (
            ((5.0 + length) ** alpha) / (6.0 ** alpha))
    if kind == "avg":
        return lambda length, logp: logp / jnp.maximum(length, 1) ** alpha
    raise ValueError(f"unknown length penalty {spec}")


def ar_sample(model, params, rng, memory, src_mask, *,
              sample_method: str = "greedy", temperature: float = 1.0,
              decoding_constraint: bool = False,
              suppress_unk_idx: Optional[int] = None,
              max_steps: Optional[int] = None,
              block_trigrams: bool = False,
              penalty_seqs=None, diversity_lambda: float = 0.5,
              bad_endings_ix: Optional[tuple] = None
              ) -> Dict[str, Any]:
    """Sample (or greedy-decode) captions autoregressively.

    Returns {'seq': [B, L] int32, 'tok_logprobs': [B, L] float32 (chosen
    token's log-prob per position), 'entropy': [B, L] float32 (per-position
    distribution entropy)} — the same information the reference's dense
    (seq, seqLogprobs) contract (AttModel.py:341-410) is reduced to by eval
    (eval_utils.py:183-184), carried as [B, L] instead of [B, L, V] so the
    sampling loop does not stream a ~50 MB logprob buffer through HBM every
    step.  Finished rows get PAD tokens and zero tok/entropy entries.

    ``block_trigrams``: soft-penalize words that would repeat an already
    generated trigram (AttModel.py:355-383, ln(1/2)*alpha with alpha=2).
    ``penalty_seqs`` [B, P, L]: group-diversity penalty — subtract
    diversity_lambda for each previous-group token chosen at this step
    (CaptionModel.add_diversity :51-68).
    """
    L = model.max_length
    B = memory.shape[0]
    V = model.tgt_vocab
    n_steps = L if max_steps is None else min(max_steps, L)
    cache = model.apply(params, memory, L + 1, method="init_ar_cache")

    def cond(s):
        return (s["pos"] < n_steps) & jnp.any(s["unfinished"])

    def body(s):
        rng, skey = jax.random.split(s["rng"])
        logprob, cache = model.apply(
            params, s["it"], s["pos"], s["cache"], src_mask,
            method="ar_step")
        if suppress_unk_idx is not None:
            logprob = logprob.at[:, suppress_unk_idx].add(-1000.0)
        if bad_endings_ix:
            # forbid STOPPING right after a bad-ending word: the reference
            # sets the stop token's logprob to -inf when the previous word
            # is in bad_endings (AttModel.py:355-360)
            bad = jnp.asarray(bad_endings_ix, jnp.int32)
            prev_bad = (s["it"][:, None] == bad[None, :]).any(-1)
            stop_cond = (s["pos"] > 0) & prev_bad
            for t in (PAD, EOS):   # our loop ends on EOS; PAD also
                logprob = logprob.at[:, t].set(     # terminates the caption
                    jnp.where(stop_cond, NEG_INF, logprob[:, t]))
        if decoding_constraint:
            # forbid repeating the previous word (AttModel.py:349-352); no-op
            # at pos 0 where "previous" is the bos input
            pen = jnp.where(s["pos"] > 0,
                            jax.nn.one_hot(s["it"], V) * NEG_INF, 0.0)
            logprob = logprob + pen
        if penalty_seqs is not None:
            # diversity: count previous groups' tokens at this step
            tok = jnp.take_along_axis(
                penalty_seqs,
                jnp.broadcast_to(s["pos"], penalty_seqs.shape[:2])[..., None],
                axis=2)[..., 0]                              # [B, P]
            counts = jax.nn.one_hot(tok, V).sum(1)
            logprob = logprob - diversity_lambda * counts
        if block_trigrams:
            # penalize words completing a trigram already in seq
            # (AttModel.py:355-383): for every past p >= 2 with
            # (seq[p-2], seq[p-1]) == (seq[t-2], seq[t-1]), count seq[p]
            t = s["pos"]
            seqb = s["seq"]
            prev2 = jnp.stack([jnp.roll(seqb, 2, 1), jnp.roll(seqb, 1, 1)], -1)
            cur2 = jnp.stack([
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(seqb, ((0, 0), (2, 0))), t, 1, 1)[:, 0],
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(seqb, ((0, 0), (1, 0))), t, 1, 1)[:, 0]], -1)
            pos_idx = jnp.arange(seqb.shape[1])[None, :]
            match = (prev2 == cur2[:, None, :]).all(-1) & (pos_idx >= 2)                 & (pos_idx < t)                                # [B, L]
            counts = (jax.nn.one_hot(seqb, V)
                      * match[..., None].astype(jnp.float32)).sum(1)
            alpha = 2.0
            logprob = jnp.where(t >= 3,
                                logprob + counts * (-0.693) * alpha, logprob)
        ids, _ = sample_next_word(skey, logprob, sample_method, temperature)
        ids = jnp.where(s["unfinished"], ids, PAD).astype(jnp.int32)
        tok = jnp.take_along_axis(logprob, ids[:, None], axis=1)[:, 0]
        ent = -(jnp.exp(logprob) * logprob).sum(-1)
        tok = jnp.where(s["unfinished"], tok, 0.0)
        ent = jnp.where(s["unfinished"], ent, 0.0)
        seq = s["seq"].at[:, s["pos"]].set(ids)
        tok_lp = s["tok_lp"].at[:, s["pos"]].set(tok)
        ent_lp = s["ent"].at[:, s["pos"]].set(ent)
        unfinished = s["unfinished"] & (ids != EOS)
        return {"pos": s["pos"] + 1, "it": ids, "cache": cache, "seq": seq,
                "tok_lp": tok_lp, "ent": ent_lp, "unfinished": unfinished,
                "rng": rng}

    init = {
        "pos": jnp.array(0, jnp.int32),
        "it": jnp.full((B,), BOS, jnp.int32),
        "cache": cache,
        "seq": jnp.full((B, L), PAD, jnp.int32),
        "tok_lp": jnp.zeros((B, L), jnp.float32),
        "ent": jnp.zeros((B, L), jnp.float32),
        "unfinished": jnp.ones((B,), bool),
        "rng": rng,
    }
    out = jax.lax.while_loop(cond, body, init)
    return {"seq": out["seq"], "tok_logprobs": out["tok_lp"],
            "entropy": out["ent"]}


def _topk_candidates(sum_lp, lp, B, K, V):
    """Global top-K over the K·V candidate expansion (equivalent to the
    reference's per-row cols×rows enumeration + sort, CaptionModel.py:
    102-130 / :252-265: any global top-K candidate is within the top-K
    words of its own row).  Returns (scores, beam_ix, word, g) where g()
    gathers beam-major [B, K, ...] arrays by the winning parent beam."""
    cand = sum_lp[:, :, None] + lp                           # [B, K, V]
    scores, idx = jax.lax.top_k(cand.reshape(B, K * V), K)   # [B, K]
    beam_ix = idx // V
    word = (idx % V).astype(jnp.int32)

    def g(x):
        return jnp.take_along_axis(
            x, beam_ix.reshape(beam_ix.shape + (1,) * (x.ndim - 2)),
            axis=1)

    return scores, beam_ix, word, g


def _gather_cache(cache, beam_ix, B, K):
    """Reorder the flat [B*K, ...] KV cache by each row's parent beam."""
    flat_ix = (jnp.arange(B)[:, None] * K + beam_ix).reshape(-1)
    return jax.tree_util.tree_map(lambda c: c[flat_ix], cache)


def _merge_done_pool(done_p, cand_p, K, payloads):
    """Merge newly ended beams into the persistent top-K done pool
    (reference's done_beams list + final sort, CaptionModel.py:193-209).
    ``payloads`` is a list of (pool_array, candidate_array) pairs gathered
    by the same keep index; returns (new_done_p, [merged payloads])."""
    all_p = jnp.concatenate([done_p, cand_p], axis=1)
    new_p, keep = jax.lax.top_k(all_p, K)
    merged = []
    for pool, cand in payloads:
        allv = jnp.concatenate([pool, cand], axis=1)
        merged.append(jnp.take_along_axis(
            allv, keep.reshape(keep.shape + (1,) * (allv.ndim - 2)),
            axis=1))
    return new_p, merged


def _staggered_groups_scan(step, init_states, G, B, K, V, L):
    """Drive G beam groups staggered along one global time axis (the
    reference's diverse-group loop order, CaptionModel.py:58-68 /
    :227-235,326-327): at global step t, group g — processed in group
    order — takes its local step t-g, penalized by counts of each word in
    groups <g's CURRENT alive beams at that column (already advanced this
    global step)."""

    def body(states, t):
        states = list(states)
        for grp in range(G):
            local = t - grp
            pos = jnp.clip(local, 0, L - 1)
            div_counts = None
            if grp > 0:
                col_ix = jnp.broadcast_to(pos, (B, K))[:, :, None]
                div_counts = sum(
                    jax.nn.one_hot(
                        jnp.take_along_axis(states[j]["seq"], col_ix,
                                            axis=2)[..., 0], V).sum(1)
                    for j in range(grp))
            valid = (local >= 0) & (local < L)
            states[grp] = jax.lax.cond(
                valid,
                lambda s, dc=div_counts, p=pos: step(s, p, dc),
                lambda s: s, states[grp])
        return tuple(states), None

    final, _ = jax.lax.scan(body, tuple(init_states), jnp.arange(L + G - 1))
    return final


def _make_beam_step(model, params, mask_k, B, K, V, L, penalty, *,
                    diversity_lambda: float, temperature: float,
                    suppress_unk_idx, bad_endings_ix, decoding_constraint):
    """One batched beam-search step shared by ar_beam_search (single group)
    and ar_diverse_beam_search (staggered groups): expand K beams to K·V
    candidates, keep top K by cumulative AUGMENTED log-prob, gather
    per-token logprobs from the UNAUGMENTED distribution (the reference's
    beam_seq_logprobs store unaug_logprobs, CaptionModel.py:112-117), merge
    ended beams into a top-K done pool with the length penalty applied
    (:193-209), knock ended alive scores down 1000 (:210)."""

    def step(state, pos, div_counts):
        logprob, cache = model.apply(
            params, state["it"], pos, state["cache"], mask_k,
            method="ar_step")
        if temperature != 1.0:
            # reference beam_search re-normalizes every step-t>=1 logprob as
            # log_softmax(logprobs / T) (CaptionModel.py:218-219 — "should
            # not affect beam search, but will affect dbs"; it affects any
            # beam run with T != 1)
            logprob = jnp.where(
                pos > 0, jax.nn.log_softmax(logprob / temperature, axis=-1),
                logprob)
        if suppress_unk_idx is not None:
            logprob = logprob.at[:, suppress_unk_idx].add(-1000.0)
        if bad_endings_ix:
            # reference beam_search CaptionModel.py:169-170: a beam whose
            # previous word is a bad ending cannot emit the stop token
            bad = jnp.asarray(bad_endings_ix, jnp.int32)
            prev_bad = (state["it"][:, None] == bad[None, :]).any(-1)
            stop_cond = (pos > 0) & prev_bad
            for t in (PAD, EOS):
                logprob = logprob.at[:, t].set(
                    jnp.where(stop_cond, NEG_INF, logprob[:, t]))
        if decoding_constraint:
            # reference CaptionModel.py:166-167: forbid repeating the
            # previous word
            oh = jax.nn.one_hot(state["it"], V, dtype=bool)
            logprob = jnp.where(oh & (pos > 0), NEG_INF, logprob)
        lp_unaug = logprob.reshape(B, K, V)
        lp = lp_unaug
        if div_counts is not None:
            lp = lp - diversity_lambda * div_counts[:, None, :]
        scores, beam_ix, word, g = _topk_candidates(
            state["sum_lp"], lp, B, K, V)

        seq = g(state["seq"]).at[:, :, pos].set(word)
        tok = jnp.take_along_axis(g(lp_unaug), word[:, :, None],
                                  axis=2)[:, :, 0]
        tok_lp = g(state["tok_lp"]).at[:, :, pos].set(tok)
        cache = _gather_cache(cache, beam_ix, B, K)

        is_end = (word == EOS) | (pos == L - 1)
        cand_p = jnp.where(is_end, penalty(pos + 1, scores), NEG_INF)
        done_p, (done_seq, done_tok) = _merge_done_pool(
            state["done_p"], cand_p, K,
            [(state["done_seq"], seq), (state["done_tok"], tok_lp)])

        sum_lp = jnp.where(word == EOS, scores - 1000.0, scores)
        return {
            "it": word.reshape(-1), "cache": cache, "sum_lp": sum_lp,
            "seq": seq, "tok_lp": tok_lp, "done_p": done_p,
            "done_seq": done_seq, "done_tok": done_tok,
        }

    return step


def _beam_init(B, K, L, cache):
    return {
        "it": jnp.full((B * K,), BOS, jnp.int32),
        "cache": cache,
        # only beam 0 alive at step 0 so identical init beams don't duplicate
        "sum_lp": jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
                            ) * jnp.ones((B, 1)),
        "seq": jnp.full((B, K, L), PAD, jnp.int32),
        "tok_lp": jnp.zeros((B, K, L), jnp.float32),
        "done_p": jnp.full((B, K), NEG_INF, jnp.float32),
        "done_seq": jnp.full((B, K, L), PAD, jnp.int32),
        "done_tok": jnp.zeros((B, K, L), jnp.float32),
    }


def ar_beam_search(model, params, memory, src_mask, *, beam_size: int,
                   length_penalty: str = "",
                   suppress_unk_idx: Optional[int] = None,
                   temperature: float = 1.0,
                   decoding_constraint: bool = False,
                   bad_endings_ix: Optional[tuple] = None) -> Dict[str, Any]:
    """Batched beam search (reference CaptionModel.beam_search, group_size=1).
    Returns the done pool sorted best-first:
    {'seq': [B, K, L], 'tok_logprobs': [B, K, L], 'scores': [B, K]}.

    Deliberately scans all L steps with no early exit, like the reference's
    own loop: ended beams keep extending at score-1000 and re-enter the done
    pool at the forced final step, and with a length penalty a later (longer)
    finish can legitimately out-score an earlier one — an admissible early
    exit would have to model that, for savings only the KD teacher pass
    would notice.  Token-exact vs the reference:
    test_torch_parity::test_beam_search_parity."""
    L = model.max_length
    B = memory.shape[0]
    K = beam_size
    V = model.tgt_vocab
    penalty = length_penalty_fn(length_penalty)

    mem_k = jnp.repeat(memory, K, axis=0)
    mask_k = None if src_mask is None else jnp.repeat(src_mask, K, axis=0)
    cache = model.apply(params, mem_k, L + 1, method="init_ar_cache")
    step = _make_beam_step(model, params, mask_k, B, K, V, L, penalty,
                           diversity_lambda=0.0, temperature=temperature,
                           suppress_unk_idx=suppress_unk_idx,
                           bad_endings_ix=bad_endings_ix,
                           decoding_constraint=decoding_constraint)
    final, _ = jax.lax.scan(lambda s, pos: (step(s, pos, None), None),
                            _beam_init(B, K, L, cache), jnp.arange(L))
    return {"seq": final["done_seq"], "tok_logprobs": final["done_tok"],
            "scores": final["done_p"]}


def ar_diverse_beam_search(model, params, memory, src_mask, *,
                           beam_size: int, group_size: int,
                           diversity_lambda: float = 0.5,
                           length_penalty: str = "",
                           suppress_unk_idx: Optional[int] = None,
                           temperature: float = 1.0,
                           decoding_constraint: bool = False,
                           bad_endings_ix: Optional[tuple] = None
                           ) -> Dict[str, Any]:
    """Diverse beam search (reference CaptionModel.beam_search with
    group_size > 1, :48-222): beam_size splits into group_size groups of
    bdash beams, STAGGERED along one time axis exactly as the reference
    runs them — at global step t, group g (processed in group order) takes
    its local step t-g, with its logits penalized by
    diversity_lambda x (count of each word in groups <g's CURRENT ALIVE
    beams at column t-g).  Because earlier groups are one step further
    ahead (and re-gathered by their own later selections), this is NOT the
    same as penalizing with earlier groups' finished sequences — the
    staggered reads are reproduced faithfully here.

    Returns {'seq': [B, K, L], 'tok_logprobs', 'scores'} with the groups'
    beams concatenated (bdash per group, group-major — the reference's
    done_beams ordering after per-group sort)."""
    bdash = beam_size // group_size
    assert bdash * group_size == beam_size, "group_size must divide beam_size"
    G = group_size
    L = model.max_length
    B = memory.shape[0]
    K = bdash
    V = model.tgt_vocab
    penalty = length_penalty_fn(length_penalty)

    mem_k = jnp.repeat(memory, K, axis=0)
    mask_k = None if src_mask is None else jnp.repeat(src_mask, K, axis=0)
    cache = model.apply(params, mem_k, L + 1, method="init_ar_cache")
    step = _make_beam_step(model, params, mask_k, B, K, V, L, penalty,
                           diversity_lambda=diversity_lambda,
                           temperature=temperature,
                           suppress_unk_idx=suppress_unk_idx,
                           bad_endings_ix=bad_endings_ix,
                           decoding_constraint=decoding_constraint)

    final = _staggered_groups_scan(
        step, (_beam_init(B, K, L, cache) for _ in range(G)),
        G, B, K, V, L)
    return {
        "seq": jnp.concatenate([s["done_seq"] for s in final], axis=1),
        "tok_logprobs": jnp.concatenate([s["done_tok"] for s in final],
                                        axis=1),
        "scores": jnp.concatenate([s["done_p"] for s in final], axis=1),
    }


def ar_old_beam_search(model, params, memory, src_mask, *, beam_size: int,
                       group_size: int = 1, diversity_lambda: float = 0.5,
                       temperature: float = 1.0, length_penalty: str = "",
                       decoding_constraint: bool = False,
                       remove_bad_endings: bool = False,
                       bad_endings_ix: Optional[tuple] = None,
                       suppress_unk_idx: Optional[int] = None
                       ) -> Dict[str, Any]:
    """Legacy beam search (reference ``CaptionModel.old_beam_search``
    :224-381, reached only through ``AttModel._old_sample_beam`` :223-261 —
    which no reference flow ever dispatches; kept here with the same
    standing: a tested library entry point outside the eval dispatch).

    Where it deliberately differs from :func:`ar_beam_search` (the modern
    ``beam_search``), matching the legacy quirks exactly:

      * the per-step stored log-probs are the PARENT beam's full
        unaugmented distribution row (``v['r']`` :264,283), not the chosen
        token's scalar — returned as ``row_logprobs`` [B, K, L, V];
      * each done beam reports ``unaug_p`` = that row buffer summed over
        time AND vocab (:365), a quirk kept verbatim;
      * a beam that emits eos has its cumulative score set to the absolute
        constant -1000 (:371), not score-1000 as in the modern pool;
      * ``remove_bad_endings`` blocks only column 0/pad (:332-333) — not
        the eos the fork actually terminates on;
      * ``suppress_unk_idx``, when given, subtracts 1000 every step; the
        caller decides when to pass it, reproducing the reference's
        ``elif self.unk_idx is not None`` (:336-337) that fires even with
        ``suppress_UNK=0`` whenever ``opt.unk_idx`` is set.

    Groups are staggered along global time exactly as the legacy loop runs
    them (:326-327), with group g at local step t-g penalized by earlier
    groups' current alive beams at that column (:227-235).  Returns
    ``{'seq': [B, K, L], 'row_logprobs': [B, K, L, V], 'scores': [B, K],
    'unaug_p': [B, K]}`` — groups concatenated group-major, each group's
    done beams sorted best-first by length-penalized score (:379-380).
    Token-exact vs the reference:
    test_torch_parity::test_old_beam_search_parity.
    """
    bdash = beam_size // group_size
    assert bdash * group_size == beam_size, "group_size must divide beam_size"
    G = group_size
    L = model.max_length
    B = memory.shape[0]
    K = bdash
    V = model.tgt_vocab
    penalty = length_penalty_fn(length_penalty)

    mem_k = jnp.repeat(memory, K, axis=0)
    mask_k = None if src_mask is None else jnp.repeat(src_mask, K, axis=0)
    cache0 = model.apply(params, mem_k, L + 1, method="init_ar_cache")

    def step(state, pos, div_counts):
        logprob, cache = model.apply(
            params, state["it"], pos, state["cache"], mask_k,
            method="ar_step")
        if temperature != 1.0:
            # the legacy loop re-normalizes every post-init logprob table as
            # log_softmax(logprobs / T) (CaptionModel.py:380-381)
            logprob = jnp.where(
                pos > 0, jax.nn.log_softmax(logprob / temperature, axis=-1),
                logprob)
        if decoding_constraint:
            # scatter an exact -inf at the previous word (:329-330) — the
            # legacy loop mutates BEFORE cloning the unaug rows, so the
            # stored 'r' rows (and hence unaug_p) carry the -inf too
            oh = jax.nn.one_hot(state["it"], V, dtype=bool)
            logprob = jnp.where(oh & (pos > 0), -jnp.inf, logprob)
        if remove_bad_endings and bad_endings_ix:
            bad = jnp.asarray(bad_endings_ix, jnp.int32)
            prev_bad = (state["it"][:, None] == bad[None, :]).any(-1)
            # column 0 (pad) ONLY, exact -inf — legacy quirk (:332-333)
            logprob = logprob.at[:, PAD].set(
                jnp.where((pos > 0) & prev_bad, -jnp.inf, logprob[:, PAD]))
        if suppress_unk_idx is not None:
            logprob = logprob.at[:, suppress_unk_idx].add(-1000.0)
        lp_unaug = logprob.reshape(B, K, V)   # = the rows stored as 'r'
        lp = lp_unaug
        if div_counts is not None:
            lp = lp - diversity_lambda * div_counts[:, None, :]
        scores, beam_ix, word, g = _topk_candidates(
            state["sum_lp"], lp, B, K, V)

        seq = g(state["seq"]).at[:, :, pos].set(word)
        row_lp = g(state["row_lp"]).at[:, :, pos, :].set(g(lp_unaug))
        cache = _gather_cache(cache, beam_ix, B, K)

        is_end = (word == EOS) | (pos == L - 1)
        cand_p = jnp.where(is_end, penalty(pos + 1, scores), NEG_INF)
        done_p, (done_seq, done_row, done_unaug) = _merge_done_pool(
            state["done_p"], cand_p, K,
            [(state["done_seq"], seq), (state["done_row"], row_lp),
             (state["done_unaug"], row_lp.sum((2, 3)))])
        # absolute -1000 reset on eos (:371), NOT score-1000
        sum_lp = jnp.where(word == EOS, -1000.0, scores)
        return {"it": word.reshape(-1), "cache": cache, "sum_lp": sum_lp,
                "seq": seq, "row_lp": row_lp, "done_p": done_p,
                "done_seq": done_seq, "done_row": done_row,
                "done_unaug": done_unaug}

    def init_state():
        s = _beam_init(B, K, L, cache0)
        for k in ("tok_lp", "done_tok"):
            del s[k]
        s["row_lp"] = jnp.zeros((B, K, L, V), jnp.float32)
        s["done_row"] = jnp.zeros((B, K, L, V), jnp.float32)
        s["done_unaug"] = jnp.zeros((B, K), jnp.float32)
        return s

    final = _staggered_groups_scan(
        step, (init_state() for _ in range(G)), G, B, K, V, L)
    return {
        "seq": jnp.concatenate([s["done_seq"] for s in final], axis=1),
        "row_logprobs": jnp.concatenate([s["done_row"] for s in final],
                                        axis=1),
        "scores": jnp.concatenate([s["done_p"] for s in final], axis=1),
        "unaug_p": jnp.concatenate([s["done_unaug"] for s in final], axis=1),
    }


def ar_diverse_sample(model, params, rng, memory, src_mask, *,
                      group_size: int, diversity_lambda: float = 0.5,
                      sample_method: str = "greedy", temperature: float = 1.0,
                      decoding_constraint: bool = False,
                      block_trigrams: bool = False,
                      bad_endings_ix: Optional[tuple] = None
                      ) -> Dict[str, Any]:
    """Group-diverse sampling (reference AttModel._diverse_sample
    :519-614): group_size sequences per image, each group's logits penalized
    by previous groups' same-step choices.  Returns {'seq': [B, G, L],
    'tok_logprobs': [B, G, L]}."""
    seqs, lps = [], []
    penalty = None
    for g in range(group_size):
        rng, k = jax.random.split(rng)
        out = ar_sample(model, params, k, memory, src_mask,
                        sample_method=sample_method, temperature=temperature,
                        penalty_seqs=penalty,
                        diversity_lambda=diversity_lambda,
                        decoding_constraint=decoding_constraint,
                        block_trigrams=block_trigrams,
                        bad_endings_ix=bad_endings_ix)
        seqs.append(out["seq"])
        lps.append(out["tok_logprobs"])
        penalty = jnp.stack(seqs, axis=1)
    return {"seq": jnp.stack(seqs, 1), "tok_logprobs": jnp.stack(lps, 1)}
