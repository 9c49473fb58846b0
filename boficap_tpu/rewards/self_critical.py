"""Self-critical reward plumbing (parity with captioning/utils/rewards.py).

Host-side: sequences arrive as numpy int arrays (device_get of sampled ids),
rewards leave as numpy float arrays (device_put back into the jit'd RL loss).
Scorer singletons are initialized once per run from a cached df pickle or
'corpus' mode, exactly like the reference's ``init_scorer`` (rewards.py:25-31).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from .bleu import Bleu
from .cider import Cider, CiderD
from .ngrams import load_doc_freq

CiderD_scorer: Optional[CiderD] = None
Cider_scorer: Optional[Cider] = None
Bleu_scorer: Optional[Bleu] = None
_native = None


def init_scorer(cached_tokens: str = "corpus", base_dir: str = "data",
                use_native: bool = True):
    """cached_tokens: 'corpus' or the stem of a '<stem>-idxs.p' pickle
    produced by scripts/prepro_ngrams.py.

    The native C++ CIDEr-D (boficap_tpu/native) handles the per-step RL
    scoring when it builds (the python scorer costs ~170 ms per RL batch,
    longer than the device step); the python scorers stay authoritative for
    tests/metrics and as the fallback."""
    global CiderD_scorer, Cider_scorer, Bleu_scorer, _native
    df_dict, ref_len = None, None
    if cached_tokens and cached_tokens != "corpus":
        path = cached_tokens if cached_tokens.endswith(".p") else \
            os.path.join(base_dir, cached_tokens + ".p")
        if os.path.exists(path):
            df_dict, ref_len = load_doc_freq(path)
    mode = "cached" if df_dict is not None else "corpus"
    CiderD_scorer = CiderD(df=mode, df_dict=df_dict, ref_len=ref_len)
    Cider_scorer = Cider(df=mode, df_dict=df_dict, ref_len=ref_len)
    Bleu_scorer = Bleu(4)
    _native = None
    if use_native:
        from ..native import get_ciderd
        _native = get_ciderd()
        if _native is not None:
            if df_dict is not None:
                keys = [" ".join(k) for k in df_dict.keys()]
                _native.set_df(keys, [float(v) for v in df_dict.values()],
                               float(ref_len))
            else:
                _native.clear_df()


def _cider_scores(res_list, refs_list):
    """res_list: [cand str]; refs_list: [[ref str]] aligned.  Native C++
    scorer when available, python otherwise (identical results — tested)."""
    if _native is not None:
        return np.asarray(_native.score(res_list, list(refs_list)),
                          np.float32)
    gts = {i: r for i, r in enumerate(refs_list)}
    res = [{"image_id": i, "caption": [c]} for i, c in enumerate(res_list)]
    _, scores = CiderD_scorer.compute_score(gts, res)
    return scores.astype(np.float32)


def array_to_str(arr) -> str:
    """Space-joined token ids, stopping at the first 0 (rewards.py:33-39)."""
    out = []
    for x in arr:
        out.append(str(int(x)))
        if int(x) == 0:
            break
    # the reference includes the terminating '0'; strip() only whitespace
    return " ".join(out)


def _opt_get(opt, key, default):
    if hasattr(opt, "get"):
        return opt.get(key, default)
    return getattr(opt, key, default)


def _gts_dict(data_gts) -> "OrderedDict[int, List[str]]":
    gts = OrderedDict()
    for i, img_refs in enumerate(data_gts):
        gts[i] = [array_to_str(img_refs[j]) for j in range(len(img_refs))]
    return gts


def get_self_critical_reward(greedy_res: np.ndarray, data_gts,
                             gen_result: np.ndarray, opt) -> np.ndarray:
    """Classic SCST: reward = score(sample) - score(greedy baseline)
    (rewards.py:41-84).  Returns [B*n, L] rewards broadcast over time."""
    batch_size = len(data_gts)
    gen_result = np.asarray(gen_result)
    greedy_res = np.asarray(greedy_res)
    n_gen = gen_result.shape[0]
    seq_per_img = n_gen // batch_size

    res = {i: [array_to_str(gen_result[i])] for i in range(n_gen)}
    res.update({n_gen + i: [array_to_str(greedy_res[i])]
                for i in range(batch_size)})
    gts0 = _gts_dict(data_gts)
    gts = {i: gts0[i // seq_per_img] for i in range(n_gen)}
    gts.update({n_gen + i: gts0[i] for i in range(batch_size)})

    cw = _opt_get(opt, "cider_reward_weight", 1)
    bw = _opt_get(opt, "bleu_reward_weight", 0)
    scores = 0.0
    if cw > 0:
        ids = list(range(n_gen + batch_size))
        cider = _cider_scores([res[i][0] for i in ids],
                              [gts[i] for i in ids])
        scores = scores + cw * cider
    if bw > 0:
        _, bleu = Bleu_scorer.compute_score(gts, res)
        scores = scores + bw * np.array(bleu[3])

    adv = (scores[:n_gen].reshape(batch_size, seq_per_img)
           - scores[n_gen:][:, None]).reshape(n_gen)
    return np.repeat(adv[:, None], gen_result.shape[1], 1).astype(np.float32)


def get_scores(data_gts, gen_result: np.ndarray, opt,
               gts_strs=None) -> np.ndarray:
    """Per-sample scores for the structure losses (rewards.py:86-117).

    ``gts_strs``: precomputed ``_gts_dict(data_gts)`` — the UIC RL step
    scores two branches (SA + NA) against the SAME references, and the
    string conversion was ~15% of the host phase; callers scoring several
    branches share one dict (train/steps.py::rl_host_scores)."""
    gen_result = np.asarray(gen_result)
    B = gen_result.shape[0]
    seq_per_img = B // len(data_gts)
    res = {i: [array_to_str(gen_result[i])] for i in range(B)}
    gts0 = _gts_dict(data_gts) if gts_strs is None else gts_strs
    gts = {i: gts0[i // seq_per_img] for i in range(B)}

    cw = _opt_get(opt, "cider_reward_weight", 1)
    bw = _opt_get(opt, "bleu_reward_weight", 0)
    scores = 0.0
    if cw > 0:
        cider = _cider_scores([res[i][0] for i in range(B)],
                              [gts[i] for i in range(B)])
        scores = scores + cw * cider
    if bw > 0:
        _, bleu = Bleu_scorer.compute_score(gts, res)
        scores = scores + bw * np.array(bleu[3])
    return np.asarray(scores, np.float32)


def get_self_cider_scores(data_gts, gen_result: np.ndarray, opt) -> np.ndarray:
    """Eigenvalue diversity of each image's sample group (rewards.py:119-138)."""
    gen_result = np.asarray(gen_result)
    B = gen_result.shape[0]
    seq_per_img = B // len(data_gts)
    res = [array_to_str(gen_result[i]) for i in range(B)]
    out = []
    for i in range(len(data_gts)):
        G = Cider_scorer.my_self_cider(
            [res[i * seq_per_img:(i + 1) * seq_per_img]])[0]
        eig = np.clip(np.linalg.eigvalsh(G / 10.0), 0, None)
        sq = np.sqrt(eig)
        denom = max(sq.sum(), 1e-12)
        out.append(-np.log(max(sq[-1], 1e-12) / denom) / np.log(len(eig)))
    return np.array(out, np.float32)
