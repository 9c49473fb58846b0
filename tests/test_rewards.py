"""Reward-layer tests: CIDEr-D / BLEU properties + SCST plumbing."""

import numpy as np
import pytest

from boficap_tpu.rewards import self_critical as sc
from boficap_tpu.rewards.bleu import Bleu
from boficap_tpu.rewards.cider import Cider, CiderD
from boficap_tpu.rewards.ngrams import (build_doc_freq, load_doc_freq,
                                        precook, save_doc_freq)


GTS = {
    0: ["4 5 6 7 0", "4 5 8 9 0"],
    1: ["10 11 12 0", "10 13 12 0"],
    2: ["14 15 16 17 18 0", "14 15 19 0"],
}


def test_precook():
    c = precook("a b a b", 2)
    assert c[("a",)] == 2 and c[("b",)] == 2
    assert c[("a", "b")] == 2 and c[("b", "a")] == 1


def test_doc_freq_roundtrip(tmp_path):
    df, n = build_doc_freq(GTS.values())
    assert n == 3
    assert df[("4", "5")] == 1.0          # appears in image 0 only
    p = str(tmp_path / "df.p")
    save_doc_freq(p, df, n)
    df2, n2 = load_doc_freq(p)
    assert n2 == 3 and df2[("4", "5")] == 1.0


def test_ciderd_perfect_match_scores_ten():
    scorer = CiderD(df="corpus")
    res = [{"image_id": i, "caption": [GTS[i][0]]} for i in GTS]
    mean, scores = scorer.compute_score(GTS, res)
    # candidate identical to one of two refs: sim with that ref == 1 per n
    assert scores.shape == (3,)
    assert (scores > 4.9).all()           # >= 10 * (1/2 refs) - cross terms
    solo_gts = {i: [GTS[i][0]] for i in GTS}
    _, solo = scorer.compute_score(solo_gts, res)
    np.testing.assert_allclose(solo, 10.0, atol=1e-6)


def test_ciderd_length_penalty_orders():
    scorer = CiderD(df="corpus")
    res_good = [{"image_id": 0, "caption": ["4 5 6 7 0"]}]
    res_short = [{"image_id": 0, "caption": ["4 5 0"]}]
    # multi-image gts so idf > 0 (log(1)-corpus degenerates to zero vectors)
    _, a = scorer.compute_score(GTS, res_good)
    _, b = scorer.compute_score(GTS, res_short)
    assert a[0] > b[0]


def test_bleu_perfect_and_zero():
    bl = Bleu(4)
    corpus, per = bl.compute_score({0: ["4 5 6 7"]}, {0: ["4 5 6 7"]})
    assert corpus[3] == pytest.approx(1.0, abs=1e-6)
    corpus0, per0 = bl.compute_score({0: ["4 5 6 7"]}, {0: ["9 10 11 12"]})
    assert corpus0[3] < 1e-3


def test_scst_reward_shapes_and_sign():
    sc.init_scorer("corpus")
    gts = [np.array([[4, 5, 6, 7, 0, 0]]), np.array([[10, 11, 12, 0, 0, 0]])]
    # samples: image 0 gets its exact ref (good) and junk (bad)
    gen = np.array([[4, 5, 6, 7, 0, 0], [20, 21, 22, 0, 0, 0],
                    [10, 11, 12, 0, 0, 0], [23, 24, 0, 0, 0, 0]])
    greedy = np.array([[4, 5, 0, 0, 0, 0], [10, 11, 0, 0, 0, 0]])

    class O:
        cider_reward_weight = 1
        bleu_reward_weight = 0
    r = sc.get_self_critical_reward(greedy, gts, gen, O())
    assert r.shape == gen.shape
    assert r[0, 0] > r[1, 0]              # exact match beats junk
    assert r[2, 0] > r[3, 0]
    # rows constant over time
    assert (r == r[:, :1]).all()


def test_get_scores_and_self_cider():
    sc.init_scorer("corpus")
    gts = [np.array([[4, 5, 6, 7, 0]])]
    gen = np.array([[4, 5, 6, 7, 0], [4, 5, 6, 7, 0]])

    class O:
        cider_reward_weight = 1
        bleu_reward_weight = 0
    s = sc.get_scores(gts, gen, O())
    assert s.shape == (2,)
    assert s[0] == pytest.approx(s[1])
    div = sc.get_self_cider_scores(gts, gen, O())
    assert div.shape == (1,)
    # identical samples -> zero diversity
    assert div[0] == pytest.approx(0.0, abs=1e-5)


def test_array_to_str_stops_at_zero():
    assert sc.array_to_str(np.array([4, 5, 0, 7])) == "4 5 0"


def test_native_ciderd_matches_python():
    """The C++ scorer reproduces the python CIDEr-D (corpus and cached df)."""
    from boficap_tpu.native import get_ciderd
    native = pytest.importorskip("boficap_tpu.native").get_ciderd()
    if native is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    refs, cands = [], []
    for i in range(12):
        rs = []
        for _ in range(5):
            n = rng.randint(4, 12)
            rs.append(" ".join(str(x) for x in rng.randint(4, 200, n)) + " 0")
        refs.append(rs)
        n = rng.randint(3, 12)
        cand = rs[0] if i % 3 == 0 else \
            " ".join(str(x) for x in rng.randint(4, 200, n)) + " 0"
        cands.append(cand)
    # corpus mode
    native.clear_df()
    got = np.asarray(native.score(cands, refs))
    py = CiderD(df="corpus")
    gts = {i: r for i, r in enumerate(refs)}
    res = [{"image_id": i, "caption": [c]} for i, c in enumerate(cands)]
    _, want = py.compute_score(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    # cached df mode
    df, nimg = build_doc_freq(refs)
    native.set_df([" ".join(k) for k in df], [float(v) for v in df.values()],
                  float(nimg))
    got2 = np.asarray(native.score(cands, refs))
    py2 = CiderD(df="cached", df_dict=df, ref_len=nimg)
    _, want2 = py2.compute_score(gts, res)
    native.clear_df()
    np.testing.assert_allclose(got2, want2, rtol=1e-6, atol=1e-8)


def test_native_ciderd_speed():
    from boficap_tpu.native import get_ciderd
    import time
    native = get_ciderd()
    if native is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    refs = [[" ".join(str(x) for x in rng.randint(4, 9500, 10)) + " 0"
             for _ in range(5)] for _ in range(50)]
    cands = []
    refs_aligned = []
    for i in range(250):
        cands.append(" ".join(str(x) for x in rng.randint(4, 9500, 9)) + " 0")
        refs_aligned.append(refs[i // 5])
    # interleaved min-of-5: timing native and python in ALTERNATING windows
    # so a co-tenant load spike (e.g. a concurrent TPU bench on this host)
    # hits both sides, not just whichever ran first; min() then drops the
    # spiked samples symmetrically
    py = CiderD(df="corpus")
    gts = {i: r for i, r in enumerate(refs_aligned)}
    res = [{"image_id": i, "caption": [c]} for i, c in enumerate(cands)]
    dt = dt_py = float("inf")
    for _ in range(5):
        native.clear_df()
        t0 = time.perf_counter()
        native.score(cands, refs_aligned)
        dt = min(dt, time.perf_counter() - t0)
        t0 = time.perf_counter()
        py.compute_score(gts, res)
        dt_py = min(dt_py, time.perf_counter() - t0)
    # >=2x under arbitrary co-tenant CPU load (measured ~10x on an idle box,
    # but the native scorer degrades more than the GIL-bound python one when
    # other processes steal cores mid-timing, and CI shares this machine
    # with TPU bench/CLI runs)
    assert dt < dt_py / 2, (
        f"native {dt*1000:.1f} ms not >2x faster than python "
        f"{dt_py*1000:.1f} ms")


def test_native_ciderd_error_paths():
    """Malformed inputs raise clean Python exceptions instead of returning
    with a pending error indicator (SystemError) or corrupting the df."""
    native = pytest.importorskip("boficap_tpu.native").get_ciderd()
    if native is None:
        pytest.skip("no native toolchain")
    with pytest.raises(TypeError):
        native.score(["a b", 7], [["a"], ["b"]])       # non-str candidate
    with pytest.raises(TypeError):
        native.score(["a", "b"], [["a"], 3])           # non-list ref group
    with pytest.raises(TypeError):
        native.score("notalist", [])
    with pytest.raises(ValueError):
        native.set_df(["a", "b"], [1.0], 10.0)         # key/val length skew
    with pytest.raises(ValueError):
        native.set_df(["a"], [1.0, 2.0], 10.0)         # extra vals: also skew
    with pytest.raises(ValueError):
        native.score(["a"], [])                        # length mismatch
    # a failed set_df must drop to corpus mode, not "cached mode, empty df"
    # (which silently mis-scores everything after): install a real df, fail
    # the next set_df mid-parse, and check score matches pure corpus mode
    native.set_df(["a b"], [3.0], 100.0)
    with pytest.raises(TypeError):
        native.set_df(["a b", 123], [1.0, 2.0], 100.0)
    native_corpus = native.score(["a b c"], [["a b d", "a b e"]])
    native.clear_df()
    expect = native.score(["a b c"], [["a b d", "a b e"]])
    assert native_corpus == pytest.approx(expect)
    native.clear_df()                                  # leave clean state
    assert native.score(["a b"], [["a b"]]) is not None


def _rand_row(L, rng, zero_prob=0.7):
    """Random id row; with prob zero_prob ends in 0s, else FULL width (no
    terminating zero — the array_to_str edge the ids path must match)."""
    row = rng.randint(4, 300, size=L)
    if rng.rand() < zero_prob:
        row[rng.randint(1, L):] = 0
    return row


def test_native_score_ids_matches_string_path():
    """score_ids (int32 arrays, no id->string building) is bit-identical
    to score() on array_to_str output — corpus AND cached-df modes, with
    per-image ref widths/counts varying and rows lacking a terminating 0."""
    native = pytest.importorskip("boficap_tpu.native").get_ciderd()
    if native is None or not hasattr(native, "score_ids"):
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(7)
    B, n, Lg = 6, 3, 12
    N = B * n
    gen = np.stack([_rand_row(Lg, rng) for _ in range(N)])
    gts = []
    for _ in range(B):
        w = rng.randint(6, 16)
        gts.append(np.stack([_rand_row(w, rng)
                             for _ in range(rng.randint(2, 6))]))
    # NB: one image's refs share a width (stacked), widths differ ACROSS
    # images — pack_refs must carry the true width so zero padding does
    # not grow a phantom trailing '0' token
    res = [sc.array_to_str(gen[i]) for i in range(N)]
    refs = [[sc.array_to_str(r) for r in gts[i // n]] for i in range(N)]
    pack = sc.pack_refs(gts)
    width = np.full(N, Lg, np.int32)
    img_idx = (np.arange(N) // n).astype(np.int32)
    cands32 = np.ascontiguousarray(gen, np.int32)

    native.clear_df()
    want = np.asarray(native.score(res, refs))
    got = np.asarray(native.score_ids(cands32, width, *pack, img_idx))
    np.testing.assert_array_equal(got, want)

    df, nimg = build_doc_freq(
        [[sc.array_to_str(r) for r in g] for g in gts])
    native.set_df([" ".join(k) for k in df],
                  [float(v) for v in df.values()], float(nimg))
    want2 = np.asarray(native.score(res, refs))
    got2 = np.asarray(native.score_ids(cands32, width, *pack, img_idx))
    native.clear_df()
    np.testing.assert_array_equal(got2, want2)


def test_reward_entry_points_ids_vs_string_paths():
    """get_scores / get_self_critical_reward produce identical rewards
    through the native ids path and the string path."""
    native = pytest.importorskip("boficap_tpu.native").get_ciderd()
    if native is None or not hasattr(native, "score_ids"):
        pytest.skip("no native toolchain")
    sc.init_scorer("corpus")
    assert sc._native_ids()
    rng = np.random.RandomState(3)
    B, n, L = 5, 4, 10
    gen = np.stack([_rand_row(L, rng) for _ in range(B * n)])
    greedy = np.stack([_rand_row(L - 2, rng) for _ in range(B)])  # width skew
    gts = [np.stack([_rand_row(L + 2, rng) for _ in range(5)])
           for _ in range(B)]

    class O:
        cider_reward_weight = 1
        bleu_reward_weight = 0

    s_ids = sc.get_scores(gts, gen, O())
    r_ids = sc.get_self_critical_reward(greedy, gts, gen, O())

    class _NoIds:  # native module minus score_ids -> string path
        score = staticmethod(native.score)
        set_df = staticmethod(native.set_df)
        clear_df = staticmethod(native.clear_df)

    saved = sc._native
    try:
        sc._native = _NoIds
        s_str = sc.get_scores(gts, gen, O())
        r_str = sc.get_self_critical_reward(greedy, gts, gen, O())
    finally:
        sc._native = saved
    np.testing.assert_array_equal(s_ids, s_str)
    np.testing.assert_array_equal(r_ids, r_str)


def test_score_ids_error_paths():
    native = pytest.importorskip("boficap_tpu.native").get_ciderd()
    if native is None or not hasattr(native, "score_ids"):
        pytest.skip("no native toolchain")
    c = np.zeros((2, 4), np.int32)
    w = np.full(2, 4, np.int32)
    bank = np.zeros((1, 2, 4), np.int32)
    rc = np.full(1, 2, np.int32)
    rw = np.full(1, 4, np.int32)
    ix = np.zeros(2, np.int32)
    with pytest.raises(ValueError):
        native.score_ids(c.astype(np.int64), w, bank, rc, rw, ix)  # itemsize
    with pytest.raises(ValueError):
        native.score_ids(c, w, bank, rc, rw, np.zeros(3, np.int32))  # N skew
    with pytest.raises(ValueError):
        native.score_ids(c, w, bank, np.full(1, 9, np.int32), rw, ix)
    with pytest.raises(ValueError):
        native.score_ids(c, w, bank, rc, rw, np.full(2, 5, np.int32))  # idx
