"""Decode-path tests: the jit'd while_loop NA/SA decoders are checked against
step-by-step Python oracles that mirror the reference's control flow
(core_NAIC TransformerModel.py:1823-1876, core_SAIC :1878-1986) exactly,
calling the same model predictor/decoder methods per step; the KV-cached AR
path is checked against a no-cache full-recompute decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boficap_tpu.decode import ar as ar_mod
from boficap_tpu.decode import bound_fill as bf
from boficap_tpu.decode.sampling import sample_next_word
from boficap_tpu.models.boficap import BoFiCap, build_model
from boficap_tpu.models.layers import causal_mask
from boficap_tpu.constants import BOS, EOS, LEN, PAD, SYN_LOWER, SYN_UPPER
from tests.test_model import make_batch, tiny_cfg

L = 20
L2 = L + 2
V = 50


def _setup(train_mode, seed=0, B=4):
    cfg = tiny_cfg(train_mode)
    model = build_model(cfg, V)
    batch = make_batch(B=B, seed=seed)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    if train_mode == "AIC":
        params = model.init({"params": jax.random.PRNGKey(seed)}, att, am,
                            jnp.asarray(batch["labels"]), deterministic=True)
    else:
        params = model.init(
            {"params": jax.random.PRNGKey(seed)}, att, am,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
            jnp.asarray(batch["phrase_length"]),
            jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method=BoFiCap.encode)
    src_mask = am.astype(bool)
    return model, params, memory, src_mask


# ---------------------------------------------------------------------------
# NA oracle: reference core_NAIC per-sample bookkeeping
# ---------------------------------------------------------------------------

def oracle_na(model, params, memory, src_mask):
    B = memory.shape[0]
    extend_syn = np.zeros((B, L2), np.int32)
    extend_syn[:, 0] = LEN
    last = np.ones(B, np.int32)
    finished = np.zeros(B, bool)
    pl = np.zeros((B, L2), np.int32)
    ps = np.zeros((B, L2), np.int32)
    pn = np.zeros(B, np.int32)
    for i in range(L):
        len_lp, syn_lp = model.apply(
            params, jnp.asarray(extend_syn), jnp.asarray(last), memory,
            src_mask, True, method="bound_step")
        len_N = np.asarray(jnp.argmax(len_lp, -1)).copy()
        syn_N = np.asarray(jnp.argmax(syn_lp, -1)).copy()
        for j in range(B):
            if finished[j]:
                continue
            if len_N[j] == 0 or syn_N[j] < SYN_LOWER or syn_N[j] > SYN_UPPER:
                finished[j] = True
                continue
            if len_N[j] + last[j] >= L + 1:
                len_N[j] = L + 1 - last[j]
                finished[j] = True
            pl[j, i] = len_N[j]
            ps[j, i] = syn_N[j]
            pn[j] += 1
            extend_syn[j, last[j]:last[j] + pl[j, i]] = ps[j, i]
            last[j] += pl[j, i]
        if finished.all():
            break
    total = last - 1
    na_mask = np.zeros((B, L, L), bool)
    for j in range(B):
        na_mask[j, :, :total[j]] = True

    def fill(m):
        h = m.decode_na(jnp.asarray(extend_syn[:, 1:-1]), memory, src_mask,
                        jnp.asarray(na_mask))
        return m.generate(h)

    logprob = np.asarray(model.apply(params, method=fill))
    seq = logprob.argmax(-1)
    for j in range(B):
        seq[j, total[j]:] = PAD
    return dict(seq=seq, logprobs=logprob, phrase_num=pn,
                phrase_length=pl[:, :L], phrase_syn=ps[:, :L])


def dense_tok_ent(lp, seq):
    """Reduce an oracle's dense [B, L, V] logprobs to the decode API's
    (tok_logprobs, entropy) [B, L] pair (zero rows reduce to zeros)."""
    tok = np.take_along_axis(lp, seq[:, :, None].astype(np.int64),
                             axis=2)[:, :, 0]
    ent = -(np.exp(lp) * lp).sum(-1)
    return tok, ent


def test_na_decode_matches_oracle():
    model, params, memory, src_mask = _setup("UIC", seed=11)
    got = jax.jit(lambda m, sm, r: bf.na_decode(
        model, params, r, m, sm))(memory, src_mask, jax.random.PRNGKey(0))
    want = oracle_na(model, params, memory, src_mask)
    np.testing.assert_array_equal(np.asarray(got["phrase_length"]),
                                  want["phrase_length"])
    np.testing.assert_array_equal(np.asarray(got["phrase_syn"]),
                                  want["phrase_syn"])
    np.testing.assert_array_equal(np.asarray(got["phrase_num"]),
                                  want["phrase_num"])
    np.testing.assert_array_equal(np.asarray(got["seq"]), want["seq"])
    # loose float tolerance: whole-program XLA fusion vs op-by-op eager
    # reorders f32 reductions; an eager na_decode matches the oracle exactly
    tok, ent = dense_tok_ent(want["logprobs"], want["seq"])
    np.testing.assert_allclose(np.asarray(got["tok_logprobs"]), tok,
                               rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["entropy"]), ent,
                               rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------------------
# SA oracle: reference core_SAIC per-sample bookkeeping
# ---------------------------------------------------------------------------

def oracle_sa(model, params, memory, src_mask):
    B = memory.shape[0]
    seq = np.zeros((B, L2), np.int64)
    seq[:, 0] = BOS
    seq_lp = np.zeros((B, L, model.tgt_vocab), np.float32)
    extend_len = np.zeros((B, L2), np.int32)
    extend_len[:, 0] = LEN
    extend_word = np.zeros((B, L2), np.int64)
    extend_syn = np.zeros((B, L2), np.int64)
    phrase_mask = np.zeros((B, L2, L2), bool)
    pl = np.zeros((B, L2), np.int32)
    pl[:, 0] = 1
    ps = np.zeros((B, L2), np.int32)
    pn = np.zeros(B, np.int32)
    finished = np.zeros(B, bool)
    seq_last = np.zeros(B, np.int32)
    phrase_last = np.ones(B, np.int32)
    for i in range(1, L + 1):
        len_lp, syn_lp = model.apply(
            params, jnp.asarray(extend_len), jnp.asarray(phrase_last),
            memory, src_mask, False, method="bound_step")
        len_N = np.asarray(jnp.argmax(len_lp, -1)).copy()
        syn_N = np.asarray(jnp.argmax(syn_lp, -1)).copy()
        for j in range(B):
            if finished[j]:
                continue
            if len_N[j] == 0 or syn_N[j] < SYN_LOWER or syn_N[j] > SYN_UPPER:
                finished[j] = True
                continue
            if len_N[j] + phrase_last[j] >= L + 1:
                len_N[j] = L + 1 - phrase_last[j]
                finished[j] = True
            pl[j, i] = len_N[j]
            ps[j, i] = syn_N[j]
            pn[j] += 1
        for j in range(B):
            if pl[j, i] == 0:
                continue
            extend_syn[j, phrase_last[j]:phrase_last[j] + pl[j, i]] = ps[j, i]
            cur, prev = int(pl[j, i]), int(pl[j, i - 1])
            if cur <= prev:
                pre_pad = prev - cur
                extend_word[j, phrase_last[j]:phrase_last[j] + cur] = \
                    seq[j, seq_last[j] + pre_pad:seq_last[j] + pre_pad + cur]
            else:
                pre_less = prev - cur % prev
                ct = cur // prev
                copied = 0
                for k in range(prev):
                    times = ct if k < pre_less else ct + 1
                    extend_word[j, phrase_last[j] + copied:
                                phrase_last[j] + copied + times] = \
                        seq[j, seq_last[j] + k]
                    copied += times
            phrase_mask[j, phrase_last[j]:, :phrase_last[j] + pl[j, i]] = True

        def sa_fill(m):
            h = m.decode_sa(jnp.asarray(extend_word[:, 1:-1]),
                            jnp.asarray(extend_syn[:, 1:-1]), memory,
                            src_mask, jnp.asarray(phrase_mask[:, 1:-1, 1:-1]))
            return m.generate(h)

        logprob = np.asarray(model.apply(params, method=sa_fill))
        words = logprob.argmax(-1)
        for j in range(B):
            if pl[j, i] == 0:
                continue
            lo, n = phrase_last[j], pl[j, i]
            seq[j, lo:lo + n] = words[j, lo - 1:lo - 1 + n]
            seq_lp[j, lo - 1:lo - 1 + n] = logprob[j, lo - 1:lo - 1 + n]
            extend_len[j, lo:lo + n] = words[j, lo - 1:lo - 1 + n]
            phrase_last[j] += n
            seq_last[j] += pl[j, i - 1]
        if finished.all():
            break
    return dict(seq=seq[:, 1:-1], logprobs=seq_lp, phrase_num=pn,
                phrase_length=pl[:, 1:-1], phrase_syn=ps[:, 1:-1])


def test_sa_decode_matches_oracle():
    model, params, memory, src_mask = _setup("UIC", seed=13)
    got = jax.jit(lambda m, sm, r: bf.sa_decode(
        model, params, r, m, sm))(memory, src_mask, jax.random.PRNGKey(0))
    want = oracle_sa(model, params, memory, src_mask)
    np.testing.assert_array_equal(np.asarray(got["phrase_length"]),
                                  want["phrase_length"])
    np.testing.assert_array_equal(np.asarray(got["phrase_num"]),
                                  want["phrase_num"])
    np.testing.assert_array_equal(np.asarray(got["seq"]), want["seq"])
    tok, ent = dense_tok_ent(want["logprobs"], want["seq"])
    np.testing.assert_allclose(np.asarray(got["tok_logprobs"]), tok,
                               rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["entropy"]), ent,
                               rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------------------
# AR: KV-cached decode == full-recompute decode; beam(1) == greedy
# ---------------------------------------------------------------------------

def oracle_ar_greedy(model, params, memory, src_mask):
    """No-cache greedy decode: re-run the full decoder per step on the
    growing prefix (exactly the reference core, TransformerModel.py:1791-1804)."""
    B = memory.shape[0]
    seq = np.full((B, L), PAD, np.int32)
    lps = np.zeros((B, L, model.tgt_vocab), np.float32)
    unfinished = np.ones(B, bool)
    prefix = np.full((B, 1), BOS, np.int32)
    for t in range(L):
        Lp = prefix.shape[1]
        mask = np.asarray(causal_mask(Lp))[None]

        def step(m):
            h = m.decode_a(jnp.asarray(prefix), memory, src_mask,
                           jnp.asarray(np.broadcast_to(mask, (B, Lp, Lp))))
            return m.generate(h)

        logprob = np.asarray(model.apply(params, method=step))[:, -1]
        ids = logprob.argmax(-1)
        ids = np.where(unfinished, ids, PAD)
        lps[:, t] = np.where(unfinished[:, None], logprob, 0.0)
        seq[:, t] = ids
        unfinished = unfinished & (ids != EOS)
        prefix = np.concatenate([prefix, ids[:, None].astype(np.int32)], 1)
        if not unfinished.any():
            break
    return seq, lps


@pytest.mark.slow
def test_ar_kv_cache_matches_full_recompute():
    """Eager step-by-step KV-cache decode must EXACTLY reproduce the
    no-cache full-recompute decode on the same token stream.  (Comparing two
    free-running greedy trajectories instead would be flaky: compile-fusion
    noise can flip near-tie argmaxes.)"""
    model, params, memory, src_mask = _setup("AIC", seed=17)
    seq, lps = oracle_ar_greedy(model, params, memory, src_mask)
    B = memory.shape[0]
    cache = model.apply(params, memory, L + 1, method="init_ar_cache")
    it = jnp.full((B,), BOS, jnp.int32)
    for t in range(L):
        lp, cache = model.apply(params, it, t, cache, src_mask,
                                method="ar_step")
        np.testing.assert_allclose(np.asarray(lp), lps[:, t],
                                   rtol=1e-5, atol=1e-6)
        it = jnp.asarray(seq[:, t])


def test_ar_sample_self_consistent():
    """Greedy ar_sample: the stored per-token log-prob/entropy match an
    eager ar_step REPLAY of the sample's own token stream (comparing two
    free-running trajectories instead would be flaky — fusion noise can
    flip near-tie argmaxes); rows after eos are PAD with zeros."""
    model, params, memory, src_mask = _setup("AIC", seed=17)
    got = jax.jit(lambda m, sm, r: ar_mod.ar_sample(
        model, params, r, m, sm))(memory, src_mask, jax.random.PRNGKey(0))
    seq = np.asarray(got["seq"])
    tok = np.asarray(got["tok_logprobs"])
    ent = np.asarray(got["entropy"])
    B = seq.shape[0]
    cache = model.apply(params, memory, L + 1, method="init_ar_cache")
    it = jnp.full((B,), BOS, jnp.int32)
    unfinished = np.ones(B, bool)
    for t in range(L):
        lp, cache = model.apply(params, it, t, cache, src_mask,
                                method="ar_step")
        lp = np.asarray(lp)
        wtok = np.take_along_axis(lp, seq[:, t][:, None], axis=1)[:, 0]
        went = -(np.exp(lp) * lp).sum(-1)
        for b in range(B):
            if unfinished[b]:
                np.testing.assert_allclose(tok[b, t], wtok[b],
                                           rtol=2e-2, atol=1e-3)
                np.testing.assert_allclose(ent[b, t], went[b],
                                           rtol=2e-2, atol=1e-3)
            else:
                assert seq[b, t] == PAD and tok[b, t] == 0 and ent[b, t] == 0
        unfinished &= seq[:, t] != EOS
        it = jnp.asarray(seq[:, t])


def test_beam_one_equals_greedy():
    model, params, memory, src_mask = _setup("AIC", seed=19)
    greedy = ar_mod.ar_sample(model, params, jax.random.PRNGKey(0), memory,
                              src_mask)
    beam = jax.jit(lambda m, sm: ar_mod.ar_beam_search(
        model, params, m, sm, beam_size=1))(memory, src_mask)
    g = np.asarray(greedy["seq"])
    b = np.asarray(beam["seq"])[:, 0]
    # beam seq includes everything up to & incl. eos; greedy pads after eos
    for i in range(g.shape[0]):
        n = np.argmax(g[i] == EOS) + 1 if (g[i] == EOS).any() else L
        np.testing.assert_array_equal(g[i, :n], b[i, :n])


def test_beam_scores_improve_with_width():
    model, params, memory, src_mask = _setup("AIC", seed=23)
    b1 = ar_mod.ar_beam_search(model, params, memory, src_mask, beam_size=1)
    b4 = ar_mod.ar_beam_search(model, params, memory, src_mask, beam_size=4)
    assert (np.asarray(b4["scores"][:, 0])
            >= np.asarray(b1["scores"][:, 0]) - 1e-5).all()


def test_sampling_methods(rng):
    lp = jnp.asarray(np.log(np.full((3, 7), 1.0 / 7, np.float32)))
    for method in ("greedy", "sample", "top3", "top0.8", "gumbel"):
        ids, tok = sample_next_word(jax.random.PRNGKey(1), lp, method, 1.0)
        assert ids.shape == (3,)
        assert np.isfinite(np.asarray(tok)).all()
    # greedy picks argmax
    lp2 = jnp.asarray(np.log(np.array([[0.1, 0.7, 0.2]], np.float32)))
    ids, tok = sample_next_word(jax.random.PRNGKey(1), lp2, "greedy", 1.0)
    assert int(ids[0]) == 1
    # top-k masks everything outside k
    ids_k, _ = sample_next_word(jax.random.PRNGKey(2), lp2, "top1", 1.0)
    assert int(ids_k[0]) == 1


def test_nnaic_decode_and_forward():
    model, params, memory, src_mask = _setup("NNAIC", seed=29)
    out = jax.jit(lambda m, sm, r: bf.nnaic_decode(
        model, params, r, m, sm))(memory, src_mask, jax.random.PRNGKey(0))
    B = memory.shape[0]
    assert out["seq"].shape == (B, L)
    assert out["length"].shape == (B,)
    seq = np.asarray(out["seq"])
    ln = np.asarray(out["length"])
    for b in range(B):
        assert (seq[b, ln[b]:] == PAD).all()
        assert np.isfinite(np.asarray(out["tok_logprobs"][b])).all()
        assert np.isfinite(np.asarray(out["entropy"][b])).all()


def test_uic_s_decode_branches():
    """UIC_s inference cores: syn-predictor SA decode and plan-gated AR."""
    model, params, memory, src_mask = _setup("UIC_s", seed=31)
    sa = jax.jit(lambda m, sm, r: bf.sa_decode(
        model, params, r, m, sm, predictor_use_syn=True))(
        memory, src_mask, jax.random.PRNGKey(0))
    ar = jax.jit(lambda m, sm, r: bf.uic_s_ar_decode(
        model, params, r, m, sm))(memory, src_mask, jax.random.PRNGKey(1))
    B = memory.shape[0]
    for out in (sa, ar):
        assert out["seq"].shape == (B, L)
        assert np.isfinite(np.asarray(out["tok_logprobs"])).all()
        assert np.isfinite(np.asarray(out["entropy"])).all()
    # AR words only inside the planned length (label positions 1..total)
    total = np.asarray(ar["phrase_length"]).sum(-1)
    seq = np.asarray(ar["seq"])
    for b in range(B):
        assert (seq[b, int(total[b]):] == PAD).all()


def test_diverse_sampling_and_beam():
    model, params, memory, src_mask = _setup("AIC", seed=37)
    out = ar_mod.ar_diverse_sample(
        model, params, jax.random.PRNGKey(0), memory, src_mask,
        group_size=3, sample_method="greedy")
    B = memory.shape[0]
    assert out["seq"].shape == (B, 3, L)
    # diversity penalty must change later groups vs group 0 (greedy would
    # otherwise repeat the identical caption)
    s = np.asarray(out["seq"])
    assert not np.array_equal(s[:, 0], s[:, 1])
    dbs = ar_mod.ar_diverse_beam_search(model, params, memory, src_mask,
                                        beam_size=4, group_size=2)
    assert dbs["seq"].shape == (B, 4, L)
    assert np.isfinite(np.asarray(dbs["scores"])).all()


def test_block_trigrams_runs():
    model, params, memory, src_mask = _setup("AIC", seed=41)
    out = ar_mod.ar_sample(model, params, jax.random.PRNGKey(0), memory,
                           src_mask, block_trigrams=True)
    assert np.isfinite(np.asarray(out["tok_logprobs"])).all()


def test_decoding_constraint_blocks_repeats():
    model, params, memory, src_mask = _setup("AIC", seed=43)
    out = ar_mod.ar_sample(model, params, jax.random.PRNGKey(0), memory,
                           src_mask, decoding_constraint=True)
    s = np.asarray(out["seq"])
    for b in range(s.shape[0]):
        for t in range(1, L):
            if s[b, t] == PAD:
                break
            assert s[b, t] != s[b, t - 1]


def test_pb_decode_runs():
    from boficap_tpu.decode.pb import pb_decode
    model, params, memory, src_mask = _setup("PB_pad", seed=59, B=3)
    out = jax.jit(lambda m, s, k: pb_decode(model, params, k, m, s))(
        memory, src_mask, jax.random.PRNGKey(0))
    out = jax.tree_util.tree_map(np.asarray, out)
    assert out["seq"].shape == (3, L)
    total = out["phrase_length"].sum(-1)
    for b in range(3):
        assert (out["seq"][b, total[b]:] == 0).all()
        # real per-word logprobs at generated positions, zero beyond
        assert (out["tok_logprobs"][b, total[b]:] == 0).all()
        assert np.isfinite(out["tok_logprobs"][b, :total[b]]).all()
        if total[b]:
            assert (out["entropy"][b, :total[b]] > 0).all()


def test_pb_decode_jit_matches_host_oracle():
    """The while_loop PB decode must reproduce the host-driven packed loop
    bit-exactly under greedy decoding (plan, words, and phrase frame).
    The oracle pads its packed tensors to the while_loop's static width so
    both sides see identical reduction orders (see pb_decode_host.pad_to),
    and the model computes in float32: under the default bfloat16,
    standalone-jit vs while_loop-inlined programs fuse differently and the
    ~1e-2 reduction-order noise can flip greedy argmaxes."""
    from boficap_tpu.decode.pb import pb_decode, pb_decode_host
    for seed in (59, 7, 23):
        cfg = tiny_cfg("PB_pad")
        cfg.dtype = "float32"
        model = build_model(cfg, V)
        batch = make_batch(B=4, seed=seed)
        att = jnp.asarray(batch["att_feats"])
        am = jnp.asarray(batch["att_masks"])
        params = model.init(
            {"params": jax.random.PRNGKey(seed)}, att, am,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
            jnp.asarray(batch["phrase_length"]),
            jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
        memory = model.apply(params, att, am, deterministic=True,
                             method="encode")
        src_mask = am.astype(bool)
        host = pb_decode_host(model, params, jax.random.PRNGKey(0),
                              jnp.asarray(batch["att_feats"][:4]),
                              jnp.asarray(batch["att_masks"][:4]),
                              pad_to=2 * (model.max_length + 2))
        jit = jax.tree_util.tree_map(
            np.asarray,
            pb_decode(model, params, jax.random.PRNGKey(0), memory,
                      src_mask))
        np.testing.assert_array_equal(jit["seq"], host["seq"])
        np.testing.assert_array_equal(jit["phrase_num"], host["phrase_num"])
        np.testing.assert_array_equal(jit["phrase_length"],
                                      host["phrase_length"])


def test_pb_packed_layout_matches_pack_decoder_inputs():
    """packed_layout's traced prefix-sum/gather math must reproduce the
    host packer (data/pb_pack.pack_decoder_inputs) bit-exactly on the
    genuine-width prefix, for random lockstep plans."""
    from boficap_tpu.decode.pb import packed_layout
    from boficap_tpu.data.pb_pack import pack_decoder_inputs
    rng = np.random.RandomState(11)
    L2 = L + 2
    for _ in range(12):
        B = rng.randint(2, 6)
        pl = np.zeros((B, L2), np.int64)
        pl[:, 0] = 1
        pn = np.full(B, 1, np.int64)
        # lockstep rounds: every (still-alive) sample appends one phrase
        rounds = rng.randint(1, 5)
        alive = np.ones(B, bool)
        for t in range(rounds):
            n = rng.randint(0, 6, size=B)
            n = np.where(alive & (pl.sum(1) + n <= L + 1), n, 0)
            pl[np.arange(B), pn] = np.where(n > 0, n, pl[np.arange(B), pn])
            pn += (n > 0).astype(np.int64)
            alive &= n > 0
        seq = rng.randint(4, 40, size=(B, L2)).astype(np.int64)
        seq[:, 0] = 1
        host_ids, host_slot, host_mask = pack_decoder_inputs(seq, pn, pl)
        Lp = host_ids.shape[1]
        W = 2 * L2
        ids, slot, mask, starts = jax.tree_util.tree_map(
            np.asarray,
            packed_layout(jnp.asarray(seq), jnp.asarray(pl), L + 1, W))
        if Lp == 0:
            assert (ids == 0).all() and not mask.any()
            continue
        np.testing.assert_array_equal(ids[:, :Lp], host_ids)
        assert (ids[:, Lp:] == 0).all()
        np.testing.assert_array_equal(mask[:, :Lp, :Lp], host_mask)
        assert not mask[:, :, Lp:].any()     # no key visibility past width
        # slot comparison only where the host wrote a column id
        valid = host_mask.any(1)
        np.testing.assert_array_equal(slot[:, :Lp][valid], host_slot[valid])


def test_pb_decode_packed_width_clamp():
    """A tiny packed-width cap ends generation PER SAMPLE instead of
    corrupting the layout: output stays a consistent phrase frame within
    the cap, and every sample's packed footprint fits the cap."""
    from boficap_tpu.decode.pb import pb_decode
    model, params, memory, src_mask = _setup("PB_pad", seed=59, B=4)
    out = jax.tree_util.tree_map(
        np.asarray,
        pb_decode(model, params, jax.random.PRNGKey(0), memory, src_mask,
                  packed_width=4))
    total = out["phrase_length"].sum(-1)
    assert (total <= 4).all()          # nothing decodes past the cap
    for b in range(4):
        assert (out["seq"][b, total[b]:] == 0).all()


def test_pb_decode_lossless_width_matches_oracle():
    """At the provable packed-width upper bound L*(L+1)//2 + 1 the
    per-sample overflow clamp is unreachable, so the jit decode must equal
    the (unbounded) host oracle bit-exactly — same protocol as
    test_pb_decode_jit_matches_host_oracle but at the lossless width."""
    from boficap_tpu.decode.pb import pb_decode, pb_decode_host
    cfg = tiny_cfg("PB_pad")
    cfg.dtype = "float32"
    model = build_model(cfg, V)
    W = model.max_length * (model.max_length + 1) // 2 + 1
    batch = make_batch(B=4, seed=31)
    att = jnp.asarray(batch["att_feats"])
    am = jnp.asarray(batch["att_masks"])
    params = model.init(
        {"params": jax.random.PRNGKey(31)}, att, am,
        jnp.asarray(batch["labels"]), jnp.asarray(batch["phrase_num"]),
        jnp.asarray(batch["phrase_length"]),
        jnp.asarray(batch["phrase_syn"]), glat_p=-1.0, deterministic=True)
    memory = model.apply(params, att, am, deterministic=True,
                         method="encode")
    host = pb_decode_host(model, params, jax.random.PRNGKey(0), att, am,
                          pad_to=W)
    jit = jax.tree_util.tree_map(
        np.asarray,
        pb_decode(model, params, jax.random.PRNGKey(0), memory,
                  am.astype(bool), packed_width=W))
    np.testing.assert_array_equal(jit["seq"], host["seq"])
    np.testing.assert_array_equal(jit["phrase_num"], host["phrase_num"])
    np.testing.assert_array_equal(jit["phrase_length"],
                                  host["phrase_length"])


def test_bound_step_cached_matches_uncached():
    """The hoisted bounding step (bound_cache + bound_step_cached: K/V
    lookup table + cached cross K/V + constant [LEN] query) must compute the
    same function as bound_step."""
    model, params, memory, src_mask = _setup("UIC", seed=7)
    L2 = model.max_length + 2
    rng = np.random.RandomState(3)
    ids = np.zeros((4, L2), np.int32)
    ids[:, 0] = 3
    for b in range(4):
        k = rng.randint(1, 8)
        ids[b, 1:1 + k] = rng.randint(4, 7, k)
    ids = jnp.asarray(ids)
    prefix = jnp.asarray(rng.randint(1, 10, 4).astype(np.int32))

    ref_len, ref_syn = model.apply(params, ids, prefix, memory, src_mask,
                                   True, method="bound_step")
    cache = model.apply(params, memory, True, method="bound_cache")
    fast_len, fast_syn = model.apply(params, cache, ids, prefix, src_mask,
                                     method="bound_step_cached")
    np.testing.assert_allclose(np.asarray(fast_len), np.asarray(ref_len),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast_syn), np.asarray(ref_syn),
                               rtol=1e-4, atol=1e-5)

    # word-vocab variant (no table; cached cross K/V + constant query only)
    wids = jnp.asarray(
        np.concatenate([np.full((4, 1), 3), rng.randint(4, V, (4, L2 - 1))],
                       axis=1).astype(np.int32))
    ref_len, ref_syn = model.apply(params, wids, prefix, memory, src_mask,
                                   False, method="bound_step")
    wcache = model.apply(params, memory, False, method="bound_cache")
    fast_len, fast_syn = model.apply(params, wcache, wids, prefix, src_mask,
                                     use_syn=False, method="bound_step_cached")
    np.testing.assert_allclose(np.asarray(fast_len), np.asarray(ref_len),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast_syn), np.asarray(ref_syn),
                               rtol=1e-4, atol=1e-5)


def test_remove_bad_endings_blocks_stop():
    """remove_bad_endings (reference AttModel.py:355-360, CaptionModel.py:
    169-170): when the previous word is a bad ending, the stop tokens'
    logprobs drop to -inf.  With EVERY word id marked bad, greedy AR decode
    can never terminate — the sequence fills all max_length positions."""
    import jax.numpy as jnp
    from boficap_tpu.constants import EOS, PAD
    from boficap_tpu.decode import ar as ar_mod
    model, params, memory, src_mask = _setup("AIC", seed=11)
    all_bad = tuple(range(4, model.tgt_vocab))

    def no_stop_after_word(seq):
        # wherever the previous token is a word (> 3, i.e. "bad" here),
        # the next token must not be a stop token (PAD or EOS)
        prev_word = seq[:, :-1] > 3
        nxt = seq[:, 1:]
        assert not (prev_word & np.isin(nxt, [PAD, EOS])).any()

    out = ar_mod.ar_sample(model, params, jax.random.PRNGKey(0), memory,
                           src_mask, bad_endings_ix=all_bad)
    no_stop_after_word(np.asarray(out["seq"]))

    base = ar_mod.ar_sample(model, params, jax.random.PRNGKey(0), memory,
                            src_mask)
    # the flag changes decode behavior for at least one sample (the
    # unsuppressed decode stops early somewhere)
    assert not np.array_equal(np.asarray(base["seq"]),
                              np.asarray(out["seq"]))

    beam = ar_mod.ar_beam_search(model, params, memory, src_mask,
                                 beam_size=2, bad_endings_ix=all_bad)
    no_stop_after_word(np.asarray(beam["seq"])[:, 0])
