"""Numerical parity against the ACTUAL reference implementation: instantiate
the reference PyTorch ``TransformerModel`` (from /root/reference, read-only),
convert its random-initialized state_dict with utils/convert.torch_to_flax,
and compare teacher-forced forward outputs tensor-by-tensor.

This is the end-to-end proof that the re-architecture (one-pass bounding,
closed-form phrase tensors, shared flax decoder) computes the same function
as the reference's per-step Python loops.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: torch oracles / subprocesses

torch = pytest.importorskip("torch")

# stub optional deps the reference imports at module scope
for name in ("thop", "lmdbdict", "skimage", "skimage.io"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["thop"].profile = lambda *a, **k: (0, 0)
# the reference hardcodes cuda timing syncs in its forward
# (TransformerModel.py:424-427); neuter them for CPU torch
torch.cuda.synchronize = lambda *a, **k: None
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from boficap_tpu.config import default_config, finalize
from boficap_tpu.data import phrase_ops as po
from boficap_tpu.models.boficap import build_model
from boficap_tpu.utils.convert import torch_to_flax
from tests.oracles import random_phrase_row

L = 20
L2 = L + 2
V = 50
B = 3
R = 9
D = 64


class RefOpt:
    pass


def ref_opt(train_mode):
    opt = RefOpt()
    for k, v in dict(train_mode=train_mode, caption_model="transformer",
                     N_enc=2, N_dec=2, N_len=1, d_model=D, d_ff=128,
                     num_att_heads=4, dropout=0.1, drop_prob_lm=0.5,
                     max_length=L, max_boxes=36, att_feat_size=2048,
                     fc_feat_size=2048, input_encoding_size=D, rnn_size=128,
                     num_layers=2, vocab_size=V, seq_length=L,
                     decoder_input_mode="add", norm_mode="copy",
                     att_hid_size=D, logit_layers=1, use_bn=0, input_json="",
                     REFORWARD=False).items():
        setattr(opt, k, v)
    opt.vocab = {str(i): f"w{i}" for i in range(4, V + 4)}
    return opt


def our_cfg(train_mode):
    cfg = default_config()
    cfg.train_mode = train_mode
    cfg.N_enc = cfg.N_dec = 2
    cfg.N_len = 1
    cfg.d_model = D
    cfg.d_ff = 128
    cfg.num_att_heads = 4
    cfg.dtype = "float32"     # parity comparisons are torch-f32 vs ours-f32
    cfg.id = "parity"
    finalize(cfg)
    return cfg


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    att = rng.randn(B, R, 2048).astype(np.float32)
    att_masks = np.ones((B, R), np.float32)
    labels = np.zeros((B, L2), np.int64)
    pls = np.zeros((B, L2), np.int64)
    syns = np.zeros((B, L2), np.int64)
    nums = np.zeros(B, np.int64)
    for b in range(B):
        lab, num, pl, syn = random_phrase_row(rng, L, vocab=V + 4)
        labels[b], nums[b], pls[b], syns[b] = lab, num, pl, syn
    return att, att_masks, labels, nums, pls, syns


@pytest.fixture(scope="module")
def parity_uic():
    from captioning.models.TransformerModel import TransformerModel
    torch.manual_seed(0)
    ref = TransformerModel(ref_opt("UIC"))
    ref.eval()
    cfg = our_cfg("UIC")
    model = build_model(cfg, V)
    params = torch_to_flax(ref.state_dict(), "UIC")
    return ref, model, params


def test_uic_forward_parity(parity_uic):
    ref, model, params = parity_uic
    att, am, labels, nums, pls, syns = make_inputs()

    ext_syn = np.asarray(po.extend_syn_seq(pls, syns, L))
    ext_word = np.asarray(po.copy_init(labels, pls, L))
    ext_mask = np.asarray(po.blockwise_mask(pls, L))

    with torch.no_grad():
        ref_out = ref._forward(
            torch.zeros(B, 2048), torch.from_numpy(att),
            torch.from_numpy(labels), torch.from_numpy(am),
            torch.from_numpy(nums), torch.from_numpy(pls),
            torch.from_numpy(syns), torch.from_numpy(ext_syn),
            torch.from_numpy(ext_word), torch.from_numpy(ext_mask),
            glat_p=-1.0)
    names = ["sa_len_logprob", "sa_syn_logprob", "sa_logprob",
             "na_len_logprob", "na_syn_logprob", "na_logprob"]
    ref_map = {n: t.detach().numpy() for n, t in zip(names, ref_out)}

    ours = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                       jnp.asarray(labels.astype(np.int32)),
                       jnp.asarray(nums.astype(np.int32)),
                       jnp.asarray(pls.astype(np.int32)),
                       jnp.asarray(syns.astype(np.int32)),
                       glat_p=None, deterministic=True)
    # the reference leaves predictor slots >= max(phrase_num) as literal
    # zeros (its loop stops there and its loss masks them,
    # TransformerModel.py:495-513); we compute real logprobs everywhere, so
    # compare only the slots the reference actually fills
    n_slots = int(nums.max())
    for n in names:
        got = np.asarray(ours[n])
        want = ref_map[n]
        assert got.shape == want.shape, (n, got.shape, want.shape)
        if "len_logprob" in n or "syn_logprob" in n:
            got, want = got[:, :n_slots], want[:, :n_slots]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4,
                                   err_msg=n)


def test_aic_forward_parity():
    from captioning.models.TransformerModel import TransformerModel
    torch.manual_seed(1)
    ref = TransformerModel(ref_opt("AIC"))
    ref.eval()
    model = build_model(our_cfg("AIC"), V)
    params = torch_to_flax(ref.state_dict(), "AIC")
    att, am, labels, *_ = make_inputs(seed=2)

    with torch.no_grad():
        ref_lp = ref._forward(torch.zeros(B, 2048), torch.from_numpy(att),
                              torch.from_numpy(labels[:, :-1]),
                              torch.from_numpy(am)).detach().numpy()
    ours = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                       jnp.asarray(labels.astype(np.int32)),
                       deterministic=True)["logprob"]
    np.testing.assert_allclose(np.asarray(ours), ref_lp, rtol=1e-3,
                               atol=2e-4)


def test_uic_greedy_decode_parity(parity_uic):
    """End-to-end NA inference parity: the reference's core_NAIC loop vs our
    jit'd while_loop bound+fill, with CONVERTED (shared) weights."""
    ref, model, params = parity_uic
    att, am, labels, nums, pls, syns = make_inputs(seed=3)
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import BoFiCap

    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method=BoFiCap.encode)
    got = bf.na_decode(model, params, jax.random.PRNGKey(0), memory,
                       jnp.asarray(am).astype(bool))

    with torch.no_grad():
        t_att = ref.att_embed(torch.from_numpy(att))
        t_mem = ref.model.encode(t_att, torch.from_numpy(am).unsqueeze(-2))
        phrase, pn, pl, ps = ref.core_NAIC(B, t_mem,
                                           torch.from_numpy(am).unsqueeze(-2))
        ref_lp = torch.log_softmax(ref.logit(phrase), dim=-1).detach().numpy()
    np.testing.assert_array_equal(np.asarray(got["phrase_num"]), pn.numpy())
    np.testing.assert_array_equal(np.asarray(got["phrase_length"]),
                                  pl.numpy())
    # fill logprobs: the reference's core_NAIC builds every sample's fill
    # mask from the LAST sample's plan (the `last[j]` bug, TransformerModel
    # .py:1872-1874); compare only rows whose plan length equals the last
    # sample's, where the bug is invisible
    totals = pl.numpy().sum(-1)
    seq = np.asarray(got["seq"])
    for b in range(B):
        if totals[b] == totals[-1]:
            want_tok = np.take_along_axis(
                ref_lp[b], seq[b][:, None].astype(np.int64), axis=1)[:, 0]
            want_ent = -(np.exp(ref_lp[b]) * ref_lp[b]).sum(-1)
            np.testing.assert_allclose(np.asarray(got["tok_logprobs"])[b],
                                       want_tok, rtol=1e-3, atol=2e-4)
            np.testing.assert_allclose(np.asarray(got["entropy"])[b],
                                       want_ent, rtol=1e-3, atol=2e-4)


def test_uic_ds_forward_parity():
    """Separate-decoder variant: checks the converter's decoder_SA/decoder_NA
    -> decoder0/decoder1 mapping end to end."""
    from captioning.models.TransformerModel import TransformerModel
    torch.manual_seed(3)
    ref = TransformerModel(ref_opt("UIC_ds"))
    ref.eval()
    model = build_model(our_cfg("UIC_ds"), V)
    params = torch_to_flax(ref.state_dict(), "UIC_ds")
    att, am, labels, nums, pls, syns = make_inputs(seed=5)
    ext_syn = np.asarray(po.extend_syn_seq(pls, syns, L))
    ext_word = np.asarray(po.copy_init(labels, pls, L))
    ext_mask = np.asarray(po.blockwise_mask(pls, L))
    with torch.no_grad():
        # NOTE: the reference's _forward UIC branch passes glat_p, but
        # EncoderDecoder_UIC_ds.forward doesn't accept it — UIC_ds is
        # unreachable through the reference's own _forward (latent bug).
        # Drive the inner module directly, mirroring _forward minus glat.
        t_att = ref.att_embed(torch.from_numpy(att))
        t_mask = torch.from_numpy(am).unsqueeze(-2)
        sa_len, sa_syn, sa_h, na_len, na_syn, na_h = ref.model(
            t_att, t_mask, torch.from_numpy(labels),
            torch.from_numpy(nums), torch.from_numpy(pls),
            torch.from_numpy(ext_syn), torch.from_numpy(ext_word),
            torch.from_numpy(ext_mask))
        ref_out = [sa_len, sa_syn,
                   torch.log_softmax(ref.logit(sa_h), -1),
                   na_len, na_syn,
                   torch.log_softmax(ref.logit(na_h), -1)]
    names = ["sa_len_logprob", "sa_syn_logprob", "sa_logprob",
             "na_len_logprob", "na_syn_logprob", "na_logprob"]
    ref_map = {n: t.detach().numpy() for n, t in zip(names, ref_out)}
    ours = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                       jnp.asarray(labels.astype(np.int32)),
                       jnp.asarray(nums.astype(np.int32)),
                       jnp.asarray(pls.astype(np.int32)),
                       jnp.asarray(syns.astype(np.int32)),
                       glat_p=None, deterministic=True)
    n_slots = int(nums.max())
    for n in names:
        got, want = np.asarray(ours[n]), ref_map[n]
        if "len_logprob" in n or "syn_logprob" in n:
            got, want = got[:, :n_slots], want[:, :n_slots]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4,
                                   err_msg=n)


def test_convert_cli_roundtrip(tmp_path, parity_uic):
    """tools/convert.py: a reference model.pth + infos pickle (opt as an
    argparse-style Namespace, as the reference pickles it) convert into an
    eval-ready (model.ckpt, infos.pkl) pair whose deserialized params equal
    torch_to_flax's output exactly."""
    from flax import serialization

    from tools.convert import main as convert_main
    ref, model, params = parity_uic

    pth = tmp_path / "model_best.pth"
    torch.save(ref.state_dict(), str(pth))
    opt = ref_opt("UIC")
    infos_in = tmp_path / "infos_ref-best.pkl"
    import pickle
    with open(infos_in, "wb") as f:
        pickle.dump({"opt": opt, "vocab": opt.vocab, "iter": 7}, f)

    out_dir = tmp_path / "converted"
    model_path, infos_path = convert_main([
        "--torch", str(pth), "--infos", str(infos_in),
        "--out_dir", str(out_dir), "--id", "conv"])

    with open(model_path, "rb") as f:
        got = serialization.from_bytes(params, f.read())
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(got)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kp))
    with open(infos_path, "rb") as f:
        infos_out = pickle.load(f)
    assert infos_out["opt"]["train_mode"] == "UIC"
    assert isinstance(infos_out["opt"], dict)       # Namespace re-written
    assert infos_out["vocab"] == opt.vocab


def test_diverse_beam_search_parity():
    """Staggered diverse beam search parity vs the ACTUAL reference
    beam_search (CaptionModel.py:48-222) with converted weights: group g at
    global step t is penalized by earlier groups' CURRENT ALIVE beams at
    column t-g (which those groups' later selections keep re-gathering), so
    sequential-groups-to-completion is NOT equivalent — this pins our
    lax.scan stagger to the reference's exact read order, token for
    token."""
    from captioning.models.TransformerModel import TransformerModel

    from boficap_tpu.decode.ar import ar_diverse_beam_search
    torch.manual_seed(5)
    ref = TransformerModel(ref_opt("AIC"))
    ref.eval()
    # REFERENCE DEFECT (documented in PARITY.md): add_diversity calls
    # self.repeat_tensor (CaptionModel.py:66), which the fork never defines
    # — upstream's utils.repeat_tensors — so the shipped dbs crashes with
    # AttributeError for any group_size > 1 once local_time >= 1.  Patch the
    # intended upstream behavior in so the algorithm can execute.
    ref.repeat_tensor = lambda n, t: t.unsqueeze(1).expand(
        -1, n, *t.shape[1:]).reshape(-1, *t.shape[1:])
    model = build_model(our_cfg("AIC"), V)
    params = torch_to_flax(ref.state_dict(), "AIC")
    att, am, *_ = make_inputs(seed=6)
    K, G = 4, 2

    with torch.no_grad():
        seq_best, _, _ = ref._sample_beam(
            torch.zeros(B, 2048), torch.from_numpy(att),
            torch.from_numpy(am),
            opt={"beam_size": K, "group_size": G, "diversity_lambda": 0.5,
                 "sample_method": "greedy", "sample_n": 1})
    # all K beams (group-major, per-group sorted) live on ref.done_beams
    ref_seqs = np.zeros((B, K, L), np.int64)
    ref_p = np.zeros((B, K), np.float64)
    for b in range(B):
        assert len(ref.done_beams[b]) == K
        for i, beam in enumerate(ref.done_beams[b]):
            s = beam["seq"].numpy()
            ref_seqs[b, i, :len(s)] = s
            ref_p[b, i] = beam["p"]

    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method="encode")
    out = ar_diverse_beam_search(model, params, memory,
                                 jnp.asarray(am).astype(bool),
                                 beam_size=K, group_size=G,
                                 diversity_lambda=0.5)
    got_seq = np.asarray(out["seq"])
    np.testing.assert_array_equal(got_seq, ref_seqs)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_p,
                               rtol=1e-3, atol=2e-4)
    # _sample_beam's sample_n=1 return is the first done beam per image
    np.testing.assert_array_equal(got_seq[:, 0], seq_best.numpy())


@pytest.mark.parametrize("norm_mode", ["copy", "compress", "complex"])
def test_pb_pad_forward_parity(norm_mode):
    """PB_pad teacher-forced forward vs the reference EncoderDecoderPB_pad
    (TransformerModel.py:1091-1213) with CONVERTED weights, for all three
    norm_modes: per-slot length logprobs (the predictor's PRIVATE embedding
    table, :1040) and the packed-phrase decode logprobs (our host
    pack_decoder_inputs layout vs the reference's numpy-side assembly)."""
    from captioning.models.TransformerModel import TransformerModel

    from boficap_tpu.data.pb_pack import pack_decoder_inputs

    opt = ref_opt("PB_pad")
    opt.norm_mode = norm_mode
    torch.manual_seed(11)
    ref = TransformerModel(opt)
    ref.eval()
    cfg = our_cfg("PB_pad")
    cfg.norm_mode = norm_mode
    model = build_model(cfg, V)
    params = torch_to_flax(ref.state_dict(), "PB_pad")

    att, am, labels, nums, pls, _ = make_inputs(seed=12)
    packed_ids, packed_slot, packed_mask = pack_decoder_inputs(
        labels, nums, pls)

    with torch.no_grad():
        t_att = ref.att_embed(torch.from_numpy(att))
        t_mask = torch.from_numpy(am).unsqueeze(-2)
        _, ref_len_lp, ref_h = ref.model(
            t_att, torch.from_numpy(nums), torch.from_numpy(pls),
            torch.from_numpy(labels), t_mask)
        ref_lp = ref.model.generator(ref_h).numpy()

    src = jnp.asarray(am).astype(bool)
    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method="encode")
    got_len = np.asarray(model.apply(
        params, jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(nums.astype(np.int32)),
        jnp.asarray(pls.astype(np.int32)), memory, src, True,
        method="pb_length_predict"))
    max_pn = int(nums.max())
    np.testing.assert_allclose(got_len[:, :max_pn],
                               ref_len_lp.numpy(), rtol=1e-3, atol=2e-4)

    got_lp = np.asarray(model.apply(
        params, jnp.asarray(packed_ids.astype(np.int32)),
        jnp.asarray(packed_slot.astype(np.int32)),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(pls.astype(np.int32)), memory, src,
        jnp.asarray(packed_mask), True, norm_mode, method="pb_decode"))
    assert got_lp.shape == ref_lp.shape, (got_lp.shape, ref_lp.shape)
    # compare each sample's own OCCUPIED packed positions (the diagonal of
    # the blockwise mask): pad columns are masked out as keys on both sides
    # but their query rows hold pad/compressed filler that legitimately
    # differs (reference :1169-1172)
    valid = np.einsum("bii->bi", packed_mask).astype(bool)
    np.testing.assert_allclose(got_lp[valid], ref_lp[valid],
                               rtol=1e-3, atol=2e-4)


def test_uic_sa_decode_parity(parity_uic):
    """End-to-end SA inference parity: the reference's core_SAIC loop
    (TransformerModel.py:1878-1986 — per phrase: bound, copy-init the new
    slot from the previous phrase, full decode, sample) vs our jit'd
    per-phrase while_loop (decode/bound_fill.py::sa_decode), with CONVERTED
    (shared) weights.  Plans and tokens must match exactly; per-token
    logprobs/entropies numerically."""
    ref, model, params = parity_uic
    att, am, *_ = make_inputs(seed=7)
    from boficap_tpu.decode import bound_fill as bf
    from boficap_tpu.models.boficap import BoFiCap

    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method=BoFiCap.encode)
    got = bf.sa_decode(model, params, jax.random.PRNGKey(0), memory,
                       jnp.asarray(am).astype(bool))

    with torch.no_grad():
        t_att = ref.att_embed(torch.from_numpy(att))
        t_mask = torch.from_numpy(am).unsqueeze(-2)
        t_mem = ref.model.encode(t_att, t_mask)
        seq, seq_lp, pn, pl, ps = ref.core_SAIC(B, t_mem, t_mask,
                                                "greedy", 1.0, "SAIC")
    np.testing.assert_array_equal(np.asarray(got["phrase_num"]), pn.numpy())
    np.testing.assert_array_equal(np.asarray(got["phrase_length"]),
                                  pl.numpy())
    np.testing.assert_array_equal(np.asarray(got["phrase_syn"]), ps.numpy())
    np.testing.assert_array_equal(np.asarray(got["seq"]), seq.numpy())
    # the reference returns the dense [B, L, V] logprob rows it wrote per
    # filled position (zeros elsewhere); we carry token/entropy reductions
    ref_lp = seq_lp.detach().numpy()
    filled = seq.numpy() != 0
    tok = np.take_along_axis(ref_lp, seq.numpy()[..., None], 2)[..., 0]
    ent = -(np.exp(ref_lp) * ref_lp).sum(-1)
    np.testing.assert_allclose(np.asarray(got["tok_logprobs"])[filled],
                               tok[filled], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["entropy"])[filled],
                               ent[filled], rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("K,G,dc", [(4, 1, 0), (4, 2, 1)])
def test_old_beam_search_parity(K, G, dc):
    """Legacy old_beam_search (CaptionModel.py:224-381) vs ar_old_beam_search
    with converted weights, via the reference's own _old_sample_beam
    (AttModel.py:223-261, dead code there — never dispatched): done-beam
    tokens, penalized scores, the stored PARENT full unaug logprob rows
    ('logps'), and the sum-over-time-AND-vocab 'unaug_p' quirk must all
    match, for both a single group and staggered diverse groups with a
    decoding constraint."""
    from captioning.models.TransformerModel import TransformerModel

    from boficap_tpu.decode.ar import ar_old_beam_search
    torch.manual_seed(13)
    ref = TransformerModel(ref_opt("AIC"))
    ref.eval()
    model = build_model(our_cfg("AIC"), V)
    params = torch_to_flax(ref.state_dict(), "AIC")
    att, am, *_ = make_inputs(seed=14)

    with torch.no_grad():
        seq_best, logps_best = ref._old_sample_beam(
            torch.zeros(B, 2048), torch.from_numpy(att),
            torch.from_numpy(am),
            opt={"beam_size": K, "group_size": G, "diversity_lambda": 0.5,
                 "decoding_constraint": dc, "sample_n": 1})
    ref_seqs = np.zeros((B, K, L), np.int64)
    ref_p = np.zeros((B, K), np.float64)
    ref_rows = np.zeros((B, K, L, V + 4), np.float32)
    ref_unaug = np.zeros((B, K), np.float64)
    for b in range(B):
        assert len(ref.done_beams[b]) == K
        for i, beam in enumerate(ref.done_beams[b]):
            s = beam["seq"].numpy()
            ref_seqs[b, i, :len(s)] = s
            ref_p[b, i] = beam["p"]
            ref_rows[b, i] = beam["logps"].numpy()
            ref_unaug[b, i] = beam["unaug_p"]

    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method="encode")
    out = ar_old_beam_search(model, params, memory,
                             jnp.asarray(am).astype(bool), beam_size=K,
                             group_size=G, diversity_lambda=0.5,
                             decoding_constraint=bool(dc))
    got_seq = np.asarray(out["seq"])
    np.testing.assert_array_equal(got_seq, ref_seqs)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_p,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["row_logprobs"]), ref_rows,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["unaug_p"]), ref_unaug,
                               rtol=1e-3, atol=5e-3)
    # _old_sample_beam's sample_n=1 return: first done beam per image, with
    # its full [L, V] logprob rows as seqLogprobs (AttModel.py:258-259)
    np.testing.assert_array_equal(got_seq[:, 0], seq_best.numpy())
    np.testing.assert_allclose(np.asarray(out["row_logprobs"])[:, 0],
                               logps_best.numpy(), rtol=1e-3, atol=2e-4)


def test_beam_search_parity():
    """Single-group batched beam search vs the reference beam_search
    (group_size=1) with converted weights: done beams, their order, and
    penalized scores must match."""
    from captioning.models.TransformerModel import TransformerModel

    from boficap_tpu.decode.ar import ar_beam_search
    torch.manual_seed(9)
    ref = TransformerModel(ref_opt("AIC"))
    ref.eval()
    model = build_model(our_cfg("AIC"), V)
    params = torch_to_flax(ref.state_dict(), "AIC")
    att, am, *_ = make_inputs(seed=10)
    K = 3

    with torch.no_grad():
        ref._sample_beam(
            torch.zeros(B, 2048), torch.from_numpy(att),
            torch.from_numpy(am),
            opt={"beam_size": K, "group_size": 1, "sample_method": "greedy",
                 "sample_n": 1})
    ref_seqs = np.zeros((B, K, L), np.int64)
    ref_p = np.zeros((B, K), np.float64)
    for b in range(B):
        for i, beam in enumerate(ref.done_beams[b][:K]):
            s = beam["seq"].numpy()
            ref_seqs[b, i, :len(s)] = s
            ref_p[b, i] = beam["p"]

    memory = model.apply(params, jnp.asarray(att), jnp.asarray(am),
                         deterministic=True, method="encode")
    out = ar_beam_search(model, params, memory,
                         jnp.asarray(am).astype(bool), beam_size=K)
    np.testing.assert_array_equal(np.asarray(out["seq"]), ref_seqs)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_p,
                               rtol=1e-3, atol=2e-4)


def test_convert_use_bn_folds_exactly():
    """use_bn=1 checkpoints: the leading BatchNorm1d folds into the Dense
    exactly at inference (convert._convert_att_embed).  Perturb the BN
    buffers away from their trivial init so the fold actually does work."""
    from captioning.models.TransformerModel import TransformerModel
    torch.manual_seed(3)
    opt = ref_opt("UIC")
    opt.use_bn = 1
    ref = TransformerModel(opt)
    with torch.no_grad():
        bn = ref.att_embed[0]
        bn.running_mean.normal_(0.3, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0.0, 0.3)
    ref.eval()
    params = torch_to_flax(ref.state_dict(), "UIC")["params"]

    x = np.random.RandomState(5).randn(7, 2048).astype(np.float32)
    want = ref.att_embed(torch.from_numpy(x)).detach().numpy()  # BN+Lin+ReLU
    k = params["att_embed"]["kernel"]
    b = params["att_embed"]["bias"]
    got = np.maximum(x @ np.asarray(k) + np.asarray(b), 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convert_rejects_use_bn2():
    """use_bn=2's trailing BN (after the ReLU) cannot fold; the converter
    must say so instead of silently mis-mapping."""
    from captioning.models.TransformerModel import TransformerModel
    opt = ref_opt("UIC")
    opt.use_bn = 2
    ref = TransformerModel(opt)
    with pytest.raises(NotImplementedError, match="use_bn=2"):
        torch_to_flax(ref.state_dict(), "UIC")


def test_convert_rejects_missing_att_embed(parity_uic):
    """The consumed-key guarantee must be two-directional: a truncated
    checkpoint missing att_embed entirely raises instead of converting with
    att_embed left at template init (silent garbage captions)."""
    ref, _, _ = parity_uic
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith("att_embed.")}
    with pytest.raises(KeyError, match="att_embed"):
        torch_to_flax(sd, "UIC")


def test_convert_rejects_unknown_toplevel_key(parity_uic):
    """Every state_dict key must be consumed — an unrecognized top-level
    module (e.g. a fork's extra head) raises instead of dropping weights."""
    ref, _, _ = parity_uic
    sd = dict(ref.state_dict())
    sd["extra_head.weight"] = torch.zeros(3, 3)
    with pytest.raises(KeyError, match="extra_head"):
        torch_to_flax(sd, "UIC")
