"""Property tests: vectorized closed-form phrase math == reference-loop oracles."""

import numpy as np
import pytest

from boficap_tpu.data import phrase_ops as po
from tests.oracles import (
    oracle_blockwise_mask,
    oracle_bound_masks,
    oracle_copy_init,
    oracle_extend_syn,
    oracle_word_loss_mask,
    random_phrase_row,
)

L = 20
L2 = L + 2


def _batch(rng, B):
    labels = np.zeros((B, L2), dtype=np.int64)
    pls = np.zeros((B, L2), dtype=np.int64)
    syns = np.zeros((B, L2), dtype=np.int64)
    nums = np.zeros(B, dtype=np.int64)
    for b in range(B):
        lab, num, pl, syn = random_phrase_row(rng, L)
        labels[b], nums[b], pls[b], syns[b] = lab, num, pl, syn
    return labels, nums, pls, syns


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1234)
    return _batch(rng, 64)


def test_extend_syn_seq(batch):
    labels, nums, pls, syns = batch
    got = po.extend_syn_seq(pls, syns, L)
    want = np.stack([oracle_extend_syn(pl, syn, L) for pl, syn in zip(pls, syns)])
    np.testing.assert_array_equal(got, want)


def test_copy_init(batch):
    labels, nums, pls, syns = batch
    got = po.copy_init(labels, pls, L)
    want = np.stack([oracle_copy_init(lab, pl, L) for lab, pl in zip(labels, pls)])
    np.testing.assert_array_equal(got, want)


def test_copy_init_edge_cases():
    # single phrase of every length 1..L, copying from bos
    for total in range(1, L + 1):
        labels = np.zeros(L2, dtype=np.int64)
        labels[0], labels[1 : 1 + total], labels[L + 1] = 1, np.arange(10, 10 + total), 2
        pl = np.zeros(L2, dtype=np.int64)
        pl[0], pl[1] = 1, total
        got = po.copy_init(labels[None], pl[None], L)[0]
        want = oracle_copy_init(labels, pl, L)
        np.testing.assert_array_equal(got, want)
    # exact-multiple round robin (cur % prev == 0)
    labels = np.zeros(L2, dtype=np.int64)
    labels[0] = 1
    labels[1:10] = np.arange(10, 19)
    pl = np.zeros(L2, dtype=np.int64)
    pl[0], pl[1], pl[2] = 1, 3, 6
    got = po.copy_init(labels[None], pl[None], L)[0]
    want = oracle_copy_init(labels, pl, L)
    np.testing.assert_array_equal(got, want)


def test_blockwise_mask(batch):
    labels, nums, pls, syns = batch
    got = po.blockwise_mask(pls, L)
    want = np.stack([oracle_blockwise_mask(pl, L) for pl in pls])
    np.testing.assert_array_equal(got, want)


def test_bound_prefixes_match_row0_of_full_masks(batch):
    labels, nums, pls, syns = batch
    steps = L + 1
    cums = po.bound_prefixes(pls, steps)
    full = np.stack([oracle_bound_masks(pl, steps, L2) for pl in pls])
    # row 0 of the oracle mask at step i should be exactly keys < cum[i],
    # for every step that is actually used (i < phrase_num)
    for b in range(len(pls)):
        for i in range(int(nums[b])):
            want_vis = int(full[b, i, 0].sum())
            assert want_vis == cums[b, i], (b, i, want_vis, cums[b, i])


def test_bound_step_masks(batch):
    labels, nums, pls, syns = batch
    steps = L + 1
    got = po.bound_step_masks(pls, steps, L2)
    want = np.stack([oracle_bound_masks(pl, steps, L2) for pl in pls])
    np.testing.assert_array_equal(got, want)


def test_word_loss_mask(batch):
    labels, nums, pls, syns = batch
    got = po.word_loss_mask(pls, L)
    want = np.stack([oracle_word_loss_mask(pl, L) for pl in pls])
    np.testing.assert_array_equal(got, want)


def test_slot_loss_mask(batch):
    labels, nums, pls, syns = batch
    got = po.slot_loss_mask(nums, L2 - 1)
    for b in range(len(nums)):
        assert got[b].sum() == nums[b]
        assert got[b, : nums[b]].all()


def test_jnp_parity(batch):
    """The same functions must produce identical results under jax.numpy/jit."""
    import jax
    import jax.numpy as jnp

    labels, nums, pls, syns = batch
    jl, jpl, jsyn = jnp.asarray(labels), jnp.asarray(pls), jnp.asarray(syns)

    fns = {
        "extend_syn": (lambda a, s: po.extend_syn_seq(a, s, L), (jpl, jsyn),
                       po.extend_syn_seq(pls, syns, L)),
        "copy_init": (lambda a, b_: po.copy_init(a, b_, L), (jl, jpl),
                      po.copy_init(labels, pls, L)),
        "blockwise": (lambda a: po.blockwise_mask(a, L), (jpl,),
                      po.blockwise_mask(pls, L)),
        "bound_prefix": (lambda a: po.bound_prefixes(a, L + 1), (jpl,),
                         po.bound_prefixes(pls, L + 1)),
        "bound_masks": (lambda a: po.bound_step_masks(a, L + 1, L2), (jpl,),
                        po.bound_step_masks(pls, L + 1, L2)),
    }
    for name, (fn, args, want) in fns.items():
        got = jax.jit(fn)(*args)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), err_msg=name)
