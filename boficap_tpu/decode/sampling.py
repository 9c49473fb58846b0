"""Next-word sampling family (reference CaptionModel.sample_next_word,
captioning/models/CaptionModel.py:383-437): greedy / temperature /
top-k / top-p (nucleus) / gumbel.

All functions operate on the LAST axis, so the same code serves the AR path
([B, V] per step) and the parallel phrase paths ([B, L, V] per pass).  The
sampling method string is static (it selects jit-compiled branches); the
reference's NaN guards are unnecessary here because masked logits use a
finite fill (models/layers.py MASK_FILL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _categorical(rng, logits):
    """Sample ids over the last axis."""
    return jax.random.categorical(rng, logits, axis=-1)


def _gather_last(logprobs, ids):
    return jnp.take_along_axis(logprobs, ids[..., None], axis=-1)[..., 0]


def top_k_filter(logprobs, k: int):
    """Keep the k largest entries, fill the rest with -inf (reference
    CaptionModel.py:418-422)."""
    kth = jax.lax.top_k(logprobs, k)[0][..., -1:]
    return jnp.where(logprobs >= kth, logprobs, NEG_INF)


def top_p_filter(logprobs, p: float):
    """Nucleus filtering (reference CaptionModel.py:407-417): keep the
    smallest prefix of descending-prob tokens whose cumulative prob reaches p
    (always at least one), renormalize."""
    probs = jax.nn.softmax(logprobs, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    csum = jnp.cumsum(sorted_probs, axis=-1)
    # mask in sorted space: first position always kept, then cumsum < p
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(csum[..., :1], dtype=bool), csum[..., :-1] < p], axis=-1)
    # threshold prob = smallest kept prob
    thresh = jnp.min(jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1,
                     keepdims=True)
    kept = jnp.where(probs >= thresh, probs, 0.0)
    kept = kept / jnp.maximum(kept.sum(-1, keepdims=True), 1e-12)
    return jnp.log(jnp.maximum(kept, 1e-12))


def sample_next_word(rng, logprobs, sample_method: str = "greedy",
                     temperature: float = 1.0):
    """Returns (ids, per-token logprob) sampled over the last axis.

    ``sample_method``: 'greedy' | 'gumbel' | 'sample' | 'topK' (int K) |
    'top0.P' (nucleus).  The gathered logprob is taken from the ORIGINAL
    log-probs for greedy/gumbel and from the tempered/filtered ones for the
    sample family, matching the reference.
    """
    if sample_method == "greedy":
        ids = jnp.argmax(logprobs, axis=-1)
        return ids, _gather_last(logprobs, ids)

    if sample_method == "gumbel":
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logprobs.shape) + 1e-20) + 1e-20)
        ids = jnp.argmax(jax.nn.log_softmax((logprobs + g) / temperature, -1),
                         axis=-1)
        return ids, _gather_last(logprobs, ids)

    lp = logprobs / temperature
    if sample_method.startswith("top"):
        top_num = float(sample_method[3:])
        if 0 < top_num < 1:
            lp = top_p_filter(lp, top_num)
        else:
            lp = top_k_filter(lp, int(top_num))
    ids = _categorical(rng, lp)
    return ids, _gather_last(lp, ids)
