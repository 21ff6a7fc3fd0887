"""Token-selection filters shared by ``generate()`` and ``DecodeEngine``.

The reference serves greedily only (its chat example argmaxes the last
logits — ``examples/quantized_llama_chat.py``); a serving framework needs
the standard sampling controls.  This module implements the HF-warper
stack — temperature → top-k → top-p (nucleus) → min-p — with the
parameters STATIC (Python floats/ints): each configuration specializes at
trace time, so disabled filters cost nothing in the compiled step and the
pure-greedy path stays a single ``argmax``.

All filters are vectorized over the batch; under jit the sorts fuse into
the decode step (one (B, V) sort per enabled prob-mass filter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_logits(
    logits: jax.Array,
    *,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
) -> jax.Array:
    """Mask (to ``-inf``) logits excluded by top-k / top-p / min-p.

    Args:
        logits: (..., V) UNNORMALIZED logits (already temperature-scaled).
        top_k: keep the k highest-logit tokens (0 = no restriction).
        top_p: keep the smallest set of tokens whose cumulative probability
            reaches ``top_p`` (nucleus sampling; 1.0 = no restriction).  At
            least the argmax always survives.
        min_p: drop tokens whose probability is below ``min_p`` times the
            maximum token probability (0.0 = no restriction).

    Filters compose in the HF order (top-k, then top-p, then min-p, each
    over the distribution the previous one left).
    """
    v = logits.shape[-1]
    x = logits.astype(jnp.float32)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    if 0 < top_k < v:
        kth = jax.lax.top_k(x, top_k)[0][..., -1:]
        x = jnp.where(x < kth, neg, x)
    if top_p < 1.0:
        probs = jax.nn.softmax(x, axis=-1)
        desc = jnp.flip(jnp.sort(probs, axis=-1), axis=-1)
        csum = jnp.cumsum(desc, axis=-1)
        # Keep while the mass BEFORE a token is < top_p (the token that
        # crosses the threshold is included; the argmax always survives).
        kept = jnp.where(csum - desc < top_p, desc, jnp.inf)
        thresh = jnp.min(kept, axis=-1, keepdims=True)
        x = jnp.where(probs < thresh, neg, x)
    if min_p > 0.0:
        probs = jax.nn.softmax(x, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        x = jnp.where(probs < min_p * pmax, neg, x)
    return x


def sample_logits(
    logits: jax.Array,
    key: jax.Array,
    temperature,
    *,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
) -> jax.Array:
    """Select one token id per row: greedy at ``temperature == 0`` (when
    static), else categorical over the filtered, temperature-scaled logits.

    ``temperature`` may be a traced scalar (``generate()`` passes one);
    filters are always static.  Returns (...,) int32.
    """
    if isinstance(temperature, (int, float)) and temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    scaled = filter_logits(scaled, top_k=top_k, top_p=top_p, min_p=min_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
