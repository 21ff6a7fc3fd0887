"""Greedy / sampling decode loop with a static KV cache.

The prefill and decode steps are jitted once each; every subsequent decode
step reuses the compiled executable (zero recompiles — the TPU analog of the
reference's zero-graph-breaks ``torch.compile`` guarantee,
``tests/test_mx_tensor.py:432-456``).
"""

from __future__ import annotations

import functools
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx



# Compiled-session cache: one set of jitted prefill/decode functions per
# model object (keyed weakly).  jit re-keys on shapes internally, so a cached
# session serves any (prompt_len, max_new_tokens, batch) combination; without
# this, every generate() call would rebuild its jit wrappers and recompile —
# tens of seconds for a 32-layer model.
_SESSIONS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _session(model, greedy: bool, top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0):
    graphdef, _ = nnx.split(model)
    fns = _SESSIONS.setdefault(model, {})
    key = ("v1", greedy, top_k, top_p, min_p)
    entry = fns.get(key)
    # Invalidate on structure change (e.g. quantize_llm_ surgery after a
    # prior generate() on the same object).
    if entry is not None and entry[0] == graphdef:
        return entry[1]

    prefill = jax.jit(
        functools.partial(_prefill, graphdef), static_argnames="max_len"
    )
    decode = jax.jit(
        functools.partial(_decode_step, graphdef), static_argnames="max_len"
    )

    def pick(logits, key, temp):
        if greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from .sampling import sample_logits

        return sample_logits(
            logits, key, temp, top_k=top_k, top_p=top_p, min_p=min_p
        )

    @functools.partial(jax.jit, static_argnames=("steps", "max_len"))
    def decode_all(state, token, pos, caches, rng, temp, steps, max_len):
        def body(carry, _):
            token, pos, caches, rng = carry
            rng, sub = jax.random.split(rng)
            logits, caches = _decode_step(
                graphdef, state, token[:, None], pos, caches, max_len
            )
            token = pick(logits, sub, temp)
            return (token, pos + 1, caches, rng), token

        (_, _, _, _), tokens = jax.lax.scan(
            body, (token, pos, caches, rng), None, length=steps
        )
        return tokens  # (steps, b)

    built = (prefill, decode, decode_all, pick)
    fns[key] = (graphdef, built)
    return built


def _prefill(graphdef, state, input_ids, caches, prompt_len, max_len):
    model = nnx.merge(graphdef, state)
    b, s = input_ids.shape
    # attention_mask=None + cache => the model applies (or fuses in-kernel)
    # the standard causal mask over the written prefix.
    logits, new_caches = model(
        input_ids,
        attention_mask=None,
        position_ids=jnp.arange(s)[None, :],
        caches=caches,
        cache_position=0,
    )
    # Logits at the last real prompt token.
    last = jnp.take_along_axis(logits, (prompt_len - 1)[:, None, None], axis=1)
    return last[:, 0, :], new_caches


def _decode_step(graphdef, state, token, pos, caches, max_len):
    """One decode step; ``pos`` is a scalar, or (b,) per-row positions
    (ragged prompts — each row attends only its own written prefix and gets
    its own RoPE position)."""
    model = nnx.merge(graphdef, state)
    b = token.shape[0]
    if jnp.ndim(pos) == 0:
        position_ids = jnp.full((b, 1), pos, jnp.int32)
    else:
        position_ids = pos[:, None]
    logits, new_caches = model(
        token,
        attention_mask=None,  # standard causal over the written prefix
        position_ids=position_ids,
        caches=caches,
        cache_position=pos,
    )
    return logits[:, -1, :], new_caches


def generate(
    model,
    input_ids: jax.Array,
    max_new_tokens: int,
    *,
    kv_cache_config=None,
    prompt_len: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    rng: Optional[jax.Array] = None,
    stream: bool = False,
    ring_cache: bool = False,
) -> jax.Array:
    """Generate ``max_new_tokens`` tokens (greedy if temperature == 0).

    By default the whole decode loop runs as ONE jitted ``lax.scan`` (a
    single dispatch for the entire generation — no per-token host round
    trips).  ``stream=True`` uses a Python loop instead (one jitted step per
    token, all steps reusing one executable) for incremental consumption;
    both produce identical tokens.

    Args:
        model: a ``LlamaForCausalLM``-family NNX model.
        input_ids: (batch, prompt_len) int32 token ids.
        kv_cache_config: optional ``MXConfig`` enabling the MX-quantized KV
            cache (TPU-build extension).
        prompt_len: per-row valid prompt lengths (defaults to full width).

    Returns (batch, max_new_tokens) generated ids.
    """
    _, state = nnx.split(model)
    b, s = input_ids.shape
    if ring_cache:
        # Rolling-buffer cache for sliding-window models: capacity covers
        # the window plus the one-shot prompt prefill (the oldest prompt
        # query still sees its full window), NOT the generation length —
        # long generations decode in bounded HBM.
        window = getattr(model.config, "sliding_window", None)
        if window is None:
            raise ValueError(
                "ring_cache=True requires a sliding-window model "
                "(config.sliding_window)"
            )
        max_len = (window + s + 127) // 128 * 128
    else:
        max_len = s + max_new_tokens
        if kv_cache_config is not None:
            # Round the cache length to a KV-tile multiple so the fused
            # MX-cache attention kernel is eligible (extra rows are masked).
            max_len = (max_len + 127) // 128 * 128
    caches = model.init_cache(b, max_len, kv_cache_config, ring=ring_cache)
    ragged = prompt_len is not None
    if prompt_len is None:
        prompt_len = jnp.full((b,), s, jnp.int32)

    greedy = temperature == 0.0
    prefill, decode, decode_all, pick = _session(
        model, greedy, top_k=int(top_k), top_p=float(top_p), min_p=float(min_p)
    )
    temp = jnp.asarray(1.0 if greedy else temperature, jnp.float32)

    logits, caches = prefill(state, input_ids, caches, prompt_len, max_len=max_len)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    token = pick(logits, rng, temp)
    # Ragged batches decode at per-row positions (each row continues right
    # after its own prompt, masking the pad K/V the prefill wrote above it).
    pos0 = jnp.asarray(prompt_len, jnp.int32) if ragged else jnp.asarray(s, jnp.int32)

    if stream:
        out = [token]
        pos = pos0
        for _ in range(max_new_tokens - 1):
            rng, sub = jax.random.split(rng)
            logits, caches = decode(state, token[:, None], pos, caches, max_len=max_len)
            token = pick(logits, sub, temp)
            out.append(token)
            pos = pos + 1
        return jnp.stack(out, axis=1)

    if max_new_tokens == 1:
        return token[:, None]
    tokens = decode_all(
        state, token, pos0, caches, rng, temp, steps=max_new_tokens - 1, max_len=max_len
    )
    return jnp.concatenate([token[:, None], tokens.T], axis=1)
