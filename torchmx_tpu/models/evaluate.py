"""Likelihood-based evaluation: perplexity and multiple-choice accuracy.

The reference's published results (``docs/sources/results/llama31.md``) are
5-task lm-eval averages (PIQA, ARC-E, ARC-C, HellaSwag, Winogrande) — all
scored by comparing the model log-likelihood of each answer continuation
given a context.  This module implements that scoring protocol natively
(teacher-forced log-probs under jit); datasets are supplied by the caller
(this environment has no network egress), e.g. from local lm-eval JSON
dumps or HF datasets on disk.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx



_LOGPROB_CACHE: "weakref.WeakKeyDictionary" = None  # initialized below


def _make_token_logprobs(model, kv_cache_config=None, decode: bool = False):
    """Jitted per-position log P(token[t] | tokens[<t]) for (b, s) inputs.

    Position 0 has no prediction; returns ``fn(ids) -> (b, s-1)`` fp32
    log-probs.  The jitted executable is cached per (model, kv config)
    (weakly per model) while the *state* is re-read on every call, so weight
    updates (checkpoint restore, training) are reflected without
    recompiling.  With ``kv_cache_config`` the forward WRITES and attends
    THROUGH an MX-quantized KV cache (the fused kernel path on TPU), so the
    reported likelihoods include cache-quantization error.

    ``decode=True`` scores teacher-forced **one token at a time** through the
    cache (a ``lax.scan`` over sq=1 steps) — the exact serving decode path,
    including decode-specialized kernels (chunk-dot / int8-dot) that only
    engage at sq=1.  Slower than the single prefill forward; use it to
    isolate decode-kernel numerics."""
    global _LOGPROB_CACHE
    import weakref

    if _LOGPROB_CACHE is None:
        _LOGPROB_CACHE = weakref.WeakKeyDictionary()
    from ..parallel import context as _cpmod

    graphdef, _ = nnx.split(model)
    # active_cp() in the key: a cacheless forward traced inside
    # context_parallel() dispatches to ring attention, so a plain cached
    # executable must not be reused there (and vice versa).
    key = (graphdef, kv_cache_config, decode, _cpmod.active_cp())
    entry = _LOGPROB_CACHE.get(model)
    if entry is None or entry[0] != key:  # invalidate on surgery/config/CP

        @jax.jit
        def f(state, input_ids):
            m = nnx.merge(graphdef, state)
            if decode:
                b, s = input_ids.shape
                caches = m.init_cache(b, s, kv_cache_config)

                def step(caches, t):
                    tok = jax.lax.dynamic_slice_in_dim(input_ids, t, 1, axis=1)
                    logits, caches = m(
                        tok,
                        position_ids=jnp.full((b, 1), t, jnp.int32),
                        caches=caches,
                        cache_position=t,
                    )
                    return caches, logits[:, 0]

                _, logits = jax.lax.scan(step, caches, jnp.arange(s))
                logits = logits.transpose(1, 0, 2)  # (b, s, vocab)
            elif kv_cache_config is not None:
                caches = m.init_cache(
                    input_ids.shape[0], input_ids.shape[1], kv_cache_config
                )
                logits, _ = m(input_ids, caches=caches, cache_position=0)
            else:
                cp = _cpmod.active_cp()
                if cp is not None and cp[2] == "zigzag":
                    # Zigzag CP: permute tokens into the striped layout (the
                    # ring then skips fully-masked chunk-pairs — ~2x fewer
                    # attention FLOPs), score targets by permuted-global
                    # index, and reorder only the (b, s) log-probs back —
                    # never the (b, s, vocab) logits.
                    cp_mesh, cp_axis, _ = cp
                    ncp = cp_mesh.shape[cp_axis]
                    s = input_ids.shape[1]
                    zperm = _cpmod.zigzag_order(s, ncp)
                    zinv = _cpmod.zigzag_inverse(s, ncp)
                    logits_z, _ = m(
                        input_ids[:, zperm],
                        position_ids=jnp.asarray(zperm, jnp.int32)[None],
                    )
                    logp_z = jax.nn.log_softmax(
                        logits_z.astype(jnp.float32), axis=-1
                    )
                    # zigzag row p (global pos zperm[p]) predicts global
                    # token zperm[p]+1; rows with no target (global pos s-1)
                    # are dropped by the zinv[: s-1] reorder below.
                    tgt = np.minimum(zperm + 1, s - 1)
                    lp_z = jnp.take_along_axis(
                        logp_z,
                        input_ids[:, tgt][..., None].astype(jnp.int32),
                        axis=2,
                    )[..., 0]
                    return lp_z[:, zinv[: s - 1]]
                logits, _ = m(input_ids)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            # logits[t] predicts token[t+1]
            return jnp.take_along_axis(
                logp[:, :-1, :], input_ids[:, 1:, None].astype(jnp.int32), axis=2
            )[..., 0]

        _LOGPROB_CACHE[model] = (key, f)
    f = _LOGPROB_CACHE[model][1]
    return lambda ids: f(nnx.state(model), ids)


def sequence_logprob(
    model, input_ids: jax.Array, *, start: Optional[jax.Array] = None
) -> jax.Array:
    """Total log-likelihood of each row, optionally only from ``start`` on
    (the continuation-given-context protocol: positions < start are context).
    """
    lp = _make_token_logprobs(model)(input_ids)
    if start is None:
        return jnp.sum(lp, axis=-1)
    # Mask out context positions: prediction t covers token t+1.
    pos = jnp.arange(1, input_ids.shape[1])[None, :]
    mask = pos >= start[:, None]
    return jnp.sum(jnp.where(mask, lp, 0.0), axis=-1)


def perplexity(
    model,
    token_ids: np.ndarray,
    *,
    seq_len: int = 512,
    batch_size: int = 8,
    kv_cache_config=None,
    decode: bool = False,
) -> float:
    """Non-overlapping chunked perplexity over a 1-D token stream.

    The stream is split into disjoint ``seq_len`` chunks; each chunk's first
    token gets no context, so this reports slightly worse PPL than a true
    sliding window (wikitext-style numbers computed with overlapping strides
    are not directly comparable).  ``kv_cache_config`` scores through an
    MX-quantized KV cache (see :func:`_make_token_logprobs`) — the SAME
    chunk set either way, so cache rows compare apples-to-apples against
    the uncached rows.
    """
    n = (len(token_ids) // seq_len) * seq_len
    chunks = np.asarray(token_ids[:n], np.int32).reshape(-1, seq_len)
    logprobs = _make_token_logprobs(model, kv_cache_config, decode)
    total, count = 0.0, 0
    for i in range(0, len(chunks), batch_size):
        batch = chunks[i : i + batch_size]
        if len(batch) < batch_size:  # keep one compiled shape
            pad = np.zeros((batch_size - len(batch), seq_len), np.int32)
            lp = logprobs(jnp.asarray(np.concatenate([batch, pad])))
            lp = lp[: len(batch)]
        else:
            lp = logprobs(jnp.asarray(batch))
        total += float(jnp.sum(lp))
        count += lp.shape[0] * lp.shape[1]
    return float(np.exp(-total / max(count, 1)))


def score_choices(
    model,
    context_ids: Sequence[Sequence[int]],
    choice_ids: Sequence[Sequence[Sequence[int]]],
    *,
    length_normalize: bool = False,
    pad_id: int = 0,
) -> List[int]:
    """Pick the highest-likelihood continuation per example.

    Args:
        context_ids: per-example token context.
        choice_ids: per-example list of candidate continuations.
        length_normalize: divide by continuation length (lm-eval's ``acc_norm``
            uses byte-length normalization; token-length is the common proxy).

    Returns the argmax choice index per example.
    """
    logprobs = _make_token_logprobs(model)
    picks = []
    for ctx, choices in zip(context_ids, choice_ids):
        rows, starts, lens = [], [], []
        # Bucket the padded width so thousands of near-unique example lengths
        # share a handful of compiled shapes.
        width = max(len(ctx) + len(c) for c in choices)
        width = (width + 63) // 64 * 64
        for c in choices:
            row = list(ctx) + list(c)
            rows.append(row + [pad_id] * (width - len(row)))
            starts.append(len(ctx))
            lens.append(len(c))
        ids = jnp.asarray(np.asarray(rows, np.int32))
        # Likelihood of the continuation region only; padding contributes to
        # positions >= len(ctx)+len(c) which we exclude via an end mask.
        lp = logprobs(ids)
        pos = np.arange(1, ids.shape[1])[None, :]
        starts_a = np.asarray(starts)[:, None]
        ends_a = (np.asarray(starts) + np.asarray(lens))[:, None]
        mask = (pos >= starts_a) & (pos < ends_a)
        scores = np.sum(np.where(mask, np.asarray(lp), 0.0), axis=-1)
        if length_normalize:
            scores = scores / np.maximum(np.asarray(lens), 1)
        picks.append(int(np.argmax(scores)))
    return picks


def accuracy(
    model,
    examples: Sequence[Tuple[Sequence[int], Sequence[Sequence[int]], int]],
    **kwargs,
) -> float:
    """Multiple-choice accuracy over ``(context, choices, gold_index)`` rows —
    the scoring protocol behind the reference's PIQA/ARC/HellaSwag/Winogrande
    tables."""
    ctxs = [e[0] for e in examples]
    choices = [e[1] for e in examples]
    golds = [e[2] for e in examples]
    picks = score_choices(model, ctxs, choices, **kwargs)
    return float(np.mean([p == g for p, g in zip(picks, golds)]))
