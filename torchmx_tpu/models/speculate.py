"""Prompt-lookup speculative decoding (greedy), a serving-side extension.

Batch-1 decode is weight-read-bound: one token per step pays the full
packed-weight HBM sweep (the reference has no serving path at all; this
framework's fused kernels put the floor at ~10 ms/token for an 8B).  A
verify step over K+1 tokens costs nearly the same HBM sweep, so accepting
``a`` drafted tokens per step divides the per-token weight traffic by
``a+1``.

Drafts come from **prompt lookup** (n-gram continuation): the longest
recent ``ngram`` suffix of the sequence is matched against its own history
and the tokens that followed the match become the draft — no draft model,
no extra memory, and exact greedy output (every emitted token is the
argmax of the full model's logits at its position; rejected drafts are
never emitted).

TPU-shaped: exactly TWO compiled executables run (the prefill and the
(K+1)-token verify step) — the draft search is host-side bookkeeping over
already-emitted ids.  Cache rollback after a rejection is free: the next
verify step re-writes the stale cache rows and every query masks by its own
``kv_len``, so stale entries are never visible (the same per-row masking
the continuous-batching engine relies on).

Sampling (``temperature > 0``) keeps speculation through REJECTION
sampling (the standard spec-sampling acceptance rule, specialized to a
deterministic proposal): prompt lookup proposes a point-mass draft
``q = delta_x``, so draft ``x`` is accepted with probability ``p(x)``
(``min(1, p(x)/q(x))``) and a rejection samples from the residual
``max(p - q, 0)`` renormalized — which for a point mass is exactly ``p``
with ``x`` excluded.  Every emitted token is therefore distributed as a
direct sample from the target (temperature-scaled, top-k/top-p/min-p
filtered) distribution conditioned on the accepted prefix — speculation
changes throughput, never the sampling distribution (property-tested in
``tests/test_speculate.py``).  With ``temperature == 0`` acceptance is
exact argmax prefix-matching.
"""

from __future__ import annotations

import functools
import weakref
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

_SESSIONS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _session(model, samp=None):
    """Compiled (prefill, verify) pair; ``samp`` is None for greedy or the
    STATIC ``(top_k, top_p, min_p)`` filter tuple for sampling mode (the
    traced temperature/key ride the call)."""
    graphdef, _ = nnx.split(model)
    cache = _SESSIONS.setdefault(model, {})
    entry = cache.get(samp)
    if entry is not None and entry[0] == graphdef:
        return entry[1]

    def _last_logits(state, input_ids, caches, prompt_len):
        m = nnx.merge(graphdef, state)
        b, s = input_ids.shape
        logits, new_caches = m(
            input_ids,
            attention_mask=None,
            position_ids=jnp.arange(s)[None, :],
            caches=caches,
            cache_position=0,
        )
        last = jnp.take_along_axis(logits, (prompt_len - 1)[:, None, None], axis=1)
        return last[:, 0, :], new_caches

    if samp is None:

        @functools.partial(jax.jit, static_argnames="max_len")
        def prefill(state, input_ids, caches, prompt_len, max_len):
            last, new_caches = _last_logits(state, input_ids, caches, prompt_len)
            return jnp.argmax(last, -1).astype(jnp.int32), new_caches

        @functools.partial(jax.jit, static_argnames="max_len")
        def verify(state, tokens, pos, caches, max_len):
            return verify_forward(graphdef, state, caches, tokens, pos)

    else:
        top_k, top_p, min_p = samp

        @functools.partial(jax.jit, static_argnames="max_len")
        def prefill(state, input_ids, caches, prompt_len, key, temp, max_len):
            from .sampling import sample_logits

            last, new_caches = _last_logits(state, input_ids, caches, prompt_len)
            tok = sample_logits(
                last, key, temp, top_k=top_k, top_p=top_p, min_p=min_p
            )
            return tok, new_caches

        @functools.partial(jax.jit, static_argnames="max_len")
        def verify(state, tokens, pos, caches, key, temp, max_len):
            return verify_sample_forward(
                graphdef, state, caches, tokens, pos, key, temp,
                top_k=top_k, top_p=top_p, min_p=min_p,
            )

    built = (prefill, verify)
    cache[samp] = (graphdef, built)
    return built


def verify_forward(graphdef, state, caches, tokens, pos, *, with_logprobs=False):
    """The speculative verify forward, shared by :func:`generate_speculative`
    and ``DecodeEngine``'s speculative step (each wraps it in its own jit /
    donation policy).

    ``tokens`` (b, K+1) = [pending token, draft_0..draft_{K-1}] at per-row
    positions ``pos..pos+K``; returns the greedy prediction AFTER each input
    token ((b, K+1) int32) and the updated caches.  Rows a rejection leaves
    stale are invisible (per-row ``kv_len`` masking) and get rewritten by
    the row's next verify.

    ``with_logprobs`` (static) additionally returns the (b, K+1) float32
    log-probability of each prediction under the UNfiltered target
    distribution at its position — the same quantity the engine's plain
    decode step records per emitted token, so speculative and plain
    ``return_logprobs`` streams match exactly."""
    m = nnx.merge(graphdef, state)
    s = tokens.shape[1]
    logits, new_caches = m(
        tokens,
        attention_mask=None,
        position_ids=pos[:, None] + jnp.arange(s)[None, :],
        caches=caches,
        cache_position=pos,
    )
    preds = jnp.argmax(logits, -1).astype(jnp.int32)
    if with_logprobs:
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            preds[..., None],
            axis=-1,
        )[..., 0]
        return preds, lp, new_caches
    return preds, new_caches


def spec_sample_decisions(
    logits, drafts, key, temperature, *, top_k=0, top_p=1.0, min_p=0.0
):
    """Rejection-sampling acceptance plan for a deterministic draft.

    Args:
        logits: (b, K+1, V) target logits at the verify positions —
            ``logits[:, j]`` is the next-token distribution conditioned on
            the pending token plus drafts ``0..j-1``.
        drafts: (b, K) drafted token ids (``tokens[:, 1:]`` of the verify
            input).
        key: PRNG key for this verify step (fold a fresh one per step).
        temperature: traced scalar > 0.
        top_k/top_p/min_p: static filters defining the TARGET distribution
            (must match the plain sampling path's).

    Returns ``(accept, resid, bonus)``:
        accept: (b, K) bool — draft j accepted iff ``u_j < p_j(draft_j)``
            (each decision independent; the host takes the accepted PREFIX).
        resid:  (b, K) int32 — the replacement token to emit if draft j is
            the first rejection: a sample from ``p_j`` with the draft's
            mass removed (the point-mass residual), renormalized.
        bonus:  (b,) int32 — a sample from ``p_K`` (emitted when every
            draft is accepted).

    Acceptance decisions, residual draws, and the bonus draw use
    independent key branches, so an emitted token is a faithful sample from
    the target distribution conditioned on its accepted prefix regardless
    of where the rejection lands.
    """
    from .sampling import filter_logits

    b, k1, _ = logits.shape
    K = k1 - 1
    x = logits.astype(jnp.float32) / temperature
    x = filter_logits(x, top_k=top_k, top_p=top_p, min_p=min_p)
    kacc, kres, kbon = jax.random.split(key, 3)
    p = jax.nn.softmax(x[:, :K], axis=-1)  # (b, K, V) target dists
    p_draft = jnp.take_along_axis(p, drafts[..., None], axis=-1)[..., 0]
    accept = jax.random.uniform(kacc, (b, K)) < p_draft
    # Residual: the target with the draft token masked out (renormalized by
    # the categorical's softmax).  Unreachable when p(draft) == 1 (then the
    # draft always accepts), so the all-masked edge case cannot emit.
    onehot = jax.nn.one_hot(drafts, x.shape[-1], dtype=bool)
    resid_logits = jnp.where(onehot, -jnp.inf, x[:, :K])
    resid = jax.random.categorical(kres, resid_logits, axis=-1)
    bonus = jax.random.categorical(kbon, x[:, K], axis=-1)
    return accept, resid.astype(jnp.int32), bonus.astype(jnp.int32)


def verify_sample_forward(
    graphdef, state, caches, tokens, pos, key, temperature,
    *, top_k=0, top_p=1.0, min_p=0.0, with_logprobs=False,
):
    """Sampling-mode speculative verify: one (K+1)-token forward plus the
    rejection-sampling plan (see :func:`spec_sample_decisions`).  Returns
    ``(accept, resid, bonus, new_caches)``; cache semantics are identical
    to :func:`verify_forward` (stale rows invisible via per-row kv_len).

    ``with_logprobs`` (static) additionally returns, before ``new_caches``,
    the raw-distribution log-probabilities of every token the host might
    emit: ``lp_draft`` (b, K) for the drafts, ``lp_resid`` (b, K) for the
    rejection replacements, ``lp_bonus`` (b,) for the all-accepted bonus —
    all under the UNfiltered target logits, matching the plain decode
    step's ``return_logprobs`` semantics."""
    m = nnx.merge(graphdef, state)
    s = tokens.shape[1]
    logits, new_caches = m(
        tokens,
        attention_mask=None,
        position_ids=pos[:, None] + jnp.arange(s)[None, :],
        caches=caches,
        cache_position=pos,
    )
    accept, resid, bonus = spec_sample_decisions(
        logits, tokens[:, 1:], key, temperature,
        top_k=top_k, top_p=top_p, min_p=min_p,
    )
    if with_logprobs:
        K = tokens.shape[1] - 1
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        def take(lp, idx):
            return jnp.take_along_axis(lp, idx[..., None], axis=-1)[..., 0]

        lp_draft = take(logp[:, :K], tokens[:, 1:])
        lp_resid = take(logp[:, :K], resid)
        lp_bonus = jnp.take_along_axis(logp[:, K], bonus[:, None], axis=-1)[:, 0]
        return accept, resid, bonus, lp_draft, lp_resid, lp_bonus, new_caches
    return accept, resid, bonus, new_caches


def _accept_len(accept_row, k: int) -> int:
    """Number of drafted tokens accepted in sampling mode: the prefix of
    True acceptance decisions (the first rejection truncates)."""
    a = 0
    while a < k and bool(accept_row[a]):
        a += 1
    return a


def _accept_prefix(drafts_row, preds_row, k: int) -> int:
    """Number of drafted tokens accepted: the longest prefix where each
    draft equals the model's greedy prediction after the previous token.
    Shared by :func:`generate_speculative` and the engine's speculative
    step so the acceptance rule cannot drift between them."""
    a = 0
    while a < k and int(drafts_row[a]) == int(preds_row[a]):
        a += 1
    return a


def _draft(row: list, ngram: int, k: int) -> list:
    """Prompt-lookup draft: find the most recent earlier occurrence of the
    last ``ngram`` tokens and return the ``k`` tokens that followed it
    (falling back to shorter n-grams, then to repeating the last token).

    Brute-force reference (O(n) per call); production paths use the
    incremental :class:`LookupIndex`, which is property-tested equivalent.
    """
    n = len(row)
    for g in range(min(ngram, n - 1), 0, -1):
        key = row[n - g :]
        # Most recent match wins (local context beats distant).
        for s in range(n - g - 1, -1, -1):
            if row[s : s + g] == key:
                cont = row[s + g : s + g + k]
                return cont + [row[-1]] * (k - len(cont))
    return [row[-1]] * k


class LookupIndex:
    """Incremental prompt-lookup state for one sequence: O(ngram) per
    appended token, O(ngram) per draft — instead of rescanning the whole
    history every step (which would make the host-side draft search the
    serving bottleneck at long generations).

    For each n-gram length the index keeps the TWO most recent end
    positions of every gram; the draft query's own suffix is always the
    most recent occurrence, so the previous one is the brute-force
    "most recent earlier match".  Equivalent to :func:`_draft` (tested on
    random sequences).
    """

    def __init__(self, ngram: int, tokens=()):  # noqa: D401
        self.ngram = int(ngram)
        self.row: list = []
        self._idx = [None] + [dict() for _ in range(self.ngram)]
        self.extend(tokens)

    def extend(self, tokens) -> None:
        row = self.row
        for t in tokens:
            row.append(int(t))
            m = len(row)
            for g in range(1, min(self.ngram, m) + 1):
                key = tuple(row[m - g : m])
                d = self._idx[g]
                prev = d.get(key)
                d[key] = (m, prev[0] if prev is not None else None)

    def draft(self, k: int) -> list:
        row = self.row
        n = len(row)
        for g in range(min(self.ngram, n - 1), 0, -1):
            pair = self._idx[g].get(tuple(row[n - g :]))
            if pair is None:
                continue
            v = pair[0] if pair[0] < n else pair[1]
            if v is not None and v < n:
                cont = row[v : v + k]
                return cont + [row[-1]] * (k - len(cont))
        return [row[-1]] * k


def generate_speculative(
    model,
    input_ids: jax.Array,
    max_new_tokens: int,
    *,
    kv_cache_config=None,
    draft_len: int = 7,
    ngram: int = 3,
    return_stats: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    seed: int = 0,
) -> jax.Array | Tuple[jax.Array, dict]:
    """Generation with prompt-lookup speculation.

    At ``temperature == 0`` emits the same greedy stream as
    :func:`generate` (modulo the usual cross-compilation bf16 drift between
    the 1-token and (K+1)-token executables); at ``temperature > 0`` each
    emitted token is a faithful sample from the filtered target
    distribution via rejection sampling (module docstring).  Either way the
    run costs ~``1/(mean accepted + 1)`` as many full weight sweeps.
    ``return_stats=True`` also returns
    ``{"steps": n, "tokens": t, "mean_accepted": a}`` for honest speedup
    accounting.
    """
    assert draft_len >= 1 and ngram >= 1
    _, state = nnx.split(model)
    b, s = input_ids.shape
    K = draft_len
    sampling = temperature > 0.0
    samp = (int(top_k), float(top_p), float(min_p)) if sampling else None
    temp = jnp.asarray(temperature, jnp.float32)
    base_key = jax.random.PRNGKey(seed)
    n_key = 0

    def next_key():
        nonlocal n_key
        n_key += 1
        return jax.random.fold_in(base_key, n_key)
    # Cache headroom: a row's pos can overshoot its quota by up to K in its
    # final accepting step (reaching s + max_new_tokens + K - 1), and a
    # FINISHED row keeps riding later verify batches, writing (harmlessly
    # masked) rows up to that frozen pos + K — so allocate 2K of slack to
    # keep every write in bounds rather than relying on scatter clamping.
    max_len = s + max_new_tokens + 2 * K + 1
    if kv_cache_config is not None:
        max_len = (max_len + 127) // 128 * 128
    caches = model.init_cache(b, max_len, kv_cache_config)
    prompt_len = jnp.full((b,), s, jnp.int32)

    prefill, verify = _session(model, samp)
    if sampling:
        token, caches = prefill(
            state, input_ids, caches, prompt_len, next_key(), temp,
            max_len=max_len,
        )
    else:
        token, caches = prefill(state, input_ids, caches, prompt_len, max_len=max_len)

    rows = [LookupIndex(ngram, np.asarray(input_ids[i])) for i in range(b)]
    first = np.asarray(token)
    out = [[int(first[i])] for i in range(b)]
    for i in range(b):
        rows[i].extend([int(first[i])])

    pos = np.full((b,), s, np.int64)
    done = np.array([len(o) >= max_new_tokens for o in out])
    steps = 0
    while not done.all():
        drafts = np.stack(
            [np.asarray(rows[i].draft(K), np.int64) for i in range(b)]
        )
        last = np.asarray([rows[i].row[-1] for i in range(b)], np.int64)
        tokens_in = jnp.asarray(
            np.concatenate([last[:, None], drafts], axis=1), jnp.int32
        )
        if sampling:
            accept, resid, bonus, caches = verify(
                state, tokens_in, jnp.asarray(pos, jnp.int32), caches,
                next_key(), temp, max_len=max_len,
            )
            accept = np.asarray(accept)
            resid, bonus = np.asarray(resid), np.asarray(bonus)
        else:
            preds, caches = verify(
                state, tokens_in, jnp.asarray(pos, jnp.int32), caches,
                max_len=max_len,
            )
            preds = np.asarray(preds)  # (b, K+1): greedy after each input
        steps += 1
        for i in range(b):
            if done[i]:
                # Finished rows still ride the batch (their cache rows churn
                # harmlessly past their last emitted token).
                continue
            if sampling:
                # Accept the prefix of passing rejection-sampling draws; the
                # step still yields one guaranteed token (the residual
                # sample at the rejection, or the bonus draw past K).
                a = _accept_len(accept[i], K)
                tail = int(resid[i, a]) if a < K else int(bonus[i])
                new = [int(t) for t in drafts[i, :a]] + [tail]
            else:
                # Accept drafted tokens while they equal the model's own
                # greedy prediction; the first non-matching position still
                # yields one guaranteed token (the prediction itself).
                a = _accept_prefix(drafts[i], preds[i], K)
                new = [int(t) for t in preds[i, : a + 1]]
            out[i].extend(new)
            rows[i].extend(new)
            pos[i] += a + 1
            if len(out[i]) >= max_new_tokens:
                done[i] = True
    result = jnp.asarray(
        np.stack([np.asarray(o[:max_new_tokens], np.int64) for o in out]), jnp.int32
    )
    if return_stats:
        total = int(sum(min(len(o), max_new_tokens) for o in out))
        # Each verify step emits (accepted + 1) tokens per row; the prefill
        # emits 1.  mean_accepted counts DRAFTS only, so the weight-sweep
        # ratio vs plain decode is exactly 1 / (1 + mean_accepted).
        stats = {
            "steps": steps,
            "tokens": total,
            "mean_accepted": (total - b) / max(steps, 1) / b - 1.0,
        }
        return result, stats
    return result
