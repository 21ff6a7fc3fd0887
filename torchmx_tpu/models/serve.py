"""Continuous-batching decode engine.

A slot-based serving loop over a single static-shape decode executable:
requests join/leave a fixed pool of batch slots at any time, every slot
decodes at its **own** sequence position (per-row ``cache_position`` — the
KV caches scatter per row, and the fused MX-cache attention kernel masks
per row), and the hot loop never recompiles.

The reference ships a single-stream chat script only
(``examples/quantized_llama_chat.py``); batching across requests is how the
BASELINE north star's serving throughput is reached (decode is
VPU/HBM-bound per forward, so batched slots amortize it — measured 34 ->
582 tok/s from batch 1 to 32 on the 8B shape).

Buffer donation keeps the hot paths in place: the decode step and the slot
scatter both donate the engine caches, so XLA aliases the cache HBM and the
per-step cache update writes only the touched rows (no full-cache copy per
``step()``/``add()``).

Usage::

    engine = DecodeEngine(model, max_batch=8, max_len=2048,
                          kv_cache_config=MXConfig("float8_e4m3"),
                          eos_token_id=eos, temperature=0.8, top_k=40)
    slot = engine.add(prompt_ids)             # prefill into a free slot
    while engine.is_active(slot):
        tokens = engine.step()                # {slot: next_token_id}
    print(engine.finished_reason[slot])       # "eos" | "cache_full" | "stop"
"""

from __future__ import annotations


from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx



DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024)


class DecodeEngine:
    """Static-slot continuous batching around an NNX causal LM.

    Args:
        model: an NNX causal LM (``LlamaForCausalLM``-shaped).
        max_batch: number of request slots (the decode batch size).
        max_len: per-slot KV-cache capacity in tokens.
        kv_cache_config: optional ``MXConfig`` for an MX-quantized KV cache.
        eos_token_id: token id(s) that auto-release a slot when *generated*
            (the EOS token itself is not emitted).
        prefill_chunk: enable CHUNKED admissions: ``add()`` only queues the
            prompt, and each ``step()`` advances one ``prefill_chunk``-token
            chunk of the oldest pending admission before decoding — a long
            prompt no longer stalls active slots for its full prefill
            latency (plus a per-bucket compile); the stall per step is
            bounded by one chunk.  Chunked and whole-prompt admissions
            produce identical greedy streams (chunked causal attention over
            the cache prefix is the same math; tested).
        temperature: 0.0 (default) decodes greedily; > 0 samples from the
            temperature-scaled distribution.
        top_k: with sampling, restrict to the k highest-probability tokens
            (0 = no restriction).
        seed: PRNG seed for sampling.
        speculative_draft_len: enable prompt-lookup SPECULATION: each
            forward verifies this many drafted tokens per slot in one
            (K+1)-token step, accepted tokens queue per slot, and
            ``step()`` pops one per call — steps whose slots all hold queued
            tokens skip the forward entirely, so the average weight sweeps
            per emitted token drop to ``1/(1 + mean accepted)``.  Greedy
            streams are exact (every token is the verify pass's own
            argmax); with ``temperature > 0`` acceptance runs the
            rejection-sampling rule, so every emitted token is a faithful
            sample from the engine's filtered target distribution
            (``models.speculate`` module docstring).  Costs ``K+1`` tokens
            of per-slot cache headroom (a slot drains once ``pos + K + 1``
            would exceed ``max_len``).
        speculative_ngram: longest n-gram suffix tried by the draft lookup.
    """

    def __init__(
        self,
        model,
        max_batch: int,
        max_len: int,
        *,
        kv_cache_config=None,
        prefill_buckets: Sequence[int] = DEFAULT_BUCKETS,
        prefill_chunk: Optional[int] = None,
        eos_token_id=None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        seed: int = 0,
        mesh=None,
        batch_axis: str = "data",
        speculative_draft_len: Optional[int] = None,
        speculative_ngram: int = 3,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
        return_logprobs: bool = False,
        ring: bool = False,
    ):
        self.model = model
        self.max_batch = max_batch
        if kv_cache_config is not None:
            # KV-tile multiple: keeps the fused MX-cache attention eligible.
            max_len = (max_len + 127) // 128 * 128
        self.max_len = max_len
        # Ring (rolling-buffer) serving for sliding-window models: cache
        # HBM is bounded by max_len (the ring capacity) while generation
        # length is unbounded — slots never evict for "cache_full".
        self.ring = bool(ring)
        if self.ring:
            window = getattr(model.config, "sliding_window", None)
            if window is None:
                raise ValueError(
                    "ring=True requires a sliding-window model "
                    "(config.sliding_window)"
                )
            if kv_cache_config is None:
                raise ValueError("ring=True requires an MX kv_cache_config")
            if speculative_draft_len is not None:
                raise ValueError(
                    "ring caches do not compose with speculative decoding "
                    "yet (multi-token verify writes would need wrap-aware "
                    "rollback)"
                )
            # A prefill of q tokens needs capacity >= window + q - 1.
            max_admit = max_len - window + 1
            if max_admit < 1:
                raise ValueError(
                    f"ring capacity {max_len} must exceed the window {window}"
                )
            self._ring_max_admit = max_admit
        buckets = [b for b in sorted(prefill_buckets) if b <= max_len]
        if not buckets or buckets[-1] < max_len:
            buckets.append(max_len)  # prompts up to the cache size always fit
        self.buckets = tuple(buckets)
        if eos_token_id is None:
            eos_ids = ()
        elif isinstance(eos_token_id, int):
            eos_ids = (eos_token_id,)
        else:
            eos_ids = tuple(int(t) for t in eos_token_id)
        self.eos_token_ids = frozenset(eos_ids)
        # Token-level stop sequences: a slot auto-releases (reason "stop")
        # when its EMITTED stream ends with one of these (the matching
        # tokens ARE emitted — the consumer trims; incremental emission
        # cannot retract).  EOS by contrast is never emitted.
        self.stop_sequences = tuple(
            tuple(int(t) for t in seq) for seq in (stop_sequences or ())
        )
        assert all(len(seq) > 0 for seq in self.stop_sequences), (
            "stop sequences must be non-empty"
        )
        self._max_stop = max((len(s_) for s_ in self.stop_sequences), default=0)
        self._tail: List[list] = [[] for _ in range(max_batch)]
        #: per-slot log-probabilities of every EMITTED token (opt-in);
        #: aligned with the step() streams, cleared by add()/release().
        self.return_logprobs = bool(return_logprobs)
        self.logprobs: Dict[int, List[float]] = {}
        self._next_lp = np.zeros((max_batch,), np.float32)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.min_p = float(min_p)
        self._base_key = jax.random.PRNGKey(seed)
        self._step_count = 0
        # Weights are snapshotted here; call refresh_state() after in-place
        # weight updates (checkpoint restore, etc.).
        graphdef, self._state = nnx.split(model)
        self._caches = model.init_cache(
            max_batch, max_len, kv_cache_config, ring=self.ring
        )
        # Per-slot host state.
        self.pos = np.zeros((max_batch,), np.int32)  # next write position
        self.active = np.zeros((max_batch,), bool)
        #: why a slot auto-released: "eos" or "cache_full"; cleared by add().
        self.finished_reason: Dict[int, str] = {}
        self._next_token = np.zeros((max_batch,), np.int32)
        if prefill_chunk is not None and max_len % prefill_chunk != 0:
            # Chunk writes are (1, prefill_chunk)-wide dynamic_update_slices
            # at offsets that are chunk multiples; a final padded chunk whose
            # window would cross max_len gets its start CLAMPED by XLA,
            # relocating pad K/V over valid earlier positions — silent
            # corruption.  Divisibility keeps every window in bounds.
            raise ValueError(
                f"prefill_chunk {prefill_chunk} must divide max_len "
                f"{max_len} (pad rows of the last chunk would otherwise "
                f"clamp-relocate over valid cache positions)"
            )
        self.prefill_chunk = prefill_chunk
        self._kv_cache_config = kv_cache_config
        # Chunked admissions in flight: slot -> {"ids", "done", "caches"}.
        self._pending: Dict[int, dict] = {}
        # Slot's cache is full but its final computed token is still
        # unemitted: one more step() emits it, then the slot evicts.
        self._draining = np.zeros((max_batch,), bool)
        # Registered prompt-prefix KV caches (shared system prompts):
        # handle -> {"ids": tuple, "caches": single-slot caches with
        # positions [0, len(ids)) filled}.  See cache_prefix().
        self._prefixes: Dict[int, dict] = {}
        self._prefix_next_handle = 0
        #: prompt tokens whose prefill was skipped via prefix-cache hits.
        self.prefix_hit_tokens = 0
        self.speculative_draft_len = speculative_draft_len
        self.speculative_ngram = int(speculative_ngram)
        if speculative_draft_len is not None:
            assert speculative_draft_len >= 1
            # Per-slot incremental lookup index over (prompt + emitted +
            # pending) feeding the prompt-lookup drafts, accepted-token
            # queues, and deferred evictions (emit the queue first, then
            # evict).
            self._history: List[Optional["object"]] = [None] * max_batch
            self._queue: List[list] = [[] for _ in range(max_batch)]
            # Per-emitted-token logprobs queued alongside _queue (the verify
            # step computes the full logits row for every position anyway,
            # so speculative + return_logprobs costs one log_softmax).
            self._lp_queue: List[list] = [[] for _ in range(max_batch)]
            self._evict_after_queue: Dict[int, str] = {}
            #: verify forwards dispatched; the speedup claim is
            #: spec_verify_count << tokens emitted (tested).
            self.spec_verify_count = 0
        self._slot_cache_template = model.init_cache(
            1, max_len, kv_cache_config, ring=self.ring
        )
        # Cache-leaf axis holding the request slot: 0 for per-layer cache
        # lists, 1 for stacked (layer-leading) caches (ScanLlamaForCausalLM).
        slot_axis = getattr(model, "cache_slot_axis", 0)
        if mesh is not None:
            # Data-parallel serving: shard the engine caches on the slot
            # axis over ``batch_axis`` — each device serves a contiguous
            # group of slots; step()/add() are unchanged (slot rows are
            # independent, so DP tokens are bit-identical to unsharded,
            # tested).  Shard the model's weights separately
            # (``parallel.shard_model``: replicated under a pure-DP mesh,
            # TP-sharded under a hybrid mesh — DP x TP serving composes).
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            n_shards = mesh.shape[batch_axis]
            assert max_batch % n_shards == 0, (
                f"max_batch {max_batch} must divide over {batch_axis}={n_shards}"
            )

            def _shard(leaf):
                if not hasattr(leaf, "ndim") or leaf.ndim <= slot_axis:
                    return leaf
                spec = [None] * leaf.ndim
                spec[slot_axis] = batch_axis
                return jax.device_put(leaf, NamedSharding(mesh, _P(*spec)))

            self._caches = jax.tree.map(_shard, self._caches)

        temp, topk = self.temperature, self.top_k
        topp, minp = self.top_p, self.min_p
        want_lp = self.return_logprobs

        def pick(logits, key):
            tok = _select_token(logits, key, temp, topk, topp, minp)
            if want_lp:
                lp = jnp.take_along_axis(
                    jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                    tok[:, None],
                    axis=-1,
                )[:, 0]
            else:
                lp = jnp.zeros(tok.shape, jnp.float32)
            return tok, lp

        def prefill_one(state, slot_caches, ids, true_len, key):
            """Prefill a (1, Lp) prompt against fresh single-slot caches."""
            m = nnx.merge(graphdef, state)
            s = ids.shape[1]
            logits, new_caches = m(
                ids,
                attention_mask=None,  # standard causal (fused when eligible)
                position_ids=jnp.arange(s)[None, :],
                caches=slot_caches,
                cache_position=0,
            )
            last = jnp.take_along_axis(
                logits, (true_len - 1)[None, None, None], axis=1
            )[:, 0, :]
            token, lp = pick(last, key)
            return token, lp, new_caches

        def scatter_slot(big, small, slot):
            """Insert single-slot cache arrays into the engine caches.

            ``big`` is donated: XLA aliases the cache buffers and updates
            only the target slot's rows in place (admission cost is O(slot
            cache), not O(full cache)).
            """
            def put(b, s):
                if not hasattr(b, "ndim"):
                    return b
                start = (0,) * slot_axis + (slot,) + (0,) * (b.ndim - slot_axis - 1)
                return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), start)

            return jax.tree.map(put, big, small)

        def decode_step(state, caches, tokens, pos, key):
            """One token for every slot, each at its own position.

            Every slot decodes, including inactive ones (static shapes keep
            the executable single); an inactive slot's stale ``pos`` writes
            garbage K/V into its own slot cache each step.  INVARIANT:
            inactive-slot cache contents are garbage and must be fully
            replaced by ``add()``'s scatter before the slot is reused.
            ``caches`` is donated — the update happens in place.
            """
            m = nnx.merge(graphdef, state)
            logits, new_caches = m(
                tokens[:, None],
                attention_mask=None,  # per-row standard causal
                position_ids=pos[:, None],
                caches=caches,
                cache_position=pos,
            )
            nxt, lp = pick(logits[:, -1, :], key)
            return nxt, lp, new_caches

        def prefill_chunk_fn(state, slot_caches, ids, offset, last_idx, key):
            """One chunk of a chunked admission: positions offset..offset+w
            against the slot's partially-filled caches (donated)."""
            m = nnx.merge(graphdef, state)
            w = ids.shape[1]
            logits, new_caches = m(
                ids,
                attention_mask=None,
                position_ids=offset + jnp.arange(w)[None, :],
                caches=slot_caches,
                cache_position=offset,
            )
            last = jnp.take_along_axis(
                logits, last_idx[None, None, None], axis=1
            )[:, 0, :]
            token, lp = pick(last, key)
            return token, lp, new_caches

        if temp == 0.0:

            def verify_step(state, caches, tokens, pos, key):
                from .speculate import verify_forward

                out = verify_forward(
                    graphdef, state, caches, tokens, pos,
                    with_logprobs=want_lp,
                )
                return out[:-1], out[-1]

        else:

            def verify_step(state, caches, tokens, pos, key):
                from .speculate import verify_sample_forward

                out = verify_sample_forward(
                    graphdef, state, caches, tokens, pos, key,
                    jnp.asarray(temp, jnp.float32),
                    top_k=topk, top_p=topp, min_p=minp,
                    with_logprobs=want_lp,
                )
                return out[:-1], out[-1]

        self._prefill_one = jax.jit(prefill_one)
        self._prefill_chunk_fn = jax.jit(prefill_chunk_fn, donate_argnums=(1,))
        self._scatter_slot = jax.jit(scatter_slot, donate_argnums=(0,))
        self._decode_step = jax.jit(decode_step, donate_argnums=(1,))
        self._verify_step = jax.jit(verify_step, donate_argnums=(1,))

    # -- request lifecycle -----------------------------------------------------

    def refresh_state(self) -> None:
        """Re-snapshot the model's weights (after an in-place update)."""
        _, self._state = nnx.split(self.model)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"prompt length {n} exceeds the cache length {self.max_len}"
        )

    def free_slots(self) -> List[int]:
        return [i for i in range(self.max_batch) if not self.active[i]]

    def is_active(self, slot: int) -> bool:
        return bool(self.active[slot])

    def _next_key(self) -> jax.Array:
        self._step_count += 1
        return jax.random.fold_in(self._base_key, self._step_count)

    def cache_prefix(self, prefix_ids: Sequence[int]) -> int:
        """Precompute and store the KV cache for a shared prompt PREFIX.

        Later ``add()`` calls whose prompt starts with a registered prefix
        reuse its K/V rows instead of recomputing them (the longest match
        wins) and prefill only the remainder — the standard system-prompt
        optimization.  Reuse is EXACT: prefill is deterministic, so copied
        rows are byte-identical to recomputed ones (MX-quantized caches
        included); greedy streams are unchanged (tested).

        Each stored prefix costs one single-slot cache (O(max_len) HBM,
        the same as one batch slot); ``drop_prefix()`` frees it.  Returns
        a handle for :meth:`drop_prefix`.
        """
        ids_t = tuple(int(t) for t in prefix_ids)
        p = len(ids_t)
        if not 1 <= p < self.max_len:
            raise ValueError(
                f"prefix length {p} must be in [1, max_len={self.max_len})"
            )
        width = self._bucket(p)
        ids = np.zeros((1, width), np.int32)
        ids[0, :p] = ids_t
        _, _, caches = self._prefill_one(
            self._state,
            self._slot_cache_template,
            jnp.asarray(ids),
            jnp.asarray(p, jnp.int32),
            self._next_key(),
        )
        handle = self._prefix_next_handle
        self._prefix_next_handle += 1
        self._prefixes[handle] = {"ids": ids_t, "caches": caches}
        return handle

    def drop_prefix(self, handle: int) -> None:
        """Free a stored prefix cache registered by :meth:`cache_prefix`."""
        del self._prefixes[handle]

    def _match_prefix(self, prompt: Sequence[int]):
        """Longest registered prefix the prompt STRICTLY extends (the
        remainder must be non-empty so admission always produces fresh
        last-token logits).  Returns (match_len, caches) or (0, None)."""
        if not self._prefixes:
            return 0, None
        pt = tuple(int(t) for t in prompt)
        best, best_p = None, 0
        for entry in self._prefixes.values():
            p = len(entry["ids"])
            if p > best_p and len(pt) > p and pt[:p] == entry["ids"]:
                best, best_p = entry, p
        return best_p, (best["caches"] if best else None)

    def add(self, prompt_ids: Sequence[int]) -> int:
        """Admit ``prompt_ids`` into a free slot; returns the slot id.

        Without ``prefill_chunk`` the whole prompt prefills synchronously
        here.  With it, the prompt is queued and ``step()`` advances one
        chunk per call — the slot starts emitting once its last chunk lands.
        Prompts extending a registered :meth:`cache_prefix` skip the
        prefix's prefill in both modes.
        """
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slots; release() one first")
        slot = free[0]
        n = len(prompt_ids)
        if not self.ring and n > self.max_len:
            raise ValueError(
                f"prompt length {n} exceeds the cache length {self.max_len}"
            )
        if self.ring:
            # One prefill forward of q tokens needs capacity >= window+q-1;
            # longer prompts must admit through chunked prefill with
            # chunk <= max_len - window + 1.
            q = self.prefill_chunk if self.prefill_chunk is not None else (
                self._bucket(n) if n <= self.max_len else n
            )
            if q > self._ring_max_admit:
                raise ValueError(
                    f"ring admission width {q} exceeds capacity "
                    f"{self.max_len} - window + 1 = {self._ring_max_admit}; "
                    "use prefill_chunk <= that bound"
                )
        match_p, match_caches = self._match_prefix(prompt_ids)
        if self.prefill_chunk is not None:
            # Chunk windows must start at chunk multiples (see the
            # constructor's divisibility guard); round the reused length
            # down — the overlap [start, match_p) recomputes to identical
            # bytes (prefill is deterministic).
            start = (match_p // self.prefill_chunk) * self.prefill_chunk
            if start > 0:
                caches = jax.tree.map(jnp.copy, match_caches)
                self.prefix_hit_tokens += start
            else:
                caches = self.model.init_cache(
                    1, self.max_len, self._kv_cache_config, ring=self.ring
                )
            self._pending[slot] = {
                "ids": np.asarray(list(prompt_ids), np.int32),
                "done": start,
                "caches": caches,
            }
            self.active[slot] = True  # reserved; emits after the last chunk
            self.finished_reason.pop(slot, None)
            return slot
        if match_p > 0:
            # Prefix hit: start from a COPY of the stored prefix K/V (the
            # jit call donates its cache argument; the copy keeps the
            # stored entry alive) and prefill only the remainder at its
            # true offset — the same offset math as chunked admissions.
            rem = n - match_p
            width = self._bucket(rem)
            start = match_p
            if start + width > self.max_len:
                # The (1, width) remainder window must stay in bounds (a
                # clamped dynamic_update_slice would relocate pad rows over
                # valid positions); shift the window down and recompute the
                # overlap — identical bytes, deterministic.
                start = self.max_len - width
                rem = n - start
            ids = np.zeros((1, width), np.int32)
            ids[0, :rem] = list(prompt_ids)[start:]
            slot_caches = jax.tree.map(jnp.copy, match_caches)
            token, lp, slot_caches = self._prefill_chunk_fn(
                self._state,
                slot_caches,
                jnp.asarray(ids),
                jnp.asarray(start, jnp.int32),
                jnp.asarray(rem - 1, jnp.int32),
                self._next_key(),
            )
            self.prefix_hit_tokens += start
        else:
            width = self._bucket(n)
            ids = np.zeros((1, width), np.int32)
            ids[0, :n] = prompt_ids
            token, lp, slot_caches = self._prefill_one(
                self._state,
                self._slot_cache_template,
                jnp.asarray(ids),
                jnp.asarray(n, jnp.int32),
                self._next_key(),
            )
        self._caches = self._scatter_slot(self._caches, slot_caches, slot)
        self._next_token[slot] = int(token[0])
        self._next_lp[slot] = float(lp[0])
        self.pos[slot] = n
        self.active[slot] = True
        self.finished_reason.pop(slot, None)
        self._tail[slot] = []
        self.logprobs.pop(slot, None)
        if self.speculative_draft_len is not None:
            from .speculate import LookupIndex

            # History INCLUDES the pending token (drafts continue after it).
            self._history[slot] = LookupIndex(
                self.speculative_ngram, list(prompt_ids) + [int(token[0])]
            )
            self._queue[slot] = []
            self._lp_queue[slot] = []
            self._evict_after_queue.pop(slot, None)
        if int(token[0]) in self.eos_token_ids:
            # The prompt's very first continuation is EOS: nothing to emit.
            self._evict(slot, "eos")
        return slot

    def step(self) -> Dict[int, int]:
        """Decode one token for every active slot (single fused dispatch).

        Returns {slot: emitted token id}.  A slot auto-releases (and stops
        appearing in the result) when it generates ``eos_token_id``
        (``finished_reason[slot] == "eos"``; the EOS itself is not emitted)
        or when its cache fills (``"cache_full"``); poll ``is_active()`` /
        ``finished_reason`` to distinguish eviction from an explicit
        ``release()``.
        """
        if self._pending:
            self._advance_pending_chunk()
        decoding = self.active & ~np.isin(
            np.arange(self.max_batch), list(self._pending)
        )
        if not decoding.any():
            return {}
        if self.speculative_draft_len is not None:
            out = self._step_speculative(decoding)
            self._apply_stops(out)
            return out
        nxt, lps, self._caches = self._decode_step(
            self._state,
            self._caches,
            jnp.asarray(self._next_token),
            jnp.asarray(self.pos),
            self._next_key(),
        )
        nxt = np.asarray(nxt)
        lps = np.asarray(lps)
        out: Dict[int, int] = {}
        for i in range(self.max_batch):
            if not self.active[i] or i in self._pending:
                continue
            if self._draining[i]:
                # Final token (computed last step, needing no further cache
                # write): emit it and evict.  This step's decode output for
                # the slot is garbage (clamped K/V write) and is discarded.
                out[i] = int(self._next_token[i])
                if self.return_logprobs:
                    self.logprobs.setdefault(i, []).append(float(self._next_lp[i]))
                self._evict(i, "cache_full")
                continue
            emitted = int(self._next_token[i])
            out[i] = emitted
            if self.return_logprobs:
                self.logprobs.setdefault(i, []).append(float(self._next_lp[i]))
            self._next_token[i] = int(nxt[i])
            self._next_lp[i] = float(lps[i])
            self.pos[i] += 1
            if int(nxt[i]) in self.eos_token_ids:
                self._evict(i, "eos")
            elif not self.ring and self.pos[i] >= self.max_len:
                # The cache is full, but nxt is a valid final token (its
                # K/V row was just written): drain it on the next step
                # instead of dropping it.
                self._draining[i] = True
        self._apply_stops(out)
        return out

    def _apply_stops(self, out: Dict[int, int]) -> None:
        "Evict slots whose emitted stream now ends with a stop sequence."
        if not self.stop_sequences:
            return
        for slot, tok in out.items():
            tail = self._tail[slot]
            tail.append(int(tok))
            if len(tail) > self._max_stop:
                del tail[: len(tail) - self._max_stop]
            if self.active[slot] and any(
                len(tail) >= len(seq) and tuple(tail[-len(seq):]) == seq
                for seq in self.stop_sequences
            ):
                self._evict(slot, "stop")

    def _step_speculative(self, decoding: np.ndarray) -> Dict[int, int]:
        """Speculative step: verify drafted tokens for every slot that can
        still take a (K+1)-token write, queue the accepted tokens, pop one
        per slot.  Steps where every slot holds queued tokens skip the
        forward entirely — that skip is the speedup."""
        from .speculate import _accept_len, _accept_prefix

        K = self.speculative_draft_len
        B = self.max_batch
        sampling = self.temperature > 0.0
        headroom = self.pos + K + 1 <= self.max_len
        participate = [
            i for i in range(B)
            if decoding[i] and headroom[i] and i not in self._evict_after_queue
        ]
        if any(not self._queue[i] for i in participate):
            tokens = np.zeros((B, K + 1), np.int32)
            for i in participate:
                # History already holds the pending token (= its last entry).
                tokens[i, 0] = self._next_token[i]
                tokens[i, 1:] = self._history[i].draft(K)
            plan, self._caches = self._verify_step(
                self._state,
                self._caches,
                jnp.asarray(tokens),
                jnp.asarray(self.pos),
                self._next_key(),
            )
            plan = tuple(np.asarray(p) for p in plan)
            self.spec_verify_count += 1
            want_lp = self.return_logprobs
            for i in participate:
                if sampling:
                    accept_row, resid_row, bonus_row = (p[i] for p in plan[:3])
                    a = _accept_len(accept_row, K)
                    nxt = int(resid_row[a]) if a < K else int(bonus_row)
                    accepted = [int(t) for t in tokens[i, 1 : a + 1]]
                    if want_lp:
                        lp_draft, lp_resid, lp_bonus = (p[i] for p in plan[3:])
                        lps_accepted = [float(x) for x in lp_draft[:a]]
                        lp_next = float(lp_resid[a]) if a < K else float(lp_bonus)
                else:
                    preds = plan[0][i]
                    a = _accept_prefix(tokens[i, 1:], preds, K)
                    nxt = int(preds[a])
                    accepted = [int(t) for t in preds[:a]]
                    if want_lp:
                        lp_row = plan[1][i]
                        lps_accepted = [float(x) for x in lp_row[:a]]
                        lp_next = float(lp_row[a])
                # Emittable now: the pending token (its K/V row was written
                # by this verify) plus the accepted drafts; the follow-up
                # token (greedy bonus / rejection-sampling replacement)
                # becomes the new pending token.
                emit = [int(tokens[i, 0])] + accepted
                # Each emitted token's logprob was computed at the forward
                # that PRODUCED it: the pending token's at the previous
                # verify/prefill (_next_lp), each accepted draft's at its
                # verify position — identical to the plain decode stream.
                if want_lp:
                    emit_lps = [float(self._next_lp[i])] + lps_accepted
                self.pos[i] += a + 1
                bonus = nxt
                # EOS inside the accepted run: emit up to (not including) it,
                # then evict once the queue drains (EOS itself never emits).
                cut = next(
                    (j for j, t in enumerate(emit[1:], 1)
                     if t in self.eos_token_ids),
                    None,
                )
                if cut is not None:
                    emit = emit[:cut]
                    if want_lp:
                        emit_lps = emit_lps[:cut]
                    self._evict_after_queue[i] = "eos"
                elif bonus in self.eos_token_ids:
                    self._evict_after_queue[i] = "eos"
                else:
                    self._next_token[i] = bonus
                    if want_lp:
                        self._next_lp[i] = lp_next
                    # History holds the pending token already; append the
                    # accepted drafts and the new pending token (evicting
                    # slots never draft again, so their history can go
                    # stale).
                    self._history[i].extend(accepted + [bonus])
                self._queue[i].extend(emit)
                if want_lp:
                    self._lp_queue[i].extend(emit_lps)
        out: Dict[int, int] = {}
        for i in range(B):
            if not decoding[i]:
                continue
            if self._queue[i]:
                out[i] = self._queue[i].pop(0)
                if self.return_logprobs:
                    self.logprobs.setdefault(i, []).append(
                        self._lp_queue[i].pop(0)
                    )
                if not self._queue[i] and i in self._evict_after_queue:
                    self._evict(i, self._evict_after_queue[i])
            elif i in self._evict_after_queue:
                self._evict(i, self._evict_after_queue[i])
            elif not headroom[i]:
                # No room for another (K+1)-token verify: emit the valid
                # pending token and retire the slot (costs up to K+1 tokens
                # of cache capacity vs the non-speculative engine).
                out[i] = int(self._next_token[i])
                if self.return_logprobs:
                    self.logprobs.setdefault(i, []).append(
                        float(self._next_lp[i])
                    )
                self._evict(i, "cache_full")
        return out

    def _advance_pending_chunk(self) -> None:
        """Run ONE chunk of the oldest pending admission (bounded stall)."""
        slot = next(iter(self._pending))
        p = self._pending[slot]
        chunk = self.prefill_chunk
        n = len(p["ids"])
        done = p["done"]
        take = min(chunk, n - done)
        ids = np.zeros((1, chunk), np.int32)
        ids[0, :take] = p["ids"][done : done + take]
        token, lp, p["caches"] = self._prefill_chunk_fn(
            self._state,
            p["caches"],
            jnp.asarray(ids),
            jnp.asarray(done, jnp.int32),
            jnp.asarray(take - 1, jnp.int32),
            self._next_key(),
        )
        p["done"] = done + take
        if p["done"] >= n:
            del self._pending[slot]
            self._caches = self._scatter_slot(self._caches, p["caches"], slot)
            self._next_token[slot] = int(token[0])
            self._next_lp[slot] = float(lp[0])
            self.pos[slot] = n
            self._tail[slot] = []
            self.logprobs.pop(slot, None)
            if self.speculative_draft_len is not None:
                from .speculate import LookupIndex

                self._history[slot] = LookupIndex(
                    self.speculative_ngram,
                    [int(t) for t in p["ids"]] + [int(token[0])],
                )
                self._queue[slot] = []
                self._lp_queue[slot] = []
                self._evict_after_queue.pop(slot, None)
            if int(token[0]) in self.eos_token_ids:
                self._evict(slot, "eos")

    def _deactivate(self, slot: int) -> None:
        self.active[slot] = False
        self.pos[slot] = 0
        self._draining[slot] = False
        self._pending.pop(slot, None)
        if self.speculative_draft_len is not None:
            self._queue[slot] = []
            self._lp_queue[slot] = []
            self._history[slot] = None  # rebuilt by add()
            self._evict_after_queue.pop(slot, None)

    def _evict(self, slot: int, reason: str) -> None:
        self._deactivate(slot)
        self.finished_reason[slot] = reason

    def release(self, slot: int) -> None:
        self._deactivate(slot)
        self.finished_reason.pop(slot, None)
        self.logprobs.pop(slot, None)


def _select_token(
    logits: jax.Array,
    key,
    temperature: float,
    top_k: int,
    top_p: float = 1.0,
    min_p: float = 0.0,
):
    """Greedy (temperature 0) or filtered sampling over (B, V) — the
    shared warper stack (`models/sampling.py`), statically specialized."""
    from .sampling import sample_logits

    return sample_logits(
        logits, key, temperature, top_k=top_k, top_p=top_p, min_p=min_p
    )
