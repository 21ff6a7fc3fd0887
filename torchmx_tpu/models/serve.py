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

Usage::

    engine = DecodeEngine(model, max_batch=8, max_len=2048,
                          kv_cache_config=MXConfig("float8_e4m3"))
    slot = engine.add(prompt_ids)             # prefill into a free slot
    while ...:
        tokens = engine.step()                # {slot: next_token_id}
        if tokens[slot] == eos: engine.release(slot)
"""

from __future__ import annotations


from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx



DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024)


class DecodeEngine:
    """Static-slot continuous batching around an NNX causal LM."""

    def __init__(
        self,
        model,
        max_batch: int,
        max_len: int,
        *,
        kv_cache_config=None,
        prefill_buckets: Sequence[int] = DEFAULT_BUCKETS,
    ):
        self.model = model
        self.max_batch = max_batch
        if kv_cache_config is not None:
            # KV-tile multiple: keeps the fused MX-cache attention eligible.
            max_len = (max_len + 127) // 128 * 128
        self.max_len = max_len
        buckets = [b for b in sorted(prefill_buckets) if b <= max_len]
        if not buckets or buckets[-1] < max_len:
            buckets.append(max_len)  # prompts up to the cache size always fit
        self.buckets = tuple(buckets)
        # Weights are snapshotted here; call refresh_state() after in-place
        # weight updates (checkpoint restore, etc.).
        graphdef, self._state = nnx.split(model)
        self._caches = model.init_cache(max_batch, max_len, kv_cache_config)
        # Per-slot host state.
        self.pos = np.zeros((max_batch,), np.int32)  # next write position
        self.active = np.zeros((max_batch,), bool)
        self._next_token = np.zeros((max_batch,), np.int32)
        self._slot_cache_template = model.init_cache(1, max_len, kv_cache_config)

        def prefill_one(state, slot_caches, ids, true_len):
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
            token = jnp.argmax(last, axis=-1).astype(jnp.int32)
            return token, new_caches

        def scatter_slot(big, small, slot):
            """Insert single-slot cache arrays into the engine caches."""
            def put(b, s):
                if not hasattr(b, "ndim"):
                    return b
                start = (slot,) + (0,) * (b.ndim - 1)
                return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), start)

            return jax.tree.map(put, big, small)

        def decode_step(state, caches, tokens, pos):
            """One token for every slot, each at its own position."""
            m = nnx.merge(graphdef, state)
            logits, new_caches = m(
                tokens[:, None],
                attention_mask=None,  # per-row standard causal
                position_ids=pos[:, None],
                caches=caches,
                cache_position=pos,
            )
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return nxt, new_caches

        self._prefill_one = jax.jit(prefill_one)
        self._scatter_slot = jax.jit(scatter_slot)
        self._decode_step = jax.jit(decode_step)

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

    def add(self, prompt_ids: Sequence[int]) -> int:
        """Prefill ``prompt_ids`` into a free slot; returns the slot id."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slots; release() one first")
        slot = free[0]
        n = len(prompt_ids)
        width = self._bucket(n)
        ids = np.zeros((1, width), np.int32)
        ids[0, :n] = prompt_ids
        token, slot_caches = self._prefill_one(
            self._state,
            self._slot_cache_template,
            jnp.asarray(ids),
            jnp.asarray(n, jnp.int32),
        )
        self._caches = self._scatter_slot(self._caches, slot_caches, slot)
        self._next_token[slot] = int(token[0])
        self.pos[slot] = n
        self.active[slot] = True
        return slot

    def step(self) -> Dict[int, int]:
        """Decode one token for every active slot (single fused dispatch)."""
        if not self.active.any():
            return {}
        nxt, self._caches = self._decode_step(
            self._state,
            self._caches,
            jnp.asarray(self._next_token),
            jnp.asarray(self.pos),
        )
        nxt = np.asarray(nxt)
        out: Dict[int, int] = {}
        for i in range(self.max_batch):
            if not self.active[i]:
                continue
            emitted = int(self._next_token[i])
            out[i] = emitted
            self._next_token[i] = int(nxt[i])
            self.pos[i] += 1
            if self.pos[i] >= self.max_len:
                self.active[i] = False
        return out

    def release(self, slot: int) -> None:
        self.active[slot] = False
        self.pos[slot] = 0
