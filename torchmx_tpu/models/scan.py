"""Scan-over-layers forward: one compiled layer body instead of N.

A 32-layer model jitted as an unrolled Python loop produces a flat graph
with 32 copies of the layer computation — 50-350 s compiles at the 8B shape
on this environment.  ``ScanLlamaForCausalLM`` stacks the (homogeneous)
per-layer parameters on a leading axis and runs ``jax.lax.scan`` over them,
so XLA compiles the decoder layer ONCE.  Logits are bit-identical to the
unrolled model (same ops per layer; tested).

MXArray weights stack transparently: the payload/scale leaves gain a leading
layer dim through ``tree_map``/``scan`` slicing while the static metadata
(elem dtype, block size, block_dim) is per-layer invariant — inside the scan
body each layer sees an ordinary 2-D kernel-layout MXArray, so the fused
Pallas kernels run unchanged.

The reference has no analog (its ``torch.compile`` path retraces the whole
module graph); this is the TPU-native answer to deep-model compile time.

Usage::

    model = LlamaForCausalLM(cfg, rngs=...)        # or quantized via
    quantize_llm_(model, qattn, qmlp)              # module surgery first
    scan_model = ScanLlamaForCausalLM.from_model(model)
    logits, caches = scan_model(ids)               # == model(ids), compiled 32x faster
    engine = DecodeEngine(scan_model, ...)         # serving works unchanged
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import (
    LlamaConfig,
    LayerKVCache,
    MXLayerKVCache,
    make_causal_mask,
    rope_cos_sin,
)

Array = jax.Array


def _apply_final_softcap(logits, config):
    """Gemma2 final-logit soft cap (None on other families)."""
    cap = getattr(config, "final_logit_softcapping", None)
    if cap is None:
        return logits
    return (cap * jnp.tanh(logits.astype(jnp.float32) / cap)).astype(logits.dtype)


def _scale_embeddings(x, config):
    """Gemma sqrt(hidden) embedding scale (identity on other families);
    every path that reimplements the embed step must apply it."""
    if not getattr(config, "scale_embeddings", False):
        return x
    import math

    return x * jnp.asarray(math.sqrt(config.hidden_size), x.dtype)


def stack_decoder_layers(layers):
    """Stack homogeneous per-layer NNX modules into (graphdef, stacked_state).

    Every parameter/cache leaf gains a leading ``num_layers`` dim.  The
    graphdef is taken from layer 0 (``layer_idx`` — a static attribute — is
    therefore 0 inside the scan body; it is never used in computation).
    """
    layers = list(layers)
    graphdef, state0 = nnx.split(layers[0])
    states = [state0] + [nnx.split(l)[1] for l in layers[1:]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return graphdef, stacked


def stack_decoder_layer_groups(layers, period: int):
    """Stack layers with stride ``period`` for periodic mixed-window models
    (``plan_layer_bodies`` -> ("period", P)): part j holds layers j, j+P,
    j+2P, ... so layer g*P+j sits at stacked index g of part j, and part
    j's graphdef pins ``layer_idx == j`` (its static window).

    Returns (graphdefs, parts): P graphdefs + a tuple of P stacked states.
    """
    layers = list(layers)
    graphdefs, parts = [], []
    for j in range(period):
        gd, st = stack_decoder_layers(layers[j::period])
        graphdefs.append(gd)
        parts.append(st)
    return graphdefs, tuple(parts)


def _refine_plan_by_structure(plan, layers, config):
    """Split the window-based body plan wherever layers differ STRUCTURALLY
    (unequal module trees): DeepSeek-V3 mixes a dense-MLP prefix
    (``first_k_dense_replace``) with MoE layers — same windows, different
    structures — and stacking across that boundary would fail (or worse,
    misalign).  Structure is compared via the STATE pytree (treedef + leaf
    shapes/dtypes), not the graphdef — graphdefs embed the static
    ``layer_idx`` and would never compare equal.  Bodies whose layers
    already share a structure pass through unchanged; otherwise the plan
    falls back to runs of equal (window, structure)."""

    def sig(layer):
        leaves, treedef = jax.tree_util.tree_flatten(nnx.split(layer)[1])
        return (
            treedef,
            tuple((tuple(x.shape), str(x.dtype)) for x in leaves),
        )

    gds = [sig(l) for l in layers]
    n = len(gds)
    if plan[0] == "uniform":
        if all(g == gds[0] for g in gds):
            return plan
    elif plan[0] == "period":
        if all(gds[i] == gds[i % plan[1]] for i in range(n)):
            return plan
    else:
        if all(
            gds[i] == gds[s] for s, e in plan[1] for i in range(s, e)
        ):
            return plan

    def key(i):
        return (config.layer_window(i), gds[i])

    runs, s0 = [], 0
    for i in range(1, n + 1):
        if i == n or key(i) != key(s0):
            runs.append((s0, i))
            s0 = i
    return ("runs", runs)


class ScanLlamaForCausalLM(nnx.Module):
    """Llama forward with ``lax.scan`` over stacked decoder layers.

    Same ``__call__``/``init_cache`` contract as ``LlamaForCausalLM`` —
    ``generate()`` and ``DecodeEngine`` work unchanged — except caches are
    STACKED pytrees (leaves ``(num_layers, batch, ...)``), which is why
    ``cache_slot_axis == 1`` (the serving engine scatters request slots on
    axis 1, after the layer axis).
    """

    cache_slot_axis = 1

    def __init__(self, model):
        self.config = model.config
        # Layers may mix attention kinds (Gemma2 alternating windows, Qwen2
        # max_window_layers gating): plan one compiled body per KIND —
        # uniform (one body, the common case), periodic (scan groups of P
        # layers), or runs (one scan per maximal equal-window run).  A
        # body's window is static via its graphdef's layer_idx.
        from .llama import plan_layer_bodies

        inner = model.model
        self._plan = _refine_plan_by_structure(
            plan_layer_bodies(model.config), list(inner.layers), model.config
        )
        self.embed_tokens = inner.embed_tokens
        self.norm = inner.norm
        self.inv_freq = inner.inv_freq
        self.rope_scale = getattr(inner, "rope_scale", 1.0)  # LongRoPE factor
        self.lm_head = model.lm_head
        kind = self._plan[0]
        if kind == "uniform":
            parts = [list(inner.layers)]
        elif kind == "period":
            P = self._plan[1]
            # Body j sweeps layers j, j+P, j+2P, ... (layer g*P+j lives at
            # stacked index [g] of part j).
            parts = [list(inner.layers)[j::P] for j in range(self._plan[1])]
        else:  # runs
            parts = [list(inner.layers)[s:e] for s, e in self._plan[1]]
        graphdefs, merged = [], []
        for part in parts:
            graphdef, stacked = stack_decoder_layers(part)
            graphdefs.append(graphdef)
            # A real module holding the stacked params: shards/checkpoints/
            # splits like any other (merge does not validate the extra
            # leading dim).
            merged.append(nnx.merge(graphdef, stacked))
        self._layer_graphdefs = graphdefs
        self._layer_graphdef = graphdefs[0]  # back-compat alias
        self.layers_stacked = merged[0] if len(merged) == 1 else nnx.List(merged)
        #: per-body static window (masks for the cacheless path).
        c = model.config
        if kind == "uniform":
            self._body_windows = [self._plan[1]]
        elif kind == "period":
            self._body_windows = [c.layer_window(j) for j in range(self._plan[1])]
        else:
            self._body_windows = [c.layer_window(s) for s, _ in self._plan[1]]

    @classmethod
    def from_model(cls, model) -> "ScanLlamaForCausalLM":
        """Convert a (possibly MX-quantized) ``LlamaForCausalLM``.

        The source model's parameter arrays are shared, not copied, until
        stacking; run ``quantize_llm_`` surgery BEFORE converting.
        """
        return cls(model)

    @property
    def num_layers(self) -> int:
        return self.config.num_hidden_layers

    def __call__(
        self,
        input_ids: Array,
        *,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        caches=None,
        cache_position: Optional[Array] = None,
    ):
        b, s = input_ids.shape
        x = _scale_embeddings(self.embed_tokens(input_ids), self.config)
        if position_ids is None:
            position_ids = jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(self.inv_freq.get_value(), position_ids, x.dtype)
        if getattr(self, "rope_scale", 1.0) != 1.0:
            cos = cos * jnp.asarray(self.rope_scale, cos.dtype)
            sin = sin * jnp.asarray(self.rope_scale, sin.dtype)
        body_masks = None
        if attention_mask is None and caches is None:
            from ..parallel import context as _cpmod

            if _cpmod.active_cp() is None:
                built = {}

                def mask_for(w):
                    if w not in built:
                        built[w] = make_causal_mask(
                            s, s, dtype=jnp.float32, window=w
                        )[None, None]
                    return built[w]

                body_masks = [mask_for(w) for w in self._body_windows]
            # else: context-parallel forward — the per-layer attention rides
            # the ring and masks causally from global offsets; a dense
            # (L, L) mask would both defeat the sharding and (worse) force
            # the eager path, silently disabling CP for the scan model.

        kind = self._plan[0]
        modules = (
            [self.layers_stacked] if kind == "uniform" else list(self.layers_stacked)
        )
        states = [nnx.split(m)[1] for m in modules]

        def make_body(graphdef, mask):
            def body(x, xs):
                lstate, cache = xs
                layer = nnx.merge(graphdef, lstate)
                x, nc = layer(
                    x,
                    cos=cos,
                    sin=sin,
                    attention_mask=mask,
                    cache=cache,
                    cache_position=cache_position,
                )
                return x, nc

            return body

        def mask_of(i):
            return body_masks[i] if body_masks is not None else attention_mask

        new_caches = None
        if kind == "uniform":
            body = make_body(self._layer_graphdefs[0], mask_of(0))
            if caches is None:
                x, _ = jax.lax.scan(body, x, (states[0], None))
            else:
                x, new_caches = jax.lax.scan(body, x, (states[0], caches))
        elif kind == "period":
            # Scan over groups of P consecutive layers; body j (graphdef
            # pinned to layer_idx == j) applies its static window/mask.
            P = self._plan[1]
            n = self.config.num_hidden_layers
            cache_g = (
                None if caches is None
                else jax.tree.map(
                    lambda a: a.reshape((n // P, P) + a.shape[1:]), caches
                )
            )
            bodies = [
                make_body(self._layer_graphdefs[j], mask_of(j)) for j in range(P)
            ]

            def group_body(x, xs):
                sts, cg = xs
                ncs = []
                for j in range(P):
                    cache_j = (
                        None if cg is None
                        else jax.tree.map(lambda a, _j=j: a[_j], cg)
                    )
                    x, nc = bodies[j](x, (sts[j], cache_j))
                    ncs.append(nc)
                if cg is None:
                    return x, None
                return x, jax.tree.map(lambda *ys: jnp.stack(ys), *ncs)

            x, new_cache_g = jax.lax.scan(
                group_body, x, (tuple(states), cache_g)
            )
            if caches is not None:
                new_caches = jax.tree.map(
                    lambda a: a.reshape((n,) + a.shape[2:]), new_cache_g
                )
        else:  # runs: one scan per maximal equal-window run of layers
            runs = self._plan[1]
            parts = []
            for i, (s0, e0) in enumerate(runs):
                body = make_body(self._layer_graphdefs[i], mask_of(i))
                cache_r = (
                    None if caches is None
                    else jax.tree.map(lambda a, _s=s0, _e=e0: a[_s:_e], caches)
                )
                x, nc = jax.lax.scan(body, x, (states[i], cache_r))
                parts.append(nc)
            if caches is not None:
                new_caches = jax.tree.map(
                    lambda *ys: jnp.concatenate(ys, axis=0), *parts
                )

        hidden = self.norm(x)
        if self.lm_head is None:
            logits = hidden @ self.embed_tokens.weight.get_value().T
        else:
            logits = self.lm_head(hidden)
        logits = _apply_final_softcap(logits, self.config)
        return logits, new_caches

    def init_cache(self, batch: int, max_len: int, kv_cache_config=None, ring: bool = False):
        """Stacked per-layer KV caches: leaves (num_layers, batch, ...)."""
        c = self.config
        if ring and kv_cache_config is None:
            raise ValueError(
                "ring caches are implemented for MX KV caches; pass a "
                "kv_cache_config"
            )
        if getattr(c, "kv_lora_rank", None):
            # DeepSeek MLA: the per-layer cache is a compressed LATENT
            # buffer, not per-head K/V.
            from .deepseek import MLACache, MXMLACache

            if ring:
                raise NotImplementedError(
                    "ring caches apply to sliding-window models; "
                    "DeepSeek-V3 attends full-causal"
                )
            if kv_cache_config is None:
                one = MLACache.create(
                    batch, max_len, c.kv_lora_rank, c.qk_rope_head_dim
                )
            else:
                one = MXMLACache.create(
                    batch, max_len, c.kv_lora_rank, c.qk_rope_head_dim,
                    kv_cache_config.elem_dtype_name,
                    kv_cache_config.block_size,
                )
        elif kv_cache_config is None:
            one = LayerKVCache.create(batch, c.num_key_value_heads, max_len, c.head_dim)
        else:
            one = MXLayerKVCache.create(
                batch,
                c.num_key_value_heads,
                max_len,
                c.head_dim,
                kv_cache_config.elem_dtype_name,
                kv_cache_config.block_size,
                ring=ring,
            )
        L = c.num_hidden_layers
        return jax.tree.map(lambda a: jnp.zeros((L,) + a.shape, a.dtype), one)
