"""Mixtral model family: Mistral attention + sparse Mixture-of-Experts MLP.

A TPU-build extension — the reference has no MoE code at all (SURVEY §2.3
marks expert parallelism "n/a: no MoE in reference"); this family lights
that row up the TPU way.

Design (TPU-first):

* **Stacked expert weights.** Each MoE block holds ``w1/w3`` (gate/up,
  shape (E, I, H)) and ``w2`` (down, (E, H, I)) as single arrays instead of
  E separate modules.  Expert parallelism is then just GSPMD: shard the
  leading E axis over an ``expert`` mesh axis (`parallel.mesh._EXPERT_RULES`)
  and XLA inserts the all-to-alls — no hand-written collectives, the same
  recipe as the TP/DP paths.
* **Three routing modes.**
  - ``capacity_factor=None`` (default): *exact* routing computed as one
    dense batched einsum over all experts, masked by the combine weights.
    Bit-faithful to the HF reference semantics (softmax over all E →
    top-k → renormalize), never drops a token, and keeps every FLOP on the
    MXU in one big contraction — at decode sizes (T = batch) the E/k-fold
    overcompute is noise next to the attention + projection cost.
  - ``capacity_factor=f``: classic GSPMD dispatch/combine with per-expert
    capacity ``C = ceil(f * k * T / E)``.  One-hot dispatch (T, E, C) →
    (E, C, H) expert batches → combine.  Compute per expert is capped
    (prefill-friendly); overflow tokens lose that expert's contribution
    (renormalized over the surviving ones), the standard drop semantics.
  - ``grouped=True``: dropless grouped (ragged) GEMM — FLOPs track the
    actual assignments (``ops/pallas_moe.py``); the prefill mode.
* **Quantization through the existing seams.** ``quantize_llm_`` swaps the
  block for ``MXInferenceMixtralMoeBlock`` (layers/mx_mixtral_moe.py) which
  slices the stacked weights into per-expert ``MXInferenceLinear``s — every
  expert GEMM runs the fused dequant-matmul kernels.

HF import: checkpoint weights arrive per-expert
(``block_sparse_moe.experts.N.w1.weight``); ``hf_import`` stacks them into
the (E, ...) arrays (``_stack_expert_weights``) and the block accepts them
via the ``import_weight`` hook.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.linear import Linear
from .llama import LlamaDecoderLayer, LlamaForCausalLM, LlamaModel
from .mistral import MistralAttention, MistralConfig


@dataclasses.dataclass
class MixtralConfig(MistralConfig):
    sliding_window: Optional[int] = None  # v0.1 trained at 4096 but serves full
    num_local_experts: int = 8
    num_experts_per_tok: int = 2

    @classmethod
    def from_hf(cls, hf_config: Any) -> "MixtralConfig":
        get = (lambda k, d=None: hf_config.get(k, d)) if isinstance(hf_config, dict) else (
            lambda k, d=None: getattr(hf_config, k, d)
        )
        cfg = MistralConfig.from_hf(hf_config)
        kw = dataclasses.asdict(cfg)
        kw["num_local_experts"] = get("num_local_experts", 8)
        kw["num_experts_per_tok"] = get("num_experts_per_tok", 2)
        return cls(**kw)


def route_topk_raw(router_logits: jax.Array, k: int):
    """HF Mixtral routing, sparse form: fp32 softmax over ALL experts, take
    the top-k, renormalize the selected.  Returns ``(top_vals (T, k) f32,
    top_idx (T, k) i32)``."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)  # (T, k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    return top_vals, top_idx.astype(jnp.int32)


def dense_combine_weights(
    top_vals: jax.Array, top_idx: jax.Array, num_experts: int
) -> jax.Array:
    """Scatter sparse routing ``(top_vals, top_idx)`` (T, k) into dense
    combine weights (T, E) — zero for unselected experts."""
    T = top_vals.shape[0]
    cw = jnp.zeros((T, num_experts), top_vals.dtype)
    t = jnp.arange(T)[:, None]
    return cw.at[t, top_idx].set(top_vals)


def route_topk(router_logits: jax.Array, k: int) -> jax.Array:
    """Dense form of :func:`route_topk_raw`: combine weights (T, E), zero
    for unselected experts."""
    top_vals, top_idx = route_topk_raw(router_logits, k)
    return dense_combine_weights(top_vals, top_idx, router_logits.shape[-1])


def _gemm_tile(dim: int) -> int:
    """Largest MXU-friendly tile that divides ``dim`` (full dim fallback)."""
    return next((c for c in (512, 256, 128) if dim % c == 0), dim)


class MixtralSparseMoeBlock(nnx.Module):
    """Sparse MoE MLP with stacked expert weights (see module docstring)."""

    def __init__(self, config: MixtralConfig, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        h, i = config.hidden_size, config.intermediate_size
        e = config.num_local_experts
        self.gate = Linear(h, e, use_bias=False, rngs=rngs)
        # Stacked expert weights, stored K-MAJOR (contraction dim first —
        # the same kernel layout ``MXInferenceLinear`` uses): w1/w3
        # (E, H, I), w2 (E, I, H).  The dense einsums contract them
        # directly, and the grouped (ragged) GEMM kernel consumes them
        # without per-call transposes.  HF checkpoints arrive torch-layout
        # (out, in); ``import_weight`` transposes once at load.
        if rngs is not None:
            std = 1.0 / math.sqrt(h)
            key = rngs.params()
            k1, k2, k3 = jax.random.split(key, 3)
            init = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * std).astype(jnp.bfloat16)
            self.w1 = nnx.Param(init(k1, (e, h, i)))  # gate_proj per expert
            self.w3 = nnx.Param(init(k2, (e, h, i)))  # up_proj per expert
            self.w2 = nnx.Param(init(k3, (e, i, h)))  # down_proj per expert
        else:
            self.w1 = nnx.Param(jnp.zeros((e, h, i), jnp.bfloat16))
            self.w3 = nnx.Param(jnp.zeros((e, h, i), jnp.bfloat16))
            self.w2 = nnx.Param(jnp.zeros((e, i, h), jnp.bfloat16))
        # None = exact dense-masked routing; float = dispatch/combine with
        # per-expert capacity ceil(f * k * T / E) and drop-on-overflow.
        self.capacity_factor: Optional[float] = None
        # True = dropless grouped (ragged) GEMM path (ops/pallas_moe.py);
        # takes precedence over capacity_factor.  Intended for prefill-sized
        # T (at decode sizes the per-expert tile padding dominates; the
        # dense-exact path wins there).
        self.grouped: bool = False
        self.grouped_tm: int = 128  # row-tile size of the grouped kernel

    def import_weight(self, leaf: str, value: jax.Array) -> bool:
        """hf_import hook: accept stacked expert tensors (torch layout
        (E, out, in) from the checkpoint; stored K-major)."""
        if leaf in ("w1", "w2", "w3"):
            param = getattr(self, leaf)
            km = value.swapaxes(1, 2)  # (E, out, in) -> (E, in, out)
            if param.get_value().shape != km.shape:
                raise ValueError(
                    f"stacked expert weight {leaf}: expected "
                    f"{param.get_value().shape} (K-major), got {value.shape}"
                )
            param.set_value(km.astype(jnp.bfloat16))
            return True
        return False

    # -- seams the MX subclass overrides -------------------------------------
    def _router_logits(self, x_t: jax.Array) -> jax.Array:
        return self.gate(x_t)

    def _expert_ffn_all(self, x_t: jax.Array) -> jax.Array:
        """(T, H) tokens -> (E, T, H) every expert's SwiGLU output."""
        w1 = self.w1.get_value()
        w3 = self.w3.get_value()
        w2 = self.w2.get_value()
        h1 = jnp.einsum("th,ehi->eti", x_t, w1, preferred_element_type=jnp.float32)
        h3 = jnp.einsum("th,ehi->eti", x_t, w3, preferred_element_type=jnp.float32)
        act = (jax.nn.silu(h1) * h3).astype(x_t.dtype)
        return jnp.einsum(
            "eti,eih->eth", act, w2, preferred_element_type=jnp.float32
        ).astype(x_t.dtype)

    def _expert_ffn_batched(self, xe: jax.Array) -> jax.Array:
        """(E, C, H) dispatched tokens -> (E, C, H) expert outputs."""
        w1 = self.w1.get_value()
        w3 = self.w3.get_value()
        w2 = self.w2.get_value()
        h1 = jnp.einsum("ech,ehi->eci", xe, w1, preferred_element_type=jnp.float32)
        h3 = jnp.einsum("ech,ehi->eci", xe, w3, preferred_element_type=jnp.float32)
        act = (jax.nn.silu(h1) * h3).astype(xe.dtype)
        return jnp.einsum(
            "eci,eih->ech", act, w2, preferred_element_type=jnp.float32
        ).astype(xe.dtype)

    def _expert_ffn_grouped(self, x_sorted: jax.Array, tile_expert: jax.Array, tile_rows: jax.Array, tm: int) -> jax.Array:
        """(R, H) expert-sorted padded rows -> (R, H) via the grouped GEMM
        kernel (dropless; each row tile contracts its own expert's weights)."""
        from ..ops.pallas_moe import grouped_matmul

        w1 = self.w1.get_value()
        w3 = self.w3.get_value()
        w2 = self.w2.get_value()
        h, i = w1.shape[1], w1.shape[2]
        bn1, bk1 = _gemm_tile(i), _gemm_tile(h)
        h1 = grouped_matmul(x_sorted, w1, tile_expert, tile_rows, tm=tm, bn=bn1, bk=bk1)
        h3 = grouped_matmul(x_sorted, w3, tile_expert, tile_rows, tm=tm, bn=bn1, bk=bk1)
        act = (jax.nn.silu(h1.astype(jnp.float32)) * h3.astype(jnp.float32)).astype(
            x_sorted.dtype
        )
        return grouped_matmul(act, w2, tile_expert, tile_rows, tm=tm, bn=bk1, bk=bn1)

    def _route_raw(self, x_t: jax.Array):
        """Routing seam: sparse ``(top_vals (T, k) f32, top_idx (T, k) i32)``.
        Mixtral semantics here (softmax-all → top-k → renormalize); sibling
        families override it (DeepSeek-V3's sigmoid noaux-tc router plugs in
        through this seam and inherits every compute path below)."""
        return route_topk_raw(
            self._router_logits(x_t), self.config.num_experts_per_tok
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, h = x.shape
        x_t = x.reshape(b * s, h)
        if self.grouped:
            # Dropless grouped GEMM path (prefill-shaped T; see
            # ops/pallas_moe.py).  FLOPs ∝ the actual assignments plus at
            # most one row tile of padding per expert.
            from ..ops.pallas_moe import combine_tokens, group_tokens

            top_vals, top_idx = self._route_raw(x_t)
            tm = self.grouped_tm
            x_sorted, tile_expert, tile_rows, dest = group_tokens(
                x_t, top_idx, tm, self.config.num_local_experts
            )
            y_sorted = self._expert_ffn_grouped(x_sorted, tile_expert, tile_rows, tm)
            y = combine_tokens(y_sorted, dest, top_vals)
            return y.astype(x.dtype).reshape(b, s, h)
        top_vals, top_idx = self._route_raw(x_t)
        cw = dense_combine_weights(
            top_vals, top_idx, self.config.num_local_experts
        )  # (T, E) f32
        if self.capacity_factor is None:
            y_all = self._expert_ffn_all(x_t)  # (E, T, H)
            y = jnp.einsum(
                "te,eth->th", cw.astype(jnp.float32), y_all.astype(jnp.float32)
            )
            return y.astype(x.dtype).reshape(b, s, h)
        y = self._dispatch_combine(x_t, cw)
        return y.astype(x.dtype).reshape(b, s, h)

    def _dispatch_combine(self, x_t: jax.Array, cw: jax.Array) -> jax.Array:
        """Capacity-bounded dispatch/combine (GSPMD MoE): one-hot matrices,
        drop-on-overflow, renormalized combine over surviving experts."""
        T, h = x_t.shape
        e = self.config.num_local_experts
        k = self.config.num_experts_per_tok
        C = max(1, int(math.ceil(self.capacity_factor * k * T / e)))
        C = min(C, T)
        sel = cw > 0  # (T, E)
        # Position of each token within its expert's queue (arrival order).
        pos_in_e = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1  # (T, E)
        keep = sel & (pos_in_e < C)
        # dispatch[t, e, c] = 1 iff token t sits in slot c of expert e
        disp = keep[:, :, None] & (
            pos_in_e[:, :, None] == jnp.arange(C)[None, None, :]
        )  # (T, E, C) bool
        dispf = disp.astype(x_t.dtype)
        xe = jnp.einsum("tec,th->ech", dispf, x_t)  # (E, C, H)
        ye = self._expert_ffn_batched(xe)  # (E, C, H)
        # Renormalize combine weights over the experts that kept the token,
        # PRESERVING the token's total routed weight (Mixtral's sums to 1 so
        # this is the classic renormalize; DeepSeek-V3's sums to its
        # routed_scaling_factor, which must survive drops).
        cw_kept = jnp.where(keep, cw, 0.0)
        full = jnp.sum(cw, axis=-1, keepdims=True)
        denom = jnp.sum(cw_kept, axis=-1, keepdims=True)
        cw_kept = jnp.where(denom > 0, cw_kept * (full / denom), 0.0)
        comb = dispf * cw_kept.astype(x_t.dtype)[:, :, None]  # (T, E, C)
        return jnp.einsum(
            "tec,ech->th",
            comb.astype(jnp.float32),
            ye.astype(jnp.float32),
        )


class MixtralDecoderLayer(LlamaDecoderLayer):
    attention_cls = MistralAttention
    mlp_cls = MixtralSparseMoeBlock

    @property
    def block_sparse_moe(self):
        """HF-name alias so checkpoint import resolves
        ``layers.N.block_sparse_moe.gate.weight`` etc."""
        return self.mlp


class MixtralModel(LlamaModel):
    layer_cls = MixtralDecoderLayer


class MixtralForCausalLM(LlamaForCausalLM):
    model_cls = MixtralModel
