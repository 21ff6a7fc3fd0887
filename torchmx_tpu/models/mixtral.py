"""Mixtral model family: Mistral attention + sparse Mixture-of-Experts MLP.

A TPU-build extension — the reference has no MoE code at all (SURVEY §2.3
marks expert parallelism "n/a: no MoE in reference"); this family lights
that row up the TPU way.

Design (TPU-first):

* **Stacked expert weights.** Each MoE block holds ``w1/w3`` (gate/up,
  shape (E, I, H)) and ``w2`` (down, (E, H, I)) as single arrays instead of
  E separate modules.  Expert parallelism is then just GSPMD: shard the
  leading E axis over an ``expert`` mesh axis (`parallel.mesh.expert_specs`)
  and XLA inserts the all-to-alls — no hand-written collectives, the same
  recipe as the TP/DP paths.
* **Two routing modes.**
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


def route_topk(router_logits: jax.Array, k: int) -> jax.Array:
    """HF Mixtral routing: fp32 softmax over ALL experts, take the top-k,
    renormalize the selected probabilities.  Returns dense combine weights
    (T, E) — zero for unselected experts (bf16, like the HF cast)."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)  # (T, k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    cw = jnp.zeros(probs.shape, probs.dtype)
    t = jnp.arange(probs.shape[0])[:, None]
    cw = cw.at[t, top_idx].set(top_vals)
    return cw


class MixtralSparseMoeBlock(nnx.Module):
    """Sparse MoE MLP with stacked expert weights (see module docstring)."""

    def __init__(self, config: MixtralConfig, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        h, i = config.hidden_size, config.intermediate_size
        e = config.num_local_experts
        self.gate = Linear(h, e, use_bias=False, rngs=rngs)
        if rngs is not None:
            std = 1.0 / math.sqrt(h)
            key = rngs.params()
            k1, k2, k3 = jax.random.split(key, 3)
            init = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * std).astype(jnp.bfloat16)
            self.w1 = nnx.Param(init(k1, (e, i, h)))  # gate_proj per expert
            self.w3 = nnx.Param(init(k2, (e, i, h)))  # up_proj per expert
            self.w2 = nnx.Param(init(k3, (e, h, i)))  # down_proj per expert
        else:
            self.w1 = nnx.Param(jnp.zeros((e, i, h), jnp.bfloat16))
            self.w3 = nnx.Param(jnp.zeros((e, i, h), jnp.bfloat16))
            self.w2 = nnx.Param(jnp.zeros((e, h, i), jnp.bfloat16))
        # None = exact dense-masked routing; float = dispatch/combine with
        # per-expert capacity ceil(f * k * T / E) and drop-on-overflow.
        self.capacity_factor: Optional[float] = None

    def import_weight(self, leaf: str, value: jax.Array) -> bool:
        """hf_import hook: accept stacked expert tensors (see module doc)."""
        if leaf in ("w1", "w2", "w3"):
            param = getattr(self, leaf)
            if param.get_value().shape != value.shape:
                raise ValueError(
                    f"stacked expert weight {leaf}: expected "
                    f"{param.get_value().shape}, got {value.shape}"
                )
            param.set_value(value.astype(jnp.bfloat16))
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
        h1 = jnp.einsum("th,eih->eti", x_t, w1, preferred_element_type=jnp.float32)
        h3 = jnp.einsum("th,eih->eti", x_t, w3, preferred_element_type=jnp.float32)
        act = (jax.nn.silu(h1) * h3).astype(x_t.dtype)
        return jnp.einsum(
            "eti,ehi->eth", act, w2, preferred_element_type=jnp.float32
        ).astype(x_t.dtype)

    def _expert_ffn_batched(self, xe: jax.Array) -> jax.Array:
        """(E, C, H) dispatched tokens -> (E, C, H) expert outputs."""
        w1 = self.w1.get_value()
        w3 = self.w3.get_value()
        w2 = self.w2.get_value()
        h1 = jnp.einsum("ech,eih->eci", xe, w1, preferred_element_type=jnp.float32)
        h3 = jnp.einsum("ech,eih->eci", xe, w3, preferred_element_type=jnp.float32)
        act = (jax.nn.silu(h1) * h3).astype(xe.dtype)
        return jnp.einsum(
            "eci,ehi->ech", act, w2, preferred_element_type=jnp.float32
        ).astype(xe.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, h = x.shape
        x_t = x.reshape(b * s, h)
        cw = route_topk(self._router_logits(x_t), self.config.num_experts_per_tok)  # (T, E) f32
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
        # Renormalize combine weights over the experts that kept the token.
        cw_kept = jnp.where(keep, cw, 0.0)
        denom = jnp.sum(cw_kept, axis=-1, keepdims=True)
        cw_kept = jnp.where(denom > 0, cw_kept / denom, 0.0)
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
