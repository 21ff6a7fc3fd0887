"""Qwen3 model family: Llama architecture with per-head QK-RMSNorm.

Distinct classes (not aliases) so the module-surgery quantization API can
target them by type, following the per-family layer-class pattern of the
reference (rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``
dispatches attention/MLP replacements by module type; the reference ships
Llama and Qwen2 families — Qwen3 is a TPU-build extension through the same
registry seam).

Qwen3 vs Llama/Qwen2:

* **QK-RMSNorm**: ``q_norm``/``k_norm`` (RMSNorm over ``head_dim``) apply to
  the per-head query/key states BEFORE RoPE (HF ``Qwen3Attention.forward``);
  this replaces Qwen2's q/k/v projection biases (Qwen3 projections are
  bias-free).
* **Explicit head_dim**: checkpoints carry ``head_dim`` decoupled from
  ``hidden_size / num_attention_heads`` (e.g. Qwen3-0.6B: hidden 1024,
  16 heads, head_dim 128) — already first-class in :class:`LlamaConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from flax import nnx

from .llama import (
    LlamaAttention,
    LlamaConfig,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    RMSNorm,
)


@dataclasses.dataclass
class Qwen3Config(LlamaConfig):
    @classmethod
    def from_hf(cls, hf_config: Any) -> "Qwen3Config":
        cfg = LlamaConfig.from_hf(hf_config)
        return cls(**dataclasses.asdict(cfg))


class Qwen3Attention(LlamaAttention):
    """Llama attention + per-head QK-RMSNorm (before RoPE)."""

    def __init__(self, config: LlamaConfig, layer_idx: int = 0, rngs: Optional[nnx.Rngs] = None):
        super().__init__(config, layer_idx, rngs=rngs)
        self.q_norm = RMSNorm(config.head_dim, config.rms_norm_eps)
        self.k_norm = RMSNorm(config.head_dim, config.rms_norm_eps)

    def _norm_qk(self, q, k):
        return self.q_norm(q), self.k_norm(k)


class Qwen3MLP(LlamaMLP):
    pass


class Qwen3DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention
    mlp_cls = Qwen3MLP


class Qwen3Model(LlamaModel):
    layer_cls = Qwen3DecoderLayer


class Qwen3ForCausalLM(LlamaForCausalLM):
    model_cls = Qwen3Model
