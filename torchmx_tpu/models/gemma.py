"""Gemma model family: Llama architecture with Gemma conventions.

Fifth model family (TPU-build extension; the reference ships Llama and
Qwen2 — ``torchmx/quant_api.py:150-158`` is the type-dispatch seam this
family registers through).  Deltas vs Llama, all carried by the shared
config (``LlamaConfig``):

* GeGLU MLP — ``hidden_act="gelu_pytorch_tanh"``;
* RMSNorm multiplies by ``(1 + weight)`` (``rms_norm_offset=1.0``;
  checkpoint weights are deltas around 1, zero-init);
* embeddings scale by ``sqrt(hidden_size)`` (``scale_embeddings=True``,
  with HF's cast-to-bf16-first rounding);
* tied word embeddings and an explicit ``head_dim`` (e.g. 256 at 2B).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from .llama import (
    LlamaAttention,
    LlamaConfig,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
)


@dataclasses.dataclass
class GemmaConfig(LlamaConfig):
    hidden_act: str = "gelu_pytorch_tanh"
    rms_norm_offset: float = 1.0
    scale_embeddings: bool = True
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf_config: Any) -> "GemmaConfig":
        cfg = LlamaConfig.from_hf(hf_config)
        kw = dataclasses.asdict(cfg)
        kw["rms_norm_offset"] = 1.0
        kw["scale_embeddings"] = True
        return cls(**kw)


class GemmaAttention(LlamaAttention):
    pass


class GemmaMLP(LlamaMLP):
    pass


class GemmaDecoderLayer(LlamaDecoderLayer):
    attention_cls = GemmaAttention
    mlp_cls = GemmaMLP


class GemmaModel(LlamaModel):
    layer_cls = GemmaDecoderLayer


class GemmaForCausalLM(LlamaForCausalLM):
    model_cls = GemmaModel
