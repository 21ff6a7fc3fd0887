"""Qwen2 model family: Llama architecture with q/k/v projection biases.

Distinct classes (not aliases) so the module-surgery quantization API can
target them by type, mirroring the reference's separate Qwen2 layer family
(rain-neuromorphics/torchmx ``torchmx/layers/mx_qwen2_attention.py:22-264``).
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
class Qwen2Config(LlamaConfig):
    attention_qkv_bias: bool = True

    @classmethod
    def from_hf(cls, hf_config: Any) -> "Qwen2Config":
        cfg = LlamaConfig.from_hf(hf_config)
        kw = dataclasses.asdict(cfg)
        kw["attention_qkv_bias"] = True
        return cls(**kw)


class Qwen2Attention(LlamaAttention):
    pass


class Qwen2MLP(LlamaMLP):
    pass


class Qwen2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen2Attention
    mlp_cls = Qwen2MLP


class Qwen2Model(LlamaModel):
    layer_cls = Qwen2DecoderLayer


class Qwen2ForCausalLM(LlamaForCausalLM):
    model_cls = Qwen2Model
