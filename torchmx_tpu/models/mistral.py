"""Mistral model family: Llama architecture with sliding-window attention.

Distinct classes (not aliases) so the module-surgery quantization API can
target them by type, following the per-family layer-class pattern of the
reference (rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``
dispatches attention/MLP replacements by module type; the reference ships
Llama and Qwen2 families — Mistral is a TPU-build extension using the same
registry seam).

Mistral-7B-v0.1 attends each query only to the last ``sliding_window``
(4096) key positions; v0.2+ checkpoints set ``sliding_window: null`` and
degrade to plain Llama.  The window masking runs in-kernel on the fused
MX-KV-cache attention path (``ops/pallas_attention.py``) and through the
dense additive masks on the eager paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from .llama import (
    LlamaAttention,
    LlamaConfig,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
)


@dataclasses.dataclass
class MistralConfig(LlamaConfig):
    sliding_window: Optional[int] = 4096

    @classmethod
    def from_hf(cls, hf_config: Any) -> "MistralConfig":
        cfg = LlamaConfig.from_hf(hf_config)
        return cls(**dataclasses.asdict(cfg))


class MistralAttention(LlamaAttention):
    pass


class MistralMLP(LlamaMLP):
    pass


class MistralDecoderLayer(LlamaDecoderLayer):
    attention_cls = MistralAttention
    mlp_cls = MistralMLP


class MistralModel(LlamaModel):
    layer_cls = MistralDecoderLayer


class MistralForCausalLM(LlamaForCausalLM):
    model_cls = MistralModel
