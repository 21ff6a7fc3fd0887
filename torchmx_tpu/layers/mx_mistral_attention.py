"""MX-quantized Mistral attention and MLP inference modules.

Mistral shares the Llama attention math plus a sliding window; the window
lives on the config (``LlamaConfig.sliding_window``) and the inherited
forward threads it through both the fused MX-KV-cache kernel and the dense
eager masks, so the MX seams — and the ``from_float`` constructors, whose
``cls`` binds to these subclasses — are inherited unchanged.  Distinct
classes exist so the type-dispatch surgery registry can target the Mistral
family (rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``); a
TPU-build model family beyond the reference's Llama/Qwen2 pair.
"""

from __future__ import annotations

from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferenceMistralMLP(MXInferenceLlamaMLP):
    pass


class MXInferenceMistralAttention(MXInferenceLlamaAttention):
    pass
