"""MX-quantized Gemma attention and MLP inference modules.

Gemma shares the Llama attention math; the GeGLU activation rides the
``act`` seam ``MXInferenceLlamaMLP.from_float`` copies from the float
module, and the norm/embedding conventions live outside the quantized
blocks — so both classes inherit everything.  Distinct types exist for
the surgery registry (rain-neuromorphics/torchmx
``torchmx/quant_api.py:150-158``).
"""

from __future__ import annotations

from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferenceGemmaMLP(MXInferenceLlamaMLP):
    pass


class MXInferenceGemmaAttention(MXInferenceLlamaAttention):
    pass


class MXInferenceGemma2MLP(MXInferenceLlamaMLP):
    pass


class MXInferenceGemma2Attention(MXInferenceLlamaAttention):
    pass
