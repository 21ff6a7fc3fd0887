"""MX-quantized Mistral attention and MLP inference modules.

Mistral shares the Llama attention math plus a sliding window; the window
lives on the config (``LlamaConfig.sliding_window``) and the inherited
forward threads it through both the fused MX-KV-cache kernel and the dense
eager masks, so the MX seams are inherited unchanged.  A TPU-build model
family beyond the reference's Llama/Qwen2 pair, registered through the same
type-dispatch surgery seam (rain-neuromorphics/torchmx
``torchmx/quant_api.py:150-158``).
"""

from __future__ import annotations

from ..config import QAttentionConfig, QLinearConfig
from ..models.mistral import MistralAttention, MistralMLP
from .linear import MXInferenceLinear
from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferenceMistralMLP(MXInferenceLlamaMLP):
    @classmethod
    def from_float(cls, mod: MistralMLP, qconfig: QLinearConfig) -> "MXInferenceMistralMLP":
        assert isinstance(mod, MistralMLP), f"mod must be a MistralMLP, got {type(mod)}"
        return cls(
            MXInferenceLinear.from_float(mod.gate_proj, qconfig),
            MXInferenceLinear.from_float(mod.up_proj, qconfig),
            MXInferenceLinear.from_float(mod.down_proj, qconfig),
            qconfig,
        )


class MXInferenceMistralAttention(MXInferenceLlamaAttention):
    @classmethod
    def from_float(
        cls, mod: MistralAttention, qconfig: QAttentionConfig
    ) -> "MXInferenceMistralAttention":
        assert isinstance(mod, MistralAttention), (
            f"mod must be a MistralAttention, got {type(mod)}"
        )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.k_proj = MXInferenceLinear.from_float(mod.k_proj, p)
        self.v_proj = MXInferenceLinear.from_float(mod.v_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        return self
