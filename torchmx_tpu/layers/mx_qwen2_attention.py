"""MX-quantized Qwen2 attention and MLP inference modules.

Counterparts of the reference's ``MXInferenceQwen2Attention`` /
``MXInferenceQwen2MLP`` (rain-neuromorphics/torchmx
``torchmx/layers/mx_qwen2_attention.py:22-264``).  Qwen2 shares the Llama
attention math (the only difference, q/k/v projection biases, is carried by
the weights), so the MX seams are inherited.
"""

from __future__ import annotations

from ..config import QAttentionConfig, QLinearConfig
from ..models.qwen2 import Qwen2Attention, Qwen2MLP
from .linear import MXInferenceLinear
from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferenceQwen2MLP(MXInferenceLlamaMLP):
    @classmethod
    def from_float(cls, mod: Qwen2MLP, qconfig: QLinearConfig) -> "MXInferenceQwen2MLP":
        assert isinstance(mod, Qwen2MLP), f"mod must be a Qwen2MLP, got {type(mod)}"
        return cls(
            MXInferenceLinear.from_float(mod.gate_proj, qconfig),
            MXInferenceLinear.from_float(mod.up_proj, qconfig),
            MXInferenceLinear.from_float(mod.down_proj, qconfig),
            qconfig,
        )


class MXInferenceQwen2Attention(MXInferenceLlamaAttention):
    @classmethod
    def from_float(
        cls, mod: Qwen2Attention, qconfig: QAttentionConfig
    ) -> "MXInferenceQwen2Attention":
        assert isinstance(mod, Qwen2Attention), (
            f"mod must be a Qwen2Attention, got {type(mod)}"
        )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.k_proj = MXInferenceLinear.from_float(mod.k_proj, p)
        self.v_proj = MXInferenceLinear.from_float(mod.v_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        return self
