"""MX-quantized Phi-3 attention and MLP inference modules.

Phi-3 shares the Llama attention/MLP math (the HF fused qkv/gate_up
projections are split once at import — ``models/hf_import.py``), so the MX
seams are inherited; only the registry types differ (analog of the
reference's per-family MX layer classes, rain-neuromorphics/torchmx
``torchmx/layers/mx_qwen2_attention.py:22-264`` — the reference ships
Llama/Qwen2 only; Phi-3 is a TPU-build extension)."""

from __future__ import annotations

from ..config import QAttentionConfig, QLinearConfig
from ..models.phi3 import Phi3Attention, Phi3MLP
from .linear import MXInferenceLinear
from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferencePhi3MLP(MXInferenceLlamaMLP):
    @classmethod
    def from_float(cls, mod: Phi3MLP, qconfig: QLinearConfig) -> "MXInferencePhi3MLP":
        assert isinstance(mod, Phi3MLP), f"mod must be a Phi3MLP, got {type(mod)}"
        return cls(
            MXInferenceLinear.from_float(mod.gate_proj, qconfig),
            MXInferenceLinear.from_float(mod.up_proj, qconfig),
            MXInferenceLinear.from_float(mod.down_proj, qconfig),
            qconfig,
        )


class MXInferencePhi3Attention(MXInferenceLlamaAttention):
    @classmethod
    def from_float(
        cls, mod: Phi3Attention, qconfig: QAttentionConfig
    ) -> "MXInferencePhi3Attention":
        assert isinstance(mod, Phi3Attention), (
            f"mod must be a Phi3Attention, got {type(mod)}"
        )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.k_proj = MXInferenceLinear.from_float(mod.k_proj, p)
        self.v_proj = MXInferenceLinear.from_float(mod.v_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        return self
