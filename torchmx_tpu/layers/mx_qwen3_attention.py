"""MX-quantized Qwen3 attention and MLP inference modules.

Qwen3 = Llama attention math + per-head QK-RMSNorm before RoPE (and no
projection biases), so the MX seams are inherited from
:class:`MXInferenceLlamaAttention`; the norm modules carry over from the
float layer (analog of the reference's per-family MX layer classes,
rain-neuromorphics/torchmx ``torchmx/layers/mx_qwen2_attention.py:22-264``
— the reference ships Llama/Qwen2 only; Qwen3 is a TPU-build extension).

Note the quantization-points interaction: when a query config is set, the
fused-path fake-quantize (``_fused_q``) and the eager ``_quantize_qkv`` both
apply AFTER QK-norm + RoPE, exactly where the reference quantizes its
rotated q/k states (``mx_llama_attention.py:195-213``).
"""

from __future__ import annotations

from ..config import QAttentionConfig, QLinearConfig
from ..models.qwen3 import Qwen3Attention, Qwen3MLP
from .linear import MXInferenceLinear
from .mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP


class MXInferenceQwen3MLP(MXInferenceLlamaMLP):
    @classmethod
    def from_float(cls, mod: Qwen3MLP, qconfig: QLinearConfig) -> "MXInferenceQwen3MLP":
        assert isinstance(mod, Qwen3MLP), f"mod must be a Qwen3MLP, got {type(mod)}"
        return cls(
            MXInferenceLinear.from_float(mod.gate_proj, qconfig),
            MXInferenceLinear.from_float(mod.up_proj, qconfig),
            MXInferenceLinear.from_float(mod.down_proj, qconfig),
            qconfig,
        )


class MXInferenceQwen3Attention(MXInferenceLlamaAttention, Qwen3Attention):
    """MX seams from the Llama MX layer; QK-norm from Qwen3Attention (the
    MRO resolves ``__init__`` to Qwen3's — fresh norm modules — and
    ``_norm_qk`` to the QK-RMSNorm)."""

    @classmethod
    def from_float(
        cls, mod: Qwen3Attention, qconfig: QAttentionConfig
    ) -> "MXInferenceQwen3Attention":
        assert isinstance(mod, Qwen3Attention), (
            f"mod must be a Qwen3Attention, got {type(mod)}"
        )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.k_proj = MXInferenceLinear.from_float(mod.k_proj, p)
        self.v_proj = MXInferenceLinear.from_float(mod.v_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        # QK-norms stay high-precision; reuse the float layer's modules.
        self.q_norm = mod.q_norm
        self.k_norm = mod.k_norm
        return self
