"""MX-quantized DeepSeek-V3 MLA attention and MoE inference modules.

Per-family MX layer classes through the surgery registry, the pattern of the
reference (rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``; the
reference ships Llama/Qwen2 — DeepSeek-V3 is a TPU-build extension).

* :class:`MXInferenceMLAAttention`: every projection (``q_a/q_b`` or ``q``,
  ``kv_a_proj_with_mqa``, ``kv_b_proj``, ``o_proj``) becomes an
  ``MXInferenceLinear``; the latent-space norms stay high precision.  The
  absorbed decode path contracts the **dequantized** ``kv_b_proj`` weight
  (exactly the values the expanded path's MX matmul sees), so quantized
  prefill and quantized decode stay consistent.  Q/K/V/attn-weights
  quantization configs are rejected: MLA's contractions run in latent space
  where the reference's per-head Q/K/V quantization points don't exist.
* :class:`MXInferenceDeepseekV3MoE`: routed experts quantize per expert
  (every expert GEMM runs the fused dequant-matmul kernels) via the Mixtral
  MX block's expert seams; the noaux-tc router stays high-precision (its
  top-k picks *which* weights run); shared experts quantize like a dense
  MLP.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ..config import QAttentionConfig, QLinearConfig
from ..models.deepseek import DeepseekV3MoE, MLAAttention
from .linear import MXInferenceLinear
from .mx_llama_attention import MXInferenceLlamaMLP
from .mx_mixtral_moe import MXInferenceMixtralMoeBlock, _RouterAlias


class MXInferenceMLAAttention(MLAAttention):
    @classmethod
    def from_float(
        cls, mod: MLAAttention, qconfig: QAttentionConfig
    ) -> "MXInferenceMLAAttention":
        assert isinstance(mod, MLAAttention), (
            f"mod must be an MLAAttention, got {type(mod)}"
        )
        if qconfig.is_qkv_quantization_enabled:
            raise NotImplementedError(
                "Q/K/V/attention-weights quantization configs do not apply "
                "to MLA attention (contractions run in latent space; there "
                "are no per-head Q/K/V tensors at the reference's "
                "quantization points) — quantize the latent KV cache via "
                "kv_cache_config instead, and drop the q/k/v/attn_weights "
                "configs"
            )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        if mod.config.q_lora_rank:
            self.q_a_proj = MXInferenceLinear.from_float(mod.q_a_proj, p)
            self.q_b_proj = MXInferenceLinear.from_float(mod.q_b_proj, p)
            self.q_a_layernorm = mod.q_a_layernorm
        else:
            self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.kv_a_proj_with_mqa = MXInferenceLinear.from_float(
            mod.kv_a_proj_with_mqa, p
        )
        self.kv_b_proj = MXInferenceLinear.from_float(mod.kv_b_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        self.kv_a_layernorm = mod.kv_a_layernorm
        return self

    def _kv_b_weight(self):
        # K-major MXArray (r, n*(dn+dv)) -> dequantized torch layout
        # (n*(dn+dv), r): the absorbed einsums contract the same values the
        # expanded path's MX matmul dequantizes.
        return self.kv_b_proj.weight.get_value().to_dtype(jnp.bfloat16).T

    def extra_repr(self) -> str:
        return f"qconfig={self.qconfig}"


class MXInferenceDeepseekV3MoE(MXInferenceMixtralMoeBlock, DeepseekV3MoE):
    """MRO: expert-FFN seams (per-expert ``MXInferenceLinear`` loops,
    ``import_weight`` streaming quantize-on-load) from the Mixtral MX block;
    routing (``_route_raw``) and the shared-experts ``__call__`` from
    :class:`DeepseekV3MoE`."""

    def __init__(self, config, gate_weight, gate_bias, experts_w1, experts_w3,
                 experts_w2, shared_mx, qconfig: QLinearConfig):
        MXInferenceMixtralMoeBlock.__init__(
            self, config, gate_weight, experts_w1, experts_w3, experts_w2,
            qconfig, capacity_factor=None,
        )
        self.e_score_bias = nnx.Variable(jnp.asarray(gate_bias, jnp.float32))
        self.shared_experts = shared_mx

    @classmethod
    def from_float(
        cls, mod: DeepseekV3MoE, qconfig: QLinearConfig
    ) -> "MXInferenceDeepseekV3MoE":
        assert isinstance(mod, DeepseekV3MoE), (
            f"mod must be a DeepseekV3MoE, got {type(mod)}"
        )
        e = mod.config.num_local_experts
        mk = lambda w: [
            MXInferenceLinear.from_weights(w[i].T, None, qconfig) for i in range(e)
        ]
        return cls(
            mod.config,
            mod.gate.weight.get_value(),
            mod.gate.e_score_correction_bias.get_value(),
            mk(mod.w1.get_value()),
            mk(mod.w3.get_value()),
            mk(mod.w2.get_value()),
            MXInferenceLlamaMLP.from_float(mod.shared_experts, qconfig),
            qconfig,
        )

    @property
    def gate(self):
        """Checkpoint-name alias exposing the hp router weight AND the
        correction-bias buffer (``...mlp.gate.e_score_correction_bias``)."""
        alias = _RouterAlias(self.gate_weight)
        alias.e_score_correction_bias = self.e_score_bias
        return alias
