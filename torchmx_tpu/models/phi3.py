"""Phi-3 model family: Llama architecture with fused HF projections and
LongRoPE context extension.

Distinct classes (not aliases) so the module-surgery quantization API can
target them by type (reference registry seam:
rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``; the reference
ships Llama and Qwen2 families — Phi-3 is a TPU-build extension).

Phi-3 vs Llama, and how each lands here:

* **Fused checkpoint projections**: HF stores ``self_attn.qkv_proj`` (rows
  ``[q | k | v]``) and ``mlp.gate_up_proj`` (rows ``[gate | up]``).  The
  math is identical to split projections, so the importer splits the fused
  weights once at load time (``hf_import._split_fused_projections``) and the
  runtime modules stay the shared Llama ones — every MX kernel path
  (K-major repack, fused activation quantize, shared-activation fq across
  q/k/v and gate/up) applies unchanged.
* **LongRoPE** (128k variants): per-dim short/long rescale factors on the
  rotary inverse frequencies plus an attention factor on cos/sin
  (``llama.compute_rope_inv_freq`` / ``llama.rope_attention_scaling``).
  The short/long choice is static, from the configured capacity — HF picks
  per call from the runtime sequence length; both agree whenever
  ``max_position_embeddings > original_max_position_embeddings`` (the
  deployed long-context case).
* **Sliding window** (mini-4k: 2047): Mistral semantics, shared machinery.
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
class Phi3Config(LlamaConfig):
    # Pretraining context; the LongRoPE short/long switch and attention
    # factor key off it (HF ``_compute_longrope_parameters``).
    original_max_position_embeddings: Optional[int] = None

    def __post_init__(self):
        super().__post_init__()
        # partial_rotary_factor < 1 (phi-3-small) would rotate only a head
        # prefix; the shipped Phi3ForCausalLM checkpoints (mini/medium) use
        # 1.0. Guarded at from_hf.

    @classmethod
    def from_hf(cls, hf_config: Any) -> "Phi3Config":
        get = (lambda k, d=None: hf_config.get(k, d)) if isinstance(hf_config, dict) else (
            lambda k, d=None: getattr(hf_config, k, d)
        )
        prf = get("partial_rotary_factor", 1.0) or 1.0
        if prf != 1.0:
            raise NotImplementedError(
                f"partial_rotary_factor={prf}: Phi3ForCausalLM checkpoints "
                "(mini/medium) rotate the full head_dim; partial rotary is "
                "not supported"
            )
        cfg = LlamaConfig.from_hf(hf_config)
        return cls(
            **dataclasses.asdict(cfg),
            original_max_position_embeddings=get("original_max_position_embeddings"),
        )


class Phi3Attention(LlamaAttention):
    pass


class Phi3MLP(LlamaMLP):
    pass


class Phi3DecoderLayer(LlamaDecoderLayer):
    attention_cls = Phi3Attention
    mlp_cls = Phi3MLP


class Phi3Model(LlamaModel):
    layer_cls = Phi3DecoderLayer


class Phi3ForCausalLM(LlamaForCausalLM):
    model_cls = Phi3Model
    # hf_import splits qkv_proj / gate_up_proj rows into q/k/v and gate/up.
    fused_hf_projections = True
