"""Gemma model family: Llama architecture with Gemma conventions.

Fifth model family (TPU-build extension; the reference ships Llama and
Qwen2 — ``torchmx/quant_api.py:150-158`` is the type-dispatch seam this
family registers through).  Deltas vs Llama, all carried by the shared
config (``LlamaConfig``):

* GeGLU MLP — ``hidden_act="gelu_pytorch_tanh"``;
* RMSNorm multiplies by ``(1 + weight)`` (``rms_norm_offset=1.0``;
  checkpoint weights are deltas around 1, zero-init);
* embeddings scale by ``sqrt(hidden_size)`` (``scale_embeddings=True``,
  with HF's cast-to-bf16-first rounding);
* tied word embeddings and an explicit ``head_dim`` (e.g. 256 at 2B).
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
class GemmaConfig(LlamaConfig):
    hidden_act: str = "gelu_pytorch_tanh"
    rms_norm_offset: float = 1.0
    scale_embeddings: bool = True
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf_config: Any) -> "GemmaConfig":
        cfg = LlamaConfig.from_hf(hf_config)
        kw = dataclasses.asdict(cfg)
        kw["rms_norm_offset"] = 1.0
        kw["scale_embeddings"] = True
        return cls(**kw)


class GemmaAttention(LlamaAttention):
    pass


class GemmaMLP(LlamaMLP):
    pass


class GemmaDecoderLayer(LlamaDecoderLayer):
    attention_cls = GemmaAttention
    mlp_cls = GemmaMLP


class GemmaModel(LlamaModel):
    layer_cls = GemmaDecoderLayer


class GemmaForCausalLM(LlamaForCausalLM):
    model_cls = GemmaModel


@dataclasses.dataclass
class Gemma2Config(GemmaConfig):
    # Gemma2 defaults: alternating sliding layers (from_hf fills
    # layer_types), decoupled attention scale, logit soft caps.
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: float = 50.0
    final_logit_softcapping: float = 30.0

    @classmethod
    def from_hf(cls, hf_config: Any) -> "Gemma2Config":
        cfg = GemmaConfig.from_hf(hf_config)
        kw = dataclasses.asdict(cfg)
        return cls(**kw)


class Gemma2Attention(LlamaAttention):
    pass


class Gemma2MLP(LlamaMLP):
    pass


class Gemma2DecoderLayer(LlamaDecoderLayer):
    """Gemma2 sandwich-norm layer: post-attention and post-feedforward
    norms sit INSIDE the residual branches (4 norms per layer)."""

    attention_cls = Gemma2Attention
    mlp_cls = Gemma2MLP

    def __init__(self, config, layer_idx, rngs=None):
        super().__init__(config, layer_idx, rngs=rngs)
        from .llama import RMSNorm

        off = config.rms_norm_offset
        self.pre_feedforward_layernorm = RMSNorm(
            config.hidden_size, config.rms_norm_eps, offset=off
        )
        self.post_feedforward_layernorm = RMSNorm(
            config.hidden_size, config.rms_norm_eps, offset=off
        )

    def __call__(self, x, *, cos, sin, attention_mask, cache=None, cache_position=None):
        attn_out, new_cache = self.self_attn(
            self.input_layernorm(x),
            cos=cos,
            sin=sin,
            attention_mask=attention_mask,
            cache=cache,
            cache_position=cache_position,
        )
        x = x + self.post_attention_layernorm(attn_out)
        x = x + self.post_feedforward_layernorm(
            self.mlp(self.pre_feedforward_layernorm(x))
        )
        return x, new_cache


class Gemma2Model(LlamaModel):
    layer_cls = Gemma2DecoderLayer


class Gemma2ForCausalLM(LlamaForCausalLM):
    model_cls = Gemma2Model

    def __call__(self, input_ids, **kwargs):
        import jax.numpy as jnp

        logits, new_caches = super().__call__(input_ids, **kwargs)
        cap = self.config.final_logit_softcapping
        if cap is not None:
            logits = (
                cap * jnp.tanh(logits.astype(jnp.float32) / cap)
            ).astype(logits.dtype)
        return logits, new_caches
