"""MX-quantized Llama attention and MLP inference modules.

TPU-native counterparts of the reference's ``MXInferenceLlamaAttention`` /
``MXInferenceLlamaMLP`` (rain-neuromorphics/torchmx
``torchmx/layers/mx_llama_attention.py:20-266``).  Instead of re-implementing
the HF forward, the MX versions subclass our NNX ``LlamaAttention`` and
override three seams:

* projections become :class:`MXInferenceLinear`;
* Q/K/V are MX-quantized before the attention matmuls when
  ``qconfig.is_qkv_quantization_enabled``: Q and K blocked along ``head_dim``
  (the Q.K^T contraction dim) and V blocked along the kv sequence length (the
  P.V contraction dim) via the transpose-quantize-transpose-back trick
  (reference ``:208-213``);
* the post-softmax attention weights are MX-quantized (reference ``:231-240``;
  pre-softmax quantization awaits an approximate softmax, same TODO as the
  reference).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from ..config import QAttentionConfig, QLinearConfig
from ..ops import mx_fake_quantize, mx_matmul
from ..models.llama import LlamaAttention, LlamaMLP
from .linear import MXInferenceLinear


class MXInferenceLlamaMLP(nnx.Module):
    """Llama MLP with MX-quantized gate/up/down projections
    (reference ``mx_llama_attention.py:20-60``)."""

    def __init__(self, gate_proj, up_proj, down_proj, qconfig: QLinearConfig, act=None):
        import jax

        self.gate_proj = gate_proj
        self.up_proj = up_proj
        self.down_proj = down_proj
        self.qconfig = qconfig
        self.act = act if act is not None else jax.nn.silu

    @classmethod
    def from_float(cls, mod: LlamaMLP, qconfig: QLinearConfig) -> "MXInferenceLlamaMLP":
        assert isinstance(mod, LlamaMLP), f"mod must be a LlamaMLP, got {type(mod)}"
        return cls(
            MXInferenceLinear.from_float(mod.gate_proj, qconfig),
            MXInferenceLinear.from_float(mod.up_proj, qconfig),
            MXInferenceLinear.from_float(mod.down_proj, qconfig),
            qconfig,
            act=getattr(mod, "act", None),  # GeGLU for Gemma, silu otherwise
        )

    def __call__(self, x):
        import jax

        from .linear import shared_activation_fq

        # gate and up consume the same activation: quantize it once at
        # prefill sizes (see shared_activation_fq).
        x_fq = shared_activation_fq(x, self.gate_proj, self.up_proj)
        if x_fq is not None:
            h = self.act(self.gate_proj.apply_prequantized(x_fq)) * (
                self.up_proj.apply_prequantized(x_fq)
            )
        else:
            h = self.act(self.gate_proj(x)) * self.up_proj(x)
        return self.down_proj(h)


class MXInferenceLlamaAttention(LlamaAttention):
    """Llama attention with MX projections and optional Q/K/V/attn-weights
    quantization inside the 4-D matmuls (reference ``:63-266``)."""

    @classmethod
    def from_float(
        cls, mod: LlamaAttention, qconfig: QAttentionConfig
    ) -> "MXInferenceLlamaAttention":
        assert isinstance(mod, LlamaAttention), (
            f"mod must be a LlamaAttention, got {type(mod)}"
        )
        self = cls(mod.config, mod.layer_idx)
        self.qconfig = qconfig
        p = qconfig.projection_config
        self.q_proj = MXInferenceLinear.from_float(mod.q_proj, p)
        self.k_proj = MXInferenceLinear.from_float(mod.k_proj, p)
        self.v_proj = MXInferenceLinear.from_float(mod.v_proj, p)
        self.o_proj = MXInferenceLinear.from_float(mod.o_proj, p)
        return self

    # -- seams ----------------------------------------------------------------

    def _project_qkv(self, hidden_states):
        from .linear import shared_activation_fq

        # q/k/v consume the same activation: quantize it once at prefill
        # sizes (see shared_activation_fq).
        x_fq = shared_activation_fq(
            hidden_states, self.q_proj, self.k_proj, self.v_proj
        )
        if x_fq is not None:
            return (
                self.q_proj.apply_prequantized(x_fq),
                self.k_proj.apply_prequantized(x_fq),
                self.v_proj.apply_prequantized(x_fq),
            )
        return super()._project_qkv(hidden_states)

    def _quantize_qkv(self, q, k, v):
        if not self.qconfig.is_qkv_quantization_enabled:
            return q, k, v
        qc, kc, vc = (
            self.qconfig.query_config,
            self.qconfig.key_config,
            self.qconfig.value_config,
        )
        # The attention matmuls run on dequantized operands either way
        # (reference ``ops.py:99-107``), so quantize-then-matmul is exactly
        # fake-quantize (one fused Pallas pass) followed by the bf16 matmul.
        # (b, h, s, -head_dim-): blocked along the Q.K^T contraction dim.
        q_fq = mx_fake_quantize(q.astype(jnp.bfloat16), qc.elem_dtype, qc.block_size)
        k_fq = mx_fake_quantize(k.astype(jnp.bfloat16), kc.elem_dtype, kc.block_size)
        # V: transpose so blocking lands on the kv length (the P.V contraction
        # dim), then transpose back (reference ``:208-213``).
        v_fq = mx_fake_quantize(
            v.swapaxes(2, 3).astype(jnp.bfloat16), vc.elem_dtype, vc.block_size
        ).swapaxes(2, 3)
        return q_fq, k_fq, v_fq

    def _quantize_attn_weights(self, attn_weights):
        if not self.qconfig.is_qkv_quantization_enabled:
            return attn_weights
        ac = self.qconfig.attention_weights_config
        # (b, h, q_len, -kv_len-): blocked along the P.V contraction dim.
        return mx_fake_quantize(
            attn_weights.astype(jnp.bfloat16), ac.elem_dtype, ac.block_size
        )

    def _fused_cache_attention_ok(self, cache=None) -> bool:
        """Fused-kernel eligibility under this layer's Q/K/V config.

        Without Q/K/V quantization: always (hp-Q x MX-cache attention).

        WITH Q/K/V quantization (round-3 extension — the serving
        configuration the accuracy tables recommend used to drop to eager
        O(L^2) + materialized ``repeat_kv``): the fused path runs when the
        cache format equals both key and value configs.  Semantics there:

        * Q is fake-quantized per ``query_config`` before the kernel
          (:meth:`_fused_q` — the quantize-then-matmul identity, exactly as
          the eager path's Q treatment);
        * the CACHE quantization *is* the K/V quantization — K/V are
          quantized once at cache-write (precisely "K/V in the key/value
          format"), where the eager path re-quantizes the dequantized cache
          a second time.  Single quantization is at least as accurate;
        * post-softmax attention-weights quantization does NOT apply inside
          the online-softmax kernel — an accuracy-FAVORING deviation.  For
          bit-faithful eager semantics (double K/V quantization +
          attn-weights fq) set ``TORCHMX_FUSED_ATTENTION=off``.
        """
        if not self.qconfig.is_qkv_quantization_enabled:
            return True
        if cache is None or not hasattr(cache, "elem_dtype_name"):
            return False
        kc, vc = self.qconfig.key_config, self.qconfig.value_config
        return (
            kc.elem_dtype_name == cache.elem_dtype_name
            and vc.elem_dtype_name == cache.elem_dtype_name
            and kc.block_size == cache.block_size == vc.block_size
        )

    def _fused_q(self, q):
        if not self.qconfig.is_qkv_quantization_enabled:
            return q
        qc = self.qconfig.query_config
        # (b, h, s, -head_dim-): blocked along the Q.K^T contraction dim,
        # same grid as the eager path's Q quantization.
        return mx_fake_quantize(q.astype(jnp.bfloat16), qc.elem_dtype, qc.block_size)

    def _matmul(self, a, b):
        return mx_matmul(a, b, out_dtype=jnp.bfloat16)

    def extra_repr(self) -> str:
        return f"qconfig={self.qconfig}"
