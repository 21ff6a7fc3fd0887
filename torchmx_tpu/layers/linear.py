"""Linear layers: high-precision base + MX-quantized inference version.

``Linear`` stores its weight in the torch/HF layout ``(out_features,
in_features)`` so HF checkpoints import without transposition and MX blocking
lands on the contraction dim.  ``MXInferenceLinear`` is the TPU-native
counterpart of the reference's ``MXInferenceLinear``
(rain-neuromorphics/torchmx ``torchmx/layers/mx_linear.py:8-95``): the weight
is quantized once at conversion; activations are quantized dynamically per
forward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .. import env_variables as env
from ..config import QLinearConfig
from ..mx_array import MXArray
from ..ops import mx_dynamic_matmul


class Linear(nnx.Module):
    """Plain bf16 linear with torch-layout weight ``(out, in)``."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        use_bias: bool = True,
        dtype=jnp.bfloat16,
        rngs: Optional[nnx.Rngs] = None,
    ):
        self.in_features = in_features
        self.out_features = out_features
        if rngs is None:
            w = jnp.zeros((out_features, in_features), dtype)
        else:
            w = nnx.initializers.lecun_normal()(
                rngs.params(), (out_features, in_features), dtype
            )
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_features,), dtype)) if use_bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.weight.get_value()
        out = jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.get_value().astype(out.dtype)
        return out


def _concrete_min_ge(arr, bound: int) -> bool:
    """True iff ``arr`` is a CONCRETE array whose minimum is >= ``bound``.

    Layout decisions gated on scale VALUES (the fp8-halves no-underflow
    precondition) need a device sync; under tracing/abstract init
    (``nnx.eval_shape`` — the benchmark's zero-weight 8B build) there is no
    value to inspect, so the repack conservatively stays off."""
    if isinstance(arr, jax.core.Tracer) or not isinstance(arr, jax.Array):
        return False
    return int(jnp.min(arr)) >= bound


class MXInferenceLinear(nnx.Module):
    """Linear with MX-quantized weight and dynamically MX-quantized activations.

    The weight is stored as an :class:`MXArray` (packed payload + E8M0 scale)
    inside an ``nnx.Param`` so it shards/checkpoints like any other param.
    Storage is **K-major** (payload ``(in_features, out_features)``, blocked on
    the contraction dim) — the layout the fused Pallas dequant-matmul kernel
    consumes directly (see ``ops/pallas_matmul.py``); the jnp simulation path
    handles it via ``block_dim``.  Forward mirrors reference
    ``mx_linear.py:61-95``: quantize the activation with
    ``activations_config``, then run the MX matmul (bias in high precision).
    """

    def __init__(self, weight_mx: MXArray, bias, qconfig: QLinearConfig):
        if weight_mx.block_dim == weight_mx.ndim - 1:
            weight_mx = weight_mx.T  # to K-major kernel layout
        if (
            weight_mx.elem_dtype.name in ("float4_e2m1", "float6_e2m3")
            and weight_mx.ndim == 2
            and weight_mx.block_dim == 0
            and weight_mx.padding == 0
            and env.TORCHMX_INT8_DOMAIN == "1"
        ):
            # Exact int8-domain re-coding (same values, one int8 code per
            # element): decode-size matmuls ride the native int8-MXU-dot
            # kernel, larger shapes the hw-convert int8 decode — the fastest
            # measured serving path (fp4 grows 0.5 -> 1 byte/element; see
            # MXArray.to_int8_domain and env_variables.TORCHMX_INT8_DOMAIN).
            weight_mx = weight_mx.to_int8_domain()
        if (
            weight_mx.elem_dtype.name == "float4_e2m1"
            and weight_mx.fp4_pack == "pair"
            and weight_mx.ndim == 2
            and weight_mx.block_dim == 0
            and weight_mx.padding == 0
            and weight_mx.shape[0] % 512 == 0  # kernel needs bk >= 512
        ):
            # fp4 kernel layout: byte p holds elements (p, p + K/2), letting
            # the fused matmul read x as contiguous half-tiles (one full-K
            # MXU dot per tile instead of two strided half-K dots).
            weight_mx = weight_mx.to_fp4_halves()
        if (
            weight_mx.elem_dtype.name == "float8_e4m3"
            and weight_mx.fp4_pack == "pair"
            and weight_mx.ndim == 2
            and weight_mx.block_dim == 0
            and weight_mx.padding == 0
            and weight_mx.shape[0] % 512 == 0  # kernel needs bk >= 512
            and env.TORCHMX_FP8_HALVES == "1"
            # fp8-dot feeds the MXU raw FLAT codes — halves-packed u16
            # words would have to be unpacked first; keep the flat layout.
            and env.TORCHMX_FP8_DOT != "1"
            and _concrete_min_ge(weight_mx.scale_e8m0, 10)
        ):
            # fp8 kernel layout: u16 word p holds codes (p, p + K/2), SWAR-
            # decoded two per i32 lane.  The scale bound (checked eagerly at
            # quantize time) guarantees no decoded value can underflow the
            # bf16-normal range, which lets the kernel drop dead-lane
            # masking (see MXArray.to_fp8_halves); real weight scales sit
            # far above it (se < 10 means a block max below 2^-117).
            weight_mx = weight_mx.to_fp8_halves()
        if (
            weight_mx.elem_dtype.name in ("float6_e3m2", "float6_e2m3")
            and weight_mx.fp4_pack == "pair"
            and weight_mx.ndim == 2
            and weight_mx.block_dim == 0
            and weight_mx.padding == 0
            and weight_mx.shape[0] % 1024 == 0  # kernel needs bk >= 1024
            and env.TORCHMX_FP6_PACK == "1"
        ):
            # fp6 kernel layout: 4 codes per 3 bytes, planar quarters — 25%
            # less weight HBM than 1 byte/code (see MXArray.to_fp6_quarters);
            # opt out via TORCHMX_FP6_PACK=0 for minimum batch-1 decode
            # latency (the quarters unpack is VPU-bound there).
            weight_mx = weight_mx.to_fp6_quarters()
        self.weight = nnx.Param(weight_mx)
        self.bias = nnx.Param(bias) if bias is not None else None
        self.qconfig = qconfig
        self.in_features, self.out_features = weight_mx.shape

    @classmethod
    def from_float(cls, mod: Linear, qconfig: QLinearConfig) -> "MXInferenceLinear":
        """Convert a high-precision ``Linear`` (reference ``mx_linear.py:21-59``).

        fp32 weights (e.g. straight off disk) are cast to bf16 first, like the
        reference's meta-device path (``mx_linear.py:68-92``).
        """
        w = mod.weight.get_value()
        return cls.from_weights(
            w, mod.bias.get_value() if mod.bias is not None else None, qconfig
        )

    @classmethod
    def from_weights(cls, weight: jax.Array, bias, qconfig: QLinearConfig) -> "MXInferenceLinear":
        if weight.dtype != jnp.bfloat16:
            weight = weight.astype(jnp.bfloat16)
        if qconfig.rotate_blocks:
            # Outlier-spreading block rotation (see rotation.py): the weight
            # side carries H/B so the rotated matmul reproduces x @ W.
            from ..rotation import rotate_blocks

            assert qconfig.weights_config.block_size == 32, (
                "rotate_blocks requires the OCP block size 32"
            )
            weight = rotate_blocks(weight, inverse=True)
        w_mx = MXArray.to_mx(
            weight,
            qconfig.weights_config.elem_dtype,
            qconfig.weights_config.block_size,
        )
        return cls(w_mx, bias, qconfig)

    def __call__(self, x: jax.Array) -> jax.Array:
        a_cfg = self.qconfig.activations_config
        x = x.astype(jnp.bfloat16)
        if self.qconfig.rotate_blocks:
            from ..rotation import rotate_blocks

            x = rotate_blocks(x)
        # Dynamic activation quantization fused into the matmul kernel on the
        # Pallas backend (the x tile is fake-quantized in VMEM — no separate
        # HBM pass); the jnp path runs the quantize->dequantize pair then the
        # dequant-dot.  Numerics are identical either way.
        out = mx_dynamic_matmul(
            x,
            self.weight.get_value(),
            a_cfg.elem_dtype_name,
            a_cfg.block_size,
            out_dtype=jnp.bfloat16,
        )
        if self.bias is not None:
            out = out + self.bias.get_value().astype(out.dtype)
        return out

    def apply_prequantized(self, x_fq: jax.Array) -> jax.Array:
        """Forward on an activation that is ALREADY fake-quantized to this
        layer's ``activations_config`` grid (see :func:`shared_activation_fq`).
        Bit-identical to ``__call__`` on the raw activation: fake-quantize is
        idempotent per grid, and the fused kernel's in-prologue fq is
        bit-identical to the standalone pass by the kernel tests."""
        from ..ops import mx_matmul

        out = mx_matmul(x_fq, self.weight.get_value(), out_dtype=jnp.bfloat16)
        if self.bias is not None:
            out = out + self.bias.get_value().astype(out.dtype)
        return out

    def __repr__(self) -> str:
        return (
            f"MXInferenceLinear(in={self.in_features}, out={self.out_features}, "
            f"qconfig={self.qconfig})"
        )


def shared_activation_fq(x: jax.Array, *linears: "MXInferenceLinear"):
    """Fake-quantize ``x`` once for several linears that consume the SAME
    activation under the SAME activation config (Llama gate/up, attention
    q/k/v) — or return None when sharing does not apply.

    Each ``MXInferenceLinear`` would otherwise re-quantize the identical
    activation: at prefill sizes the fq is a per-matmul VPU cost (~10% of a
    Llama-8B MLP matmul on v5e), so quantizing once and feeding the
    weight-only cached kernels is strictly cheaper.  At decode sizes
    (rows <= the kernel's fuse threshold) the per-matmul in-kernel fq is
    effectively free and skipping the extra dispatch wins instead.
    """
    from ..ops import mx_fake_quantize
    from ..ops.pallas_matmul import _ACT_FQ_FUSE_MAX_M

    if not all(isinstance(lin, MXInferenceLinear) for lin in linears):
        return None
    cfg = linears[0].qconfig.activations_config
    rot = linears[0].qconfig.rotate_blocks
    if any(
        lin.qconfig.activations_config != cfg or lin.qconfig.rotate_blocks != rot
        for lin in linears[1:]
    ):
        return None
    n_rows = x.size // x.shape[-1] if x.ndim > 1 else 1
    if n_rows <= _ACT_FQ_FUSE_MAX_M:
        return None
    x = x.astype(jnp.bfloat16)
    if rot:
        from ..rotation import rotate_blocks

        x = rotate_blocks(x)
    return mx_fake_quantize(x, cfg.elem_dtype, cfg.block_size)
