"""MX matmul / linear ops.

The reference routes all matmul-family ATen ops through "dequantize both
operands, run the op in high precision" handlers
(rain-neuromorphics/torchmx ``torchmx/ops.py:29-119``), with reduced-precision
GEMM reductions globally disabled (``ops.py:16-19``).  The TPU-native
equivalents here take :class:`~torchmx_tpu.mx_array.MXArray` or plain arrays
directly (no dispatch machinery: PyTorch lowers 4-D matmul to
expand+view+bmm; in JAX ``jnp.matmul`` batches natively) and always accumulate
in fp32 on the MXU (``preferred_element_type=jnp.float32``).

Backend selection (``TORCHMX_QUANTIZE_BACKEND``):
    * ``"jnp"``    — dequantize-then-dot (bit-parity reference path).
    * ``"pallas"`` — fused dequant-matmul TPU kernels (see ``pallas_matmul``).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .. import env_variables as env
from ..mx_array import MXArray

Array = jax.Array
ArrayLike = Union[Array, MXArray]


def _dequant(x: ArrayLike, target_dtype) -> Array:
    if isinstance(x, MXArray):
        return x.to_dtype(target_dtype)
    return x.astype(target_dtype)


def _result_dtype(*operands: ArrayLike):
    for op in operands:
        if isinstance(op, MXArray):
            return op.orig_dtype
    return operands[0].dtype


from .backend import use_pallas as _use_pallas
from .fallbacks import note_fallback as _note_fallback


def _shape_reason(a, b) -> str:
    bdesc = (
        f"{b.elem_dtype.name}/{b.fp4_pack}" if isinstance(b, MXArray) else str(b.dtype)
    )
    return f"{tuple(a.shape)}@{tuple(b.shape)} {bdesc}"


def mx_matmul(a: ArrayLike, b: ArrayLike, out_dtype=None, _noted: bool = False) -> Array:
    """``a @ b`` where either operand may be an MXArray.

    Supports 2-D and batched (3-D/4-D attention) shapes.  On the simulation
    path, operands are dequantized to the original high precision and
    contracted with fp32 accumulation, matching the reference's semantics
    (``ops.py:60-107``: ``aten.mm/matmul/bmm`` handlers); eligible shapes with
    K-major MXArray weights route through the fused Pallas kernels.
    ``_noted`` marks a call from a wrapper that already counted (and
    re-attempted) the kernel path for this logical op — skip both here.
    """
    out_dtype = out_dtype or _result_dtype(a, b)
    if _use_pallas() and not _noted:
        from . import pallas_matmul

        out = pallas_matmul.matmul_any(a, b, out_dtype)
        if out is not None:
            return out
        if isinstance(b, MXArray) and b.ndim == 2:
            _note_fallback("mx_matmul", _shape_reason(a, b))
    a_hp = _dequant(a, out_dtype)
    b_hp = _dequant(b, out_dtype)
    return jnp.matmul(
        a_hp, b_hp, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def mx_dynamic_matmul(
    x: Array,
    w: MXArray,
    act_elem_dtype_name: str,
    act_block_size: int = 32,
    out_dtype=None,
) -> Array:
    """Dynamic-activation-quantized matmul: fake-quantize ``x`` per MX block,
    then ``x_q @ w`` — the hot op behind ``MXInferenceLinear``.

    On the Pallas backend the activation quantization is fused into the
    matmul kernel prologue (the tile is fake-quantized in VMEM), eliminating
    the separate fake-quantize pass's HBM round trip over ``x``.  The
    fallback (and the numerics reference) is ``mx_fake_quantize`` followed by
    :func:`mx_matmul` — bit-identical by construction.
    """
    if not isinstance(elem_name := act_elem_dtype_name, str):
        elem_name = elem_name.name  # accept a DType
    out_dtype = out_dtype or _result_dtype(x, w)
    attempted = False
    if _use_pallas() and act_block_size == 32:
        from . import pallas_matmul

        if elem_name == "int8":
            # int8 acts x int8(-domain) weights at decode sizes: native int8
            # MXU dots with per-32-block rescale — same MX values, per-block
            # accumulation grouping (see pallas_matmul._int8dot_kernel).
            out = pallas_matmul.int8dot_any(x, w, out_dtype)
            if out is not None:
                return out
        if elem_name == "float8_e4m3" and env.TORCHMX_FP8_DOT == "1":
            # fp8 acts x flat fp8 weights at decode sizes: raw e4m3 codes
            # into the MXU (native f8 dots on this TPU generation) — zero
            # per-element decode; f32-rounding-class numerics (round 5).
            out = pallas_matmul.fp8dot_any(x, w, out_dtype)
            if out is not None:
                return out
        out = pallas_matmul.matmul_any(x, w, out_dtype, act_fq=elem_name)
        if out is not None:
            return out
        attempted = True
        if isinstance(w, MXArray) and w.ndim == 2:
            _note_fallback("mx_dynamic_matmul", _shape_reason(x, w))
    from .quantize import mx_fake_quantize

    x_fq = mx_fake_quantize(x.astype(jnp.bfloat16), elem_name, act_block_size)
    # _noted: when the kernel path was already attempted (and the miss
    # counted) above, don't re-attempt or double-count it inside mx_matmul;
    # an unusual act_block_size skips the fused attempt but the plain
    # kernel may still take block-32 weights.
    return mx_matmul(x_fq, w, out_dtype, _noted=attempted)


def mx_linear(
    x: ArrayLike,
    weight: ArrayLike,
    bias: Optional[Array] = None,
    out_dtype=None,
) -> Array:
    """``x @ weight.T + bias`` with MX operands (``aten.linear``/``addmm``,
    reference ``ops.py:29-41,110-119``; the bias stays high-precision).

    ``weight`` follows the torch linear layout ``(out_features, in_features)``
    with the contraction (last) dim blocked.
    """
    out_dtype = out_dtype or _result_dtype(x, weight)
    if _use_pallas():
        from . import pallas_matmul

        out = pallas_matmul.linear_any(x, weight, out_dtype)
        if out is not None:
            return out if bias is None else (out + bias.astype(out_dtype))
        if isinstance(weight, MXArray) and weight.ndim == 2:
            _note_fallback("mx_linear", _shape_reason(x, weight))

    x_hp = _dequant(x, out_dtype)
    w_hp = _dequant(weight, out_dtype)
    out = jax.lax.dot_general(
        x_hp,
        w_hp,
        dimension_numbers=(((x_hp.ndim - 1,), (w_hp.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out_dtype)
    return out
