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


def mx_matmul(a: ArrayLike, b: ArrayLike, out_dtype=None) -> Array:
    """``a @ b`` where either operand may be an MXArray.

    Supports 2-D and batched (3-D/4-D attention) shapes.  On the simulation
    path, operands are dequantized to the original high precision and
    contracted with fp32 accumulation, matching the reference's semantics
    (``ops.py:60-107``: ``aten.mm/matmul/bmm`` handlers); eligible shapes with
    K-major MXArray weights route through the fused Pallas kernels.
    """
    out_dtype = out_dtype or _result_dtype(a, b)
    if _use_pallas():
        from . import pallas_matmul

        out = pallas_matmul.matmul_any(a, b, out_dtype)
        if out is not None:
            return out
    a_hp = _dequant(a, out_dtype)
    b_hp = _dequant(b, out_dtype)
    return jnp.matmul(
        a_hp, b_hp, preferred_element_type=jnp.float32
    ).astype(out_dtype)


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
