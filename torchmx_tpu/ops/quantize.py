"""Backend-dispatched quantization ops (jnp reference / Pallas kernels)."""

from __future__ import annotations

import jax

from .. import env_variables as env


from .backend import use_pallas as _use_pallas


def mx_fake_quantize(x: jax.Array, elem_dtype_name, block_size: int = 32) -> jax.Array:
    """MX quantize-dequantize roundtrip (dynamic activation quantization).

    On the Pallas backend this is a single fused VMEM pass
    (``fake_quantize_pallas``); otherwise the jnp quantize + dequantize pair.
    Numerics are identical by construction.
    """
    if not isinstance(elem_dtype_name, str):
        elem_dtype_name = elem_dtype_name.name  # accept a DType
    if _use_pallas():
        from . import pallas_quantize

        out = pallas_quantize.fake_quantize_pallas(x, elem_dtype_name, block_size)
        if out is not None:
            return out
        from .fallbacks import note_fallback

        note_fallback(
            "mx_fake_quantize", f"{tuple(x.shape)} {elem_dtype_name}/{block_size}"
        )
    from ..mx_array import MXArray

    return MXArray.to_mx(x, elem_dtype_name, block_size).to_dtype(x.dtype)
