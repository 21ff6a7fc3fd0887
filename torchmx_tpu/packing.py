"""Sub-byte payload packing for MX element formats.

Layouts:

* **fp4 (e2m1)** — two 4-bit codes per byte, **first element in the high
  nibble** (``b = e0 << 4 | e1``), matching the reference layout
  (rain-neuromorphics/torchmx ``torchmx/utils.py:120-145``).
* **fp6 (e3m2 / e2m3)** — four 6-bit codes per 3 bytes (TPU-build extension;
  the reference stores fp6 one byte per element).  Layout is MSB-first:
  ``b0 = e0<<2 | e1>>4``, ``b1 = (e1&0xF)<<4 | e2>>2``, ``b2 = (e2&0x3)<<6 | e3``.

All functions are pure jnp and jit-safe (static shapes only).
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import tensor_size_fp4x2_to_hp, tensor_size_hp_to_fp4x2


def _normalize_axis(axis: int, ndim: int) -> int:
    return axis if axis >= 0 else axis + ndim


def pack_uint4(uint8_data: jnp.ndarray, packing_dim: int = -1) -> jnp.ndarray:
    """Pack pairs of uint4 codes (stored one-per-byte) into single bytes.

    The element at the even index lands in the **high** nibble (reference
    ``utils.py:120-145``).  The packed axis length must be even.
    """
    packing_dim = _normalize_axis(packing_dim, uint8_data.ndim)
    shape = uint8_data.shape
    assert shape[packing_dim] % 2 == 0, (
        f"pack_uint4 requires an even length along dim {packing_dim}, "
        f"got {shape[packing_dim]}"
    )
    down_size = tensor_size_hp_to_fp4x2(shape, packing_dim)
    # Split the packed axis into (pairs, 2) and combine.
    split_shape = shape[:packing_dim] + (shape[packing_dim] // 2, 2) + shape[packing_dim + 1 :]
    x = uint8_data.reshape(split_shape)
    hi = jnp.take(x, 0, axis=packing_dim + 1)
    lo = jnp.take(x, 1, axis=packing_dim + 1)
    packed = (hi << 4) | (lo & 0xF)
    return packed.astype(jnp.uint8).reshape(down_size)


def unpack_uint4(uint8_data: jnp.ndarray, packing_dim: int = -1) -> jnp.ndarray:
    """Unpack fp4x2 bytes into one uint4 code per byte (reference ``utils.py:96-117``)."""
    packing_dim = _normalize_axis(packing_dim, uint8_data.ndim)
    shape = uint8_data.shape
    up_size = tensor_size_fp4x2_to_hp(shape, packing_dim)
    first = (uint8_data >> 4).astype(jnp.uint8)
    second = (uint8_data & 0xF).astype(jnp.uint8)
    unpacked = jnp.stack([first, second], axis=packing_dim + 1)
    return unpacked.reshape(up_size)


def pack_uint6(uint8_data: jnp.ndarray, packing_dim: int = -1) -> jnp.ndarray:
    """Pack groups of four 6-bit codes into 3 bytes (TPU-build extension).

    The packed axis length must be a multiple of 4; the output axis length is
    ``3 * n // 4``.
    """
    packing_dim = _normalize_axis(packing_dim, uint8_data.ndim)
    shape = uint8_data.shape
    n = shape[packing_dim]
    assert n % 4 == 0, f"pack_uint6 requires length % 4 == 0 along dim {packing_dim}, got {n}"
    split_shape = shape[:packing_dim] + (n // 4, 4) + shape[packing_dim + 1 :]
    x = uint8_data.reshape(split_shape).astype(jnp.uint8)
    e0 = jnp.take(x, 0, axis=packing_dim + 1)
    e1 = jnp.take(x, 1, axis=packing_dim + 1)
    e2 = jnp.take(x, 2, axis=packing_dim + 1)
    e3 = jnp.take(x, 3, axis=packing_dim + 1)
    b0 = (e0 << 2) | (e1 >> 4)
    b1 = ((e1 & 0xF) << 4) | (e2 >> 2)
    b2 = ((e2 & 0x3) << 6) | (e3 & 0x3F)
    packed = jnp.stack([b0, b1, b2], axis=packing_dim + 1).astype(jnp.uint8)
    out_shape = list(shape)
    out_shape[packing_dim] = 3 * n // 4
    return packed.reshape(out_shape)


def unpack_uint6(uint8_data: jnp.ndarray, packing_dim: int = -1) -> jnp.ndarray:
    """Inverse of :func:`pack_uint6`."""
    packing_dim = _normalize_axis(packing_dim, uint8_data.ndim)
    shape = uint8_data.shape
    n3 = shape[packing_dim]
    assert n3 % 3 == 0, f"unpack_uint6 requires length % 3 == 0 along dim {packing_dim}, got {n3}"
    split_shape = shape[:packing_dim] + (n3 // 3, 3) + shape[packing_dim + 1 :]
    x = uint8_data.reshape(split_shape)
    b0 = jnp.take(x, 0, axis=packing_dim + 1)
    b1 = jnp.take(x, 1, axis=packing_dim + 1)
    b2 = jnp.take(x, 2, axis=packing_dim + 1)
    e0 = b0 >> 2
    e1 = ((b0 & 0x3) << 4) | (b1 >> 4)
    e2 = ((b1 & 0xF) << 2) | (b2 >> 6)
    e3 = b2 & 0x3F
    unpacked = jnp.stack([e0, e1, e2, e3], axis=packing_dim + 1).astype(jnp.uint8)
    out_shape = list(shape)
    out_shape[packing_dim] = 4 * n3 // 3
    return unpacked.reshape(out_shape)
