"""Block Hadamard rotation for outlier-resilient MX quantization.

A beyond-reference extension (the reference quantizes raw tensors only):
rotating each 32-element MX block by a Hadamard matrix before quantization
spreads activation/weight outliers across the block, so the shared E8M0
scale wastes fewer element codes on a single large value — the main
accuracy lever for MXFP4 (see "Block Rotation is All You Need for MXFP4
Quantization", arxiv 2511.04214, and the QuaRot/SpinQuant line of work).

The transform is numerically free at the matmul level: with ``H`` the
±1 Sylvester-Hadamard matrix of size ``B`` (``H == H.T`` and
``H @ H.T == B * I``),

    (x H) @ (H^T W / B)  ==  x @ W

exactly — and ``1/B`` is a power of two, so folding it into the weight
side is a lossless bf16 scaling.  Activations pay one tiny batched
``(M, K/B, B) @ (B, B)`` matmul per forward (``2*M*K*B`` FLOPs, ~B/N of
the main matmul); weights rotate once offline.

TPU notes: the per-block matmul XLA-compiles to an MXU einsum; blocks are
along the contraction dim, so rotation commutes with tensor-parallel
K-sharding at any 32-aligned shard boundary.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

BLOCK = 32


@functools.lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    """Sylvester-Hadamard matrix of size n (n a power of two), entries ±1."""
    assert n & (n - 1) == 0 and n > 0, f"n must be a power of two, got {n}"
    h = np.array([[1]], dtype=np.int8)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard(n: int = BLOCK, dtype=jnp.bfloat16) -> jnp.ndarray:
    """The ±1 Sylvester-Hadamard matrix as a device array."""
    return jnp.asarray(_hadamard_np(n), dtype)


def rotate_blocks(t: jnp.ndarray, block_size: int = BLOCK, inverse: bool = False):
    """Rotate each ``block_size`` chunk of the last axis by H (or H/B).

    ``inverse=True`` applies ``H / B`` — used on the weight side so the
    rotated matmul reproduces the unrotated product exactly (in exact
    arithmetic); ``H`` is symmetric, so no transpose is needed.
    """
    *lead, k = t.shape
    assert k % block_size == 0, f"last dim {k} not divisible by {block_size}"
    h = hadamard(block_size, t.dtype)
    if inverse:
        # 1/B is a power of two, so ±1/B is exact in bf16.
        h = (h / block_size).astype(t.dtype)
    out = jnp.einsum(
        "...kb,bc->...kc",
        t.reshape(*lead, k // block_size, block_size),
        h,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(*lead, k).astype(t.dtype)
