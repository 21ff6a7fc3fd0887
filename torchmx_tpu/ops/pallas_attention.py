"""Fused MX-KV-cache decode attention (Pallas TPU kernel).

The serving hot path: at every decode step the whole KV cache is read once.
The reference-parity path dequantizes the full cache to bf16 in HBM and runs
eager attention on it — 3x the memory traffic of the cache itself (read
codes, write bf16, read bf16), on a step that is purely HBM-bound.  This
kernel reads the packed MX codes + E8M0 scales directly, decodes tiles in
VMEM (scale broadcast over the 32-lane blocks via a tiny MXU dot — lane-dim
reshapes are unsupported on Mosaic), and runs blockwise online-softmax
attention (flash-style) with fp32 running max/sum/accumulator, handling GQA
by folding the query-head group into the row dimension (no ``repeat_kv``
materialization).

Numerics: K/V tiles decode exactly as ``dequantize_mx``; softmax uses the
numerically-stable online rescaling, so results match the full-softmax
reference within fp32 reordering tolerance (not bit-identical — the
reference path stays available via ``TORCHMX_FUSED_ATTENTION=off``).

Extension beyond the reference: its KV cache is high-precision and the
quantized-cache kernel is the BASELINE north star ("MX KV-cache" +
"blockwise Pallas attention"); the reference left cache quantization as a
TODO (``mx_llama_attention.py:176-183``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from .. import env_variables as env
from .pallas_matmul import decode_codes_to_bf16, decode_int8_to_bf16

BLOCK = 32
NEG_INF = -1e30  # finite: keeps exp() NaN-free for fully-masked tiles
MAX_ROWS = 64  # decode-path bound on (group_size * q_len)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lane_block_scale(scale_u8, d: int):
    """(Lt, d//32) uint8 -> (Lt, d) int32: broadcast each scale over its
    32-lane block with one tiny MXU dot (B[i, j] = 1 iff j//32 == i)."""
    nb = d // BLOCK
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 0)
    b = (col // BLOCK == row).astype(jnp.float32)
    sef = jax.lax.dot_general(
        scale_u8.astype(jnp.int32).astype(jnp.float32),  # u8->f32 unsupported on Mosaic
        b,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return sef.astype(jnp.int32)


def _decode_tile(codes_u8, scale_u8, elem: dtypes.DType, d: int):
    """(Lt, d) codes + (Lt, d//32) scales -> (Lt, d) bf16."""
    codes = codes_u8.astype(jnp.int32)
    se = _lane_block_scale(scale_u8, d)
    if elem == dtypes.int8:
        return decode_int8_to_bf16(codes, se)
    return decode_codes_to_bf16(codes, se, elem)


def _attn_kernel(
    q_ref,
    kd_ref,
    ks_ref,
    vd_ref,
    vs_ref,
    bias_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    elem_name: str,
    sm_scale: float,
    g: int,
    sq: int,
):
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows, d = q_ref.shape[2], q_ref.shape[3]
    lt = kd_ref.shape[2]
    q = q_ref[0, 0]  # (rows, d) bf16
    kf = _decode_tile(kd_ref[0, 0], ks_ref[0, 0], elem, d)  # (lt, d)

    # s = q @ k^T: contract the lane dim of both operands.
    s = jax.lax.dot_general(
        q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    # bias (sq, lt) -> (g*sq, lt): broadcast across the head group.
    bias = jnp.broadcast_to(bias_ref[0][None], (g, sq, lt)).reshape(rows, lt)
    s = s + jnp.maximum(bias, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

    vf = _decode_tile(vd_ref[0, 0], vs_ref[0, 0], elem, d)  # (lt, d)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("elem_name", "sm_scale", "lt", "g", "sq"))
def _mx_cached_attention(q4, k_data, k_scale, v_data, v_scale, bias, elem_name, sm_scale, lt, g, sq):
    b, hkv, rows, d = q4.shape
    L = k_data.shape[2]
    nb = d // BLOCK
    grid = (b, hkv, L // lt)
    kernel = functools.partial(
        _attn_kernel, elem_name=elem_name, sm_scale=sm_scale, g=g, sq=sq
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rows, d), lambda ib, ih, kt: (ib, ih, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, lt), lambda ib, ih, kt: (ib, 0, kt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, d), lambda ib, ih, kt: (ib, ih, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q4, k_data, k_scale, v_data, v_scale, bias)
    return out


def _use_fused() -> bool:
    mode = env.TORCHMX_FUSED_ATTENTION
    if mode == "pallas":
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def _pick_lt(L: int) -> Optional[int]:
    return next((c for c in (512, 256, 128) if L % c == 0), None)


def cached_attention_any(q, cache, attention_mask, sm_scale) -> Optional[jax.Array]:
    """Fused attention over an MX-quantized KV cache.

    Args:
        q: (b, hq, sq, d) bf16 queries (RoPE applied).
        cache: an ``MXLayerKVCache``-shaped object (``k_data/k_scale/
            v_data/v_scale/elem_dtype_name/block_size`` fields) holding the
            cache *after* the current tokens were written.
        attention_mask: additive mask broadcastable to (b, 1, sq, L), or None.
        sm_scale: softmax scale (1/sqrt(head_dim)).

    Returns (b, hq, sq, d) bf16, or None if ineligible (caller falls back to
    the dequantize-the-cache path).
    """
    if not _use_fused():
        return None
    needed = ("k_data", "k_scale", "v_data", "v_scale", "elem_dtype_name", "block_size")
    if not all(hasattr(cache, f) for f in needed):
        return None
    if cache.block_size != BLOCK:
        return None
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[cache.elem_dtype_name]
    if elem == dtypes.float4_e2m1:
        return None  # nibble-packed lanes: fallback path
    b, hq, sq, d = q.shape
    _, hkv, L, dp = cache.k_data.shape
    if d % 128 != 0 or dp != d or hq % hkv != 0:
        return None
    g = hq // hkv
    rows = g * sq
    if rows > MAX_ROWS:
        return None  # prefill-sized: the XLA path is compute-bound anyway
    lt = _pick_lt(L)
    if lt is None:
        return None

    if attention_mask is None:
        bias = jnp.zeros((b, sq, L), jnp.float32)
    else:
        m = jnp.broadcast_to(attention_mask, (b, 1, sq, L)).astype(jnp.float32)
        bias = m[:, 0]
    # (b, hq, sq, d) -> (b, hkv, g*sq, d): group rows = (head-in-group, sq).
    q4 = q.astype(jnp.bfloat16).reshape(b, hkv, g, sq, d).reshape(b, hkv, rows, d)
    out = _mx_cached_attention(
        q4,
        cache.k_data,
        cache.k_scale,
        cache.v_data,
        cache.v_scale,
        bias,
        cache.elem_dtype_name,
        float(sm_scale),
        lt,
        g,
        sq,
    )
    return out.reshape(b, hkv, g, sq, d).reshape(b, hq, sq, d)
