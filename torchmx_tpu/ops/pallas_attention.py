"""Fused MX-KV-cache attention (Pallas TPU kernel), prefill + decode.

The serving hot path reads the whole KV cache every decode step; the
reference-parity path dequantizes the full cache to bf16 in HBM and runs
eager attention (O(sq*L) materialized logits).  This kernel:

* reads the packed MX codes + E8M0 scales directly and decodes tiles in
  VMEM (scale broadcast over the 32-lane blocks via a tiny MXU dot —
  lane-dim reshapes are unsupported on Mosaic);
* runs blockwise online-softmax attention (flash-style) with fp32 running
  max/sum/accumulator — no (sq, L) logits in HBM;
* folds the GQA query-head group into the row dimension (no ``repeat_kv``
  materialization), rows ordered (q position, head-in-group);
* masks **causally in-kernel** from two scalars (first query position
  ``q_off`` and visible prefix length ``kv_len``) instead of reading a dense
  bias — prefill and decode are the same kernel (decode: sq=1,
  q_off = kv_len-1), and fully-masked KV tiles are skipped by predication.

Measured (v5e, fp8 cache, b=4 hq=32 hkv=8 L=8192): decode step 0.59 ms vs
4.96 ms for the dequantize path and 2.16 ms for a bf16 cache.

Numerics: K/V tiles decode exactly as ``dequantize_mx``; the online softmax
matches the full-softmax reference within fp32 reordering tolerance (the
reference path stays available via ``TORCHMX_FUSED_ATTENTION=off``).

Extension beyond the reference: its KV cache is high precision and cache
quantization is an open TODO (``mx_llama_attention.py:176-183``); the MX
KV-cache + blockwise attention is the BASELINE north star.
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
from .pallas_matmul import decode_codes_to_bf16, decode_fp4_to_bf16, decode_int8_to_bf16

BLOCK = 32
NEG_INF = -1e30  # finite: keeps exp() NaN-free under fully-masked tiles
MAX_ROWS = 256  # per-q-tile row budget (group_size * sq_tile)


from .backend import interpret as _interpret


def _lane_block_scale(scale_u8, d: int):
    """(Lt, d//32) uint8 -> (Lt, d) int32: broadcast each scale over its
    32-lane block with one tiny MXU dot (B[i, j] = 1 iff j//32 == i)."""
    nb = d // BLOCK
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, d), 0)
    b = (col // BLOCK == row).astype(jnp.float32)
    sef = jax.lax.dot_general(
        scale_u8.astype(jnp.int32).astype(jnp.float32),  # u8->f32 unsupported
        b,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return sef.astype(jnp.int32)


def _lane_block_scale_half(scale_u8, d_half: int, block_offset: int):
    """Like :func:`_lane_block_scale` but selecting block rows
    ``[block_offset, block_offset + d_half/32)`` of the full scale tile —
    avoids sub-lane slicing of the (Lt, d/32) scale array."""
    nb = scale_u8.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, d_half), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, d_half), 0)
    b = (col // BLOCK + block_offset == row).astype(jnp.float32)
    sef = jax.lax.dot_general(
        scale_u8.astype(jnp.int32).astype(jnp.float32),
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
    return decode_codes_to_bf16(codes, se, elem, dot_operand=True)


def _decode_fp4_halves(bytes_u8, scale_u8, d: int):
    """(Lt, d/2) halves-packed fp4 bytes -> two (Lt, d/2) bf16 planes
    (elements [0, d/2) and [d/2, d)), each against its own scale rows.

    Plane-wise decode: the matmul kernel's SWAR variant LOSES here (0.714 ms
    vs 0.632 at L=8192 lt=2048) because its packed scale/threshold words are
    free only when built on small sublane-block arrays — with the attention
    cache's lane-dim blocks they cost ~9 extra VPU ops per byte on the
    full-size tile, more than SWAR saves."""
    b = bytes_u8.astype(jnp.int32)
    half = d // 2
    nb2 = half // BLOCK
    se_hi = _lane_block_scale_half(scale_u8, half, 0)
    se_lo = _lane_block_scale_half(scale_u8, half, nb2)
    return (
        decode_fp4_to_bf16((b >> 4) & 0xF, se_hi),
        decode_fp4_to_bf16(b & 0xF, se_lo),
    )


def _attn_kernel(
    qoff_ref,
    kvlen_ref,
    q_ref,
    kd_ref,
    ks_ref,
    vd_ref,
    vs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    elem_name: str,
    sm_scale: float,
    g: int,
    sqt: int,
    window: Optional[int] = None,
    ring: bool = False,
    softcap: Optional[float] = None,
):
    # "bfloat16" selects the no-decode baseline variant: K/V tiles are read
    # as bf16 directly (scale refs carry dummies).  This is the honest
    # iso-kernel comparator for the MX-cache speedups (same blockwise
    # online-softmax structure, no dequantization) — a benchmarking aid, not
    # a serving path (a bf16 cache belongs to the plain LayerKVCache flow).
    # ``window``: sliding-window attention (Mistral semantics — query at
    # position p sees keys in (p - window, p]); tiles entirely below the
    # window are skipped by predication just like tiles above the causal
    # frontier.
    # ``ring``: the cache is a rolling buffer — slot j holds absolute
    # position T - ((T - j) mod capacity) with T the newest written
    # position; masking reconstructs positions from slot indices (requires
    # ``window``; no tile skipping — the ring is sized ~window so every
    # tile is live once saturated).
    bf16_cache = elem_name == "bfloat16"
    elem = None if bf16_cache else dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    qt = pl.program_id(2)
    kt = pl.program_id(3)
    rows, d = q_ref.shape[2], q_ref.shape[3]
    lt = kd_ref.shape[2]

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ib = pl.program_id(0)
    q_off = qoff_ref[ib]  # per-batch-row positions (continuous batching)
    kv_len = kvlen_ref[ib]
    # Highest query position in this q tile; skip KV tiles entirely above the
    # causal frontier or beyond the visible prefix.
    q_hi = q_off + (qt + 1) * sqt - 1
    if ring:
        work = kv_len > 0
    else:
        work = (kt * lt <= q_hi) & (kt * lt < kv_len)
        if window is not None:
            # Lowest query row in this tile sees keys > q_lo - window; a KV
            # tile whose top index is below that bound is dead for every row.
            q_lo = q_off + qt * sqt
            work &= (kt + 1) * lt - 1 > q_lo - window

    @pl.when(work)
    def _():
        q = q_ref[0, 0]  # (rows, d) bf16, rows ordered (si, gi)
        dn_qk = (((1,), (1,)), ((), ()))
        if bf16_cache:
            s = jax.lax.dot_general(
                q, kd_ref[0, 0], dn_qk, preferred_element_type=jnp.float32
            )
        elif elem == dtypes.float4_e2m1:
            # Halves-packed fp4: decode the two nibble planes and split the
            # contraction (q[:, :d/2] @ k_hi^T + q[:, d/2:] @ k_lo^T).
            k_hi, k_lo = _decode_fp4_halves(kd_ref[0, 0], ks_ref[0, 0], d)
            s = jax.lax.dot_general(
                q[:, : d // 2], k_hi, dn_qk, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                q[:, d // 2 :], k_lo, dn_qk, preferred_element_type=jnp.float32
            )
        else:
            kf = _decode_tile(kd_ref[0, 0], ks_ref[0, 0], elem, d)  # (lt, d)
            s = jax.lax.dot_general(
                q, kf, dn_qk, preferred_element_type=jnp.float32
            )
        s = s * sm_scale
        if softcap is not None:
            # Gemma2 attention soft cap, applied BEFORE masking (HF order).
            s = softcap * jnp.tanh(s / softcap)
        # Causal + prefix mask, computed from indices.
        q_pos = q_off + qt * sqt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0) // g
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        if ring:
            # Reconstruct the absolute position in each slot: the slot index
            # IS kv_pos; the newest written position is kv_len - 1.
            R = pl.num_programs(3) * lt
            t_new = kv_len - 1
            m = jax.lax.rem(t_new - kv_pos, R)
            m = jnp.where(m < 0, m + R, m)
            pos_abs = t_new - m
            valid = (pos_abs >= 0) & (pos_abs <= q_pos) & (pos_abs > q_pos - window)
        else:
            valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
            if window is not None:
                valid &= kv_pos > q_pos - window
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        dn_pv = (((1,), (0,)), ((), ()))
        p16 = p.astype(jnp.bfloat16)
        if bf16_cache:
            pv = jax.lax.dot_general(
                p16, vd_ref[0, 0], dn_pv, preferred_element_type=jnp.float32
            )
        elif elem == dtypes.float4_e2m1:
            v_hi, v_lo = _decode_fp4_halves(vd_ref[0, 0], vs_ref[0, 0], d)
            pv = jnp.concatenate(
                [
                    jax.lax.dot_general(p16, v_hi, dn_pv, preferred_element_type=jnp.float32),
                    jax.lax.dot_general(p16, v_lo, dn_pv, preferred_element_type=jnp.float32),
                ],
                axis=1,
            )
        else:
            vf = _decode_tile(vd_ref[0, 0], vs_ref[0, 0], elem, d)  # (lt, d)
            pv = jax.lax.dot_general(
                p16, vf, dn_pv, preferred_element_type=jnp.float32
            )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> 0 output
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "elem_name", "sm_scale", "lt", "g", "sqt", "window", "ring", "softcap"
    ),
)
def _mx_cached_attention(
    q4, k_data, k_scale, v_data, v_scale, q_off, kv_len, elem_name, sm_scale, lt, g, sqt,
    window=None, ring=False, softcap=None,
):
    b, hkv, rows, d = q4.shape
    L = k_data.shape[2]
    dp = k_data.shape[3]  # payload width: d, or d/2 for halves-packed fp4
    nb = d // BLOCK
    rows_t = sqt * g
    grid = (b, hkv, rows // rows_t, L // lt)
    kernel = functools.partial(
        _attn_kernel, elem_name=elem_name, sm_scale=sm_scale, g=g, sqt=sqt,
        window=window, ring=ring, softcap=softcap,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows_t, d), lambda ib, ih, qt, kt: (ib, ih, qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, dp), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, dp), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows_t, d), lambda ib, ih, qt, kt: (ib, ih, qt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, q4, k_data, k_scale, v_data, v_scale)


def _attn_kernel_chunkdot(
    qoff_ref,
    kvlen_ref,
    q_ref,
    kd_ref,
    ks_ref,
    vd_ref,
    vs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    sm_scale: float,
    g: int,
):
    """int8-cache decode attention with the block scale FACTORED OUT of the
    dots (round 3; 0.308 -> 0.262 ms at b=4 L=8192 on v5e).

    The tiled kernel decodes every K/V element to scaled bf16 (~4 VPU ops
    each, via the MXU-dot lane broadcast of the scales).  Here codes convert
    bare (one hardware int->bf16 op) and the per-32-lane-block scales
    multiply the chunk PARTIAL SUMS instead:

        q.k^T = sum_c 2^(se_c-127) * (q_c . k_c)       (c = d/32 chunks)
        p.v   = sum_c (p * 2^(se_c-127)) . v_c         (scale folded into
                                                        the small p side)

    so the per-element work drops to the bare convert.  The accumulator
    lives in (d/32, rows, 32) chunk layout; the wrapper un-chunks outside.
    Decode-only (rows = g, one q tile): at prefill the tiled kernel's decode
    cost amortizes over sq MXU rows and chunking would shrink the dots.
    """
    kt = pl.program_id(2)
    nc, _, rows = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    lt = kd_ref.shape[2]

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ib = pl.program_id(0)
    q_hi = qoff_ref[ib]
    kv_len = kvlen_ref[ib]
    work = (kt * lt <= q_hi) & (kt * lt < kv_len)

    @pl.when(work)
    def _():
        q3 = q_ref[0, 0]  # (nc, 32, rows) bf16: pre-chunked, pre-transposed
        kf = kd_ref[0, 0].astype(jnp.bfloat16)  # (lt, d) bare hw convert
        kT = kf.T.reshape(nc, BLOCK, lt)
        dots = jax.lax.dot_general(
            q3, kT, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nc, rows, lt) chunk partials
        ks = ks_ref[0, 0].astype(jnp.int32)  # (lt, nc) E8M0
        kscale = jax.lax.bitcast_convert_type(
            (ks.T << 23), jnp.float32
        )  # (nc, lt) = 2^(se-127); se==0 only on never-written slots
        s = jnp.sum(dots * kscale[:, None, :], axis=0) * sm_scale  # (rows, lt)

        q_pos = q_hi + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0) // g
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        vf = vd_ref[0, 0].astype(jnp.bfloat16)  # (lt, d) bare hw convert
        vT = vf.T.reshape(nc, BLOCK, lt)
        vs = vs_ref[0, 0].astype(jnp.int32)
        vscale = jax.lax.bitcast_convert_type((vs.T << 23), jnp.float32)
        p3 = (p[None, :, :] * vscale[:, None, :]).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p3, vT, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nc, rows, 32)
        acc_ref[:] = acc_ref[:] * alpha[None] + pv
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l[None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "lt", "g"))
def _mx_cached_attention_chunkdot(
    q3, k_data, k_scale, v_data, v_scale, q_off, kv_len, sm_scale, lt, g
):
    b, hkv, nc, blk, rows = q3.shape
    L = k_data.shape[2]
    d = nc * blk
    grid = (b, hkv, L // lt)
    kernel = functools.partial(_attn_kernel_chunkdot, sm_scale=sm_scale, g=g)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc, blk, rows), lambda ib, ih, kt: (ib, ih, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nc), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nc), lambda ib, ih, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nc, rows, blk), lambda ib, ih, kt: (ib, ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, nc, rows, blk), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((nc, rows, blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, q3, k_data, k_scale, v_data, v_scale)


def use_chunkdot(elem_name: str, sq: int, d: int) -> bool:
    """True when the decode-specialized chunk-dot kernel serves this shape:
    int8 cache, single query position, lane-multiple head_dim."""
    return elem_name == "int8" and sq == 1 and d % 128 == 0


def _chunkdot_attention(q, cache, q_off, kv_len, sm_scale, lt):
    b, hq, sq, d = q.shape
    hkv = cache.k_data.shape[1]
    g = hq // hkv
    # (b, hq, 1, d) -> chunk layout (b, hkv, d/32, 32, g): chunks of d on
    # sublanes so the kernel's per-chunk dots batch over them.
    q3 = (
        q.astype(jnp.bfloat16)
        .reshape(b, hkv, g, d)
        .transpose(0, 1, 3, 2)
        .reshape(b, hkv, d // BLOCK, BLOCK, g)
    )
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mx_cached_attention_chunkdot(
        q3, cache.k_data, cache.k_scale, cache.v_data, cache.v_scale,
        q_off, kv_len, float(sm_scale), lt, g,
    )  # (b, hkv, d/32, g, 32)
    return (
        out.transpose(0, 1, 3, 2, 4).reshape(b, hkv, g, d).reshape(b, hq, sq, d)
    )


def _decode_tile_dmajor(codes_u8, scale_u8, elem: dtypes.DType):
    """d-major tile decode: (dp, lt) codes + (nb, lt) scales -> (d, lt) bf16.

    MX blocks lie on SUBLANES here, so the per-32-block scale broadcast is a
    free ``_expand_scale`` (the seq layout needs an MXU-dot lane broadcast)
    and fp4 uses the same SWAR decode that wins in the matmul kernels.
    """
    from .pallas_matmul import _expand_scale, decode_fp4_swar_planes

    if elem == dtypes.float4_e2m1:
        b = codes_u8.astype(jnp.int32)  # (d/2, lt): hi nibble el p, lo el p+d/2
        nb2 = scale_u8.shape[0] // 2
        sa = scale_u8[:nb2].astype(jnp.int32)
        sb = scale_u8[nb2:].astype(jnp.int32)
        w_hi, w_lo = decode_fp4_swar_planes(b, sa, sb)
        return jnp.concatenate([w_hi, w_lo], axis=0)  # (d, lt) sublane concat
    codes = codes_u8.astype(jnp.int32)
    se = _expand_scale(scale_u8.astype(jnp.int32), BLOCK)  # (d, lt), free
    if elem == dtypes.int8:
        return decode_int8_to_bf16(codes, se)
    return decode_codes_to_bf16(codes, se, elem, dot_operand=True)


def _attn_kernel_dmajor(
    qoff_ref,
    kvlen_ref,
    q_ref,
    kd_ref,
    ks_ref,
    vd_ref,
    vs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    elem_name: str,
    sm_scale: float,
    g: int,
    sqt: int,
    window: Optional[int] = None,
    ring: bool = False,
    softcap: Optional[float] = None,
):
    """Blockwise online-softmax attention over a d-major MX KV cache.

    Same masking/online-softmax structure as :func:`_attn_kernel`, but K/V
    tiles arrive (dp, lt) with head_dim on sublanes: the scale broadcast is a
    free sublane expand, the q.K^T and P.V dots consume the tiles with NO
    in-kernel transposes (q (rows, d) . kf (d, lt), then p (rows, lt) . vf
    (d, lt) contracted on lt), and fp4 decodes via the SWAR scheme that the
    seq layout's lane-dim blocks price out (see ``_decode_fp4_halves``).
    """
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    qt = pl.program_id(2)
    kt = pl.program_id(3)
    rows = q_ref.shape[2]
    lt = kd_ref.shape[3]

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ib = pl.program_id(0)
    q_off = qoff_ref[ib]
    kv_len = kvlen_ref[ib]
    q_hi = q_off + (qt + 1) * sqt - 1
    if ring:
        work = kv_len > 0
    else:
        work = (kt * lt <= q_hi) & (kt * lt < kv_len)
        if window is not None:
            q_lo = q_off + qt * sqt
            work &= (kt + 1) * lt - 1 > q_lo - window

    @pl.when(work)
    def _():
        q = q_ref[0, 0]  # (rows, d) bf16, rows ordered (si, gi)
        kf = _decode_tile_dmajor(kd_ref[0, 0], ks_ref[0, 0], elem)  # (d, lt)
        s = jax.lax.dot_general(
            q, kf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (rows, lt)
        s = s * sm_scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        q_pos = q_off + qt * sqt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0) // g
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        if ring:
            R = pl.num_programs(3) * lt
            t_new = kv_len - 1
            m = jax.lax.rem(t_new - kv_pos, R)
            m = jnp.where(m < 0, m + R, m)
            pos_abs = t_new - m
            valid = (pos_abs >= 0) & (pos_abs <= q_pos) & (pos_abs > q_pos - window)
        else:
            valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
            if window is not None:
                valid &= kv_pos > q_pos - window
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        vf = _decode_tile_dmajor(vd_ref[0, 0], vs_ref[0, 0], elem)  # (d, lt)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, d)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "elem_name", "sm_scale", "lt", "g", "sqt", "window", "ring", "softcap"
    ),
)
def _mx_cached_attention_dmajor(
    q4, k_data, k_scale, v_data, v_scale, q_off, kv_len, elem_name, sm_scale, lt, g, sqt,
    window=None, ring=False, softcap=None,
):
    b, hkv, rows, d = q4.shape
    dp = k_data.shape[2]  # payload rows: d, or d/2 for halves-packed fp4
    L = k_data.shape[3]
    nb = d // BLOCK
    rows_t = sqt * g
    grid = (b, hkv, rows // rows_t, L // lt)
    kernel = functools.partial(
        _attn_kernel_dmajor, elem_name=elem_name, sm_scale=sm_scale, g=g, sqt=sqt,
        window=window, ring=ring, softcap=softcap,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows_t, d), lambda ib, ih, qt, kt: (ib, ih, qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp, lt), lambda ib, ih, qt, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb, lt), lambda ib, ih, qt, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp, lt), lambda ib, ih, qt, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb, lt), lambda ib, ih, qt, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows_t, d), lambda ib, ih, qt, kt: (ib, ih, qt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, q4, k_data, k_scale, v_data, v_scale)


def _attn_kernel_int8dot(
    qoff_ref,
    kvlen_ref,
    qd_ref,
    qs_ref,
    kd_ref,
    ks_ref,
    vd_ref,
    vs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    sm_scale: float,
):
    """Decode attention with int8 codes fed to the MXU RAW — zero per-element
    K/V decode work (the d-major bare-convert path still pays one hw convert
    per cache element; at decode that IS the latency).

    q is MXINT8-quantized per 32-block of head_dim by the wrapper; q.K^T runs
    as d/32 batched int8xint8 dots with exact int32 partial sums, rescaled by
    2^(se_q + se_k - 254) per (chunk, row, position) and summed over chunks
    (the int8-MXU matmul kernel's scheme, ``decode_lab`` B).  For P.V the V
    scale 2^(se_v - 127) varies along the contraction, so it folds into the
    small P side per chunk; P then requantizes to 8-bit fixed point per
    (chunk, row) — max over the visible lane range, exact power-of-254 ...
    rather: code = round(p3 * 127 / max) — and P.V runs int8xint8 too,
    descaled by max/127.  P requantization adds ~0.4% relative error on the
    attention weights — less than the fp6/fp8 attention-weight quantization
    the reference's QKV configs apply (its fp8 has 19 dB SQNR; this is
    ~42 dB) — and is opt-in via ``TORCHMX_ATTN_INT8_DOT``.

    Accumulator lives in (d/32, rows, 32) chunk layout; the wrapper
    un-chunks.  Decode-only (one q tile of rows = g).
    """
    kt = pl.program_id(2)
    nc, _, rows = qd_ref.shape[2], qd_ref.shape[3], qd_ref.shape[4]
    lt = kd_ref.shape[3]

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ib = pl.program_id(0)
    q_hi = qoff_ref[ib]
    kv_len = kvlen_ref[ib]
    work = (kt * lt <= q_hi) & (kt * lt < kv_len)

    @pl.when(work)
    def _():
        q3 = qd_ref[0, 0]  # (nc, 32, rows) int8
        k3 = kd_ref[0, 0].reshape(nc, BLOCK, lt)  # (d, lt) -> sublane chunks
        dots = jax.lax.dot_general(
            q3, k3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (nc, rows, lt) exact
        eq = qs_ref[0, 0].astype(jnp.int32)  # (nc, rows)
        ek = ks_ref[0, 0].astype(jnp.int32)  # (nc, lt)
        # Factored rescale on the SMALL shapes (see _int8dot_kernel, incl.
        # the documented scale-0 -> +0.0 / inf*0 deviations — here a NaN
        # would poison the softmax row, but an inf factor needs an E8M0
        # sum > 381, impossible): saves the clipped exponent-sum
        # construction on full (nc, rows, lt) lanes.
        pq_s = jax.lax.bitcast_convert_type(eq << 23, jnp.float32)
        pk_s = jax.lax.bitcast_convert_type(ek << 23, jnp.float32)
        s = jnp.sum(
            dots.astype(jnp.float32) * pq_s[:, :, None] * pk_s[:, None, :], axis=0
        ) * sm_scale

        q_pos = q_hi + jnp.zeros((rows, lt), jnp.int32)
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (rows, lt); masked lanes exp(NEG_INF) = 0
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        ev = vs_ref[0, 0].astype(jnp.int32)  # (nc, lt)
        vscale = jax.lax.bitcast_convert_type(ev << 23, jnp.float32)
        p3 = p[None, :, :] * vscale[:, None, :]  # (nc, rows, lt)
        mx = jnp.max(p3, axis=2, keepdims=True)  # full-lane reduce
        mx = jnp.where(mx == 0.0, 1.0, mx)
        pq = jnp.round(p3 * (127.0 / mx)).astype(jnp.int8)
        v3 = vd_ref[0, 0].reshape(nc, BLOCK, lt)
        pv = jax.lax.dot_general(
            pq, v3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (nc, rows, 32)
        acc_ref[:] = acc_ref[:] * alpha[None] + pv.astype(jnp.float32) * (
            mx * (1.0 / 127.0)
        )
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l[None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "lt"))
def _mx_cached_attention_int8dot(
    q3, qs3, k_data, k_scale, v_data, v_scale, q_off, kv_len, sm_scale, lt
):
    b, hkv, nc, blk, rows = q3.shape
    L = k_data.shape[3]
    d = nc * blk
    grid = (b, hkv, L // lt)
    nb = d // BLOCK
    kernel = functools.partial(_attn_kernel_int8dot, sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc, blk, rows), lambda ib, ih, kt: (ib, ih, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, rows), lambda ib, ih, kt: (ib, ih, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, lt), lambda ib, ih, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb, lt), lambda ib, ih, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, lt), lambda ib, ih, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb, lt), lambda ib, ih, kt: (ib, ih, 0, kt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nc, rows, blk), lambda ib, ih, kt: (ib, ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, nc, rows, blk), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((nc, rows, blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, q3, qs3, k_data, k_scale, v_data, v_scale)


def use_int8dot(cache, sq: int, d: int) -> bool:
    """True when the all-int8 MXU-dot decode kernel serves this shape: opt-in
    flag, int8 d-major cache, single query position, lane-multiple head_dim."""
    return (
        env.TORCHMX_ATTN_INT8_DOT == "1"
        and getattr(cache, "layout", "seq") == "dmajor"
        and cache.elem_dtype_name == "int8"
        and sq == 1
        and d % 128 == 0
    )


def _int8dot_attention(q, cache, q_off, kv_len, sm_scale, lt):
    from ..mx_array import quantize_mx

    b, hq, sq, d = q.shape
    hkv = cache.k_data.shape[1]
    g = hq // hkv
    nc = d // BLOCK
    # Quantize q to MXINT8 per 32-block of head_dim (38 dB — above the fp8
    # the reference's QKV configs apply to q), then chunk for the kernel.
    qs, qd = quantize_mx(
        q.astype(jnp.bfloat16).reshape(b, hkv, g, d), "int8", BLOCK
    )  # (b, hkv, g, nc) u8, (b, hkv, g, d) i8
    q3 = qd.transpose(0, 1, 3, 2).reshape(b, hkv, nc, BLOCK, g)
    qs3 = qs.transpose(0, 1, 3, 2)  # (b, hkv, nc, g)
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mx_cached_attention_int8dot(
        q3, qs3, cache.k_data, cache.k_scale, cache.v_data, cache.v_scale,
        q_off, kv_len, float(sm_scale), lt,
    )  # (b, hkv, nc, g, 32)
    return (
        out.transpose(0, 1, 3, 2, 4).reshape(b, hkv, g, d).reshape(b, hq, sq, d)
    )


def bf16_cached_attention(q, k, v, q_off, kv_len, sm_scale, window=None) -> Optional[jax.Array]:
    """Blockwise online-softmax attention over a BF16 KV cache — the same
    fused kernel with the MX decode removed.  The honest iso-kernel baseline
    for the MX-cache speedup numbers (an eager bf16-cache comparison
    overstates them); used by ``bench.py``, not by serving.
    """
    b, hq, sq, d = q.shape
    _, hkv, L, dk = k.shape
    if dk != d or d % 128 != 0 or hq % hkv != 0:
        return None
    g = hq // hkv
    lt = _pick_lt(L)
    sqt = _pick_sqt(sq, g)
    if lt is None or sqt is None:
        return None
    q4 = (
        q.astype(jnp.bfloat16)
        .reshape(b, hkv, g, sq, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, hkv, sq * g, d)
    )
    dummy = jnp.zeros((b, hkv, L, d // BLOCK), jnp.uint8)
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mx_cached_attention(
        q4, k.astype(jnp.bfloat16), dummy, v.astype(jnp.bfloat16), dummy,
        q_off, kv_len, "bfloat16", float(sm_scale), lt, g, sqt, window,
    )
    return (
        out.reshape(b, hkv, sq, g, d).transpose(0, 1, 3, 2, 4).reshape(b, hq, sq, d)
    )


def _use_fused() -> bool:
    mode = env.TORCHMX_FUSED_ATTENTION
    if mode == "pallas":
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def _pick_lt(L: int) -> Optional[int]:
    """KV tile length: as large as the cache allows, scaled down for short
    caches.  Fewer grid invocations dominate decode latency (measured, int8
    cache L=8192 b=4: lt 512 -> 0.405 ms, 1024 -> 0.337, 2048 -> 0.308;
    the bf16-cache variant 0.343 -> 0.189), at the cost of coarser
    masked-tile skipping when the visible prefix is much shorter than the
    cache — hence the L-proportional cap (waste is bounded by one tile).
    """
    cap = 2048 if L >= 8192 else (1024 if L >= 2048 else 512)
    return next((c for c in (cap, 1024, 512, 256, 128) if c <= cap and L % c == 0), None)


def _pick_sqt(sq: int, g: int) -> Optional[int]:
    """Largest q-tile: whole sq when the row count is small (any row count is
    a legal full-dim block), else the largest divisor with rows_t % 8 == 0."""
    if sq * g <= MAX_ROWS:
        return sq
    for c in range(MAX_ROWS // g, 0, -1):
        if sq % c == 0 and (c * g) % 8 == 0:
            return c
    return None


def plan_cached_attention(
    hq: int, hkv: int, sq: int, L: int, d: int, elem_name: str
):
    """Static kernel-path oracle for the fused MX-KV-cache attention: the
    (lt, sqt) tiling for query shape (b, hq, sq, d) against a cache of
    capacity L, or None if that shape falls back to the dequantize path.
    Pure shape math — tests pin production shapes through this.
    """
    if elem_name not in dtypes.STR_TO_SUPPORTED_ELEM_DTYPE:
        return None
    if d % 128 != 0 or hq % hkv != 0:
        return None
    g = hq // hkv
    lt = _pick_lt(L)
    sqt = _pick_sqt(sq, g)
    if lt is None or sqt is None:
        return None
    return lt, sqt


def cached_attention_any(
    q, cache, q_off, kv_len, sm_scale, window=None, ring=False, softcap=None
) -> Optional[jax.Array]:
    """Fused causal attention over an MX-quantized KV cache.

    Args:
        q: (b, hq, sq, d) bf16 queries (RoPE applied).
        cache: an ``MXLayerKVCache``-shaped object (``k_data/k_scale/
            v_data/v_scale/elem_dtype_name/block_size``) holding the cache
            *after* the current tokens were written.
        q_off: first query position — scalar, or (b,) per-row positions
            (continuous batching; == cache_position).
        kv_len: visible prefix length(s) (== q_off + sq), same shape rules.
        sm_scale: softmax scale (1/sqrt(head_dim)).
        window: optional static sliding-window size (Mistral semantics —
            query at position p sees keys in (p - window, p]).  Served by
            the base and d-major kernels; the chunk-dot / int8-dot decode
            specializations pass when a window is set.
        ring: the cache is a rolling buffer (``MXLayerKVCache(ring=True)``):
            slots hold the last ``capacity`` positions; requires ``window``.

    Returns (b, hq, sq, d) bf16, or None if ineligible (caller falls back to
    the dequantize-the-cache path).
    """
    if not _use_fused():
        return None
    if ring and window is None:
        return None
    if softcap is not None:
        softcap = float(softcap)
    needed = ("k_data", "k_scale", "v_data", "v_scale", "elem_dtype_name", "block_size")
    if not all(hasattr(cache, f) for f in needed):
        return None
    if cache.block_size != BLOCK:
        return None
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[cache.elem_dtype_name]
    b, hq, sq, d = q.shape
    layout = getattr(cache, "layout", "seq")
    if layout == "dmajor":
        _, hkv, dp, L = cache.k_data.shape
    else:
        _, hkv, L, dp = cache.k_data.shape
    want_dp = d // 2 if elem == dtypes.float4_e2m1 else d  # fp4: d-halves bytes
    if dp != want_dp:
        return None
    plan = plan_cached_attention(hq, hkv, sq, L, d, cache.elem_dtype_name)
    if plan is None:
        return None
    lt, sqt = plan
    g = hq // hkv

    if layout == "dmajor":
        if window is None and not ring and softcap is None and use_int8dot(cache, sq, d):
            return _int8dot_attention(q, cache, q_off, kv_len, sm_scale, lt)
        q4 = (
            q.astype(jnp.bfloat16)
            .reshape(b, hkv, g, sq, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, hkv, sq * g, d)
        )
        q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
        out = _mx_cached_attention_dmajor(
            q4,
            cache.k_data,
            cache.k_scale,
            cache.v_data,
            cache.v_scale,
            q_off,
            kv_len,
            cache.elem_dtype_name,
            float(sm_scale),
            lt,
            g,
            sqt,
            window,
            ring,
            softcap,
        )
        return (
            out.reshape(b, hkv, sq, g, d).transpose(0, 1, 3, 2, 4).reshape(b, hq, sq, d)
        )

    if window is None and not ring and softcap is None and use_chunkdot(cache.elem_dtype_name, sq, d):
        return _chunkdot_attention(q, cache, q_off, kv_len, sm_scale, lt)

    # (b, hq, sq, d) -> (b, hkv, sq*g, d), rows ordered (q position, head).
    q4 = (
        q.astype(jnp.bfloat16)
        .reshape(b, hkv, g, sq, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, hkv, sq * g, d)
    )
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mx_cached_attention(
        q4,
        cache.k_data,
        cache.k_scale,
        cache.v_data,
        cache.v_scale,
        q_off,
        kv_len,
        cache.elem_dtype_name,
        float(sm_scale),
        lt,
        g,
        sqt,
        window,
        ring,
        softcap,
    )
    return (
        out.reshape(b, hkv, sq, g, d).transpose(0, 1, 3, 2, 4).reshape(b, hq, sq, d)
    )
