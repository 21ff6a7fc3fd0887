"""Fused absorbed-MLA attention over the (MX) latent cache (Pallas TPU).

DeepSeek-V3's Multi-head Latent Attention caches ONE compressed latent per
token (``kv_lora_rank`` + ``qk_rope_head_dim`` values).  The absorbed decode
form contracts queries directly against that latent:

    scores = q_lat . latent^T + q_rot . rot^T        (MQA: all heads share it)
    out    = softmax(scores) . latent                (V *is* the latent)

The eager path (``models/deepseek.py`` cached branch) dequantizes the ENTIRE
(b, L, r) latent buffer to bf16 in HBM every decode step and materializes
(b, n, sq, L) scores — the exact dequantize-the-whole-cache antipattern the
Llama cache kernel (``pallas_attention.py``) was built to kill (measured
8.6x there).  This kernel:

* reads packed MX codes + E8M0 scales and decodes latent tiles in VMEM;
* decodes each latent tile ONCE and feeds it to BOTH dots (it is K for the
  scores and V for the output) — strictly less decode work than any K/V
  cache, on top of the latent's ~8x capacity win;
* runs blockwise online-softmax with fp32 running max/sum/accumulator, rows
  = (query position, head) with all heads sharing the KV tiles (MQA
  folding, like the GQA group folding in ``_attn_kernel``);
* masks causally in-kernel from per-batch-row scalars (``q_off``,
  ``kv_len``) and skips dead KV tiles by predication — prefill through the
  cache and decode are the same kernel.

``elem_name="bfloat16"`` selects the no-decode variant serving the
high-precision :class:`~torchmx_tpu.models.deepseek.MLACache` through the
same blockwise structure (and doubling as the honest iso-kernel baseline
for the MX-latent speedup numbers).

fp4 latents are stored HALVES-PACKED (byte ``j`` holds elements
``(j, j + d/2)``; round 5) so the kernel reads each nibble plane as a
contiguous half and splits both contractions — the same d-halves treatment
that fixed fp4 K/V caches.  Widths must split into whole 32-blocks per
plane (% 64; DeepSeek-V3's r=512, dr=64 qualify).

``layout="dmajor"`` latent caches (features on sublanes, positions on
lanes) serve the all-int8 MXU-dot decode tier (:func:`use_mla_int8dot`,
opt-in via ``TORCHMX_ATTN_INT8_DOT``): raw int8 latent codes feed the MXU
directly — zero per-element decode work, the fix for the int8 latent
losing to the bf16 latent on pure latency (round-4 verdict item).

Reference anchor: the reference's KV-cache quantization TODO
(rain-neuromorphics/torchmx ``torchmx/layers/mx_llama_attention.py:176-183``)
— MLA + MX latent quantization is this framework's answer, and this kernel
is its decode path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from .backend import interpret as _interpret
from .. import env_variables as env
from .pallas_attention import (
    BLOCK,
    MAX_ROWS,
    NEG_INF,
    _decode_fp4_halves,
    _decode_tile,
    _pick_lt,
    _pick_sqt,
    _use_fused,
)


def _mla_kernel(
    qoff_ref,
    kvlen_ref,
    ql_ref,
    qr_ref,
    ld_ref,
    ls_ref,
    rd_ref,
    rs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    elem_name: str,
    sm_scale: float,
    g: int,
    sqt: int,
):
    bf16_cache = elem_name == "bfloat16"
    elem = None if bf16_cache else dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    qt = pl.program_id(1)
    kt = pl.program_id(2)
    rows, r = ql_ref.shape[1], ql_ref.shape[2]
    dr = qr_ref.shape[2]
    lt = ld_ref.shape[1]

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ib = pl.program_id(0)
    q_off = qoff_ref[ib]
    kv_len = kvlen_ref[ib]
    q_hi = q_off + (qt + 1) * sqt - 1
    work = (kt * lt <= q_hi) & (kt * lt < kv_len)

    fp4 = (not bf16_cache) and elem == dtypes.float4_e2m1

    @pl.when(work)
    def _():
        ql = ql_ref[0]  # (rows, r) bf16, rows ordered (si, hi)
        qr = qr_ref[0]  # (rows, dr)
        dn_qk = (((1,), (1,)), ((), ()))
        if bf16_cache:
            lat_f = ld_ref[0]  # (lt, r)
            rot_f = rd_ref[0]  # (lt, dr)
        elif fp4:
            # Halves-packed fp4 latent (round 5 — previously an eager
            # fallback): decode the two nibble planes once and split both
            # contractions, exactly the K/V-cache halves treatment.
            lat_hi, lat_lo = _decode_fp4_halves(ld_ref[0], ls_ref[0], r)
            rot_hi, rot_lo = _decode_fp4_halves(rd_ref[0], rs_ref[0], dr)
        else:
            lat_f = _decode_tile(ld_ref[0], ls_ref[0], elem, r)
            rot_f = _decode_tile(rd_ref[0], rs_ref[0], elem, dr)
        if fp4:
            s = (
                jax.lax.dot_general(
                    ql[:, : r // 2], lat_hi, dn_qk,
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    ql[:, r // 2 :], lat_lo, dn_qk,
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    qr[:, : dr // 2], rot_hi, dn_qk,
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    qr[:, dr // 2 :], rot_lo, dn_qk,
                    preferred_element_type=jnp.float32,
                )
            )
        else:
            s = jax.lax.dot_general(
                ql, lat_f, dn_qk, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                qr, rot_f, dn_qk, preferred_element_type=jnp.float32
            )
        s = s * sm_scale

        q_pos = q_off + qt * sqt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0) // g
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        # V is the SAME decoded latent tile — the second dot reuses it.
        dn_pv = (((1,), (0,)), ((), ()))
        p16 = p.astype(jnp.bfloat16)
        if fp4:
            pv = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        p16, lat_hi, dn_pv, preferred_element_type=jnp.float32
                    ),
                    jax.lax.dot_general(
                        p16, lat_lo, dn_pv, preferred_element_type=jnp.float32
                    ),
                ],
                axis=1,
            )  # (rows, r)
        else:
            pv = jax.lax.dot_general(
                p16, lat_f, dn_pv, preferred_element_type=jnp.float32
            )  # (rows, r)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(2) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("elem_name", "sm_scale", "lt", "g", "sqt")
)
def _mla_cached_attention(
    q_lat3, q_rot3, lat_data, lat_scale, rot_data, rot_scale, q_off, kv_len,
    elem_name, sm_scale, lt, g, sqt,
):
    b, rows, r = q_lat3.shape
    dr = q_rot3.shape[2]
    L = lat_data.shape[1]
    # Payload widths straight off the buffers: r / dr, or halved for
    # halves-packed fp4 (two codes per byte).
    rp, dp = lat_data.shape[2], rot_data.shape[2]
    nbr = r // BLOCK
    nbd = dr // BLOCK
    rows_t = sqt * g
    grid = (b, rows // rows_t, L // lt)
    kernel = functools.partial(
        _mla_kernel, elem_name=elem_name, sm_scale=sm_scale, g=g, sqt=sqt
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows_t, r), lambda ib, qt, kt: (ib, qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_t, dr), lambda ib, qt, kt: (ib, qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, rp), lambda ib, qt, kt: (ib, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, nbr), lambda ib, qt, kt: (ib, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, dp), lambda ib, qt, kt: (ib, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, nbd), lambda ib, qt, kt: (ib, kt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_t, r), lambda ib, qt, kt: (ib, qt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, r), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, 128), jnp.float32),
            pltpu.VMEM((rows_t, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, q_lat3, q_rot3, lat_data, lat_scale, rot_data, rot_scale)


def plan_mla_attention(n_heads: int, sq: int, L: int, r: int, dr: int,
                       elem_name: str):
    """Static kernel-path oracle (mirror of ``plan_cached_attention``): the
    (lt, sqt) tiling, or None when the shape falls back to the eager path.
    fp4 latents are eligible in the halves-packed layout (round 5; widths
    must split into whole 32-blocks per nibble plane, i.e. % 64)."""
    if elem_name != "bfloat16":
        if elem_name not in dtypes.STR_TO_SUPPORTED_ELEM_DTYPE:
            return None
        if dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name] == dtypes.float4_e2m1:
            if r % (2 * BLOCK) or dr % (2 * BLOCK):
                return None
        elif r % BLOCK or dr % BLOCK:
            return None
    lt = _pick_lt(L)
    sqt = _pick_sqt(sq, n_heads)
    if lt is None or sqt is None:
        return None
    return lt, sqt


def mla_cached_attention(
    q_lat, q_rot, cache, q_off, kv_len, sm_scale
) -> Optional[jax.Array]:
    """Fused absorbed-MLA attention over a latent cache.

    Args:
        q_lat: (b, n, sq, r) absorbed queries (``q_pass @ W_kb[K-half]``).
        q_rot: (b, n, sq, dr) rotary queries (RoPE applied).
        cache: an ``MXMLACache`` (packed codes + scales) or ``MLACache``
            (bf16 buffers) holding the cache *after* the current tokens were
            written.
        q_off: first query position — scalar or (b,) per-row (continuous
            batching; == cache_position).
        kv_len: visible prefix length(s) (== q_off + sq).
        sm_scale: attention scale (includes any YaRN mscale factor).

    Returns (b, n, sq, r) bf16 — ``softmax(q.latent^T).latent``, still to be
    folded through W_kb's V-half by the caller — or None if ineligible
    (caller falls back to the eager dequantize path).
    """
    if not _use_fused():
        return None
    b, n, sq, r = q_lat.shape
    dr = q_rot.shape[3]
    if hasattr(cache, "lat_data"):  # MXMLACache
        elem_name = cache.elem_dtype_name
        if cache.block_size != BLOCK:
            return None
        if getattr(cache, "layout", "seq") == "dmajor":
            # d-major latents serve the all-int8 MXU-dot decode kernel
            # only; other shapes fall back to the eager read() path.
            if use_mla_int8dot(cache, sq, r, dr):
                lt = _pick_lt(cache.lat_data.shape[2])
                if lt is None or n > MAX_ROWS:
                    return None
                return _mla_int8dot_attention(
                    q_lat, q_rot, cache, q_off, kv_len, sm_scale, lt
                )
            return None
        lat_data, lat_scale = cache.lat_data, cache.lat_scale
        rot_data, rot_scale = cache.rot_data, cache.rot_scale
        L = lat_data.shape[1]
        expect_r = r // 2 if elem_name == "float4_e2m1" else r
        expect_d = dr // 2 if elem_name == "float4_e2m1" else dr
        if lat_data.shape[2] != expect_r or rot_data.shape[2] != expect_d:
            return None  # unexpected payload packing
    elif hasattr(cache, "latent"):  # MLACache (bf16)
        elem_name = "bfloat16"
        lat_data = cache.latent.astype(jnp.bfloat16)
        rot_data = cache.k_rot.astype(jnp.bfloat16)
        L = lat_data.shape[1]
        lat_scale = jnp.zeros((b, L, max(r // BLOCK, 1)), jnp.uint8)
        rot_scale = jnp.zeros((b, L, max(dr // BLOCK, 1)), jnp.uint8)
    else:
        return None
    plan = plan_mla_attention(n, sq, L, r, dr, elem_name)
    if plan is None:
        return None
    lt, sqt = plan

    # (b, n, sq, x) -> (b, sq*n, x), rows ordered (q position, head).
    fold = lambda q: q.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(
        b, sq * n, q.shape[3]
    )
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mla_cached_attention(
        fold(q_lat), fold(q_rot), lat_data, lat_scale, rot_data, rot_scale,
        q_off, kv_len, elem_name, float(sm_scale), lt, g=n, sqt=sqt,
    )  # (b, sq*n, r)
    return out.reshape(b, sq, n, r).transpose(0, 2, 1, 3)


def _mla_kernel_int8dot(
    qoff_ref,
    kvlen_ref,
    ql_ref,
    qlsc_ref,
    qr_ref,
    qrsc_ref,
    ld_ref,
    ls_ref,
    rd_ref,
    rs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
):
    """Absorbed-MLA decode with int8 latent codes fed to the MXU RAW — the
    ``_attn_kernel_int8dot`` recipe on the shared latent, restructured
    around the d-major cache's PER-POSITION scales (one shared exponent
    per cached position over the whole latent vector; see ``MXMLACache``).

    Scales constant along both contractions collapse the chunked v1 form
    (r/32 = 16 batched 32-deep dots + three rescale passes over
    (16, rows, lt) planes — measured 0.138 ms, above the 0.122 ms bf16
    latent) into:

    * scores: ONE (rows, r) x (r, lt) int8 MXU dot with exact int32
      partials (r = 512: |sum| <= 512*127^2 << 2^31), rescaled by the
      rank-1 outer product of the per-row q scale (sm_scale pre-folded by
      the wrapper) and the per-position latent scale — 2 VPU passes over
      a single (rows, lt) plane;
    * P.V: the per-position latent scale folds into P (1 plane), P
      requantizes to 8-bit fixed point per row (~0.4% relative — above
      the fp8 the reference's QKV configs would apply), and ONE
      (rows, lt) x (lt, r) int8 dot accumulates exactly (lt <= 2048:
      |sum| <= 2048*127^2 << 2^31).

    The flat (rows, r) accumulator replaces v1's chunked one — no
    un-chunking in the wrapper.  Opt-in via ``TORCHMX_ATTN_INT8_DOT``;
    decode-only (sq == 1); rows = n query heads (MQA folding).
    """
    kt = pl.program_id(1)
    rows = ql_ref.shape[1]
    lt = ld_ref.shape[2]

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
        ql = ql_ref[0]   # (rows, r) int8
        lat = ld_ref[0]  # (r, lt) int8
        s_int = jax.lax.dot_general(
            ql, lat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (rows, lt) exact
        qr = qr_ref[0]   # (rows, dr) int8
        rot = rd_ref[0]  # (dr, lt) int8
        sr_int = jax.lax.dot_general(
            qr, rot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # Rank-1 rescale: per-row q scale (sm_scale folded in by the
        # wrapper) x per-position cache scale 2^(e-127).
        pk_l = jax.lax.bitcast_convert_type(
            ls_ref[0].astype(jnp.int32) << 23, jnp.float32
        )  # (1, lt)
        pk_r = jax.lax.bitcast_convert_type(
            rs_ref[0].astype(jnp.int32) << 23, jnp.float32
        )
        s = (
            s_int.astype(jnp.float32) * qlsc_ref[0] * pk_l
            + sr_int.astype(jnp.float32) * qrsc_ref[0] * pk_r
        )

        q_pos = q_hi + jnp.zeros((rows, lt), jnp.int32)
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (rows, lt)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        # V is the latent again: its per-position scale folds into P, which
        # requantizes to 8-bit fixed point per row.
        p3 = p * pk_l  # (rows, lt)
        mx = jnp.max(p3, axis=1, keepdims=True)
        mx = jnp.where(mx == 0.0, 1.0, mx)
        pq = jnp.round(p3 * (127.0 / mx)).astype(jnp.int8)
        pv = jax.lax.dot_general(
            pq, lat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (rows, r) exact
        acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) * (
            mx * (1.0 / 127.0)
        )
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("lt",))
def _mla_cached_attention_int8dot(
    ql, qlsc, qr, qrsc, lat_data, lat_scale, rot_data, rot_scale,
    q_off, kv_len, lt,
):
    b, rows, r = ql.shape
    dr = qr.shape[2]
    L = lat_data.shape[2]
    grid = (b, L // lt)
    return pl.pallas_call(
        _mla_kernel_int8dot,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, r), lambda ib, kt: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda ib, kt: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, dr), lambda ib, kt: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda ib, kt: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lt), lambda ib, kt: (ib, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt), lambda ib, kt: (ib, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dr, lt), lambda ib, kt: (ib, 0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt), lambda ib, kt: (ib, 0, kt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, r), lambda ib, kt: (ib, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, r), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_off, kv_len, ql, qlsc, qr, qrsc, lat_data, lat_scale, rot_data, rot_scale)


def use_mla_int8dot(cache, sq: int, r: int, dr: int) -> bool:
    """True when the all-int8 MXU-dot MLA decode kernel serves this shape:
    opt-in flag, int8 d-major latent cache, single query position,
    lane-multiple latent rank."""
    return (
        env.TORCHMX_ATTN_INT8_DOT == "1"
        and getattr(cache, "layout", "seq") == "dmajor"
        and cache.elem_dtype_name == "int8"
        and sq == 1
        and r % 128 == 0
        and dr % BLOCK == 0
    )


def _mla_int8dot_attention(q_lat, q_rot, cache, q_off, kv_len, sm_scale, lt):
    from ..mx_array import quantize_mx

    b, n, sq, r = q_lat.shape
    dr = q_rot.shape[3]
    # Quantize q_lat/q_rot to int8 with one shared exponent per ROW (block =
    # full width, mirroring the cache's per-position scales; ~34 dB — above
    # the 19 dB fp8 the reference's QKV configs would apply to q), and fold
    # sm_scale into the resulting f32 per-row scales.
    qls, qld = quantize_mx(
        q_lat.astype(jnp.bfloat16).reshape(b, n, r), "int8", r
    )  # (b, n, 1) u8, (b, n, r) i8
    qrs, qrd = quantize_mx(
        q_rot.astype(jnp.bfloat16).reshape(b, n, dr), "int8", dr
    )
    to_f32 = lambda e: jax.lax.bitcast_convert_type(
        e.astype(jnp.int32) << 23, jnp.float32
    )
    qlsc = to_f32(qls) * sm_scale  # (b, n, 1) f32
    qrsc = to_f32(qrs) * sm_scale
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _mla_cached_attention_int8dot(
        qld, qlsc, qrd, qrsc,
        cache.lat_data, cache.lat_scale, cache.rot_data, cache.rot_scale,
        q_off, kv_len, lt,
    )  # (b, n, r)
    return out[:, :, None, :]
