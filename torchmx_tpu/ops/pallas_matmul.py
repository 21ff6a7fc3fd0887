"""Pallas TPU fused dequant-matmul kernels.

The performance backend behind ``mx_linear`` / ``mx_matmul``
(``TORCHMX_QUANTIZE_BACKEND=pallas``).  The XLA simulation path materializes
the dequantized bf16 weights in HBM every call (2 bytes/element written and
re-read); these kernels keep the MX payload packed in HBM, decode tiles in
VMEM on the VPU while the MXU runs the matmuls, and accumulate in fp32
(replacing the Triton kernels the reference intended behind its custom ops,
``mx_tensor.py:146``).

**Weight layout is K-major** (contraction dim on sublanes): payload ``(K, N)``
with ``block_dim == 0``.  This makes the per-32-block scale broadcast a
sublane-dim reshape, which Mosaic lowers for free (a lane-dim reshape is
unsupported), and feeds the MXU untransposed.  ``MXInferenceLinear`` stores
its weights in this layout (an ``MXArray.T`` — one transpose at quantization
time).

Decode is pure integer bit-surgery — the E8M0 scale is folded into the bf16
exponent field, so dequantization costs no FP multiplies:

    normal element:     bf16_field = e + se - bias
    subnormal element:  bf16_field = p + se + 1 - bias - mb   (p = msb of m)

fp4 payloads stay nibble-packed in HBM: packing pairs neighbours along K, so
K-major bytes hold elements ``(2p, 2p+1)``; the wrapper splits ``x`` into
even/odd K-planes once per call and the kernel contracts the high- and
low-nibble planes separately (two half-K matmuls == one full-K matmul).

Preconditions (guaranteed for weights quantized from finite bf16): no NaN
(255) scales, and dequantized values in the bf16-normal range (below it the
kernel flushes to zero — which XLA arithmetic would flush anyway).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from .. import env_variables as env
from ..mx_array import MXArray

BLOCK = 32  # OCP MX block size; kernels assume block_size == 32

# Mosaic scoped-VMEM ceiling per kernel invocation (v5e has 128MB physical).
_VMEM_LIMIT = 64 * 1024 * 1024


from .backend import interpret as _interpret


# ---------------------------------------------------------------------------
# In-kernel decode: MX element codes + E8M0 scales -> bf16
# ---------------------------------------------------------------------------


def decode_codes_to_bf16(
    codes, se, elem_dtype: dtypes.DType, *, dot_operand: bool = False
):
    """Decode integer element codes to scaled bf16 values.

    Args:
        codes: int32 element codes (fp4: one nibble in the low 4 bits).
        se: int32 biased E8M0 exponents, broadcast to ``codes.shape``.
        elem_dtype: one of the supported fp element dtypes.
        dot_operand: the decoded values feed an MXU dot directly — skip the
            two contract details a contraction cannot observe: the signed
            zero of negative-zero codes (``x * -0`` never changes a dot
            result; only an all-(-0) column could, producing -0 vs +0) and
            the fp8 NaN code remap (the quantizer never emits NaN codes from
            finite inputs — same precondition as the no-NaN-scales rule).
            Saves ~6 of ~26 VPU ops/element; at decode batch sizes those ops
            are the token latency.

    Returns bf16 values ``decode(code) * 2^(se - 127)``, bit-identical to
    ``dequantize_mx`` for results in the bf16-normal range.

    Implicit-bit-subtraction scheme (~25% fewer VPU ops than normalizing
    element subnormals with an msb-select chain — at decode batch sizes the
    fused matmul is VPU-decode-bound, so these ops are the token latency):
    the element's exp/mantissa bits land in the bf16 field positions
    unchanged (``mag = code << (7 - mb)``), the scale folds into the
    exponent as ``fa = se - bias + (e == 0)``, and subnormal codes
    (``e == 0``) decode through the identity

        (1 + m/2^mb) * 2^F  -  1 * 2^F  =  (m/2^mb) * 2^F

    — one exact bf16 subtraction replaces the normalize/shift/mask chain,
    and the zero code falls out as ``2^F - 2^F`` for free.
    """
    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits
    bias = elem_dtype.exponent_bias

    sgn_hi = ((codes >> (mb + eb)) & 1) << 15
    mag = (codes & ((1 << (mb + eb)) - 1)) << (7 - mb)
    sub = mag < 0x80  # element exponent == 0
    fa = se - bias + sub
    fshift = fa << 7
    bits = mag + fshift
    # Flush sub-bf16-normal results: covers normal codes whose folded field
    # drops to <= 0 and subnormal codes with fa <= 0 in one comparison.
    dead = bits < 0x80
    bits = jnp.where(dead, 0, bits) | sgn_hi
    corr = jnp.where(sub & ~dead, fshift, 0) | sgn_hi
    f = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)
    c = jax.lax.bitcast_convert_type(corr.astype(jnp.uint16), jnp.bfloat16)
    if dot_operand:
        return f - c
    # Re-OR the sign: IEEE gives +0 for (-x) - (-x), but dequantize_mx (and
    # the reference quantizer's signed-zero-preserving contract) keep -0 for
    # negative zero codes; nonzero results already carry the right sign, so
    # the OR only resurrects signed zeros.
    r = jax.lax.bitcast_convert_type(
        (
            jax.lax.bitcast_convert_type(f - c, jnp.uint16).astype(jnp.int32) | sgn_hi
        ).astype(jnp.uint16),
        jnp.bfloat16,
    )
    if elem_dtype == dtypes.float8_e4m3:
        # S.1111.111 encodes NaN (the quantizer never emits it, but decode
        # must agree with dequantize_mx on every code).
        nan = jax.lax.bitcast_convert_type(
            jnp.full_like(codes, 0x7FC0).astype(jnp.uint16), jnp.bfloat16
        )
        r = jnp.where((codes & 0x7F) == 0x7F, nan, r)
    return r


def decode_fp4_to_bf16(nibbles, se):
    """Specialized fp4 (e2m1) decode — half the VPU ops of the generic path.

    The 8 magnitude codes map to bf16 bits by pure arithmetic:
    ``0x3EC0 + (c << 6) + (c >= 2 ? 0x40 : 0)`` covers 0.5..6 exactly (the
    subnormal c==1 is the only irregular step).  Bit-identical to
    :func:`decode_codes_to_bf16` for every (code, scale) pair (tested).
    At decode-time batch sizes the fused matmul is VPU-decode-bound, so
    these ops are the token latency.
    """
    c = nibbles & 7
    mag = 0x3EC0 + (c << 6) + ((c >= 2).astype(jnp.int32) << 6)
    bits = mag + ((se - 127) << 7)
    dead = (c == 0) | (bits < 0x80)
    bits = jnp.where(dead, 0, bits) | ((nibbles & 8) << 12)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)


def _i32c(v: int):
    """int32 constant from a u32 bit pattern (0x80008000 etc.)."""
    return jnp.int32(v if v < 2**31 else v - 2**32)


def decode_fp4_swar_planes(b, sa, sb):
    """SWAR fp4 decode: both nibbles of each halves-packed byte decode inside
    ONE i32 lane (two bf16 fields built simultaneously), roughly halving the
    per-element VPU ops of :func:`decode_fp4_to_bf16` — 0.146 ms vs 0.191 at
    the M=8 8B shape where those ops ARE the token latency (bf16: 0.160;
    tools/decode_lab.py).  Bit-identical to the two-plane
    ``decode_fp4_to_bf16`` path over every (code, scale) pair (tested
    exhaustively).

    Args:
        b: (rows, bn) int32 — halves-packed bytes (hi nibble: element p of
           the first K half, lo: element p + K/2).
        sa, sb: (rows // 32, bn) int32 — E8M0 scale rows of the two halves.

    Returns ``(w_hi, w_lo)`` bf16 planes.

    Scheme: gather both codes into half-words (``u``), build both BIASED
    bf16 fields at once — ``biased = field + 0xC0`` with the scale folded as
    ``se << 7`` (= ``0x3F80 + (se-127)<<7``, always >= 0 so no cross-half
    borrow) — and mask dead halves from a per-block minimum-alive-magnitude
    threshold: se >= 2 -> 1, se == 1 -> 2, se == 0 -> 4 (magnitudes below
    the threshold have field <= 0, i.e. flush-to-zero or garbage; at the
    threshold and above the field is a valid positive bf16).  The biased
    subtract never borrows: alive halves have ``biased >= 0x140``.
    """

    swfp = _expand_scale((sa << 23) | (sb << 7), BLOCK)
    thrp = _expand_scale((_fp4_thr(sa) << 16) | _fp4_thr(sb), BLOCK)
    return _fp4_swar_core(b, swfp, thrp)


def _fp4_thr(se):
    """Smallest ALIVE fp4 magnitude code per scale: below it the biased
    field is <= 0 (flush-to-zero or garbage); at and above it the field is
    a valid positive bf16 (se >= 2 -> 1, se == 1 -> 2, se == 0 -> 4)."""
    return jnp.where(se >= 2, 1, jnp.where(se == 1, 2, 4))


def _fp4_swar_core(b, swfp, thrp):
    """SWAR fp4 decode core on PRE-EXPANDED packed words (one per byte):
    ``swfp = (sa << 23) | (sb << 7)``, ``thrp = (thr_a << 16) | thr_b``.
    Callers with sublane-dim blocks expand via ``_expand_scale`` (free);
    the attention kernel's lane-dim blocks expand via its MXU-dot broadcast.
    """
    u = ((b << 12) | b) & 0x000F000F
    m = u & 0x00070007
    sgn = (u & 0x00080008) << 12
    step = ((m >> 1) | (m >> 2)) & 0x00010001
    biased = ((m + step) << 6) + swfp
    g = ((m | _i32c(0x80008000)) - thrp) & _i32c(0x80008000)
    mask = ((g >> 15) & 0x00010001) * 0xFFFF
    bits = ((biased & mask) - (0x00C000C0 & mask)) | sgn
    w_hi = jax.lax.bitcast_convert_type((bits >> 16).astype(jnp.uint16), jnp.bfloat16)
    w_lo = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)
    return w_hi, w_lo


def decode_fp8_swar_planes(b, sa, sb):
    """SWAR fp8_e4m3 decode: both codes of each halves-packed u16 word decode
    inside ONE i32 lane (two bf16 fields built simultaneously) — the decode
    chain runs on arrays of HALF the lanes of the flat 1-byte kernel's
    generic ``decode_codes_to_bf16`` (~19 vector ops on full-size arrays),
    which at decode M is the token latency.

    Args:
        b: (rows, bn) int32 — halves-packed words (bits [15:8]: the code of
           element p of the first K half; [7:0]: element p + K/2).
        sa, sb: (rows // 32, bn) int32 — E8M0 scale rows of the two halves.

    Returns ``(w_hi, w_lo)`` bf16 planes, bit-identical to the scalar
    ``decode_codes_to_bf16(..., dot_operand=True)`` on every (code, scale)
    pair with ``scale >= 10`` (tested exhaustively).

    Scheme: spread both codes to 16-bit fields, place exp/mantissa at the
    bf16 positions (``mag = (code & 0x7F) << 4``), fold the scale in BIASED
    form (``biased = mag + (se + subnormal) << 7``, always >= 0 so no
    cross-half borrow), then one packed subtract of the 0x380 bias.
    Subnormal codes (element exponent 0) decode through the same
    implicit-bit identity as the scalar path — ``(1 + m/8)·2^F - 2^F`` —
    with the correction word built by masking the mantissa nibble off the
    packed bits, and ONE bf16 subtract per extracted plane.

    Preconditions (enforced at pack time, ``MXArray.to_fp8_halves``): every
    scale >= 10, so no decoded value can fall below the bf16-normal range —
    the dead-lane masking (6+ packed ops) is dropped entirely, and
    ``biased - 0x380`` can never borrow (``biased >= 0x580``).  The fp8 NaN
    code follows the ``dot_operand`` contract (the quantizer never emits
    it).  Zero codes fall out exact: ``2^F - 2^F = 0``.
    """
    swp = _expand_scale((sa << 23) | (sb << 7), BLOCK)
    u = ((b << 8) | b) & _i32c(0x00FF00FF)
    mag = (u & 0x007F007F) << 4
    sgn = (u & _i32c(0x00800080)) << 8
    # Per-field "element exponent nonzero" flag without a packed compare:
    # field exp bits live at [10:7]; (mag | 0x800) - 0x80 leaves bit 11 set
    # iff the field's mag >= 0x80 (no cross-field borrow: results >= 0x780).
    d = (mag | _i32c(0x08000800)) - _i32c(0x00800080)
    nzb = (d >> 11) & 0x00010001
    subb = 0x00010001 - nzb
    biased = (mag + swp) + (subb << 7)
    bits0 = biased - _i32c(0x03800380)
    # Subnormal correction: exponent-only field (mantissa nibble < 0x80
    # masks off cleanly), zero for normal halves.
    corr = (bits0 & (subb * 0xFF80)) | sgn
    bits = bits0 | sgn
    f_hi = jax.lax.bitcast_convert_type((bits >> 16).astype(jnp.uint16), jnp.bfloat16)
    f_lo = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)
    c_hi = jax.lax.bitcast_convert_type((corr >> 16).astype(jnp.uint16), jnp.bfloat16)
    c_lo = jax.lax.bitcast_convert_type(corr.astype(jnp.uint16), jnp.bfloat16)
    return f_hi - c_hi, f_lo - c_lo


def decode_int8_to_bf16(codes, se):
    """int8 codes: convert and fold 2^(se-127) into the exponent field."""
    vals = codes.astype(jnp.bfloat16)  # exact: |codes| <= 127
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint16).astype(jnp.int32)
    nonzero = codes != 0
    bits = jnp.where(nonzero, bits + ((se - 127) << 7), 0)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)


def _fq_xT_tile(xT, elem_name: str):
    """Fake-quantize a transposed (bk, M) activation tile in VMEM.

    The matmul-kernel prologue for dynamic activation quantization: fusing it
    here removes the separate fake-quantize pass's HBM round trip over ``x``.
    The wrapper hands the kernel ``x.T`` so the MX blocks (along K) land on
    SUBLANES, where the per-32-block reduce/broadcast are free reshapes — no
    in-kernel transposes (measured 2-3x slower than this on v5e) — and the
    MXU consumes the transposed operand directly (``_DN_T``).
    """
    from .pallas_quantize import (
        _block_scale_sublane,
        _fq_magic_cast,
        _unpack_bf16_fields,
    )

    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    _, exponent, _ = _unpack_bf16_fields(xT)
    _, se_full = _block_scale_sublane(exponent, elem.max_pow2)
    return _fq_magic_cast(xT, se_full, elem)


def _fq_xT_pair(xeT, xoT, elem_name: str):
    """Fake-quantize transposed even/odd K-plane tiles with their *joint*
    block scale.

    The fp4 "pair" packing splits ``x`` into even/odd K-planes before the
    kernel, so each original 32-element MX block contributes 16 elements to
    each plane; the shared exponent must be the max over both halves.
    """
    from .pallas_quantize import _fq_magic_cast, _unpack_bf16_fields

    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    _, ee, _ = _unpack_bf16_fields(xeT)
    _, eo, _ = _unpack_bf16_fields(xoT)
    bkp, m = ee.shape
    nb = bkp // (BLOCK // 2)
    emax = jnp.maximum(
        jnp.max(ee.reshape(nb, BLOCK // 2, m), axis=1),
        jnp.max(eo.reshape(nb, BLOCK // 2, m), axis=1),
    )
    se = jnp.clip(emax - elem.max_pow2, 0, 254)
    se = jnp.where(emax == 255, 255, se)
    se_full = jnp.broadcast_to(se[:, None, :], (nb, BLOCK // 2, m)).reshape(bkp, m)
    return _fq_magic_cast(xeT, se_full, elem), _fq_magic_cast(xoT, se_full, elem)


def _expand_scale(se, factor):
    """(nb, bn) -> (nb*factor, bn): broadcast each scale over its K-block.

    A sublane-dim broadcast+reshape — free under Mosaic (the lane-dim variant
    is an unsupported shape cast).
    """
    nb, bn = se.shape
    return jnp.broadcast_to(se[:, None, :], (nb, factor, bn)).reshape(nb * factor, bn)


def _cache_x_tiles(k, act_fq: Optional[str], *pairs):
    """Store x tiles into their VMEM caches on the j == 0 sweep.

    On the first output-column sweep the true x tiles stream from HBM (the
    BlockSpec index maps pin j > 0 sweeps to tile 0, so Pallas never
    re-DMAs them), get fake-quantized in VMEM if ``act_fq`` is set
    (transpose -> sublane-block fq -> transpose back: the same two
    transposes the standalone fake-quantize kernel performs, minus its HBM
    round trip and dispatch), and land in their ``(nk, M, bk)`` scratches.
    Later sweeps read the scratch.  Cuts x HBM traffic from
    ``(N/bn) * M*K`` to ``M*K`` and absorbs the activation-quantize pass.

    Scheduling matters: this must be ONE conditional region at the TOP of
    the kernel body, before the weight decode — emitting the stores after
    the decode (or one region per tile) costs ~40% E2E on v5e, as Mosaic
    then fails to overlap the stores with the MXU dots.  Kernels read the
    cached tiles back AFTER the decode (``xs_ref[k]``), not from this
    function's return, for the same reason.
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        for x_ref, xs_ref in pairs:
            t = x_ref[:]
            if act_fq is not None:
                t = _fq_xT_tile(t.T, act_fq).T
            xs_ref[k] = t


def _cache_x_tiles_pipelined(k, nk, act_fq, *triples):
    """Software-pipelined j == 0 fq+store: quantize tile ``k+1`` while the
    MXU dots cached tile ``k``.

    :func:`_cache_x_tiles` creates a same-step dependence fq(k) → dot(k), so
    Mosaic cannot overlap the fq VPU work with the MXU (measured: the fused
    fq costs its full standalone time on top of the matmul).  Here each
    triple is ``(x0_ref, xn_ref, xs_ref)`` where ``xn_ref``'s index map
    fetches x tile ``min(k+1, nk-1)`` (:func:`_pin_pipelined`) and
    ``x0_ref`` is pinned to tile 0: step k quantizes tile k+1 into
    ``xs_ref[k+1]`` — independent of the dot on ``xs_ref[k]`` written last
    step — and the k == 0 prologue fills tile 0 (the only serial fq left).
    The last step re-quantizes tile nk-1 with identical bits (harmless; it
    keeps the dot outside any ``pl.when``, which is catastrophic for
    scheduling).  Accumulation order is unchanged → bit-identical output.
    """
    j = pl.program_id(0)

    @pl.when((j == 0) & (k == 0))
    def _():
        for x0_ref, _xn_ref, xs_ref in triples:
            t = x0_ref[:]
            if act_fq is not None:
                t = _fq_xT_tile(t.T, act_fq).T
            xs_ref[0] = t

    @pl.when(j == 0)
    def _():
        nxt = jnp.minimum(k + 1, nk - 1)
        for _x0_ref, xn_ref, xs_ref in triples:
            t = xn_ref[:]
            if act_fq is not None:
                t = _fq_xT_tile(t.T, act_fq).T
            xs_ref[nxt] = t


# ---------------------------------------------------------------------------
# Fused kernels (grid (j, k), k innermost; fp32 accumulator scratch)
# ---------------------------------------------------------------------------

_DN = (((1,), (0,)), ((), ()))  # x (M, bk) @ w (bk, bn)
_DN_T = (((0,), (0,)), ((), ()))  # xT (bk, M) contracted with w (bk, bn)


def _dot_f32acc(a, b, dn=None):
    """bf16 x bf16 -> f32 dot; interpret mode upcasts (CPU XLA has no
    bf16-in/f32-out dot thunk; f32 products of bf16 values are identical)."""
    if _interpret():
        a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, dn or _DN, preferred_element_type=jnp.float32)


def _linear_kernel_1byte(
    x_ref,
    *rest,
    elem_name: str,
    act_fq: Optional[str],
    x_cache: bool = False,
    pipe_fq: bool = False,
):
    """One-byte-per-code formats (fp8/fp6/int8), K-major weights.

    With ``act_fq`` (and no ``x_cache``), ``x_ref`` holds a TRANSPOSED
    (bk, M) tile: the fq runs in the cheap sublane layout and the MXU
    contracts the transposed operand directly.  With ``x_cache`` x tiles
    live in a VMEM scratch after the first sweep (see :func:`_cache_x_tiles`);
    with ``pipe_fq`` the j == 0 fill runs one tile ahead of the dots
    (:func:`_cache_x_tiles_pipelined`; extra input: the pinned tile-0 ref).
    """
    if pipe_fq:
        x0_ref, w_ref, s_ref, o_ref, acc_ref, *scratch = rest
    else:
        x0_ref = None
        w_ref, s_ref, o_ref, acc_ref, *scratch = rest
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if pipe_fq:
        _cache_x_tiles_pipelined(
            k, pl.num_programs(1), act_fq, (x0_ref, x_ref, scratch[0])
        )
    elif x_cache:
        _cache_x_tiles(k, act_fq, (x_ref, scratch[0]))
    codes = w_ref[:].astype(jnp.int32)
    se = _expand_scale(s_ref[:].astype(jnp.int32), BLOCK)
    if elem_name == "int8":
        w = decode_int8_to_bf16(codes, se)
    else:
        w = decode_codes_to_bf16(
            codes, se, dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name], dot_operand=True
        )
    if x_cache:
        acc_ref[:] += _dot_f32acc(scratch[0][k], w)
    elif act_fq is None:
        acc_ref[:] += _dot_f32acc(x_ref[:], w)
    else:
        acc_ref[:] += _dot_f32acc(_fq_xT_tile(x_ref[:], act_fq), w, _DN_T)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _linear_kernel_fp4(
    xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_ref, *, act_fq: Optional[str]
):
    """fp4 reference ("pair") packing: bytes (K/2, N); hi nibble = even-k,
    lo nibble = odd-k; x arrives pre-split into even/odd K-planes
    (transposed to (bkp, M) when ``act_fq`` is set — see
    ``_linear_kernel_1byte``)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[:].astype(jnp.int32)
    # One byte covers two elements of the same 32-block: 16 byte-rows/block.
    se = _expand_scale(s_ref[:].astype(jnp.int32), BLOCK // 2)
    w_hi = decode_fp4_to_bf16((b >> 4) & 0xF, se)
    w_lo = decode_fp4_to_bf16(b & 0xF, se)
    if act_fq is None:
        acc_ref[:] += _dot_f32acc(xe_ref[:], w_hi)
        acc_ref[:] += _dot_f32acc(xo_ref[:], w_lo)
    else:
        xeT, xoT = _fq_xT_pair(xe_ref[:], xo_ref[:], act_fq)
        acc_ref[:] += _dot_f32acc(xeT, w_hi, _DN_T)
        acc_ref[:] += _dot_f32acc(xoT, w_lo, _DN_T)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _linear_kernel_fp4_halves(
    xa_ref,
    xb_ref,
    *rest,
    act_fq: Optional[str],
    x_cache: bool = False,
    pipe_fq: bool = False,
    elem_name: str = "float4_e2m1",
):
    """fp4/fp8 "halves" packing: word p holds elements (p, p + K/2) —
    nibbles of one byte for fp4, bytes of one u16 for fp8; either way both
    elements SWAR-decode inside one i32 lane.

    The two nibble planes decode against their own scale rows and concatenate
    on sublanes into one (bk, bn) operand, so the MXU runs a single full-K
    tile dot and x is read as two contiguous half-tiles straight from HBM
    (no XLA slicing, no strided loads) — ~8% faster than the pair layout.
    With ``act_fq`` the x half-tiles arrive transposed ((bkp, M)); halves are
    contiguous K ranges, so each fq's its own blocks (see
    ``_linear_kernel_1byte``).  ``pipe_fq``: pipelined j == 0 fill, extra
    pinned tile-0 refs (:func:`_cache_x_tiles_pipelined`)."""
    if pipe_fq:
        xa0_ref, xb0_ref, w_ref, sa_ref, sb_ref, o_ref, acc_ref, *scratch = rest
    else:
        w_ref, sa_ref, sb_ref, o_ref, acc_ref, *scratch = rest
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if pipe_fq:
        _cache_x_tiles_pipelined(
            k, pl.num_programs(1), act_fq,
            (xa0_ref, xa_ref, scratch[0]), (xb0_ref, xb_ref, scratch[1]),
        )
    elif x_cache:
        _cache_x_tiles(k, act_fq, (xa_ref, scratch[0]), (xb_ref, scratch[1]))
    b = w_ref[:].astype(jnp.int32)
    decode = (
        decode_fp4_swar_planes if elem_name == "float4_e2m1"
        else decode_fp8_swar_planes
    )
    w_hi, w_lo = decode(
        b, sa_ref[:].astype(jnp.int32), sb_ref[:].astype(jnp.int32)
    )
    w = jnp.concatenate([w_hi, w_lo], axis=0)
    if x_cache:
        x = jnp.concatenate([scratch[0][k], scratch[1][k]], axis=1)
        acc_ref[:] += _dot_f32acc(x, w)
    elif act_fq is None:
        x = jnp.concatenate([xa_ref[:], xb_ref[:]], axis=1)
        acc_ref[:] += _dot_f32acc(x, w)
    else:
        xT = jnp.concatenate(
            [_fq_xT_tile(xa_ref[:], act_fq), _fq_xT_tile(xb_ref[:], act_fq)], axis=0
        )
        acc_ref[:] += _dot_f32acc(xT, w, _DN_T)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _linear_kernel_fp6q(
    xa_ref, xb_ref, xc_ref, xd_ref, *rest,
    elem_name: str, act_fq: Optional[str], x_cache: bool = False,
    pipe_fq: bool = False,
):
    """fp6 "quarters" packing: 4 elements per 3 HBM bytes, planar.

    Three byte-planes (each bk/4 rows per tile) reconstruct four 6-bit code
    quarters with pure shifts/ors on contiguous sublane ranges — no
    interleave — then concatenate on sublanes into one (bk, bn) operand for
    a single full-K tile dot.  25% less weight HBM than the 1-byte fp6
    layout, which is what makes MXFP6 cheaper than MXFP8 at decode (the
    kernel is weight-bandwidth-bound there).  ``pipe_fq``: pipelined j == 0
    fill, extra pinned tile-0 refs (:func:`_cache_x_tiles_pipelined`).
    """
    if pipe_fq:
        (xa0_ref, xb0_ref, xc0_ref, xd0_ref, p0_ref, p1_ref, p2_ref,
         s0_ref, s1_ref, s2_ref, s3_ref, o_ref, acc_ref, *scratch) = rest
    else:
        (p0_ref, p1_ref, p2_ref,
         s0_ref, s1_ref, s2_ref, s3_ref, o_ref, acc_ref, *scratch) = rest
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if pipe_fq:
        _cache_x_tiles_pipelined(
            k, pl.num_programs(1), act_fq,
            (xa0_ref, xa_ref, scratch[0]), (xb0_ref, xb_ref, scratch[1]),
            (xc0_ref, xc_ref, scratch[2]), (xd0_ref, xd_ref, scratch[3]),
        )
    elif x_cache:
        _cache_x_tiles(
            k, act_fq, *zip((xa_ref, xb_ref, xc_ref, xd_ref), scratch)
        )
    p0 = p0_ref[:].astype(jnp.int32)
    p1 = p1_ref[:].astype(jnp.int32)
    p2 = p2_ref[:].astype(jnp.int32)
    q0 = p0 >> 2
    q1 = p1 >> 2
    q2 = p2 >> 2
    q3 = ((p0 & 3) << 4) | ((p1 & 3) << 2) | (p2 & 3)
    w = jnp.concatenate(
        [
            decode_codes_to_bf16(
                q, _expand_scale(s_ref[:].astype(jnp.int32), BLOCK), elem,
                dot_operand=True,
            )
            for q, s_ref in ((q0, s0_ref), (q1, s1_ref), (q2, s2_ref), (q3, s3_ref))
        ],
        axis=0,
    )
    x_refs = (xa_ref, xb_ref, xc_ref, xd_ref)
    if x_cache:
        x = jnp.concatenate([xs[k] for xs in scratch], axis=1)
        acc_ref[:] += _dot_f32acc(x, w)
    elif act_fq is None:
        x = jnp.concatenate([r[:] for r in x_refs], axis=1)
        acc_ref[:] += _dot_f32acc(x, w)
    else:
        # Quarters are contiguous K ranges: each fq's its own blocks.
        xT = jnp.concatenate([_fq_xT_tile(r[:], act_fq) for r in x_refs], axis=0)
        acc_ref[:] += _dot_f32acc(xT, w, _DN_T)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "elem_name", "bn", "bk", "out_dtype", "act_fq", "x_cache", "pipe_fq",
    ),
)
def _pallas_matmul_fp6q(
    x, w_data, w_scale, elem_name, bn, bk, out_dtype, act_fq=None, x_cache=False,
    pipe_fq=False,
):
    M, K = x.shape
    N = w_data.shape[1]
    bkq = bk // 4
    nq = (K // 4) // bkq  # quarter offset, in bkq-sized tiles
    grid = (N // bn, K // bk)
    scratch = [pltpu.VMEM((M, bn), jnp.float32)]
    if x_cache:
        pin = _pin_pipelined if pipe_fq else _pin_after_first_sweep

        def xq_spec(qi):
            return pl.BlockSpec(
                (M, bkq), pin(nq, qi * nq), memory_space=pltpu.VMEM
            )

        def xq0_spec(qi):
            return pl.BlockSpec(
                (M, bkq), lambda j, k, qi=qi: (0, qi * nq), memory_space=pltpu.VMEM
            )

        scratch += [pltpu.VMEM((K // bk, M, bkq), jnp.bfloat16)] * 4
    elif act_fq is None:
        def xq_spec(qi):
            return pl.BlockSpec(
                (M, bkq), lambda j, k, qi=qi: (0, k + qi * nq), memory_space=pltpu.VMEM
            )
    else:
        x = x.T  # (K, M)
        def xq_spec(qi):
            return pl.BlockSpec(
                (bkq, M), lambda j, k, qi=qi: (k + qi * nq, 0), memory_space=pltpu.VMEM
            )

    def plane_spec(pi):
        return pl.BlockSpec(
            (bkq, bn), lambda j, k, pi=pi: (k + pi * nq, j), memory_space=pltpu.VMEM
        )

    def scale_spec(qi):
        return pl.BlockSpec(
            (bkq // BLOCK, bn),
            lambda j, k, qi=qi: (k + qi * nq, j),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _linear_kernel_fp6q, elem_name=elem_name, act_fq=act_fq, x_cache=x_cache,
        pipe_fq=pipe_fq,
    )
    x_args = (x, x, x, x) if pipe_fq else ()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xq_spec(i) for i in range(4)]
        + ([xq0_spec(i) for i in range(4)] if pipe_fq else [])
        + [plane_spec(i) for i in range(3)]
        + [scale_spec(i) for i in range(4)],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary" if x_cache else "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + N * K * 3 // 4 + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, x, x, x, *x_args, w_data, w_data, w_data, w_scale, w_scale, w_scale, w_scale)


# ---------------------------------------------------------------------------
# int8-domain decode path: feed the MXU int8 codes DIRECTLY (v5e native int8
# matmul) and rescale the per-32-block integer partial sums in f32.
# ---------------------------------------------------------------------------


def _int8dot_kernel(xcT_ref, sxT_ref, w_ref, sw_ref, o_ref, acc_ref, *,
                    fp8: bool = False):
    """MXINT8 x MXINT8 fused matmul with native int8 MXU dots — or, with
    ``fp8=True`` (round 5, ``TORCHMX_FP8_DOT``), MXFP8 x MXFP8 with native
    **f8e4m3 MXU dots**: both code tiles bitcast u8 -> float8_e4m3fn and
    feed the MXU raw (this TPU generation consumes e4m3 operands natively —
    probed via HLO: no convert before the convolution).  Every e4m3xe4m3
    product is exact in f32 (<= 8 significand bits); the 32-deep MXU sum
    accumulates in f32, so block partials match the dequantize reference
    within f32 rounding instead of int8's bit-exactness — the same
    "per-block grouping" numerics contract, one rounding class wider.

    Decode-M rewrite (round 3): instead of decoding every weight byte to bf16
    on the VPU (~10 ops/element — the token latency at decode sizes), the
    packed codes go to the MXU as int8 and only the (nb, M, bn) block partial
    sums are rescaled: ``sum_b 2^(sx[b,m]+sw[b,n]-254) * dot32(xc, wc)``.
    Per-weight-element VPU work drops to ~3*M/32 ops (M=8: ~0.75), taking the
    M=8 8B-shape matmul from 0.115 ms to ~0.107 ms vs a 0.072 ms HBM floor
    (bf16: 0.156 ms; fp8 bit-surgery: 0.324 ms) — measured in
    tools/decode_lab.py.

    Numerics: every 32-block partial sum is EXACT (integer products, |sum| <
    2^19, and the power-of-two rescale is an exact f32 multiply); only the
    cross-block f32 accumulation order differs from the dequantize-then-dot
    reference, so results match within f32 reordering tolerance (the
    per-block grouping is at least as accurate).  Preconditions: no NaN (255)
    scales on either side — quantizing finite bf16 guarantees this.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, m = xcT_ref.shape
    bn = w_ref.shape[1]
    nb = bk // BLOCK
    xt, wt = xcT_ref[:], w_ref[:]
    if fp8:
        xt = jax.lax.bitcast_convert_type(xt, jnp.float8_e4m3fn)
        wt = jax.lax.bitcast_convert_type(wt, jnp.float8_e4m3fn)
    x3 = xt.reshape(nb, BLOCK, m)
    w3 = wt.reshape(nb, BLOCK, bn)
    dots = jax.lax.dot_general(
        x3, w3, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32 if fp8 else jnp.int32,
    )  # (nb, m, bn) block sums: exact int32, or f32 of exact products
    ex = sxT_ref[:].astype(jnp.int32)  # (nb, m)
    ew = sw_ref[:].astype(jnp.int32)  # (nb, bn)
    # Factored rescale: 2^(ex+ew-254) = 2^(ex-127) * 2^(ew-127), each factor
    # built as f32 exponent bits on its SMALL native shape — the clipped
    # exponent-sum construction on full (nb, m, bn) lanes was ~3 extra VPU
    # ops per weight element, the token latency at decode M.  Exact for
    # scales >= 1 on both sides: |dots| < 2^19 keeps every intermediate in
    # f32 normal range (px >= 2^-126 so dots*px never flushes).
    # DOCUMENTED DEVIATIONS from the old clipped exponent-sum (all outside
    # realistic NN magnitudes; quantizing finite bf16 with int8's max_pow2=6
    # yields scale 0 only for a block whose amax < 2^-120):
    # * scale byte 0 here means factor +0.0 (the old form computed e.g.
    #   ex=0, ew=200 exactly as 2^-181->clamped); that block's contribution
    #   flushes to +0 even when the OTHER side's scale is huge — and if the
    #   other factor overflowed to inf, inf*0 -> NaN poisons the tile
    #   (unreachable: an inf factor needs ew > 381, but E8M0 <= 254).
    # * a final product overflow yields inf where the old form clamped to
    #   2^127 (again needs ex+ew > 381: impossible for E8M0 pairs).
    px = jax.lax.bitcast_convert_type(ex << 23, jnp.float32)
    pw = jax.lax.bitcast_convert_type(ew << 23, jnp.float32)
    acc_ref[:] += jnp.sum(
        dots.astype(jnp.float32) * px[:, :, None] * pw[:, None, :], axis=0
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "out_dtype", "fp8"))
def _pallas_matmul_int8dot(xcT, sxT, w_codes, w_scale, bn, bk, out_dtype,
                           fp8=False):
    K, M = xcT.shape
    N = w_codes.shape[1]
    grid = (N // bn, K // bk)
    return pl.pallas_call(
        functools.partial(_int8dot_kernel, fp8=fp8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + N * K + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xcT, sxT, w_codes, w_scale)


# The int8-dot path wins while the per-block rescale (3*M/32 VPU ops per
# weight element) stays below the ~10-op bf16 decode it replaces; above this
# M the regular 1-byte kernel (MXU-bound there) takes over.
_INT8DOT_MAX_M = 256


def plan_int8dot(M: int, N: int, K: int):
    """(bn, bk) for the int8-dot decode kernel, or None if the shape falls
    back to the regular kernels (M too large, or no legal tiling)."""
    if M % 8 != 0 or M > _INT8DOT_MAX_M:
        return None
    return _pick_tiles(M, N, K, w_bytes=1.0)


def int8dot_any(x_hp, w: MXArray, out_dtype) -> Optional[jax.Array]:
    """int8-dot path for ``mx_dynamic_matmul`` with int8 activations and
    int8(-domain) kernel-layout weights.  ``x_hp`` is the raw bf16 activation;
    it is quantized to MXINT8 here (same values as the fused act-fq path —
    only the cross-block accumulation grouping differs, see
    :func:`_int8dot_kernel`).  Returns None if ineligible.
    """
    if not isinstance(w, MXArray) or w.elem_dtype != dtypes.int8:
        return None
    if not _is_kernel_layout(w):
        return None
    if x_hp.ndim < 2:
        return None
    lead = x_hp.shape[:-1]
    K = x_hp.shape[-1]
    N = w.shape[1]
    M = int(math.prod(lead)) if lead else 1
    plan = plan_int8dot(M + (8 - M % 8) % 8, N, K)
    if plan is None:
        return None
    bn, bk = plan
    from ..mx_array import quantize_mx

    x2 = x_hp.astype(jnp.bfloat16).reshape(M, K)
    pad_m = (8 - M % 8) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    sx, xc = quantize_mx(x2, "int8", BLOCK)
    out = _pallas_matmul_int8dot(xc.T, sx.T, w.data, w.scale_e8m0, bn, bk, out_dtype)
    if pad_m:
        out = out[:M]
    return out.reshape(*lead, N)


def fp8dot_any(x_hp, w: MXArray, out_dtype) -> Optional[jax.Array]:
    """fp8-dot path for ``mx_dynamic_matmul`` with fp8 activations and FLAT
    (1 byte/code, K-major) fp8_e4m3 weights: raw e4m3 codes into the MXU
    (``TORCHMX_FP8_DOT``).  ``x_hp`` is the raw bf16 activation; it is
    quantized to MXFP8 codes here (same values as the fused act-fq path —
    the cross-block accumulation grouping and the f32 32-deep sums differ,
    see :func:`_int8dot_kernel` with ``fp8=True``).  Returns None if
    ineligible."""
    if not isinstance(w, MXArray) or w.elem_dtype != dtypes.float8_e4m3:
        return None
    if w.fp4_pack != "pair":  # halves-packed u16 words don't feed the MXU raw
        return None
    if not _is_kernel_layout(w):
        return None
    if x_hp.ndim < 2:
        return None
    lead = x_hp.shape[:-1]
    K = x_hp.shape[-1]
    N = w.shape[1]
    M = int(math.prod(lead)) if lead else 1
    plan = plan_int8dot(M + (8 - M % 8) % 8, N, K)
    if plan is None:
        return None
    bn, bk = plan
    from ..mx_array import quantize_mx

    x2 = x_hp.astype(jnp.bfloat16).reshape(M, K)
    pad_m = (8 - M % 8) % 8
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    sx, xc = quantize_mx(x2, "float8_e4m3", BLOCK)
    out = _pallas_matmul_int8dot(
        xc.T, sx.T, w.data, w.scale_e8m0, bn, bk, out_dtype, fp8=True
    )
    if pad_m:
        out = out[:M]
    return out.reshape(*lead, N)


def _is_kernel_layout(w: MXArray) -> bool:
    """K-major 2-D MXArray: payload (K, N), blocked dim first, unpadded."""
    return (
        w.data.ndim == 2
        and w.block_dim == 0
        and w.padding == 0
        and w.block_size == BLOCK
    )


def _pin_after_first_sweep(nk: int, offset: int = 0):
    """Index map streaming the true k-tile on the j == 0 sweep and pinning
    later sweeps to the LAST streamed tile — every j > 0 step then has the
    same block index as the step before it, so Pallas never issues another
    DMA (pinning to tile 0 would re-DMA one dead tile per operand per
    sweep at the j-transition) — the kernel reads the VMEM cache instead."""
    return lambda j, k: (0, jnp.where(j == 0, k, nk - 1) + offset)


def _pin_pipelined(nk: int, offset: int = 0):
    """Index map for the pipelined x-cache fill: the j == 0 sweep streams
    tile ``min(k+1, nk-1)`` (one tile AHEAD of the dot, see
    :func:`_cache_x_tiles_pipelined`); later sweeps stay pinned at the last
    streamed index so Pallas never re-DMAs."""
    return lambda j, k: (
        0,
        jnp.where(j == 0, jnp.minimum(k + 1, nk - 1), nk - 1) + offset,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "elem_name", "bn", "bk", "out_dtype", "act_fq", "x_cache", "pipe_fq",
    ),
)
def _pallas_matmul_1byte(
    x, w_codes, w_scale, elem_name, bn, bk, out_dtype, act_fq=None, x_cache=False,
    pipe_fq=False,
):
    M, K = x.shape
    N = w_codes.shape[1]
    grid = (N // bn, K // bk)
    kernel = functools.partial(
        _linear_kernel_1byte, elem_name=elem_name, act_fq=act_fq, x_cache=x_cache,
        pipe_fq=pipe_fq,
    )
    scratch = [pltpu.VMEM((M, bn), jnp.float32)]
    x_args = ()
    # With fused act-fq the kernel wants x transposed (MX blocks on
    # sublanes): one XLA transpose outside replaces the separate
    # fake-quantize pass's full HBM round trip.
    if x_cache:
        if pipe_fq:
            x_spec = pl.BlockSpec(
                (M, bk), _pin_pipelined(K // bk), memory_space=pltpu.VMEM
            )
            x0_spec = pl.BlockSpec(
                (M, bk), lambda j, k: (0, 0), memory_space=pltpu.VMEM
            )
            x_args = (x,)
        else:
            x_spec = pl.BlockSpec(
                (M, bk), _pin_after_first_sweep(K // bk), memory_space=pltpu.VMEM
            )
        scratch.append(pltpu.VMEM((K // bk, M, bk), jnp.bfloat16))
    elif act_fq is None:
        x_spec = pl.BlockSpec((M, bk), lambda j, k: (0, k), memory_space=pltpu.VMEM)
    else:
        x = x.T  # (K, M)
        x_spec = pl.BlockSpec((bk, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM)
    in_specs = [x_spec]
    if pipe_fq:
        in_specs.append(x0_spec)
    in_specs += [
        pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary" if x_cache else "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + N * K + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, *x_args, w_codes, w_scale)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "out_dtype", "act_fq"))
def _pallas_matmul_fp4(x, w_data, w_scale, bn, bk, out_dtype, act_fq=None):
    M, K = x.shape
    N = w_data.shape[1]
    bkp = bk // 2
    # Split x into even/odd K-planes matching the nibble packing.
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    grid = (N // bn, K // bk)
    if act_fq is None:
        x_spec = pl.BlockSpec((M, bkp), lambda j, k: (0, k), memory_space=pltpu.VMEM)
    else:
        xe, xo = xe.T, xo.T  # (K/2, M) each
        x_spec = pl.BlockSpec((bkp, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_linear_kernel_fp4, act_fq=act_fq),
        grid=grid,
        in_specs=[
            x_spec,
            x_spec,
            pl.BlockSpec((bkp, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + N * K // 2 + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xe, xo, w_data, w_scale)


@functools.partial(
    jax.jit,
    static_argnames=("bn", "bk", "out_dtype", "act_fq", "x_cache", "pipe_fq",
                     "elem_name"),
)
def _pallas_matmul_fp4_halves(
    x, w_data, w_scale, bn, bk, out_dtype, act_fq=None, x_cache=False, pipe_fq=False,
    elem_name="float4_e2m1",
):
    M, K = x.shape
    N = w_data.shape[1]
    bkp = bk // 2
    nko = (K // 2) // bkp  # lo-half offset, in bkp-sized column tiles of x
    grid = (N // bn, K // bk)
    scratch = [pltpu.VMEM((M, bn), jnp.float32)]
    x_args = ()
    if x_cache:
        pin = _pin_pipelined if pipe_fq else _pin_after_first_sweep
        xa_spec = pl.BlockSpec((M, bkp), pin(K // bk), memory_space=pltpu.VMEM)
        xb_spec = pl.BlockSpec((M, bkp), pin(K // bk, nko), memory_space=pltpu.VMEM)
        if pipe_fq:
            xa0_spec = pl.BlockSpec(
                (M, bkp), lambda j, k: (0, 0), memory_space=pltpu.VMEM
            )
            xb0_spec = pl.BlockSpec(
                (M, bkp), lambda j, k: (0, nko), memory_space=pltpu.VMEM
            )
            x_args = (x, x)
        scratch += [pltpu.VMEM((K // bk, M, bkp), jnp.bfloat16)] * 2
    elif act_fq is None:
        xa_spec = pl.BlockSpec((M, bkp), lambda j, k: (0, k), memory_space=pltpu.VMEM)
        xb_spec = pl.BlockSpec(
            (M, bkp), lambda j, k: (0, k + nko), memory_space=pltpu.VMEM
        )
    else:
        x = x.T  # (K, M); half-tiles become row ranges
        xa_spec = pl.BlockSpec((bkp, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM)
        xb_spec = pl.BlockSpec(
            (bkp, M), lambda j, k: (k + nko, 0), memory_space=pltpu.VMEM
        )
    in_specs = [xa_spec, xb_spec]
    if pipe_fq:
        in_specs += [xa0_spec, xb0_spec]
    in_specs += [
        pl.BlockSpec((bkp, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bkp // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bkp // BLOCK, bn), lambda j, k: (k + nko, j), memory_space=pltpu.VMEM
        ),
    ]
    w_bytes = N * K // 2 if elem_name == "float4_e2m1" else N * K
    return pl.pallas_call(
        functools.partial(
            _linear_kernel_fp4_halves, act_fq=act_fq, x_cache=x_cache,
            pipe_fq=pipe_fq, elem_name=elem_name,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary" if x_cache else "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + w_bytes + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, x, *x_args, w_data, w_scale, w_scale)


# Conservative VMEM budget for one kernel invocation: fp32 accumulator +
# bf16 output block + double-buffered x and w tiles must fit under the 64MB
# compiler limit with headroom (bn=7168/bk=1024 at 55MB estimated crashes
# the Mosaic compile; 52MB estimated configs run).
_VMEM_BUDGET = 52 * 1024 * 1024


def _pick_tiles(
    M: int,
    N: int,
    K: int,
    w_bytes: float = 1.0,
    min_bk: int = 0,
    extra_bytes: int = 0,
    budget: int = 0,
    x_bufs: int = 2,
):
    """Largest output-column tile that fits VMEM.

    Without the x-cache the x tile is refetched from HBM once per
    output-column sweep (N/bn times), so bn should be as large as the
    accumulator allows; bk=512 beats 1024 at every bn on v5e (smaller
    decode working set).  ``w_bytes`` is the packed bytes per weight
    element (0.5 for fp4); ``extra_bytes`` budgets non-tile VMEM (the
    x-cache scratch) against ``budget``.
    """
    if M % 8 != 0:
        return None
    bns = sorted(
        {
            c
            for c in (N, N // 2, N // 4, N // 8, 2048, 1024, 512, 256, 128)
            if c >= 128 and c % 128 == 0 and N % c == 0
        },
        reverse=True,
    )
    bks = [c for c in (512, 256, 1024) if K % c == 0 and c % max(min_bk, 1) == 0]
    if not bks and not min_bk and 32 <= K <= 1024 and K % 32 == 0:
        # Small-K case (e.g. the tiny CI model's hidden 128): a full-K block.
        # Mosaic's tile rule needs the scale tile's sublane count (bk/32)
        # divisible by 8 *or* equal to the full array dim — bk == K is the
        # latter.
        bks = [K]
    for bn in bns:
        for bk in bks:
            if (bk // BLOCK) % 8 != 0 and bk != K:
                continue
            vmem = M * bn * 8 + x_bufs * (M * bk * 2) + 2 * int(bk * bn * w_bytes)
            if vmem + extra_bytes <= (budget or _VMEM_BUDGET):
                return bn, bk
    return None


def plan_matmul(
    M: int, N: int, K: int, elem_name: str = "float8_e4m3", fp4_pack: str = "pair"
):
    """Static kernel-path oracle: the (bn, bk) tiling the fused matmul uses
    for logical shapes ``(M, K) @ (K, N)``, or None if that shape falls back
    to the XLA dequantize path.  Pure shape math — tests assert production
    shapes stay eligible through this function.
    """
    # Decode-sized inputs (M < 8, e.g. batch-1 token steps) pad up to the
    # 8-sublane minimum: the kernel is weight-HBM-bound there, so the extra
    # rows are free — and the fallback (dequantizing the full weight to HBM)
    # costs ~10x the packed read.
    Mp = M + (8 - M % 8) % 8
    w_bytes, min_bk = _format_geometry(elem_name, fp4_pack)
    return _pick_tiles(Mp, N, K, w_bytes, min_bk)


def _format_geometry(elem_name: str, fp4_pack: str):
    """(packed bytes per weight element, minimum bk) for a weight format.

    The fp4-halves per-half scale tile is (bk/64, bn); TPU blocks need the
    second-minor dim divisible by 8, so bk must be a multiple of 512; the
    fp6-quarters per-quarter scale tile is (bk/128, bn), so 1024 there.
    """
    if elem_name == "float4_e2m1":
        return 0.5, (512 if fp4_pack == "halves" else 0)
    if fp4_pack == "quarters":
        return 0.75, 1024
    if elem_name == "float8_e4m3" and fp4_pack == "halves":
        # u16 word per 2 elements (1 byte/element); per-half scale tile is
        # (bk/64, bn) like fp4 halves, so the same 512 minimum bk.
        return 1.0, 512
    return 1.0, 0


# In-kernel activation fq without the x-cache recomputes once per
# output-column sweep (N/bn times): profitable only at decode-sized M,
# where the recompute is negligible and skipping the standalone fq kernel
# saves a dispatch plus an HBM round trip over x.  Above this M the kernel
# either fq's into the j==0 VMEM x-cache (one fq total, no HBM round trip)
# or, when the cache does not fit VMEM, falls back to the two-pass path
# (standalone fq kernel, then the unfused matmul).
_ACT_FQ_FUSE_MAX_M = 64

# Tighter budget when the x-cache scratch rides along: configs estimated in
# the 45-52MB band compile but schedule poorly (measured: fp6-quarters
# bn=3584/bk=1024 + cache runs at 0.67x of bf16 while bn=1792 runs 0.88x),
# so cached planning prefers a smaller bn that leaves headroom.
_VMEM_CACHE_BUDGET = 45 * 1024 * 1024


def plan_matmul_cached(
    M: int, N: int, K: int, elem_name: str = "float8_e4m3", fp4_pack: str = "pair"
):
    """Tiling for the j==0 x-cache kernel variant, or None when the cache
    (an ``M x K`` bf16 scratch) cannot fit VMEM or there is only one
    output-column sweep to amortize it over."""
    Mp = M + (8 - M % 8) % 8
    if elem_name == "float4_e2m1" and fp4_pack == "pair":
        # The fp4 "pair" kernel has no cache mode (x arrives as strided
        # even/odd K-planes; the halves layout is the production fp4 path).
        return None
    w_bytes, min_bk = _format_geometry(elem_name, fp4_pack)
    # x_bufs=4: the pipelined-fq variant (default) holds the streaming tile
    # AND the pinned tile-0 prologue ref, each double-buffered.
    plan = _pick_tiles(
        Mp, N, K, w_bytes, min_bk,
        extra_bytes=Mp * K * 2, budget=_VMEM_CACHE_BUDGET, x_bufs=4,
    )
    if plan is None or N // plan[0] <= 1:
        return None
    return plan


def _run_kernel(x_hp, w: MXArray, out_dtype, act_fq=None) -> Optional[jax.Array]:
    M, K = x_hp.shape
    N = w.shape[1]
    plan = plan_matmul(M, N, K, w.elem_dtype.name, w.fp4_pack)
    if plan is None:
        return None
    pad_m = (8 - M % 8) % 8
    cached_plan = plan_matmul_cached(M, N, K, w.elem_dtype.name, w.fp4_pack)
    x_cache = cached_plan is not None
    bn, bk = cached_plan if x_cache else plan
    if act_fq is not None and M > _ACT_FQ_FUSE_MAX_M and not x_cache:
        from .pallas_quantize import fake_quantize_pallas

        x_fq = fake_quantize_pallas(x_hp, act_fq, BLOCK)
        if x_fq is None:
            x_fq = MXArray.to_mx(x_hp, act_fq, BLOCK).to_dtype(jnp.bfloat16)
        x_hp = x_fq
        act_fq = None
    if pad_m:
        x_hp = jnp.pad(x_hp, ((0, pad_m), (0, 0)))
    # Pipelined j==0 fq (overlap the activation quantize with the MXU dots);
    # only meaningful when the kernel fq's into the x-cache.
    pipe_fq = bool(
        x_cache and act_fq is not None and env.TORCHMX_FQ_PIPELINE == "1"
    )
    if w.elem_dtype == dtypes.float4_e2m1:
        if w.fp4_pack == "halves":
            out = _pallas_matmul_fp4_halves(
                x_hp, w.data, w.scale_e8m0, bn, bk, out_dtype, act_fq, x_cache,
                pipe_fq,
            )
        else:
            out = _pallas_matmul_fp4(
                x_hp, w.data, w.scale_e8m0, bn, bk, out_dtype, act_fq
            )
    elif w.elem_dtype == dtypes.float8_e4m3 and w.fp4_pack == "halves":
        out = _pallas_matmul_fp4_halves(
            x_hp, w.data, w.scale_e8m0, bn, bk, out_dtype, act_fq, x_cache,
            pipe_fq, elem_name="float8_e4m3",
        )
    elif w.fp4_pack == "quarters":
        out = _pallas_matmul_fp6q(
            x_hp, w.data, w.scale_e8m0, w.elem_dtype.name, bn, bk, out_dtype, act_fq,
            x_cache, pipe_fq,
        )
    else:
        out = _pallas_matmul_1byte(
            x_hp, w.data, w.scale_e8m0, w.elem_dtype.name, bn, bk, out_dtype, act_fq,
            x_cache, pipe_fq,
        )
    return out[:M] if pad_m else out


def _flatten_leading(x_hp, w, out_dtype, run):
    if x_hp.ndim == 2:
        return run(x_hp, w, out_dtype)
    lead = x_hp.shape[:-1]
    out = run(x_hp.reshape(-1, x_hp.shape[-1]), w, out_dtype)
    return None if out is None else out.reshape(*lead, -1)


def matmul_any(a, b, out_dtype, act_fq: Optional[str] = None) -> Optional[jax.Array]:
    """Pallas path for ``mx_matmul(a, b)``: b must be a K-major kernel-layout
    MXArray (payload (K, N), blocked on K).  Returns None if ineligible.

    ``act_fq`` (an element dtype name) fuses dynamic activation quantization
    into the kernel prologue: ``a`` must then be a plain bf16-castable array
    and is fake-quantized per 32-element MX block in VMEM — no separate
    fake-quantize pass over HBM.
    """
    if not isinstance(b, MXArray) or not _is_kernel_layout(b):
        return None
    if act_fq is not None and isinstance(a, MXArray):
        return None
    x_hp = a.to_dtype(jnp.bfloat16) if isinstance(a, MXArray) else a.astype(jnp.bfloat16)
    run = functools.partial(_run_kernel, act_fq=act_fq)
    return _flatten_leading(x_hp, b, out_dtype, run)


def linear_any(x, w, out_dtype) -> Optional[jax.Array]:
    """Pallas path for ``mx_linear(x, w)`` with torch-layout ``w`` (N, K).

    The payload is transposed to kernel layout per call (an XLA uint8
    transpose — far cheaper than materializing bf16 weights, but for full
    speed store weights K-major and call ``mx_matmul``; ``MXInferenceLinear``
    does this).  ``x`` may be an MXArray (dequantized outside the kernel).
    """
    if not isinstance(w, MXArray):
        return None
    if not (
        w.data.ndim == 2
        and w.block_dim == w.data.ndim - 1
        and w.padding == 0
        and w.block_size == BLOCK
    ):
        return None
    x_hp = x.to_dtype(jnp.bfloat16) if isinstance(x, MXArray) else x.astype(jnp.bfloat16)
    return _flatten_leading(x_hp, w.transpose((1, 0)), out_dtype, _run_kernel)
