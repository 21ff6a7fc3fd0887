"""``MXArray`` — the MX-quantized tensor abstraction, as a JAX pytree.

The TPU-native counterpart of the reference's ``MXTensor`` torch subclass
(rain-neuromorphics/torchmx ``torchmx/mx_tensor.py:357-528``).  Instead of
ATen dispatch overrides, ``MXArray`` is a registered pytree whose leaves are
the packed payload and the E8M0 scale; quantization metadata is static aux
data, so MXArrays flow through ``jax.jit`` / ``pjit`` / ``shard_map`` /
checkpointing natively.

Fields:
    * ``scale_e8m0`` — uint8, payload shape with ``block_dim`` divided by
      ``block_size`` (padded block count).
    * ``data`` — uint8 payload (int8 for the int8 format; fp4 packs two codes
      per byte along ``block_dim``, high nibble first).  Stored **unpadded**
      (sliced back after quantization), like the reference.
    * static: ``elem_dtype``, ``block_size``, ``orig_dtype``, ``block_dim``,
      ``padding``.

Structural ops (``transpose`` / ``reshape`` / ``broadcast_to``) co-transform
payload and scale and remap ``block_dim`` — the semantics of the reference's
ATen overrides (``torchmx/ops.py:71-248``) without the dispatch machinery.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import dtypes
from . import env_variables as env
from .mx_quantization import (
    dequantize_to_dtype,
    get_e8m0_shared_exponent,
    pow2_split_factors,
    quantize_mx_with_e8m0_shared_exponent_hw_exact,
    quantize_mx_with_e8m0_shared_exponent_simulated,
)
from .utils import tensor_size_fp4x2_to_hp

Array = jax.Array


# ---------------------------------------------------------------------------
# Op-level seam: quantize_mx / dequantize_mx
#
# These are the jit-traceable analogs of the reference's torch.library custom
# ops (``mx_tensor.py:36-193``); abstract eval (the reference's register_fake
# meta kernels) comes free from jax tracing.  The Pallas TPU kernels plug in
# behind the same signatures (see ``ops/``).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("elem_dtype_name", "block_size", "use_hw_exact"))
def _quantize_mx_impl(
    data_hp: Array, elem_dtype_name: str, block_size: int, use_hw_exact: bool
) -> Tuple[Array, Array]:
    elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
    orig_shape = data_hp.shape
    blocked = data_hp.reshape(-1, block_size)
    shared_exponent = get_e8m0_shared_exponent(blocked, elem_dtype)

    if use_hw_exact:
        data_lp = quantize_mx_with_e8m0_shared_exponent_hw_exact(
            blocked, elem_dtype, shared_exponent[:, None], orig_shape
        )
    else:
        data_lp = quantize_mx_with_e8m0_shared_exponent_simulated(
            blocked, elem_dtype, shared_exponent[:, None], orig_shape
        )
    scale = shared_exponent.reshape(orig_shape[:-1] + (-1,))
    return scale, data_lp


def _quantize_shifted(
    data_hp: Array, elem_dtype_name: str, block_size: int, shift: int
) -> Tuple[Array, Array]:
    """Quantize with the max-based E8M0 scale shifted by ``shift`` binades
    (values above the shrunken range saturate in the element cast).  NaN
    blocks keep the 255 scale.  ``shift == 0`` is exactly the standard
    quantize path (same implementation selection as :func:`quantize_mx`'s
    jnp branch — bit-identical to the Pallas kernel by contract)."""
    elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
    use_hw_exact = (
        elem_dtype in dtypes.SUPPORTED_FP_ELEM_DTYPES
        and env.MX_EXACT_QUANTIZATION == "True"
    )
    return _quantize_shifted_impl(
        data_hp, elem_dtype_name, block_size, shift, use_hw_exact
    )


@functools.partial(
    jax.jit,
    static_argnames=("elem_dtype_name", "block_size", "shift", "use_hw_exact"),
)
def _quantize_shifted_impl(
    data_hp, elem_dtype_name, block_size, shift, use_hw_exact
) -> Tuple[Array, Array]:
    elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
    orig_shape = data_hp.shape
    blocked = data_hp.reshape(-1, block_size)
    base = get_e8m0_shared_exponent(blocked, elem_dtype)
    if shift:
        se = jnp.clip(base.astype(jnp.int32) + shift, 0, 254).astype(jnp.uint8)
        se = jnp.where(base == dtypes.E8M0_EXPONENT_NAN_VAL, base, se)
    else:
        se = base
    if use_hw_exact:
        data_lp = quantize_mx_with_e8m0_shared_exponent_hw_exact(
            blocked, elem_dtype, se[:, None], orig_shape
        )
    else:
        data_lp = quantize_mx_with_e8m0_shared_exponent_simulated(
            blocked, elem_dtype, se[:, None], orig_shape
        )
    return se.reshape(orig_shape[:-1] + (-1,)), data_lp


def quantize_mx(
    data_hp: Array, elem_dtype_name: str, block_size: int
) -> Tuple[Array, Array]:
    """Quantize along the last dim into (E8M0 scale, low-precision payload).

    For input shape ``(..., D)`` with ``D % block_size == 0`` returns
    ``scale`` of shape ``(..., D // block_size)`` (uint8) and payload of shape
    ``(..., D)`` (uint8/int8; fp4: ``(..., D // 2)`` packed).

    Mirrors reference ``mx_tensor.py:36-96``.  The quantizer implementation is
    selected by ``MX_HARDWARE_EXACT_QUANTIZATION`` (fp dtypes only), exactly
    like the reference (``mx_tensor.py:80-90``); both are bit-identical.
    """
    elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
    assert data_hp.dtype == jnp.bfloat16, (
        f"Only bfloat16 input dtype is supported, got {data_hp.dtype}"
    )
    assert data_hp.shape[-1] % block_size == 0, (
        "The last dimension of the input tensor must be a multiple of block_size"
    )
    # Backend dispatch: the fused Pallas block-quantize kernel on TPU
    # (bit-identical to both jnp quantizers by contract and by test),
    # the jnp reference path otherwise.
    from .ops.backend import use_pallas

    if use_pallas():
        from .ops.pallas_quantize import quantize_mx_pallas

        out = quantize_mx_pallas(data_hp, elem_dtype_name, block_size)
        if out is not None:
            return out
    use_hw_exact = (
        elem_dtype in dtypes.SUPPORTED_FP_ELEM_DTYPES
        and env.MX_EXACT_QUANTIZATION == "True"
    )
    return _quantize_mx_impl(data_hp, elem_dtype_name, block_size, use_hw_exact)


@functools.partial(
    jax.jit,
    static_argnames=("elem_dtype_name", "block_size", "target_dtype", "block_dim"),
)
def dequantize_mx(
    data_lp: Array,
    shared_exp_e8m0: Array,
    elem_dtype_name: str,
    block_size: int,
    target_dtype,
    block_dim: int,
) -> Array:
    """Decode an MX payload + scale back to ``target_dtype``.

    Mirrors reference ``mx_tensor.py:123-164``: decode elements (fp via exact
    bf16 reconstruction, int8 via direct cast), then apply the power-of-two
    scale (NaN-propagating) repeated ``block_size`` times along ``block_dim``.

    The scale is applied in fp32 as two fp32-normal factors
    (:func:`~torchmx_tpu.mx_quantization.pow2_split_factors`) and converted to
    ``target_dtype`` once at the end.  On CPU this is bit-identical to the
    reference's "cast scale to target dtype, multiply in target dtype"
    (elements and power-of-two scales are exact in fp32; one final rounding);
    on TPU it is additionally safe against subnormal flushing.
    """
    elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
    if elem_dtype in dtypes.SUPPORTED_FP_ELEM_DTYPES:
        data_hp = dequantize_to_dtype(data_lp, elem_dtype, jnp.float32, block_dim)
    elif elem_dtype == dtypes.int8:
        data_hp = data_lp.astype(jnp.float32)
    else:
        raise AssertionError(f"unsupported dtype: {elem_dtype}")

    e = shared_exp_e8m0.astype(jnp.int32)
    s1, s2 = pow2_split_factors(e - 127)
    s1 = jnp.where(e == dtypes.E8M0_EXPONENT_NAN_VAL, jnp.nan, s1)
    s1 = jnp.repeat(s1, block_size, axis=block_dim)
    s2 = jnp.repeat(s2, block_size, axis=block_dim)
    return ((data_hp * s1) * s2).astype(target_dtype)


# ---------------------------------------------------------------------------
# MXArray pytree
# ---------------------------------------------------------------------------


def _normalize_dim(dim: int, ndim: int) -> int:
    return dim if dim >= 0 else dim + ndim


@jax.tree_util.register_pytree_node_class
class MXArray:
    """MX block-floating-point array: packed payload + per-block E8M0 scale."""

    def __init__(
        self,
        scale_e8m0: Array,
        data: Array,
        elem_dtype: dtypes.DType,
        block_size: int,
        orig_dtype,
        padding: int = 0,
        block_dim: Optional[int] = None,
        fp4_pack: str = "pair",
    ):
        if block_dim is None:
            block_dim = data.ndim - 1
        else:
            block_dim = _normalize_dim(block_dim, data.ndim)

        if not isinstance(elem_dtype, dtypes.DType):
            elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype]
        assert (
            elem_dtype in dtypes.SUPPORTED_ELEM_DTYPES
        ), f"unsupported elem_dtype {elem_dtype}"
        assert scale_e8m0.dtype == jnp.uint8, "scale must be uint8"
        if fp4_pack == "halves" and elem_dtype == dtypes.float8_e4m3:
            # fp8 kernel "halves" layout: u16 word p = (code[p] << 8) |
            # code[p + K/2] — same bytes/element as flat fp8, SWAR-decoded
            # two elements per i32 lane (see ops/pallas_matmul.py).
            assert data.dtype == jnp.uint16, f"{data.dtype} (fp8 halves)"
        else:
            assert data.dtype in (jnp.uint8, jnp.int8), f"{data.dtype} is unsupported"

        assert fp4_pack in ("pair", "halves", "quarters"), fp4_pack
        self.scale_e8m0 = scale_e8m0
        self.data = data
        self.elem_dtype = elem_dtype
        self.block_size = block_size
        self.orig_dtype = jnp.dtype(orig_dtype)
        self.block_dim = block_dim
        self.padding = padding
        # fp4 payload byte layout: "pair" = reference layout, neighbours
        # (2p, 2p+1) share a byte (``utils.py:120-145``); "halves" = TPU
        # kernel layout, byte p holds elements (p, p + K/2) so the fused
        # matmul kernel reads contiguous x half-tiles (no strided slicing).
        self.fp4_pack = fp4_pack

        # Consistency: scale implies the logical element count on block_dim
        # (reference ``mx_tensor.py:417-435``).
        expected = list(scale_e8m0.shape)
        expected[block_dim] = expected[block_dim] * block_size - padding
        if tuple(expected) != self.shape:
            raise ValueError(
                f"scale shape {scale_e8m0.shape} (block_size={block_size}, "
                f"padding={padding}) implies logical shape {tuple(expected)}, "
                f"but payload implies {self.shape}"
            )

    # -- shape/dtype surface -------------------------------------------------

    @property
    def shape(self) -> Tuple[int, ...]:
        """Logical (unquantized) shape."""
        s = list(self.data.shape)
        if self.elem_dtype == dtypes.float4_e2m1:
            s = tensor_size_fp4x2_to_hp(s, self.block_dim)
            s[self.block_dim] -= self.padding % 2
        elif self.fp4_pack == "quarters":
            # fp6 planar packing: 3 byte-planes hold 4 code-planes.
            s[self.block_dim] = s[self.block_dim] * 4 // 3
        elif self.fp4_pack == "halves" and self.elem_dtype == dtypes.float8_e4m3:
            # fp8 halves: one u16 word covers two elements (p, p + K/2).
            s[self.block_dim] = s[self.block_dim] * 2
        return tuple(s)

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def dtype(self):
        return self.orig_dtype

    def __repr__(self) -> str:
        r = (
            f"MXArray(elem_dtype={self.elem_dtype}, shape={self.shape}, "
            f"block_size={self.block_size}, block_dim={self.block_dim}, "
            f"orig_dtype={self.orig_dtype}"
        )
        if self.padding > 0:
            r += f", padding={self.padding}"
        return r + ")"

    def _quantization_type(self) -> str:
        return (
            f"shape={self.shape}, block_size={self.block_size}, "
            f"elem_dtype={self.elem_dtype}, orig_dtype={self.orig_dtype}"
        )

    # -- pytree protocol -------------------------------------------------------

    def tree_flatten(self):
        children = (self.scale_e8m0, self.data)
        aux = (
            self.elem_dtype.name,
            self.block_size,
            str(self.orig_dtype),
            self.block_dim,
            self.padding,
            self.fp4_pack,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        scale, data = children
        name, block_size, orig_dtype, block_dim, padding, fp4_pack = aux
        obj = object.__new__(cls)
        # Bypass __init__ validation: during tracing/transforms children may
        # be placeholders without shapes.
        obj.scale_e8m0 = scale
        obj.data = data
        obj.elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[name]
        obj.block_size = block_size
        obj.orig_dtype = jnp.dtype(orig_dtype)
        obj.block_dim = block_dim
        obj.padding = padding
        obj.fp4_pack = fp4_pack
        return obj

    # -- quantize / dequantize -------------------------------------------------

    @staticmethod
    def to_mx(
        data_hp: Array,
        elem_dtype: dtypes.DType | str,
        block_size: int = 32,
    ) -> "MXArray":
        """Quantize a bf16 array to MX along its last dimension.

        Pads the last dim to a block multiple, quantizes, and slices the
        payload back to the logical size (fp4: ceil-halved bytes), recording
        ``padding`` (reference ``mx_tensor.py:196-252``).
        """
        if isinstance(elem_dtype, str):
            elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype]
        padding = (block_size - data_hp.shape[-1] % block_size) % block_size
        size_before_padding = data_hp.shape[-1]
        if padding > 0:
            assert block_size % 2 == 0, (
                f"block_size must be even to support padding but got {block_size}"
            )
            pad_width = [(0, 0)] * (data_hp.ndim - 1) + [(0, padding)]
            data_hp = jnp.pad(data_hp, pad_width)

        scale, data_lp = quantize_mx(data_hp, elem_dtype.name, block_size)

        if elem_dtype == dtypes.float4_e2m1:
            size_before_padding = math.ceil(size_before_padding / 2)
        data_lp = data_lp[..., :size_before_padding]

        return MXArray(scale, data_lp, elem_dtype, block_size, data_hp.dtype, padding)

    @staticmethod
    def to_mx_mse(
        data_hp: Array,
        elem_dtype: dtypes.DType | str,
        block_size: int = 32,
        shifts: Sequence[int] = (0, -1, -2),
    ) -> "MXArray":
        """Quantize with an MSE-optimal per-block scale search.

        The standard MX scale (``clamp(max_exp - max_pow2)``) guarantees no
        clipping, but one outlier then inflates the block's quantization
        step for the other 31 elements — the dominant fp4 error mode.  This
        variant additionally tries the max-based scale shifted down by each
        ``shifts`` entry (clipping the outlier via the quantizer's
        saturating cast, shrinking everyone else's step) and keeps, per
        block, the candidate with the lowest reconstruction MSE.

        A TPU-build extension beyond the reference (which only implements
        the max-based rule) in the spirit of clipping-based PTQ scale
        optimization (BATQuant et al., PAPERS.md); intended for WEIGHTS —
        the search runs once offline, decode/runtime cost is zero, and the
        result is a plain :class:`MXArray` (shift 0 reproduces
        :meth:`to_mx` bit-for-bit).

        Empirical caveat, measured here: with MX's power-of-two scales a
        one-binade shift always clips the block max by >=25% (fp4's format
        max 6 = 1.5 * 2^max_pow2 leaves only half a binade of headroom),
        and on gaussian or outlier-heavy weights that clipping cost exceeds
        the halved-quantum gain — the per-block argmin then selects shift 0
        everywhere, reproducing :meth:`to_mx`.  The search can only help
        distributions whose block max sits just above a binade boundary
        with the bulk far below it; it never does worse than the max rule.
        """
        if isinstance(elem_dtype, str):
            elem_dtype = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype]
        padding = (block_size - data_hp.shape[-1] % block_size) % block_size
        size_before_padding = data_hp.shape[-1]
        if padding > 0:
            pad_width = [(0, 0)] * (data_hp.ndim - 1) + [(0, padding)]
            data_hp = jnp.pad(data_hp, pad_width)

        cands = []
        for d in shifts:
            scale, codes = _quantize_shifted(
                data_hp, elem_dtype.name, block_size, int(d)
            )
            deq = dequantize_mx(
                codes, scale, elem_dtype.name, block_size, jnp.float32, -1
            )
            sq = (deq - data_hp.astype(jnp.float32)) ** 2
            err = jnp.sum(
                sq.reshape(*data_hp.shape[:-1], -1, block_size), axis=-1
            )
            cands.append((scale, codes, err))
        scales = jnp.stack([c[0] for c in cands])
        codes = jnp.stack([c[1] for c in cands])
        errs = jnp.stack([c[2] for c in cands])
        best = jnp.argmin(errs, axis=0)  # (..., nblocks)
        scale = jnp.take_along_axis(scales, best[None], axis=0)[0]
        ppb = codes.shape[-1] // scales.shape[-1]  # payload bytes per block
        best_b = jnp.repeat(best, ppb, axis=-1)
        data_lp = jnp.take_along_axis(codes, best_b[None], axis=0)[0]

        if elem_dtype == dtypes.float4_e2m1:
            size_before_padding = math.ceil(size_before_padding / 2)
        data_lp = data_lp[..., :size_before_padding]
        return MXArray(
            scale, data_lp, elem_dtype, block_size, data_hp.dtype, padding
        )

    def astype(self, dtype) -> "MXArray":
        """Re-brand the high-precision target dtype without touching bits.

        The analog of the reference's autocast ``aten._to_copy`` handler
        (``torchmx/ops.py:251-276``): under dtype autocasting an MX tensor is
        not dequantized-and-recast — only ``orig_dtype`` (what
        ``to_dtype``/ops will produce) changes; payload and scale bits are
        untouched.
        """
        return MXArray(
            self.scale_e8m0,
            self.data,
            self.elem_dtype,
            self.block_size,
            dtype,
            self.padding,
            self.block_dim,
            self.fp4_pack,
        )

    def to_fp4_halves(self) -> "MXArray":
        """Repack a 2-D K-major fp4 payload into the kernel "halves" layout.

        Requires fp4, block_dim == 0, no padding, and K % 64 == 0 (each half
        must stay 32-block-aligned).  One XLA shuffle at quantization time;
        the fused Pallas matmul then consumes x as two contiguous half-tiles.
        """
        assert self.elem_dtype == dtypes.float4_e2m1 and self.fp4_pack == "pair"
        assert self.data.ndim == 2 and self.block_dim == 0 and self.padding == 0
        K = self.shape[0]
        assert K % 64 == 0, f"halves layout needs K % 64 == 0, got {K}"
        from .packing import unpack_uint4

        codes = unpack_uint4(self.data, packing_dim=0)  # (K, N), one code/byte
        hi, lo = codes[: K // 2], codes[K // 2 :]
        data = ((hi << 4) | (lo & 0xF)).astype(jnp.uint8)
        return MXArray(
            self.scale_e8m0,
            data,
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
            fp4_pack="halves",
        )

    def to_fp6_quarters(self) -> "MXArray":
        """Repack a 2-D K-major fp6 payload into the kernel "quarters" layout:
        4 elements per 3 bytes in HBM (the reference stores fp6 at one byte
        per element — ``utils.py:96-145`` packs fp4 only; this is the TPU
        extension that gives MXFP6 a real bandwidth edge over MXFP8).

        K splits into four quarters q0..q3 of 6-bit codes; three byte-planes
        of K/4 rows each hold them PLANAR — each quarter decodes from a
        contiguous sublane range with no interleave (Mosaic's stack+reshape
        interleave is ~2.4x slower):

            P0 = q0 << 2 | q3 >> 4
            P1 = q1 << 2 | (q3 >> 2) & 3
            P2 = q2 << 2 | q3 & 3

        Requires an fp6 dtype, block_dim == 0, no padding, K % 128 == 0
        (each quarter stays 32-block-aligned).
        """
        assert self.elem_dtype in (dtypes.float6_e3m2, dtypes.float6_e2m3)
        assert self.fp4_pack == "pair", "already packed"
        assert self.data.ndim == 2 and self.block_dim == 0 and self.padding == 0
        K = self.data.shape[0]
        assert K % 128 == 0, f"quarters layout needs K % 128 == 0, got {K}"
        q = K // 4
        c = self.data
        q0, q1, q2, q3 = c[:q], c[q : 2 * q], c[2 * q : 3 * q], c[3 * q :]
        p0 = (q0 << 2) | (q3 >> 4)
        p1 = (q1 << 2) | ((q3 >> 2) & 3)
        p2 = (q2 << 2) | (q3 & 3)
        data = jnp.concatenate([p0, p1, p2], axis=0).astype(jnp.uint8)
        return MXArray(
            self.scale_e8m0,
            data,
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
            fp4_pack="quarters",
        )

    def to_int8_domain(self) -> "MXArray":
        """Exact MXINT8 re-coding of fp4/fp6_e2m3 weights (int8 passthrough).

        Every float4_e2m1 value is an integer multiple of 2^-1 and every
        float6_e2m3 value of 2^-3, so ``value = intval * 2^(se' - 127)`` with
        ``intval = value * 2^k`` (|intval| <= 12 / 60) and ``se' = se - k``
        (k = 1 / 3) represents the SAME values as a valid MXINT8 array — no
        re-quantization, bit-equal dequantization.  The int8-domain layout
        (one int8 code per element) is what the decode-optimized int8-MXU-dot
        kernel consumes (``ops/pallas_matmul._int8dot_kernel``) and it also
        rides the fast hw-convert decode of the regular int8 kernel
        (0.115 ms vs fp6's 0.293 at the M=8 8B shape).

        Trade-off: fp4 grows from 0.5 to 1 byte/element (e2m3 stays at its
        1-byte flat size).  Contract: blocks with ``se < k`` flush to zero —
        all their values are below ~2^-124·max, the region the fused serving
        kernels flush anyway; unreachable for real model weights.
        """
        if self.elem_dtype == dtypes.int8:
            return self
        assert self.padding == 0, "int8-domain re-coding of padded arrays"
        if self.elem_dtype == dtypes.float4_e2m1:
            if self.fp4_pack == "halves":
                return self._halves_to_pair().to_int8_domain()
            from .packing import unpack_uint4

            codes = unpack_uint4(
                self.data, packing_dim=self.block_dim
            ).astype(jnp.int32)
            mag = codes & 7
            # value*2: {0,.5,1,1.5,2,3,4,6} -> {0,1,2,3,4,6,8,12}
            intmag = jnp.where(mag < 4, mag, (4 + 2 * (mag & 1)) << ((mag >> 1) - 2))
            sign = codes & 8
            k_off = 1
        elif self.elem_dtype == dtypes.float6_e2m3:
            assert self.fp4_pack == "pair", "re-code from the flat layout"
            codes = self.data.astype(jnp.int32)
            e = (codes >> 3) & 3
            m = codes & 7
            # value*8: subnormal m, normal (8+m) << (e-1); max 60
            intmag = jnp.where(e == 0, m, (8 + m) << jnp.maximum(e - 1, 0))
            sign = codes & 0x20
            k_off = 3
        else:
            raise AssertionError(
                f"{self.elem_dtype.name} values are not int8-representable "
                "(float6_e3m2 spans 0.0625..28 = 449 steps; float8_e4m3 more)"
            )
        se = self.scale_e8m0.astype(jnp.int32)
        keep = se >= k_off
        data = jnp.where(sign > 0, -intmag, intmag)
        keep_full = jnp.repeat(keep, self.block_size, axis=self.block_dim)
        data = jnp.where(keep_full, data, 0).astype(jnp.int8)
        scale = jnp.where(keep, se - k_off, 0).astype(jnp.uint8)
        return MXArray(
            scale,
            data,
            dtypes.int8,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
        )

    def _quarters_to_flat(self) -> "MXArray":
        """Inverse of :meth:`to_fp6_quarters` (one byte per code)."""
        assert self.fp4_pack == "quarters"
        q = self.data.shape[0] // 3
        p0, p1, p2 = self.data[:q], self.data[q : 2 * q], self.data[2 * q :]
        q0 = p0 >> 2
        q1 = p1 >> 2
        q2 = p2 >> 2
        q3 = ((p0 & 3) << 4) | ((p1 & 3) << 2) | (p2 & 3)
        codes = jnp.concatenate([q0, q1, q2, q3], axis=0).astype(jnp.uint8)
        return MXArray(
            self.scale_e8m0,
            codes,
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
        )

    def to_fp8_halves(self) -> "MXArray":
        """Repack a 2-D K-major fp8 payload into the kernel "halves" layout:
        u16 word p holds codes ``(p, p + K/2)`` — same bytes per element as
        the flat layout, but the fused matmul SWAR-decodes both elements of
        each word inside one i32 lane (``decode_fp8_swar_planes``), cutting
        the VPU decode that dominates decode-sized matmuls.

        Requires fp8_e4m3, block_dim == 0, no padding, K % 64 == 0 (each
        half stays 32-block-aligned), and every scale >= 10: the SWAR kernel
        drops the dead-lane masking (sub-bf16-normal results cannot occur at
        ``se >= 10``; the borrow-free packed subtract relies on it).  Callers
        check the scale bound eagerly (see ``layers/linear.py``).
        """
        assert self.elem_dtype == dtypes.float8_e4m3 and self.fp4_pack == "pair"
        assert self.data.ndim == 2 and self.block_dim == 0 and self.padding == 0
        K = self.shape[0]
        assert K % 64 == 0, f"halves layout needs K % 64 == 0, got {K}"
        codes = self.data.astype(jnp.uint16)
        data = (codes[: K // 2] << 8) | codes[K // 2 :]
        return MXArray(
            self.scale_e8m0,
            data,
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
            fp4_pack="halves",
        )

    def _fp8_halves_to_flat(self) -> "MXArray":
        """Inverse of :meth:`to_fp8_halves`."""
        assert self.fp4_pack == "halves" and self.elem_dtype == dtypes.float8_e4m3
        w = self.data
        codes = jnp.concatenate([w >> 8, w & 0xFF], axis=0).astype(jnp.uint8)
        return MXArray(
            self.scale_e8m0,
            codes,
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
        )

    def _halves_to_pair(self) -> "MXArray":
        """Inverse of :meth:`to_fp4_halves`."""
        assert self.fp4_pack == "halves"
        from .packing import pack_uint4

        b = self.data.astype(jnp.uint8)
        codes = jnp.concatenate([b >> 4, b & 0xF], axis=0)  # (K, N)
        return MXArray(
            self.scale_e8m0,
            pack_uint4(codes, packing_dim=0),
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            self.block_dim,
        )

    def to_dtype(self, target_dtype) -> Array:
        """Dequantize to ``target_dtype`` (bf16 or f32).

        Re-pads the payload along ``block_dim``, decodes, and slices back
        (reference ``mx_tensor.py:255-331``).
        """
        if self.fp4_pack == "halves":
            if self.elem_dtype == dtypes.float8_e4m3:
                return self._fp8_halves_to_flat().to_dtype(target_dtype)
            return self._halves_to_pair().to_dtype(target_dtype)
        if self.fp4_pack == "quarters":
            return self._quarters_to_flat().to_dtype(target_dtype)
        data_lp = self.data
        bd = self.block_dim
        org_size = data_lp.shape[bd]
        if self.elem_dtype == dtypes.float4_e2m1:
            org_size = org_size * 2 - (self.padding % 2)

        if self.padding > 0:
            pad_size = self.padding
            if self.elem_dtype == dtypes.float4_e2m1:
                pad_size = pad_size // 2
            pad_width = [(0, 0)] * data_lp.ndim
            pad_width[bd] = (0, pad_size)
            data_lp = jnp.pad(data_lp, pad_width)

        out = dequantize_mx(
            data_lp,
            self.scale_e8m0,
            self.elem_dtype.name,
            self.block_size,
            target_dtype,
            bd,
        )

        if self.padding > 0:
            out = jax.lax.slice_in_dim(out, 0, org_size, axis=bd)
        return out

    # -- structural ops (scale/payload co-transformation) ----------------------

    def transpose(self, axes: Optional[Sequence[int]] = None) -> "MXArray":
        """Permute dims; payload and scale permute together and ``block_dim``
        is remapped (semantics of reference ``ops.py:122-158``)."""
        assert self.fp4_pack == "pair", (
            f"structural ops operate on the reference 'pair' layout only; "
            f"this array uses the '{self.fp4_pack}' kernel layout — convert "
            f"first via _halves_to_pair() / _quarters_to_flat() (weights "
            f"normally repack once at load; see docs/architecture.md)"
        )
        if axes is None:
            axes = tuple(reversed(range(self.ndim)))
        axes = tuple(_normalize_dim(a, self.ndim) for a in axes)
        new_block_dim = axes.index(self.block_dim)
        return MXArray(
            jnp.transpose(self.scale_e8m0, axes),
            jnp.transpose(self.data, axes),
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            new_block_dim,
        )

    def swapaxes(self, dim0: int, dim1: int) -> "MXArray":
        """Swap two dims (analog of ``aten.transpose.int``, ``ops.py:139-158``)."""
        axes = list(range(self.ndim))
        d0, d1 = _normalize_dim(dim0, self.ndim), _normalize_dim(dim1, self.ndim)
        axes[d0], axes[d1] = axes[d1], axes[d0]
        return self.transpose(axes)

    @property
    def T(self) -> "MXArray":
        """2-D transpose (analog of ``aten.t``, ``ops.py:122-136``)."""
        assert self.ndim == 2, "T only supports 2-D MXArrays"
        return self.transpose((1, 0))

    def reshape(self, *new_shape) -> "MXArray":
        """Reshape leading (non-block) dims; ``block_dim`` must stay at the
        same distance from the end with its size unchanged.

        Covers the reference's ``aten.view`` support surface (block_dim last,
        or second-last for the 4-D attention lowering; ``ops.py:181-248``).
        """
        assert self.fp4_pack == "pair", (
            f"structural ops operate on the reference 'pair' layout only; "
            f"this array uses the '{self.fp4_pack}' kernel layout — convert "
            f"first via _halves_to_pair() / _quarters_to_flat() (weights "
            f"normally repack once at load; see docs/architecture.md)"
        )
        if len(new_shape) == 1 and isinstance(new_shape[0], (tuple, list)):
            new_shape = tuple(new_shape[0])
        logical = self.shape
        if -1 in new_shape:
            known = math.prod(d for d in new_shape if d != -1)
            total = math.prod(logical)
            new_shape = tuple(total // known if d == -1 else d for d in new_shape)
        assert math.prod(new_shape) == math.prod(logical), (
            f"cannot reshape {logical} -> {new_shape}"
        )
        tail = self.ndim - self.block_dim  # 1 = last, 2 = second-last, ...
        new_block_dim = len(new_shape) - tail
        assert new_block_dim >= 0 and new_shape[new_block_dim] == logical[self.block_dim], (
            f"reshape may not move/resize the blocked dim: {logical} -> {new_shape} "
            f"(block_dim={self.block_dim})"
        )
        # Trailing dims from block_dim onward must be preserved verbatim.
        assert new_shape[new_block_dim:] == logical[self.block_dim:], (
            f"reshape may only change leading dims: {logical} -> {new_shape}"
        )
        data_shape = list(new_shape)
        scale_shape = list(new_shape)
        data_shape[new_block_dim] = self.data.shape[self.block_dim]
        scale_shape[new_block_dim] = self.scale_e8m0.shape[self.block_dim]
        for off in range(1, tail):
            data_shape[new_block_dim + off] = self.data.shape[self.block_dim + off]
            scale_shape[new_block_dim + off] = self.scale_e8m0.shape[self.block_dim + off]
        return MXArray(
            self.scale_e8m0.reshape(scale_shape),
            self.data.reshape(data_shape),
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            new_block_dim,
        )

    def broadcast_to(self, target_shape: Sequence[int]) -> "MXArray":
        """Broadcast size-1 dims (analog of ``aten.expand``, ``ops.py:71-96``).

        The blocked dim cannot be broadcast.
        """
        assert self.fp4_pack == "pair", (
            f"structural ops operate on the reference 'pair' layout only; "
            f"this array uses the '{self.fp4_pack}' kernel layout — convert "
            f"first via _halves_to_pair() / _quarters_to_flat() (weights "
            f"normally repack once at load; see docs/architecture.md)"
        )
        target_shape = tuple(target_shape)
        logical = self.shape
        extra = len(target_shape) - len(logical)
        assert extra >= 0, f"cannot broadcast {logical} to {target_shape}"
        new_block_dim = self.block_dim + extra
        assert target_shape[new_block_dim] == logical[self.block_dim], (
            "cannot broadcast the blocked dim"
        )
        data_shape = list(target_shape)
        scale_shape = list(target_shape)
        data_shape[new_block_dim] = self.data.shape[self.block_dim]
        scale_shape[new_block_dim] = self.scale_e8m0.shape[self.block_dim]
        return MXArray(
            jnp.broadcast_to(self.scale_e8m0, scale_shape),
            jnp.broadcast_to(self.data, data_shape),
            self.elem_dtype,
            self.block_size,
            self.orig_dtype,
            self.padding,
            new_block_dim,
        )


# ---------------------------------------------------------------------------
# Differentiable casts (straight-through estimators)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fake_quantize(data_hp: Array, elem_dtype_name: str, block_size: int) -> Array:
    """Quantize-dequantize roundtrip with a straight-through gradient.

    Forward: ``to_mx`` then ``to_dtype`` back to the input dtype; backward:
    identity.  The JAX analog of the reference's ``ToMXConstrFunc`` /
    ``FromMXConstrFunc`` autograd pair (``mx_tensor.py:196-331``).
    """
    mx = MXArray.to_mx(data_hp, elem_dtype_name, block_size)
    return mx.to_dtype(data_hp.dtype)


def _fake_quantize_fwd(data_hp, elem_dtype_name, block_size):
    return fake_quantize(data_hp, elem_dtype_name, block_size), None


def _fake_quantize_bwd(elem_dtype_name, block_size, res, g):
    return (g,)


fake_quantize.defvjp(_fake_quantize_fwd, _fake_quantize_bwd)


def make_quantize_gradient(elem_dtype_name: str, block_size: int = 32):
    """Identity forward; the cotangent is MX quantize-dequantized in backward.

    Analog of the reference's ``NoopFwToMXBw`` training hook
    (``mx_tensor.py:334-354``) — JAX cotangents must be arrays, so the
    backward returns the dequantized MX gradient rather than an MXArray.
    """

    @jax.custom_vjp
    def _f(x):
        return x

    def _fwd(x):
        return x, None

    def _bwd(_, g):
        g_mx = MXArray.to_mx(g.astype(jnp.bfloat16), elem_dtype_name, block_size)
        return (g_mx.to_dtype(g.dtype),)

    _f.defvjp(_fwd, _bwd)
    return _f
