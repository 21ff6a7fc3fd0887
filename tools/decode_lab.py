"""Decode-kernel laboratory: candidate sub-byte decode schemes at decode M.

Round-3 headline experiment (VERDICT item 1): the fused dequant-matmul is
VPU-decode-bound at decode sizes (M=8: fp4 0.195 ms / fp8 0.448 ms vs bf16
0.153 ms, HBM floors 38/72 us).  This lab times candidate decode rewrites on
the real chip against the shipping kernels:

  A. fp8 decode via the HARDWARE fp8->bf16 convert (+ one exact power-of-2
     bf16 multiply for the E8M0 scale) instead of integer bit-surgery.
  B. int8 weights fed to the MXU DIRECTLY as int8 (native int8 matmul) with
     per-32-block f32 rescale of the (nb, M, bn) partial sums — near-zero
     per-weight-element VPU work.
  C. SWAR fp4: decode both nibbles of each packed byte inside one i32 lane
     (two bf16 fields built simultaneously), halving per-element VPU ops.

Run:  python tools/decode_lab.py [M]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timed_loop, _paired
from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.ops import pallas_matmul as pm

BLOCK = 32


# ---------------------------------------------------------------------------
# A. fp8 hw-convert kernel
# ---------------------------------------------------------------------------


def _kernel_fp8_convert(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f8 = w_ref[:]  # (bk, bn) float8_e4m3fn
    # E8M0 scale 2^(se-127) as bf16 bits: se<<7 (se==0 -> +0, flushing the
    # all-subnormal block exactly like the bit-surgery path).
    se = s_ref[:].astype(jnp.int32)
    sb = jax.lax.bitcast_convert_type(
        pm._expand_scale(se << 7, BLOCK).astype(jnp.uint16), jnp.bfloat16
    )
    w = f8.astype(jnp.bfloat16) * sb
    acc_ref[:] += pm._dot_f32acc(x_ref[:], w)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk"))
def matmul_fp8_convert(x, w_codes, w_scale, bn, bk):
    M, K = x.shape
    N = w_codes.shape[1]
    grid = (N // bn, K // bk)
    w_f8 = jax.lax.bitcast_convert_type(w_codes, jnp.float8_e4m3fn)
    return pl.pallas_call(
        _kernel_fp8_convert,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, w_f8, w_scale)


# ---------------------------------------------------------------------------
# B. int8 MXU-dot kernel (per-32-block rescale)
# ---------------------------------------------------------------------------


def _kernel_int8_dot(xT_ref, sxT_ref, w_ref, sw_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, m = xT_ref.shape
    bn = w_ref.shape[1]
    nb = bk // BLOCK
    x3 = xT_ref[:].reshape(nb, BLOCK, m)
    w3 = w_ref[:].reshape(nb, BLOCK, bn)
    # Batched int8 dot: contraction over each 32-block, exact int32 sums.
    dots = jax.lax.dot_general(
        x3, w3, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # (nb, m, bn)
    ex = sxT_ref[:].astype(jnp.int32)  # (nb, m)
    ew = sw_ref[:].astype(jnp.int32)  # (nb, bn)
    e = jnp.clip(ex[:, :, None] + ew[:, None, :] - 127, 0, 254)
    scale = jax.lax.bitcast_convert_type(e << 23, jnp.float32)
    acc_ref[:] += jnp.sum(dots.astype(jnp.float32) * scale, axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk"))
def matmul_int8_dot(xcT, sxT, w_codes, w_scale, bn, bk):
    K, M = xcT.shape
    N = w_codes.shape[1]
    grid = (N // bn, K // bk)
    return pl.pallas_call(
        _kernel_int8_dot,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, M), lambda j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xcT, sxT, w_codes.view(jnp.int8) if hasattr(w_codes, "view") else w_codes, w_scale)


# ---------------------------------------------------------------------------
# C. SWAR fp4 kernel (halves packing, both nibbles per i32 lane)
# ---------------------------------------------------------------------------


def _i32(v):
    return jnp.int32(v if v < 2**31 else v - 2**32)


def _kernel_fp4_swar(x_ref, w_ref, sa_ref, sb_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[:].astype(jnp.int32)  # (bkp, bn); hi nibble: el p, lo: el p+K/2
    sa = sa_ref[:].astype(jnp.int32)
    sb = sb_ref[:].astype(jnp.int32)
    # Packed per-block words (tiny arrays, sublane-broadcast for free):
    # swfp: biased field base per half = se<<7 (bias 0xC0 vs the true field).
    swfp = pm._expand_scale((sa << 23) | (sb << 7), BLOCK)
    # thr: smallest alive magnitude code per half (se>=2 -> 1, 1 -> 2, 0 -> 8).
    def thr(se):
        return jnp.where(se >= 2, 1, jnp.where(se == 1, 2, 8))

    thrp = pm._expand_scale((thr(sa) << 16) | thr(sb), BLOCK)

    u = ((b << 12) | b) & 0x000F000F
    m = u & 0x00070007
    sgn = (u & 0x00080008) << 12
    s = ((m >> 1) | (m >> 2)) & 0x00010001
    biased = ((m + s) << 6) + swfp
    g = ((m | _i32(0x80008000)) - thrp) & _i32(0x80008000)
    mask = ((g >> 15) & 0x00010001) * 0xFFFF
    bits = ((biased & mask) - (0x00C000C0 & mask)) | sgn
    w_hi = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    w_lo = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)
    w = jnp.concatenate([w_hi, w_lo], axis=0)
    acc_ref[:] += pm._dot_f32acc(x_ref[:], w)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk"))
def matmul_fp4_swar(x, w_data, w_scale, bn, bk):
    """x pre-arranged so rows match [hi-plane; lo-plane] concat per tile:
    the same two-half-tiles trick as the shipping halves kernel."""
    M, K = x.shape
    N = w_data.shape[1]
    bkp = bk // 2
    nko = (K // 2) // bkp
    grid = (N // bn, K // bk)
    return pl.pallas_call(
        _kernel_fp4_swar,
        grid=grid,
        in_specs=[
            # x as one (M, bk) tile built from the two half-ranges: pass x
            # pre-concatenated outside (decode M is tiny).
            pl.BlockSpec((M, bk), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp // BLOCK, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bkp // BLOCK, bn), lambda j, k: (k + nko, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, w_data, w_scale, w_scale)


def swar_x_arrange(x, bk):
    """Interleave x columns so tile k rows match [hi(k); lo(k)]: columns
    [k*bkp:(k+1)*bkp] of the hi half then of the lo half, per bk-tile."""
    M, K = x.shape
    bkp = bk // 2
    xh = x[:, : K // 2].reshape(M, K // bk, bkp)
    xl = x[:, K // 2 :].reshape(M, K // bk, bkp)
    return jnp.concatenate([xh, xl], axis=2).reshape(M, K)


# ---------------------------------------------------------------------------


def main():
    only = os.environ.get("LAB_ONLY", "")  # e.g. "swar" to run one variant
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K, N = 4096, 14336
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
    print(f"shape M={M} K={K} N={N}  backend={jax.default_backend()}", flush=True)

    results = {}

    def bf16_step(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    # --- correctness smoke first (cheap shapes), then timing ---
    w_fp8 = MXArray.to_mx(w, "float8_e4m3", 32).T
    w_int8 = MXArray.to_mx(w, "int8", 32).T
    w_fp4 = MXArray.to_mx(w, "float4_e2m1", 32).T.to_fp4_halves()

    bn, bk = 2048, 512

    # A. fp8 convert
    try:
        if only and "fp8c" not in only:
            raise RuntimeError("skipped by LAB_ONLY")
        out = matmul_fp8_convert(x, w_fp8.data, w_fp8.scale_e8m0, bn, bk)
        ref = jnp.matmul(
            x, w_fp8.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        exact = bool(jnp.all(out == ref))
        print(f"A fp8-convert: max_abs_err={err:.3e} bitexact={exact}", flush=True)
        results["fp8_convert_ok"] = True
    except Exception as e:
        print(f"A fp8-convert FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results["fp8_convert_ok"] = False

    # B. int8 dot
    try:
        if only and "int8dot" not in only:
            raise RuntimeError("skipped by LAB_ONLY")
        xq = MXArray.to_mx(x, "int8", 32)
        xcT = xq.data.view(jnp.int8).T if xq.data.dtype != jnp.int8 else xq.data.T
        sxT = xq.scale_e8m0.T
        out = matmul_int8_dot(xcT, sxT, w_int8.data, w_int8.scale_e8m0, bn, bk)
        ref = jnp.matmul(
            xq.to_dtype(jnp.bfloat16),
            w_int8.to_dtype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        err = float(
            jnp.max(
                jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
                / (jnp.abs(ref.astype(jnp.float32)) + 1e-3)
            )
        )
        print(f"B int8-dot: max_rel_err={err:.3e}", flush=True)
        results["int8_dot_ok"] = True
    except Exception as e:
        print(f"B int8-dot FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results["int8_dot_ok"] = False

    # C. SWAR fp4
    try:
        if only and "swar" not in only:
            raise RuntimeError("skipped by LAB_ONLY")
        xs = swar_x_arrange(x, bk)
        out = matmul_fp4_swar(xs, w_fp4.data, w_fp4.scale_e8m0, bn, bk)
        ref = pm.matmul_any(x, w_fp4, jnp.bfloat16)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        exact = bool(jnp.all(out == ref))
        print(f"C fp4-swar: max_abs_err_vs_halves={err:.3e} bitexact={exact}", flush=True)
        results["fp4_swar_ok"] = True
    except Exception as e:
        print(f"C fp4-swar FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results["fp4_swar_ok"] = False

    # --- timing (differential method; see bench.py) ---
    def time_pair(name, trial, base_trial):
        t, tb = _paired(trial, base_trial, trials=5)
        results[name] = t * 1e3
        results.setdefault("bf16_ms_runs", []).append(tb * 1e3)
        print(f"{name}: {t*1e3:.3f} ms   (bf16 same-run {tb*1e3:.3f} ms)", flush=True)

    bf16_trial = _timed_loop(bf16_step, x, w)

    if not only or "cur" in only:
        time_pair(
            "cur_fp4_halves",
            _timed_loop(lambda c, wd, ws: pm._pallas_matmul_fp4_halves(
                c, wd, ws, bn, bk, jnp.bfloat16
            ), x, w_fp4.data, w_fp4.scale_e8m0),
            bf16_trial,
        )
        time_pair(
            "cur_fp8",
            _timed_loop(lambda c, wd, ws: pm._pallas_matmul_1byte(
                c, wd, ws, "float8_e4m3", bn, bk, jnp.bfloat16
            ), x, w_fp8.data, w_fp8.scale_e8m0),
            bf16_trial,
        )
        time_pair(
            "cur_int8",
            _timed_loop(lambda c, wd, ws: pm._pallas_matmul_1byte(
                c, wd, ws, "int8", bn, bk, jnp.bfloat16
            ), x, w_int8.data, w_int8.scale_e8m0),
            bf16_trial,
        )
    if results.get("fp8_convert_ok"):
        time_pair(
            "fp8_convert",
            _timed_loop(lambda c, wd, ws: matmul_fp8_convert(c, wd, ws, bn, bk),
                        x, w_fp8.data, w_fp8.scale_e8m0),
            bf16_trial,
        )
    if results.get("int8_dot_ok"):
        xq = MXArray.to_mx(x, "int8", 32)
        xcT0 = jnp.asarray(xq.data.view(jnp.int8).T)
        sxT0 = jnp.asarray(xq.scale_e8m0.T)

        def int8_step(c, sx, wd, ws):
            return matmul_int8_dot(c, sx, wd, ws, bn, bk).T  # keep carry shape

        # carry must be xcT (K, M) int8: wrap so the scan carry stays bf16 x.
        def step(c, wd, ws):
            # quantize x inside the step (what serving would do)
            xq = MXArray.to_mx(c, "int8", 32)
            xcT = xq.data.view(jnp.int8).T
            sxT = xq.scale_e8m0.T
            return matmul_int8_dot(xcT, sxT, wd, ws, bn, bk)

        time_pair(
            "int8_dot(incl act quant)",
            _timed_loop(step, x, w_int8.data, w_int8.scale_e8m0),
            bf16_trial,
        )
    if not only or "fp8dot" in only:
        # Round-5 production tier (TORCHMX_FP8_DOT): raw e4m3 codes into
        # the MXU via the shipping fp8dot_any wrapper (incl. act quantize).
        def fp8dot_step(c, wd, ws):
            w_flat = MXArray(
                ws, wd, w_fp8.elem_dtype, 32, jnp.bfloat16, 0, 0,
            )
            out = pm.fp8dot_any(c, w_flat, jnp.bfloat16)
            assert out is not None
            return out

        time_pair(
            "fp8_dot(incl act quant)",
            _timed_loop(fp8dot_step, x, w_fp8.data, w_fp8.scale_e8m0),
            bf16_trial,
        )

    if results.get("fp4_swar_ok"):
        def swar_step(c, wd, ws):
            return matmul_fp4_swar(swar_x_arrange(c, bk), wd, ws, bn, bk)

        time_pair(
            "fp4_swar",
            _timed_loop(swar_step, x, w_fp4.data, w_fp4.scale_e8m0),
            bf16_trial,
        )

    bf = results.get("bf16_ms_runs", [])
    print(f"bf16 median: {np.median(bf):.3f} ms over {len(bf)} runs", flush=True)
    floors = {"fp4": N * K * 0.5 / 819e9 * 1e3, "1byte": N * K / 819e9 * 1e3}
    print(f"HBM floors: fp4 {floors['fp4']:.3f} ms, 1-byte {floors['1byte']:.3f} ms")


if __name__ == "__main__":
    main()
