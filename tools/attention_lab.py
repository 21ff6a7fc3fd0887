"""Attention-decode laboratory: where does the fused MX-cache decode step go?

Round-3 experiment: decode attention runs ~5x above its HBM floor
(int8 0.40-0.46 ms, fp8 0.64 ms vs ~85 us K+V read at b=4 hq=32 hkv=8
L=8192).  Candidates timed here on the real chip:

  1. KV tile size Lt: 512 (shipping) vs 1024/2048 — grid-invocation count
     drops 4x; fixed per-invocation overhead is a prime suspect.
  2. dot_operand decode shave (landed) for fp8.
  3. bf16-cache iso-kernel baseline (the honest comparator).

Run:  python tools/attention_lab.py [L] [b]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop, _paired
from torchmx_tpu.models.llama import MXLayerKVCache
from torchmx_tpu.ops import pallas_attention as pa

HQ, HKV, D = 32, 8, 128


import functools

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLOCK = 32


def _attn_kernel_chunkdot(
    qoff_ref, kvlen_ref, q_ref, kd_ref, ks_ref, vd_ref, vs_ref,
    o_ref, m_ref, l_ref, acc_ref, *, sm_scale, g, sqt,
):
    """int8-cache attention with the block scale FACTORED OUT of the dots.

    Instead of decoding every K/V element to scaled bf16 (~4 VPU ops each),
    codes convert bare (1 hw op) and the per-32-block scales multiply the
    chunk PARTIAL SUMS:  q.K^T = sum_blk 2^(se_blk-127) * (q_blk . k_blk),
    P.V   = sum_blk (P * 2^(se_blk-127)) . v_blk  (scale folded into the
    small P side).  Accumulator kept in (4, rows, 32) chunk layout; the
    wrapper un-chunks outside the kernel.
    """
    qt = pl.program_id(2)
    kt = pl.program_id(3)
    rows = q_ref.shape[4]  # q block (1, 1, 4, 32, rows)
    lt = kd_ref.shape[2]
    d = 4 * BLOCK

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

    @pl.when(work)
    def _():
        q3 = q_ref[0, 0]  # (4, 32, rows) bf16: pre-chunked, pre-transposed
        kf = kd_ref[0, 0].astype(jnp.bfloat16)  # (lt, d) bare convert
        kT = kf.T.reshape(4, BLOCK, lt)
        dots = jax.lax.dot_general(
            q3, kT, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (4, rows, lt) chunk partials
        ks = ks_ref[0, 0].astype(jnp.int32)  # (lt, 4)
        kscale = jax.lax.bitcast_convert_type(
            (ks.T << 23), jnp.float32
        )  # (4, lt) = 2^(se-127)
        s = jnp.sum(dots * kscale[:, None, :], axis=0) * sm_scale  # (rows, lt)

        q_pos = q_off + qt * sqt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0) // g
        kv_pos = kt * lt + jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 1)
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        vf = vd_ref[0, 0].astype(jnp.bfloat16)  # (lt, d) bare convert
        vT = vf.T.reshape(4, BLOCK, lt)
        vs = vs_ref[0, 0].astype(jnp.int32)  # (lt, 4)
        vscale = jax.lax.bitcast_convert_type((vs.T << 23), jnp.float32)  # (4, lt)
        p3 = (p[None, :, :] * vscale[:, None, :]).astype(jnp.bfloat16)  # (4, rows, lt)
        pv = jax.lax.dot_general(
            p3, vT, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (4, rows, 32)
        acc_ref[:] = acc_ref[:] * alpha[None] + pv
        m_ref[:, :1] = m_new

    @pl.when(kt == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l[None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "lt", "g", "sqt"))
def _chunkdot_attention(q3, k_data, k_scale, v_data, v_scale, q_off, kv_len,
                        sm_scale, lt, g, sqt):
    b, hkv, four, blk, rows = q3.shape
    L = k_data.shape[2]
    d = four * blk
    nb = d // BLOCK
    grid = (b, hkv, rows // (sqt * g), L // lt)
    kernel = functools.partial(
        _attn_kernel_chunkdot, sm_scale=sm_scale, g=g, sqt=sqt
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4, blk, rows), lambda ib, ih, qt, kt: (ib, ih, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, d), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lt, nb), lambda ib, ih, qt, kt: (ib, ih, kt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4, rows, blk), lambda ib, ih, qt, kt: (ib, ih, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, 4, rows, blk), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((4, rows, blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(q_off, kv_len, q3, k_data, k_scale, v_data, v_scale)


def chunkdot_attention(q, cache_kd, cache_ks, cache_vd, cache_vs, q_off, kv_len, sm, lt):
    """q (b, hq, 1, d) -> (b, hq, 1, d); int8 cache only."""
    b, hq, sq, d = q.shape
    hkv = cache_kd.shape[1]
    g = hq // hkv
    # (b, hkv, g, d) rows -> chunk layout (b, hkv, 4, 32, rows)
    q4 = (
        q.astype(jnp.bfloat16).reshape(b, hkv, g, d)
        .transpose(0, 1, 3, 2)  # (b, hkv, d, rows)
        .reshape(b, hkv, 4, BLOCK, g)
    )
    q_off = jnp.broadcast_to(jnp.asarray(q_off, jnp.int32), (b,))
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    out = _chunkdot_attention(
        q4, cache_kd, cache_ks, cache_vd, cache_vs, q_off, kv_len, sm, lt, g, 1
    )  # (b, hkv, 4, rows, 32)
    return (
        out.transpose(0, 1, 3, 2, 4).reshape(b, hkv, g, d).reshape(b, hq, sq, d)
    )


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sm = 1.0 / math.sqrt(D)
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.standard_normal((B, HQ, 1, D)) * 0.3, jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, HKV, L, D)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, HKV, L, D)) * 0.3, jnp.bfloat16)
    g = HQ // HKV
    floor_ms = 2 * B * HKV * L * D / 819e9 * 1e3
    print(
        f"b={B} hq={HQ} hkv={HKV} d={D} L={L}  1-byte K+V floor {floor_ms:.3f} ms",
        flush=True,
    )

    def q4_of(q):
        b = q.shape[0]
        return (
            q.astype(jnp.bfloat16)
            .reshape(b, HKV, g, 1, D)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, HKV, g, D)
        )

    def fused_trial(ename, lt):
        cache0 = MXLayerKVCache.create(B, HKV, L, D, ename, 32).write(kc, vc, 0)
        q_off = jnp.full((B,), L - 1, jnp.int32)
        kv_len = jnp.full((B,), L, jnp.int32)

        def step(q, kd, ks, vd, vs):
            q4 = q4_of(q)
            out = pa._mx_cached_attention(
                q4, kd, ks, vd, vs, q_off, kv_len, ename, sm, lt, g, 1
            )
            return out.reshape(B, HKV, 1, g, D).transpose(0, 1, 3, 2, 4).reshape(
                B, HQ, 1, D
            )

        return _timed_loop(
            step, qd, cache0.k_data, cache0.k_scale, cache0.v_data, cache0.v_scale
        )

    def bf16_trial(lt):
        dummy = jnp.zeros((B, HKV, L, D // 32), jnp.uint8)
        q_off = jnp.full((B,), L - 1, jnp.int32)
        kv_len = jnp.full((B,), L, jnp.int32)

        def step(q, kf, vf):
            q4 = q4_of(q)
            out = pa._mx_cached_attention(
                q4, kf, dummy, vf, dummy, q_off, kv_len, "bfloat16", sm, lt, g, 1
            )
            return out.reshape(B, HKV, 1, g, D).transpose(0, 1, 3, 2, 4).reshape(
                B, HQ, 1, D
            )

        return _timed_loop(step, qd, kc, vc)

    fmts = os.environ.get("LAB_FMTS", "int8,float8_e4m3,float4_e2m1,bf16").split(",")
    lts = [int(v) for v in os.environ.get("LAB_LTS", "512,1024,2048").split(",")]

    if "int8cd" in fmts:
        cache0 = MXLayerKVCache.create(B, HKV, L, D, "int8", 32).write(kc, vc, 0)
        ref = pa.cached_attention_any(
            qd, cache0, jnp.full((B,), L - 1, jnp.int32), jnp.full((B,), L, jnp.int32), sm
        )
        got = chunkdot_attention(
            qd, cache0.k_data, cache0.k_scale, cache0.v_data, cache0.v_scale,
            L - 1, L, sm, min(lts),
        )
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"int8cd correctness: max_abs_err vs fused kernel = {err:.2e}", flush=True)

        def cd_trial(lt):
            def step(q, kd, ks, vd, vs):
                return chunkdot_attention(q, kd, ks, vd, vs, L - 1, L, sm, lt)

            return _timed_loop(
                step, qd, cache0.k_data, cache0.k_scale, cache0.v_data, cache0.v_scale
            )

        base_cd = fused_trial("int8", 512)
        for lt in lts:
            if L % lt:
                continue
            t, tb = _paired(cd_trial(lt), base_cd, trials=4)
            print(f"{'int8-chunkdot':14s} lt={lt:5d}: {t*1e3:.3f} ms  (int8/512 same-run {tb*1e3:.3f})", flush=True)
        fmts = [f for f in fmts if f != "int8cd"]
        if not fmts:
            return

    base = fused_trial("int8", 512)
    for ename in fmts:
        for lt in lts:
            if L % lt:
                continue
            trial = bf16_trial(lt) if ename == "bf16" else fused_trial(ename, lt)
            t, tb = _paired(trial, base, trials=4)
            print(f"{ename:14s} lt={lt:5d}: {t*1e3:.3f} ms  (int8/512 same-run {tb*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
