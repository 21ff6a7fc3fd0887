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
