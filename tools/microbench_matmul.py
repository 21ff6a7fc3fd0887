"""Component micro-bench for the fused dequant-matmul path (dev tool).

Uses the same differential data-dependent-scan methodology as bench.py
(absolute timings lie on this execution path; marginal scan-step cost is
the real device time).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.ops import mx_matmul, mx_fake_quantize

M, K, N = 1024, 4096, 14336
REPS_LO, REPS_HI, TRIALS = 40, 120, 5


def _timed_loop(step_fn, x, *consts):
    def make(reps):
        @jax.jit
        def loop(x, *consts):
            def body(c, _):
                y = step_fn(c, *consts)
                col = jnp.max(y, axis=1, keepdims=True).astype(jnp.bfloat16)
                c = c * 0.5 + col * 1e-6
                return c, ()

            c, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(c.astype(jnp.float32))

        return loop

    lo, hi = make(REPS_LO), make(REPS_HI)
    float(lo(x, *consts))
    float(hi(x, *consts))
    deltas = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(lo(x, *consts))
        t1 = time.perf_counter()
        float(hi(x, *consts))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (REPS_HI - REPS_LO))
    return float(np.median(deltas)) * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
    w4 = jax.tree_util.tree_map(
        jax.device_put, MXArray.to_mx(w, "float4_e2m1", 32).T
    )
    w8 = jax.tree_util.tree_map(
        jax.device_put, MXArray.to_mx(w, "float8_e4m3", 32).T
    )
    w6 = jax.tree_util.tree_map(
        jax.device_put, MXArray.to_mx(w, "float6_e3m2", 32).T
    )
    wi8 = jax.tree_util.tree_map(jax.device_put, MXArray.to_mx(w, "int8", 32).T)

    def bf16_step(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def kern_step(x, wm):
        return mx_matmul(x, wm, out_dtype=jnp.bfloat16)

    def fq_step(x):
        return mx_fake_quantize(x, "float8_e4m3", 32)

    t_bf16 = _timed_loop(bf16_step, x, w)
    print(f"bf16 matmul      : {t_bf16:7.3f} ms  ({2*M*K*N/t_bf16/1e9:.0f} TFLOPs)")
    for name, wm in [("fp4", w4), ("fp8", w8), ("fp6_e3m2", w6), ("int8", wi8)]:
        t = _timed_loop(kern_step, x, wm)
        print(f"pallas {name:9s}: {t:7.3f} ms  ratio {t_bf16/t:.3f}")
    t_fq = _timed_loop(fq_step, x)
    print(f"act fake-quant   : {t_fq:7.3f} ms")


if __name__ == "__main__":
    main()
