"""Headline benchmark: MX fused dequant-matmul throughput vs bf16 matmul.

Llama-3-8B MLP shape (M=1024 tokens, K=4096, N=14336) with MXFP4 weights and
MXFP8 activations — the BASELINE.json north-star configuration.  Prints ONE
JSON line:

    {"metric": "mxfp4w_fp8a_matmul_frac_of_bf16", "value": r, "unit": "ratio",
     "vs_baseline": r / 0.80}

where ``value`` is (bf16 matmul time) / (MX dequant-matmul time) on the same
shape and ``vs_baseline`` normalizes by the >=0.80-of-bf16 target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 1024, 4096, 14336
REPS_LO, REPS_HI, TRIALS = 40, 120, 5


def _timed_loop(step_fn, x, *consts):
    """Per-step wall time of a data-dependent scan of ``step_fn``, measured
    differentially between two scan lengths.

    The execution path here has a large fixed per-call overhead and
    acknowledges short calls asynchronously, so absolute timings lie; the
    marginal cost (T(hi) - T(lo)) / (hi - lo) isolates the real device time.
    The scan body folds the output back into the carry so XLA cannot elide or
    reorder the work.
    """

    def make(reps):
        @jax.jit
        def loop(x, *consts):
            def body(c, _):
                y = step_fn(c, *consts)  # (M, N)
                # Consume every output column NON-linearly (a linear reduction
                # like sum gets strength-reduced into the weights, deleting
                # the matmul).
                col = jnp.max(y, axis=1, keepdims=True).astype(jnp.bfloat16)
                c = c * 0.5 + col * 1e-6
                return c, ()

            c, _ = jax.lax.scan(body, x, None, length=reps)
            # Scalar output: forcing the value to host is the only reliable
            # sync point on this execution path.
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
    return float(np.median(deltas))


def main():
    from torchmx_tpu.mx_array import MXArray
    from torchmx_tpu.ops import mx_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)

    # K-major kernel layout with fp4 halves packing, as stored by
    # MXInferenceLinear.
    w_mx = MXArray.to_mx(w, "float4_e2m1", 32).T.to_fp4_halves()
    w_mx = jax.tree_util.tree_map(jax.device_put, w_mx)

    def bf16_step(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def mx_step(x, w_mx):
        from torchmx_tpu.ops import mx_fake_quantize

        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
        return mx_matmul(x_fq, w_mx, out_dtype=jnp.bfloat16)

    t_bf16 = _timed_loop(bf16_step, x, w)
    t_mx = _timed_loop(mx_step, x, w_mx)

    ratio = t_bf16 / t_mx
    flops = 2.0 * M * K * N
    print(
        json.dumps(
            {
                "metric": "mxfp4w_fp8a_matmul_frac_of_bf16",
                "value": round(ratio, 4),
                "unit": "ratio",
                "vs_baseline": round(ratio / 0.80, 4),
                "detail": {
                    "bf16_ms": round(t_bf16 * 1e3, 3),
                    "mx_ms": round(t_mx * 1e3, 3),
                    "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
                    "mx_tflops": round(flops / t_mx / 1e12, 1),
                    "shape": [M, K, N],
                    "backend": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
