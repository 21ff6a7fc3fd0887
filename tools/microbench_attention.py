"""Decode-attention micro-bench: fused MX-KV-cache kernel vs the
dequantize-the-cache path vs a bf16 cache (dev tool, differential timing)."""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from torchmx_tpu import env_variables as env
from torchmx_tpu.models.llama import LayerKVCache, MXLayerKVCache, repeat_kv
from torchmx_tpu.ops import pallas_attention as pa

B, HQ, HKV, D, L = 1, 32, 8, 128, 2048
SCALE = 1.0 / math.sqrt(D)
REPS_LO, REPS_HI, TRIALS = 60, 180, 5


def _timed_loop(step_fn, q, *consts):
    def make(reps):
        @jax.jit
        def loop(q, *consts):
            def body(c, _):
                y = step_fn(c, *consts)  # (B, HQ, 1, D)
                col = jnp.max(y, axis=-1, keepdims=True).astype(jnp.bfloat16)
                c = c * 0.5 + col * 1e-6
                return c, ()

            c, _ = jax.lax.scan(body, q, None, length=reps)
            return jnp.sum(c.astype(jnp.float32))

        return loop

    lo, hi = make(REPS_LO), make(REPS_HI)
    float(lo(q, *consts))
    float(hi(q, *consts))
    deltas = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(lo(q, *consts))
        t1 = time.perf_counter()
        float(hi(q, *consts))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (REPS_HI - REPS_LO))
    return float(np.median(deltas)) * 1e3


def main():
    import sys

    elem = sys.argv[1] if len(sys.argv) > 1 else "float8_e4m3"
    sq = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # >1 = prefill shape
    layout = sys.argv[3] if len(sys.argv) > 3 else "seq"  # or "dmajor"

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, HQ, sq, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, L, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, L, D)) * 0.3, jnp.bfloat16)
    mx_cache = MXLayerKVCache.create(B, HKV, L, D, elem, 32, layout=layout).write(
        k, v, 0
    )
    hp_cache = LayerKVCache(k=k, v=v)
    mask = jnp.zeros((1, 1, 1, L), jnp.float32)
    q_off, kv_len = L - sq, L

    def fused_step(q, kd, ks, vd, vs):
        cache = MXLayerKVCache(
            k_data=kd, k_scale=ks, v_data=vd, v_scale=vs,
            elem_dtype_name=elem, block_size=32, layout=layout,
        )
        out = pa.cached_attention_any(q, cache, q_off, kv_len, SCALE)
        assert out is not None
        return out

    def dequant_step(q, kd, ks, vd, vs):
        cache = MXLayerKVCache(
            k_data=kd, k_scale=ks, v_data=vd, v_scale=vs,
            elem_dtype_name=elem, block_size=32, layout=layout,
        )
        kf, vf = cache.dequantize()
        kf = repeat_kv(kf, HQ // HKV)
        vf = repeat_kv(vf, HQ // HKV)
        s = jnp.matmul(q, kf.swapaxes(-2, -1), preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32) * SCALE + mask
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.matmul(p, vf, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def bf16_step(q, kf, vf):
        kk = repeat_kv(kf, HQ // HKV)
        vv = repeat_kv(vf, HQ // HKV)
        s = jnp.matmul(q, kk.swapaxes(-2, -1), preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32) * SCALE + mask
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.matmul(p, vv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    try:
        t_f = _timed_loop(fused_step, q, mx_cache.k_data, mx_cache.k_scale,
                          mx_cache.v_data, mx_cache.v_scale)
        t_d = _timed_loop(dequant_step, q, mx_cache.k_data, mx_cache.k_scale,
                          mx_cache.v_data, mx_cache.v_scale)
        t_b = _timed_loop(bf16_step, q, hp_cache.k, hp_cache.v)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    cache_mb = (
        np.prod(mx_cache.k_data.shape) + np.prod(mx_cache.k_scale.shape)
    ) * 2 / 1e6
    print(f"attention (b={B} hq={HQ} hkv={HKV} d={D} L={L} sq={sq}, "
          f"{elem} cache {cache_mb:.1f}MB):")
    print(f"  fused MX kernel   : {t_f:7.3f} ms")
    print(f"  dequantize path   : {t_d:7.3f} ms  ({t_d/t_f:.2f}x slower)")
    print(f"  bf16 cache (eager): {t_b:7.3f} ms  ({t_b/t_f:.2f}x vs fused)")


if __name__ == "__main__":
    main()
