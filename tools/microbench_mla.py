"""Absorbed-MLA decode attention microbench: fused latent kernel vs the
eager full-cache-dequantize path vs an uncompressed-MHA cache read.

The MLA latent cache's whole point is bandwidth: DeepSeek-V3 stores
``r + dr = 576`` numbers per token instead of MHA's ``n·(dk + dv)``
(= 128·(192+128) = 40960 — a 71× compression).  This tool measures, at a
decode step on the real chip:

* ``fused_<elem>`` — the blockwise Pallas kernel over the PACKED latent
  cache (``ops/pallas_mla.py``): decodes tiles in VMEM, reuses each decoded
  tile for both dots (the latent is K *and* V).
* ``fused_bf16`` — the same kernel over an uncompressed bf16 latent cache
  (the honest iso-kernel baseline).
* ``eager_<elem>`` — the pre-round-4 path: dequantize the ENTIRE (b, L, r)
  latent buffer to bf16 in HBM every step, then eager einsums with a dense
  (1, L) mask (``models/deepseek.py`` fallback).
* ``mha_bf16`` — what an UNCOMPRESSED MHA cache read costs at the same
  model scale: the repo's fused bf16 cache-attention kernel over
  (b, n_kv = n, L, d = 128) K and V buffers (per-head keys/values that MLA
  never materializes).

Run:  python tools/microbench_mla.py [L] [elem]
(defaults L=4096, elem=int8; shapes r=512, dr=64, n=32 — a 32-head slice
of the V3 geometry that fits one chip comfortably.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _paired, _timed_loop
from torchmx_tpu.models.deepseek import MLACache, MXMLACache
from torchmx_tpu.models.llama import _standard_cache_mask
from torchmx_tpu.ops import pallas_attention as pa
from torchmx_tpu.ops.pallas_mla import mla_cached_attention


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    elem = sys.argv[2] if len(sys.argv) > 2 else "int8"
    # b=8 rows: the per-step latent read must dwarf the differential-timing
    # noise floor (b=1, L=4096 reads 2.4 MB -> ~3 us, unmeasurable through
    # the tunnel; b=8, L=8192 reads ~38 MB -> ~50 us).
    b, n, sq, r, dr, dv = 8, 32, 1, 512, 64, 128
    sm = 1.0 / np.sqrt(r + dr)
    rng = np.random.default_rng(0)

    latent = jnp.asarray(rng.standard_normal((b, L, r)) * 0.3, jnp.bfloat16)
    k_rot = jnp.asarray(rng.standard_normal((b, L, dr)) * 0.3, jnp.bfloat16)
    q_lat = jnp.asarray(rng.standard_normal((b, n, sq, r)) * 0.3, jnp.bfloat16)
    q_rot = jnp.asarray(rng.standard_normal((b, n, sq, dr)) * 0.3, jnp.bfloat16)

    pos = jnp.arange(L, dtype=jnp.int32)[None]
    mx = MXMLACache.create(b, L, r, dr, elem, 32)
    mx = jax.jit(lambda c, a, k: c.write(a, k, jnp.zeros((b,), jnp.int32)))(
        mx, latent, k_rot
    )
    hp = MLACache.create(b, L, r, dr)
    hp = jax.jit(lambda c, a, k: c.write(a, k, jnp.zeros((b,), jnp.int32)))(
        hp, latent, k_rot
    )
    q_off = jnp.full((b,), L - 1, jnp.int32)
    kv_len = jnp.full((b,), L, jnp.int32)

    # The timed step must thread the (b, n, sq, r) output back into a
    # (M, N)-ish carry for bench._timed_loop; fold it to (n, r).
    def fused_step(c, cache):
        out = mla_cached_attention(
            q_lat + c[None, :, None, :] * 1e-6, q_rot, cache, q_off, kv_len, sm
        )
        assert out is not None, "fused path ineligible at this shape"
        return out[0, :, 0, :]

    def eager_step(c, cache):
        lat_full, rot_full = cache.read()
        mask = _standard_cache_mask(q_off, sq, L)
        ql = q_lat + c[None, :, None, :] * 1e-6
        s = jnp.einsum("bhsr,blr->bhsl", ql, lat_full)
        s = s + jnp.einsum("bhsd,bld->bhsl", q_rot, rot_full)
        s = s * sm + mask
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhsl,blr->bhsr", p, lat_full)[0, :, 0, :]

    c0 = jnp.zeros((n, r), jnp.bfloat16)
    t_fused_mx, t_fused_bf16 = _paired(
        _timed_loop(fused_step, c0, mx), _timed_loop(fused_step, c0, hp)
    )
    t_eager_mx, _ = _paired(
        _timed_loop(eager_step, c0, mx), _timed_loop(fused_step, c0, mx)
    )

    # All-int8 MXU-dot tier (round 5): d-major int8 latent cache, raw codes
    # into the MXU — the latency answer for the quantized latent (the seq
    # int8 kernel buys capacity but loses to the bf16 latent on decode ms).
    t_int8dot = None
    if elem == "int8":
        from torchmx_tpu import env_variables as env_mod

        dm = MXMLACache.create(b, L, r, dr, "int8", 32, layout="dmajor")
        dm = jax.jit(lambda c, a, k: c.write(a, k, jnp.zeros((b,), jnp.int32)))(
            dm, latent, k_rot
        )
        old_flag = env_mod.TORCHMX_ATTN_INT8_DOT
        env_mod.TORCHMX_ATTN_INT8_DOT = "1"
        try:
            tr_int8dot = _timed_loop(fused_step, c0, dm)
        finally:
            env_mod.TORCHMX_ATTN_INT8_DOT = old_flag
        t_int8dot, _ = _paired(tr_int8dot, _timed_loop(fused_step, c0, hp))

    # Uncompressed-MHA row: per-head K (d=128+... use d=128) and V caches at
    # the same head count — the memory MLA refuses to materialize.
    d = 128
    kc = jnp.asarray(rng.standard_normal((b, n, L, d)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, n, L, d)) * 0.3, jnp.bfloat16)
    qd = jnp.asarray(rng.standard_normal((b, n, sq, d)) * 0.3, jnp.bfloat16)

    def mha_step(c, k, v):
        out = pa.bf16_cached_attention(
            qd + c[None, :, None, :] * 1e-6, k, v, L - 1, L, 1.0 / np.sqrt(d)
        )
        assert out is not None
        return out[0, :, 0, :]

    t_mha, _ = _paired(
        _timed_loop(mha_step, jnp.zeros((n, d), jnp.bfloat16), kc, vc),
        _timed_loop(fused_step, c0, mx),
    )

    per_elem = {"bfloat16": 2.0, "float4_e2m1": 0.5}.get(elem, 1.0)
    lat_bytes = int(b * L * (r + dr) * per_elem)
    mha_bytes = 2 * b * n * L * d * 2
    print(f"MLA decode attention  b={b} n={n} L={L} r={r} dr={dr} elem={elem}")
    print(f"| path | ms |")
    print(f"|---|---|")
    print(f"| fused MX latent ({elem}) | {t_fused_mx * 1e3:.3f} |")
    if t_int8dot is not None:
        print(f"| fused int8 MXU-dot latent (dmajor, TORCHMX_ATTN_INT8_DOT) "
              f"| {t_int8dot * 1e3:.3f} |")
    print(f"| fused bf16 latent (iso-kernel baseline) | {t_fused_bf16 * 1e3:.3f} |")
    print(f"| eager MX latent (full-cache dequantize, pre-r4) | {t_eager_mx * 1e3:.3f} |")
    print(f"| uncompressed MHA cache (fused bf16 kernel, d={d}) | {t_mha * 1e3:.3f} |")
    print(
        f"cache read/token: latent {lat_bytes / 1e6:.2f} MB vs MHA "
        f"{mha_bytes / 1e6:.2f} MB ({mha_bytes / lat_bytes:.0f}x)"
    )


if __name__ == "__main__":
    main()
