"""Exhaustive fake-quantize check: pallas (interpret on CPU / native on TPU)
vs jnp quantize+dequantize over all 2^16 bf16 bit patterns (dev tool)."""
import os

import numpy as np

import jax
import jax.numpy as jnp

from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.ops import pallas_quantize as pq

ALL = ["float8_e4m3", "float6_e3m2", "float6_e2m3", "float4_e2m1", "int8"]


def all_bf16(seed):
    bits = np.arange(65536, dtype=np.uint16)
    rng = np.random.default_rng(seed)
    rng.shuffle(bits)
    return jnp.asarray(bits).view(jnp.bfloat16).reshape(128, 512)


def check(x, name, tag):
    ref = np.asarray(MXArray.to_mx(x, name, 32).to_dtype(jnp.bfloat16), np.float32)
    out = pq.fake_quantize_pallas(x, name, 32)
    assert out is not None, f"{name} ineligible"
    a = np.asarray(out, np.float32)
    both_nan = np.isnan(a) & np.isnan(ref)
    a = np.where(both_nan, 0, a)
    r = np.where(both_nan, 0, ref)
    bad = ~(
        (a == r)
        | ((a == 0) & (r == 0))  # allow -0 vs +0? no — require bit equality below
    )
    # signed-zero check: compare bit patterns where both are zero
    az = np.asarray(out).view(np.uint16) if out.dtype == jnp.bfloat16 else None
    eq = np.array_equal(a, r)
    if not eq:
        idx = np.argwhere(a != r)[:5]
        for i, j in idx:
            xi = np.asarray(x, np.float32)[i, j]
            print(f"  MISMATCH {tag} {name} [{i},{j}]: x={xi} got={a[i,j]} ref={r[i,j]}")
        raise SystemExit(1)
    # bit-level (covers signed zeros)
    gb = np.asarray(out).view(np.uint16)
    rb = np.asarray(MXArray.to_mx(x, name, 32).to_dtype(jnp.bfloat16)).view(np.uint16)
    nz = ~(both_nan.reshape(gb.shape))
    if not np.array_equal(gb[nz], rb[nz]):
        d = np.argwhere((gb != rb) & nz)[:5]
        for i, j in d:
            print(f"  BITDIFF {tag} {name} [{i},{j}]: got={gb[i,j]:04x} ref={rb[i,j]:04x}")
        raise SystemExit(1)
    print(f"  ok {tag} {name}")


def main():
    for name in ALL:
        for seed in (0, 1, 2):
            check(all_bf16(seed), name, f"shuffle{seed}")
        # Adversarial: per-block max-setter with a sweep of magnitudes below it.
        rng = np.random.default_rng(9)
        maxes = np.float32(2.0) ** rng.integers(-130, 128, size=(256, 1))
        offs = np.float32(2.0) ** rng.integers(-20, 1, size=(256, 32))
        signs = rng.choice([-1.0, 1.0], size=(256, 32)).astype(np.float32)
        x = jnp.asarray(maxes * offs * signs, jnp.bfloat16).reshape(128, 64)
        check(x, name, "adversarial")
    print("ALL OK")


if __name__ == "__main__":
    main()
