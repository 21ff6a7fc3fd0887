"""MX matmul smoke test — quantize two arrays and compare the MX matmul with
the bf16 ground truth (analog of reference ``examples/check_mxtensor_ops.py``).

Run: ``python examples/check_mx_ops.py``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torchmx_tpu import MXArray, mx_matmul

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((128, 256)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.bfloat16)

    a_mx = MXArray.to_mx(a, "float8_e4m3", block_size=32)
    b_mx = MXArray.to_mx(b.T, "float6_e3m2", block_size=32).T  # K-blocked

    out = mx_matmul(a_mx, b_mx, out_dtype=jnp.bfloat16)
    ref = jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    err = jnp.linalg.norm((out - ref).astype(jnp.float32)) / jnp.linalg.norm(
        ref.astype(jnp.float32)
    )
    sqnr = -20.0 * jnp.log10(err)
    print(f"a: {a_mx}")
    print(f"b: {b_mx}")
    print(f"mx_matmul vs bf16 matmul: relative error {float(err):.4f}  SQNR {float(sqnr):.1f} dB")
    assert float(sqnr) > 14.0, "MX matmul diverged from the bf16 ground truth"
    print("OK")
