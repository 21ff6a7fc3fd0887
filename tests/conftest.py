"""Shared fixtures: exhaustive bf16 bit-pattern inputs and the dual-mode
quantizer env toggle (model of reference ``tests/conftest.py``).

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
without TPU hardware (``xla_force_host_platform_device_count``).
"""

import os

# Must be set before jax initializes its backends.  The environment may pin
# JAX_PLATFORMS to a TPU plugin (e.g. "axon"); tests always run on a virtual
# 8-device CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from torchmx_tpu import dtypes  # noqa: E402
from torchmx_tpu import env_variables as env  # noqa: E402


def bf16_from_bits(sign, exponent, mantissa):
    """Compose bf16 values from (sign, exponent, mantissa) integer fields.

    Inputs broadcast together; returns a jnp bfloat16 array.
    """
    sign = np.asarray(sign, dtype=np.uint16)
    exponent = np.asarray(exponent, dtype=np.uint16)
    mantissa = np.asarray(mantissa, dtype=np.uint16)
    bits = (sign << 15) | (exponent << 7) | mantissa
    bits = np.broadcast_arrays(bits)[0]
    return jnp.asarray(bits).view(jnp.bfloat16)


@pytest.fixture()
def bfloat16_all_normals():
    """Every bf16 normal value (both signs), sorted."""
    mantissa = np.arange(128, dtype=np.uint16).reshape(1, 1, -1)
    exponent = (np.arange(1, 255, dtype=np.uint16) << 7).reshape(1, -1, 1)
    sign = (np.array([0, 1], dtype=np.uint16) << 15).reshape(-1, 1, 1)
    bits = (sign | exponent | mantissa).flatten()
    vals = jnp.asarray(bits).view(jnp.bfloat16)
    return jnp.sort(vals)


@pytest.fixture()
def bfloat16_subnormals():
    """Every bf16 subnormal value (both signs), sorted."""
    mantissa = np.arange(1, 128, dtype=np.uint16).reshape(1, -1)
    sign = (np.array([0, 1], dtype=np.uint16) << 15).reshape(-1, 1)
    bits = (sign | mantissa).flatten()
    vals = jnp.asarray(bits).view(jnp.bfloat16)
    return jnp.sort(vals)


@pytest.fixture()
def all_bfloat16_values(bfloat16_all_normals, bfloat16_subnormals):
    return jnp.sort(jnp.concatenate([bfloat16_all_normals, bfloat16_subnormals]))


@pytest.fixture()
def all_float22_e8m13_values():
    """Every float22_e8m13 value embedded in fp32, plus specials."""
    mantissa_shift = dtypes.float32.mantissa_bits - dtypes.float22_e8m13.mantissa_bits
    mantissa = (np.arange(0, 2**13, dtype=np.uint32) << mantissa_shift).reshape(1, 1, -1)
    exponent = (np.arange(0, 255, dtype=np.uint32) << 23).reshape(1, -1, 1)
    sign = (np.array([0, 1], dtype=np.uint32) << 31).reshape(-1, 1, 1)
    bits = (sign | exponent | mantissa).flatten()
    vals = bits.view(np.float32)
    specials = np.array([np.nan, -np.inf, np.inf, -np.nan], dtype=np.float32)
    return jnp.asarray(np.sort(np.concatenate([vals, specials])))


@pytest.fixture()
def special_bfloat16_vector():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    x[0, 1] = np.inf
    x[1, 1] = -np.inf
    x[2, 1] = np.nan
    x[3, 1] = -np.nan
    x[4, 1], x[4, 2] = np.nan, np.inf
    return jnp.asarray(x, dtype=jnp.bfloat16)


@pytest.fixture(params=["True", "False"])
def set_quantization_env(request):
    """Run the test under both quantizer implementations (hw-exact/simulated)."""
    old = env.MX_EXACT_QUANTIZATION
    env.MX_EXACT_QUANTIZATION = request.param
    yield
    env.MX_EXACT_QUANTIZATION = old
