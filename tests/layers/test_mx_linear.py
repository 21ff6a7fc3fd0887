"""MXInferenceLinear tests (model: reference ``tests/layers/test_mx_linear.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests.layers.conftest import GEMM_COMBINATIONS, LINEAR_SQNR_FLOOR, sqnr_db
from torchmx_tpu import dtypes
from torchmx_tpu.config import MXConfig, QLinearConfig
from torchmx_tpu.layers.linear import Linear, MXInferenceLinear


def make_linear(key=0, in_f=128, out_f=64, bias=True):
    lin = Linear(in_f, out_f, use_bias=bias, rngs=nnx.Rngs(key))
    return lin


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("combo", list(GEMM_COMBINATIONS) + ["int8"])
def test_linear_sqnr(combo):
    if combo == "int8":
        a_dt = w_dt = dtypes.int8
    else:
        a_dt, w_dt = GEMM_COMBINATIONS[combo]
    lin = make_linear()
    qconfig = QLinearConfig(
        weights_config=MXConfig(w_dt.name),
        activations_config=MXConfig(a_dt.name),
    )
    qlin = MXInferenceLinear.from_float(lin, qconfig)
    x = jax.random.normal(jax.random.PRNGKey(7), (16, 128), jnp.float32).astype(
        jnp.bfloat16
    )
    ref = lin(x)
    est = qlin(x)
    assert sqnr_db(ref, est) >= LINEAR_SQNR_FLOOR[combo], (
        f"combo {combo}: {sqnr_db(ref, est):.2f} dB"
    )


@pytest.mark.usefixtures("set_quantization_env")
def test_bias_preserved_and_hp():
    lin = make_linear(bias=True)
    qconfig = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qlin = MXInferenceLinear.from_float(lin, qconfig)
    np.testing.assert_array_equal(
        np.asarray(qlin.bias.get_value()), np.asarray(lin.bias.get_value())
    )


def test_fp32_weight_cast_to_bf16():
    # fp32 weights straight off disk are cast to bf16 before quantization
    # (reference meta-device path, ``mx_linear.py:68-92``).
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    qconfig = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qlin = MXInferenceLinear.from_weights(w, None, qconfig)
    assert qlin.weight.get_value().orig_dtype == jnp.bfloat16


@pytest.mark.usefixtures("set_quantization_env")
def test_padding_path_in_features_not_multiple_of_block():
    # in_features 100: both weight and activation quantization hit padding.
    lin = make_linear(in_f=100, out_f=32)
    qconfig = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qlin = MXInferenceLinear.from_float(lin, qconfig)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 100), jnp.float32).astype(
        jnp.bfloat16
    )
    out = qlin(x)
    assert out.shape == (4, 32)
    assert sqnr_db(lin(x), out) >= 13.0


@pytest.mark.usefixtures("set_quantization_env")
def test_3d_input():
    lin = make_linear()
    qconfig = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qlin = MXInferenceLinear.from_float(lin, qconfig)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 128), jnp.float32).astype(
        jnp.bfloat16
    )
    assert qlin(x).shape == (2, 8, 64)


def test_jit_zero_retrace():
    """Decode-loop analog of the reference's zero-graph-breaks guarantee."""
    lin = make_linear()
    qconfig = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qlin = MXInferenceLinear.from_float(lin, qconfig)
    gdef, state = nnx.split(qlin)

    @jax.jit
    def step(state, x):
        return nnx.merge(gdef, state)(x)

    x = jnp.ones((4, 128), jnp.bfloat16)
    for i in range(4):
        step(state, x + i)
    assert step._cache_size() == 1
