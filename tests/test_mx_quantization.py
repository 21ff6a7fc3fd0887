"""Golden bit-level tests for the MX quantization numerics.

These are the numerics contract: hand-computed sign/exponent/mantissa/scale
bit patterns per element format, covering normal->normal, saturation,
normal->subnormal, underflow (incl. signed zeros), zeros, and bf16-subnormal
inputs — the same contract vectors as the reference test-suite
(rain-neuromorphics/torchmx ``tests/test_mx_quantization.py``), which is what
"bit-exact quantization numerics vs the reference at block_size 32" means.

Every test runs under both quantizer implementations (hw-exact integer path
and simulated fp32-divide path) via the ``set_quantization_env`` fixture, and
the full-bf16-domain tests assert the two are bit-identical everywhere.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import bf16_from_bits
from torchmx_tpu import dtypes
from torchmx_tpu import env_variables as env
from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.mx_quantization import round_to_even
from torchmx_tpu.packing import unpack_uint4


def compose_payload(sign, exponent, mantissa, elem_dtype):
    """Assemble expected uint8 payload codes from bit-fields."""
    sign = np.asarray(sign, dtype=np.uint8)
    exponent = np.asarray(exponent, dtype=np.uint8)
    mantissa = np.asarray(mantissa, dtype=np.uint8)
    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits
    return np.broadcast_arrays(
        (sign << (mb + eb)) | (exponent << mb) | mantissa
    )[0]


def assert_bits_equal(actual, expected):
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))


def _full_domain_check(all_bfloat16_values, elem_dtype, target_dtypes=(jnp.float32, jnp.bfloat16)):
    """hw-exact and simulated quantizers must agree bit-for-bit over the whole
    bf16 domain (reference ``test_mx_quantization.py:187-207`` per-dtype
    mirrors — strengthened: we keep NaN/inf values in the mix and require
    equality on every element; see the NaN-block note in
    ``mx_quantization.py``)."""
    x = np.asarray(all_bfloat16_values)
    rng = np.random.default_rng(0)
    x = x[rng.permutation(x.shape[0])][:-30]  # multiple of 32
    x = jnp.asarray(x)

    old = env.MX_EXACT_QUANTIZATION
    try:
        env.MX_EXACT_QUANTIZATION = "True"
        y_hw = MXArray.to_mx(x, elem_dtype, 32)
        env.MX_EXACT_QUANTIZATION = "False"
        y_sim = MXArray.to_mx(x, elem_dtype, 32)
    finally:
        env.MX_EXACT_QUANTIZATION = old

    assert_bits_equal(y_hw.data, y_sim.data)
    assert_bits_equal(y_hw.scale_e8m0, y_sim.scale_e8m0)
    for td in target_dtypes:
        hw = np.asarray(y_hw.to_dtype(td))
        sim = np.asarray(y_sim.to_dtype(td))
        np.testing.assert_array_equal(
            hw.view(np.uint16 if td == jnp.bfloat16 else np.uint32),
            sim.view(np.uint16 if td == jnp.bfloat16 else np.uint32),
        )


class TestMXFloat8e4m3:
    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_normal(self):
        mant = np.array([0b1111111, 0b0001010, 0b1000001, 0b1, 0b0101010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 0]).reshape(1, -1)
        exp = np.array(
            [
                [5, 5, 5, 5, 5, 19],
                [100, 100, 100, 100, 100, 111],
                [240, 240, 240, 240, 240, 249],
            ]
        )
        x = bf16_from_bits(sign, exp, mant)

        scale_gt = np.array([11, 103, 241], dtype=np.uint8)
        gt_mant = np.array([0b0, 0b001, 0b100, 0b0, 0b011, 0]).reshape(1, -1)
        gt_exp = np.array([[2, 1, 1, 1, 1, 15], [5, 4, 4, 4, 4, 15], [7, 6, 6, 6, 6, 15]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float8_e4m3)

        y = MXArray.to_mx(x, dtypes.float8_e4m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, scale_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_saturation(self):
        x = bf16_from_bits([1, 0, 1], [100, 100, 100], [0b1110010, 0b1110010, 0b1111110])
        shared_gt = np.array([92], dtype=np.uint8)
        mx_scale = jnp.asarray(2.0 ** (92.0 - 127), dtype=jnp.bfloat16)
        gt = mx_scale * jnp.asarray([-448.0, 448.0, -448.0], dtype=jnp.bfloat16)

        y_mx = MXArray.to_mx(x, dtypes.float8_e4m3, 3)
        y = y_mx.to_dtype(jnp.bfloat16)
        assert_bits_equal(y, gt)
        assert_bits_equal(y_mx.scale_e8m0, shared_gt)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_subnormal(self):
        mant = np.array([0b1111111, 0b0001010, 0b1000001, 0b1, 0b0101010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.full((3, 6), 100)
        exp[0, -1], exp[1, -1], exp[2, -1] = 118, 116, 115
        x = bf16_from_bits(sign, exp, mant)

        gt_mant = np.array(
            [
                [0b1, 0b1, 0b1, 0b1, 0b1, 0],
                [0b100, 0b010, 0b011, 0b010, 0b011, 0],
                [0b0, 0b100, 0b110, 0b100, 0b101, 0],
            ]
        )
        gt_exp = np.array([[0, 0, 0, 0, 0, 15], [0, 0, 0, 0, 0, 15], [1, 0, 0, 0, 0, 15]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float8_e4m3)
        shared_gt = np.array([110, 108, 107], dtype=np.uint8)

        y = MXArray.to_mx(x, dtypes.float8_e4m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_underflow(self):
        mant = np.array([0b1111111, 0b0001010, 0b1000001, 0b1, 0b0101010, 0])
        sign = np.array([1, 0, 0, 1, 0, 0])
        exp = np.array([100, 100, 100, 100, 100, 119])
        x = bf16_from_bits(sign, exp, mant)

        y = MXArray.to_mx(x, dtypes.float8_e4m3, 6).to_dtype(jnp.bfloat16)
        y_gt = jnp.asarray([-0.0, 0.0, 0.0, -0.0, 0.0, 2.0**-8], dtype=jnp.bfloat16)
        # Bit-compare so signed zeros are verified.
        assert_bits_equal(np.asarray(y).view(np.uint16), np.asarray(y_gt).view(np.uint16))

    @pytest.mark.usefixtures("set_quantization_env")
    def test_zeros_to_zeros(self):
        x = np.zeros((3, 6), dtype=np.float32)
        x[0, -1], x[1, -1], x[2, -1] = 2.0**-9, 2.0**5, 2.0**-125
        x = jnp.asarray(x, dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.float8_e4m3, 6).to_dtype(jnp.bfloat16)
        assert_bits_equal(y, x)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_subnormals_to_normal_and_subnormal(self):
        mant = np.broadcast_to(
            np.array([0b1111111, 0b0001010, 0b1000001, 0b0110011, 0b0101010, 0]), (3, 6)
        )
        sign = np.array([0, 1, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.zeros((3, 6), dtype=np.int64)
        exp[0, -1], exp[1, -1], exp[2, -1] = 12, 13, 14
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([4, 5, 6], dtype=np.uint8)
        gt_mant = np.array(
            [
                [0b0, 0b101, 0b000, 0b101, 0b010, 0],
                [0b0, 0b10, 0b0, 0b101, 0b010, 0],
                [0b0, 0b1, 0b0, 0b110, 0b101, 0],
            ]
        )
        gt_exp = np.array([[4, 0, 3, 2, 2, 15], [3, 0, 2, 1, 1, 15], [2, 0, 1, 0, 0, 15]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float8_e4m3)

        y = MXArray.to_mx(x, dtypes.float8_e4m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    def test_full_bf16_domain_hw_exact_vs_simulated(self, all_bfloat16_values):
        _full_domain_check(all_bfloat16_values, dtypes.float8_e4m3)


class TestMXFloat6e3m2:
    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_normal(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b1, 0b0111010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.array(
            [
                [5, 5, 5, 5, 5, 11],
                [100, 100, 100, 100, 100, 103],
                [250, 250, 250, 250, 250, 251],
            ]
        )
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([7, 99, 247], dtype=np.uint8)
        gt_mant = np.array([0b0, 0b01, 0b10, 0b0, 0b10, 0]).reshape(1, -1)
        gt_exp = np.array([[2, 1, 1, 1, 1, 7], [5, 4, 4, 4, 4, 7], [7, 6, 6, 6, 6, 7]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e3m2)

        y = MXArray.to_mx(x, dtypes.float6_e3m2, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_saturation(self):
        x = bf16_from_bits([1, 0, 1], [100, 100, 100], [0b1111010, 0b1110000, 0b1111110])
        shared_gt = np.array([96], dtype=np.uint8)
        mx_scale = jnp.asarray(2.0 ** (96.0 - 127), dtype=jnp.bfloat16)
        gt = mx_scale * jnp.asarray([-28.0, 28.0, -28.0], dtype=jnp.bfloat16)

        y_mx = MXArray.to_mx(x, dtypes.float6_e3m2, 3)
        assert_bits_equal(y_mx.to_dtype(jnp.bfloat16), gt)
        assert_bits_equal(y_mx.scale_e8m0, shared_gt)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_subnormal(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b1, 0b0111010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.full((3, 6), 100)
        exp[0, -1], exp[1, -1], exp[2, -1] = 109, 108, 107
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([105, 104, 103], dtype=np.uint8)[:, None]
        gt_mant = np.array(
            [
                [0b1, 0b1, 0b1, 0b1, 0b1, 0],
                [0b10, 0b1, 0b10, 0b1, 0b1, 0],
                [0b0, 0b10, 0b11, 0b10, 0b11, 0],
            ]
        )
        gt_exp = np.array([[0, 0, 0, 0, 0, 7], [0, 0, 0, 0, 0, 7], [1, 0, 0, 0, 0, 7]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e3m2)

        y = MXArray.to_mx(x, dtypes.float6_e3m2, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_underflow(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b1, 0b0111010, 0])
        sign = np.array([1, 0, 0, 1, 0, 1])
        exp = np.array([100, 100, 100, 100, 100, 110])
        x = bf16_from_bits(sign, exp, mant)

        y = MXArray.to_mx(x, dtypes.float6_e3m2, 6).to_dtype(jnp.bfloat16)
        y_gt = jnp.asarray([-0.0, 0.0, 0.0, -0.0, 0.0, -(2.0**-17)], dtype=jnp.bfloat16)
        assert_bits_equal(np.asarray(y).view(np.uint16), np.asarray(y_gt).view(np.uint16))

    @pytest.mark.usefixtures("set_quantization_env")
    def test_zeros_to_zeros(self):
        x = np.zeros((3, 5), dtype=np.float32)
        x[0, -1], x[1, -1], x[2, -1] = 2.0**-17, 2.0**5, 2.0**-125
        x = jnp.asarray(x, dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.float6_e3m2, 5).to_dtype(jnp.bfloat16)
        assert_bits_equal(y, x)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_subnormals_to_normal_and_subnormal(self):
        mant = np.broadcast_to(
            np.array([0b1111111, 0b0001010, 0b1000001, 0b0110011, 0b0101010, 0]), (3, 6)
        )
        sign = np.array([0, 1, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.zeros((3, 6), dtype=np.int64)
        exp[0, -1], exp[1, -1], exp[2, -1] = 5, 7, 8
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([1, 3, 4], dtype=np.uint8)
        gt_mant = np.array(
            [
                [0b0, 0b1, 0b0, 0b10, 0b01, 0],
                [0b0, 0b0, 0b10, 0b10, 0b1, 0],
                [0b10, 0b0, 0b1, 0b1, 0b1, 0],
            ]
        )
        gt_exp = np.array([[3, 0, 2, 1, 1, 7], [1, 0, 0, 0, 0, 7], [0, 0, 0, 0, 0, 7]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e3m2)

        y = MXArray.to_mx(x, dtypes.float6_e3m2, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    def test_full_bf16_domain_hw_exact_vs_simulated(self, all_bfloat16_values):
        _full_domain_check(all_bfloat16_values, dtypes.float6_e3m2)


class TestMXFloat6e2m3:
    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_normal(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b1, 0b0111010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.array(
            [
                [5, 5, 5, 5, 5, 7],
                [100, 100, 100, 100, 100, 101],
                [250, 250, 250, 250, 250, 250],
            ]
        )
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([5, 99, 248], dtype=np.uint8)
        gt_mant = np.array([0b0, 0b010, 0b100, 0b0, 0b100, 0]).reshape(1, -1)
        gt_exp = np.array([[2, 1, 1, 1, 1, 3], [3, 2, 2, 2, 2, 3], [3, 3, 3, 3, 3, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e2m3)
        gt[2, 0] = 0b111111  # saturated

        y = MXArray.to_mx(x, dtypes.float6_e2m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_saturation(self):
        x = bf16_from_bits([1, 0, 1], [100, 100, 100], [0b1111010, 0b1110000, 0b1111110])
        shared_gt = np.array([98], dtype=np.uint8)
        mx_scale = jnp.asarray(2.0 ** (98.0 - 127), dtype=jnp.bfloat16)
        gt = mx_scale * jnp.asarray([-7.5, 7.5, -7.5], dtype=jnp.bfloat16)

        y_mx = MXArray.to_mx(x, dtypes.float6_e2m3, 3)
        assert_bits_equal(y_mx.to_dtype(jnp.bfloat16), gt)
        assert_bits_equal(y_mx.scale_e8m0, shared_gt)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_subnormal(self):
        mant = np.array([0b1111111, 0b0001010, 0b1000001, 0b1, 0b0101010, 0]).reshape(1, -1)
        sign = np.array([1, 0, 0, 1, 0, 1]).reshape(1, -1)
        exp = np.full((3, 6), 100)
        exp[0, -1], exp[1, -1], exp[2, -1] = 105, 104, 103
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([103, 102, 101], dtype=np.uint8)
        gt_mant = np.array(
            [
                [0b10, 0b1, 0b10, 0b1, 0b1, 0],
                [0b100, 0b10, 0b11, 0b10, 0b11, 0],
                [0b0, 0b100, 0b110, 0b100, 0b101, 0],
            ]
        )
        gt_exp = np.array([[0, 0, 0, 0, 0, 3], [0, 0, 0, 0, 0, 3], [1, 0, 0, 0, 0, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e2m3)

        y = MXArray.to_mx(x, dtypes.float6_e2m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_underflow(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b1, 0b0111010, 0])
        sign = np.array([1, 0, 0, 1, 0, 1])
        exp = np.array([100, 100, 100, 100, 100, 107])
        x = bf16_from_bits(sign, exp, mant)

        y = MXArray.to_mx(x, dtypes.float6_e2m3, 6).to_dtype(jnp.bfloat16)
        y_gt = jnp.asarray([-0.0, 0.0, 0.0, -0.0, 0.0, -(2.0**-20)], dtype=jnp.bfloat16)
        assert_bits_equal(np.asarray(y).view(np.uint16), np.asarray(y_gt).view(np.uint16))

    @pytest.mark.usefixtures("set_quantization_env")
    def test_zeros_to_zeros(self):
        x = np.zeros((3, 6), dtype=np.float32)
        x[0, -1], x[1, -1], x[2, -1] = 2.0**-9, 2.0**5, 2.0**-125
        x = jnp.asarray(x, dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.float6_e2m3, 6).to_dtype(jnp.bfloat16)
        assert_bits_equal(y, x)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_subnormals_to_normal_and_subnormal(self):
        mant = np.broadcast_to(
            np.array([0b1111111, 0b0001010, 0b1000001, 0b0110011, 0b0101010, 0]), (2, 6)
        )
        sign = np.array([0, 1, 0, 0, 1, 1]).reshape(1, -1)
        exp = np.zeros((2, 6), dtype=np.int64)
        exp[0, -1], exp[1, -1] = 2, 3
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([0, 1], dtype=np.uint8)
        gt_mant = np.array(
            [
                [0b0, 0b1, 0b0, 0b110, 0b101, 0],
                [0b0, 0b1, 0b100, 0b11, 0b11, 0],
            ]
        )
        gt_exp = np.array([[2, 0, 1, 0, 0, 3], [1, 0, 0, 0, 0, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float6_e2m3)

        y = MXArray.to_mx(x, dtypes.float6_e2m3, 6)
        assert_bits_equal(y.data, gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    def test_full_bf16_domain_hw_exact_vs_simulated(self, all_bfloat16_values):
        _full_domain_check(all_bfloat16_values, dtypes.float6_e2m3)


class TestMXFloat4e2m1:
    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_normal(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b0111010]).reshape(1, -1)
        sign = np.array([1, 0, 1, 0]).reshape(1, -1)
        exp = np.array([[5, 5, 5, 7], [100, 100, 100, 101], [250, 250, 250, 250]])
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([5, 99, 248], dtype=np.uint8)
        gt_mant = np.array([0b0, 0b0, 0b1, 0b1]).reshape(1, -1)
        gt_exp = np.array([[2, 1, 1, 3], [3, 2, 2, 3], [3, 3, 3, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float4_e2m1)
        gt[2, 0] = 0b1111  # saturated

        y = MXArray.to_mx(x, dtypes.float4_e2m1, 4)
        assert_bits_equal(unpack_uint4(y.data), gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_saturation(self):
        x = bf16_from_bits(
            [1, 0, 1, 0],
            [100, 100, 100, 100],
            [0b1111010, 0b1110000, 0b1111110, 0b1101110],
        )
        shared_gt = np.array([98], dtype=np.uint8)
        mx_scale = jnp.asarray(2.0 ** (98.0 - 127), dtype=jnp.bfloat16)
        gt = mx_scale * jnp.asarray([-6.0, 6.0, -6.0, 6.0], dtype=jnp.bfloat16)

        y_mx = MXArray.to_mx(x, dtypes.float4_e2m1, 4)
        assert_bits_equal(y_mx.to_dtype(jnp.bfloat16), gt)
        assert_bits_equal(y_mx.scale_e8m0, shared_gt)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_to_subnormal(self):
        mant = np.array([0b1111111, 0b0001010, 0b1000001, 0]).reshape(1, -1)
        sign = np.array([1, 0, 1, 0]).reshape(1, -1)
        exp = np.full((2, 4), 100)
        exp[0, -1], exp[1, -1] = 104, 103
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([102, 101], dtype=np.uint8)
        gt_mant = np.array([[0b1, 0b1, 0b1, 0b0], [0b0, 0b1, 0b0, 0b0]])
        gt_exp = np.array([[0, 0, 0, 3], [1, 0, 1, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float4_e2m1)

        y = MXArray.to_mx(x, dtypes.float4_e2m1, 4)
        assert_bits_equal(unpack_uint4(y.data), gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_normal_underflow(self):
        mant = np.array([0b1111111, 0b0011010, 0b1000001, 0b0111010, 0, 0])
        sign = np.array([1, 0, 1, 0, 1, 0])
        exp = np.array([100, 100, 100, 100, 100, 105])
        x = bf16_from_bits(sign, exp, mant)

        y = MXArray.to_mx(x, dtypes.float4_e2m1, 6).to_dtype(jnp.bfloat16)
        y_gt = jnp.asarray([-0.0, 0.0, -0.0, 0.0, -0.0, 2.0**-22], dtype=jnp.bfloat16)
        assert_bits_equal(np.asarray(y).view(np.uint16), np.asarray(y_gt).view(np.uint16))

    @pytest.mark.usefixtures("set_quantization_env")
    def test_zeros_to_zeros(self):
        x = np.zeros((3, 6), dtype=np.float32)
        x[0, -1], x[1, -1], x[2, -1] = 2.0**-9, 2.0**5, 2.0**-125
        x = jnp.asarray(x, dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.float4_e2m1, 6).to_dtype(jnp.bfloat16)
        assert_bits_equal(y, x)

    @pytest.mark.usefixtures("set_quantization_env")
    def test_bf16_subnormals_to_normal_and_subnormal(self):
        mant = np.broadcast_to(
            np.array([0b1111111, 0b0011010, 0b1000001, 0b0110011, 0b0101010, 0]), (2, 6)
        )
        sign = np.array([0, 1, 0, 0, 1, 0]).reshape(1, -1)
        exp = np.zeros((2, 6), dtype=np.int64)
        exp[0, -1], exp[1, -1] = 2, 3
        x = bf16_from_bits(sign, exp, mant)

        shared_gt = np.array([0, 1], dtype=np.uint8)
        gt_mant = np.array(
            [
                [0b0, 0b1, 0b0, 0b0, 0b1, 0b0],
                [0b0, 0b0, 0b1, 0b1, 0b1, 0b0],
            ]
        )
        gt_exp = np.array([[2, 0, 1, 1, 0, 3], [1, 0, 0, 0, 0, 3]])
        gt = compose_payload(sign, gt_exp, gt_mant, dtypes.float4_e2m1)

        y = MXArray.to_mx(x, dtypes.float4_e2m1, 6)
        assert_bits_equal(unpack_uint4(y.data), gt)
        assert_bits_equal(y.scale_e8m0, shared_gt[:, None])

    def test_full_bf16_domain_hw_exact_vs_simulated(self, all_bfloat16_values):
        _full_domain_check(all_bfloat16_values, dtypes.float4_e2m1)


class TestRoundToEven:
    def test_basic_rounding(self):
        m = jnp.asarray([0b1010011, 0b1101101], dtype=jnp.int32)  # [83, 109]
        s = jnp.asarray([2, 3], dtype=jnp.int32)
        assert_bits_equal(round_to_even(m, s), np.array([21, 14]))

    def test_no_rounding_needed(self):
        m = jnp.asarray([0b1010000, 0b1100000], dtype=jnp.int32)  # [80, 96]
        s = jnp.asarray([2, 3], dtype=jnp.int32)
        assert_bits_equal(round_to_even(m, s), np.array([20, 12]))

    def test_round_half_to_even(self):
        m = jnp.asarray([0b1010110, 0b1101100], dtype=jnp.int32)  # [86, 104]
        s = jnp.asarray([2, 3], dtype=jnp.int32)
        assert_bits_equal(round_to_even(m, s), np.array([22, 14]))

    def test_all_zero_mantissa(self):
        m = jnp.asarray([0, 0], dtype=jnp.int32)
        s = jnp.asarray([2, 3], dtype=jnp.int32)
        assert_bits_equal(round_to_even(m, s), np.array([0, 0]))

    def test_shift_zero(self):
        m = jnp.asarray([0b1010011, 0b1101101], dtype=jnp.int32)
        s = jnp.asarray([0, 0], dtype=jnp.int32)
        assert_bits_equal(round_to_even(m, s), np.asarray(m))


class TestInt8:
    """int8 has no hw-exact path (reference ``mx_tensor.py:80-90``); validate
    the simulated RNE path and the roundtrip."""

    def test_round_half_even(self):
        x = jnp.asarray([127.0, 63.5, 62.5, -62.5, 1.0], dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.int8, 5)
        # shared exp: max_exp = 127+6=133 biased -> 133-6=127 -> scale 1.0
        assert_bits_equal(y.scale_e8m0, np.array([127], dtype=np.uint8))
        assert_bits_equal(y.data, np.array([127, 64, 62, -62, 1], dtype=np.int8))

    def test_roundtrip_exact_values(self):
        x = jnp.asarray([[1.0, -2.0, 3.0, -4.0]], dtype=jnp.bfloat16)
        y = MXArray.to_mx(x, dtypes.int8, 4).to_dtype(jnp.bfloat16)
        assert_bits_equal(y, x)


class TestFp8CastAgainstNative:
    """Cross-check our bit-level fp8 cast/decode against XLA's native
    float8_e4m3fn conversions."""

    def test_cast_matches_native(self, all_bfloat16_values):
        from torchmx_tpu.mx_quantization import f32_to_fpx_unpacked

        x = all_bfloat16_values.astype(jnp.float32)
        x = jnp.clip(x, -448.0, 448.0)
        x = jnp.where(jnp.isnan(x), 0.0, x)
        ours = f32_to_fpx_unpacked(x, dtypes.float8_e4m3)
        import jax

        native = jax.lax.bitcast_convert_type(
            x.astype(jnp.float8_e4m3fn), jnp.uint8
        )
        assert_bits_equal(ours, native)

    def test_decode_matches_native(self):
        from torchmx_tpu.mx_quantization import dequantize_to_dtype
        import jax

        codes = jnp.arange(256, dtype=jnp.uint8)
        ours = dequantize_to_dtype(codes, dtypes.float8_e4m3, jnp.float32)
        native = jax.lax.bitcast_convert_type(codes, jnp.float8_e4m3fn).astype(
            jnp.float32
        )
        # NaN encodings (0x7F/0xFF) compare by nan-ness.
        both_nan = np.isnan(np.asarray(ours)) & np.isnan(np.asarray(native))
        np.testing.assert_array_equal(
            np.where(both_nan, 0, np.asarray(ours)),
            np.where(both_nan, 0, np.asarray(native)),
        )
