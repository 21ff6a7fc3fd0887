"""Config system, dtype registry, custom float cast and infra tests.

Model: reference ``tests/test_config.py`` / ``tests/test_custom_float_cast.py``
semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import dtypes
from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.custom_float_cast import hp_to_floatx


class TestDTypes:
    def test_contract_constants(self):
        # These values are OCP MX contract constants (reference dtypes.py).
        assert dtypes.float8_e4m3.max == 448.0 and dtypes.float8_e4m3.max_pow2 == 8
        assert dtypes.float6_e3m2.max == 28.0 and dtypes.float6_e3m2.max_pow2 == 4
        assert dtypes.float6_e2m3.max == 7.5 and dtypes.float6_e2m3.max_pow2 == 2
        assert dtypes.float4_e2m1.max == 6.0 and dtypes.float4_e2m1.max_pow2 == 2
        assert dtypes.int8.max == 127.0 and dtypes.int8.max_pow2 == 6
        assert dtypes.E8M0_EXPONENT_NAN_VAL == 255
        assert dtypes.e8m0.exponent_bias == 127

    def test_registry(self):
        assert set(dtypes.STR_TO_SUPPORTED_ELEM_DTYPE) == {
            "float8_e4m3",
            "float6_e3m2",
            "float6_e2m3",
            "float4_e2m1",
            "int8",
        }


class TestMXConfig:
    def test_valid(self):
        c = MXConfig(elem_dtype_name="float8_e4m3")
        assert c.block_size == 32
        assert c.elem_dtype is dtypes.float8_e4m3

    def test_invalid_name(self):
        with pytest.raises(ValueError):
            MXConfig(elem_dtype_name="float16")

    def test_invalid_block_size(self):
        with pytest.raises(ValueError):
            MXConfig(elem_dtype_name="int8", block_size=0)

    def test_dict_roundtrip_and_eq(self):
        c = MXConfig("float6_e3m2", 16)
        assert MXConfig.load_from_dict(c.to_dict()) == c
        assert c != MXConfig("float6_e3m2", 32)
        assert c != "not a config"


class TestQLinearConfig:
    def test_dict_roundtrip(self):
        c = QLinearConfig(
            weights_config=MXConfig("float6_e3m2"),
            activations_config=MXConfig("float8_e4m3"),
        )
        assert QLinearConfig.load_from_dict(c.to_dict()) == c


class TestQAttentionConfig:
    def _proj(self):
        return QLinearConfig(
            weights_config=MXConfig("float6_e3m2"),
            activations_config=MXConfig("float8_e4m3"),
        )

    def test_projection_only(self):
        c = QAttentionConfig(projection_config=self._proj())
        assert not c.is_qkv_quantization_enabled
        assert QAttentionConfig.load_from_dict(c.to_dict()) == c

    def test_all_or_none_validation(self):
        with pytest.raises(AssertionError):
            QAttentionConfig(
                projection_config=self._proj(), query_config=MXConfig("float8_e4m3")
            )

    def test_full_qkv(self):
        c = QAttentionConfig(
            projection_config=self._proj(),
            query_config=MXConfig("float6_e3m2"),
            key_config=MXConfig("float6_e3m2"),
            value_config=MXConfig("float6_e3m2"),
            attention_weights_config=MXConfig("float6_e3m2"),
        )
        assert c.is_qkv_quantization_enabled
        assert QAttentionConfig.load_from_dict(c.to_dict()) == c

    def test_kv_cache_extension(self):
        c = QAttentionConfig(
            projection_config=self._proj(), kv_cache_config=MXConfig("float8_e4m3")
        )
        assert c.is_kv_cache_quantization_enabled
        assert QAttentionConfig.load_from_dict(c.to_dict()) == c


class TestCustomFloatCast:
    def test_all_float22_values_are_fixed_points(self, all_float22_e8m13_values):
        """Every float22_e8m13 value must survive the cast unchanged
        (reference ``tests/test_custom_float_cast.py`` semantics)."""
        x = all_float22_e8m13_values
        y = hp_to_floatx(
            x,
            exponent_bits=dtypes.float22_e8m13.exponent_bits,
            mantissa_bits=dtypes.float22_e8m13.mantissa_bits,
            max_normal=dtypes.float22_e8m13.max,
        )
        xs, ys = np.asarray(x), np.asarray(y)
        both_nan = np.isnan(xs) & np.isnan(ys)
        np.testing.assert_array_equal(xs[~both_nan], ys[~both_nan])

    def test_rounding_to_bf16_grid(self):
        # Casting to (8, 7) reproduces bf16 rounding of fp32 values.
        x = jnp.asarray([1.0 + 2**-9, 1.0 + 2**-8 + 2**-9, 3.14159], jnp.float32)
        y = hp_to_floatx(x, 8, 7, dtypes.bfloat16.max)
        gt = np.asarray(x.astype(jnp.bfloat16), np.float32)
        np.testing.assert_array_equal(np.asarray(y), gt)

    def test_truncate_mode(self):
        x = jnp.asarray([1.9999, -1.9999], jnp.float32)
        y = hp_to_floatx(x, 8, 2, 3.5, round_mode="truncate")
        np.testing.assert_array_equal(np.asarray(y), np.asarray([1.75, -1.75], np.float32))

    def test_flush_subnormals(self):
        x = jnp.asarray([2.0**-7, 2.0**-5], jnp.float32)
        y = hp_to_floatx(x, 4, 3, 448.0, keep_subnormals=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray([0.0, 2.0**-5], np.float32))

    def test_saturation_and_inf(self):
        x = jnp.asarray([1e30, -1e30, np.inf, -np.inf], jnp.float32)
        y = hp_to_floatx(x, 4, 3, 448.0)
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray([448.0, -448.0, np.inf, -np.inf], np.float32)
        )
