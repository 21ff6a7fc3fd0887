"""Fixtures for layer tests: GEMM combos and SQNR floors.

The GEMM (activation, weight) dtype combos mirror the reference
(``tests/layers/conftest.py:55-64``).  SQNR floors are regenerated from our
own seeded inputs (the reference's exact goldens depend on torch RNG streams;
see SURVEY §6) but sit at comparable levels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import dtypes

GEMM_COMBINATIONS = {
    "0": (dtypes.float8_e4m3, dtypes.float6_e3m2),
    "1": (dtypes.float8_e4m3, dtypes.float4_e2m1),
    "2": (dtypes.float6_e3m2, dtypes.float6_e3m2),
    "3": (dtypes.float6_e3m2, dtypes.float4_e2m1),
    "4": (dtypes.float6_e2m3, dtypes.float6_e3m2),
    "5": (dtypes.float6_e2m3, dtypes.float4_e2m1),
    "6": (dtypes.float4_e2m1, dtypes.float6_e3m2),
    "7": (dtypes.float4_e2m1, dtypes.float4_e2m1),
}

# SQNR floors (dB) per combo for a 128x128 linear on seeded normal inputs.
LINEAR_SQNR_FLOOR = {
    "0": 23.5,
    "1": 12.5,
    "2": 22.0,
    "3": 12.5,
    "4": 22.0,
    "5": 12.5,
    "6": 13.0,
    "7": 10.5,
    "int8": 38.0,
}

ATTEN_PROJ_ONLY_SQNR_FLOOR = {
    "0": 18, "1": 13, "2": 17, "3": 12, "4": 18, "5": 13, "6": 12, "7": 10,
}

ATTEN_ALL_QUANT_SQNR_FLOOR = {
    "0": 17, "1": 11, "2": 16, "3": 12, "4": 17, "5": 12, "6": 12, "7": 8,
}

MLP_SQNR_FLOOR = {
    "0": 16, "1": 9, "2": 14, "3": 8, "4": 16, "5": 9, "6": 10, "7": 7,
}


def sqnr_db(ref, est):
    ref = np.asarray(ref, np.float32)
    est = np.asarray(est, np.float32)
    return 10 * np.log10((ref**2).mean() / ((ref - est) ** 2).mean())


@pytest.fixture()
def hidden_states():
    x = jax.random.uniform(jax.random.PRNGKey(42), (2, 128, 128), jnp.float32)
    return x.astype(jnp.bfloat16)


@pytest.fixture()
def llama_tiny_config():
    from torchmx_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )


@pytest.fixture()
def qwen2_tiny_config():
    from torchmx_tpu.models.qwen2 import Qwen2Config

    return Qwen2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
