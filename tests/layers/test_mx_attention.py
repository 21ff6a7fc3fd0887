"""MX attention / MLP layer tests for Llama and Qwen2.

Model: reference ``tests/layers/test_mx_llama_attention.py`` /
``test_mx_qwen2_attention.py``: real attention blocks (tiny config) vs MX
versions, with/without Q/K/V/attn-weights quantization, SQNR-gated; plus the
MX KV cache extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests.layers.conftest import (
    ATTEN_ALL_QUANT_SQNR_FLOOR,
    ATTEN_PROJ_ONLY_SQNR_FLOOR,
    GEMM_COMBINATIONS,
    MLP_SQNR_FLOOR,
    sqnr_db,
)
from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.layers.mx_llama_attention import (
    MXInferenceLlamaAttention,
    MXInferenceLlamaMLP,
)
from torchmx_tpu.layers.mx_qwen2_attention import (
    MXInferenceQwen2Attention,
    MXInferenceQwen2MLP,
)
from torchmx_tpu.models.llama import (
    LayerKVCache,
    LlamaAttention,
    LlamaMLP,
    MXLayerKVCache,
    make_causal_mask,
    rope_cos_sin,
)
from torchmx_tpu.models.qwen2 import Qwen2Attention, Qwen2MLP


def _qconfig(combo, qkv: bool):
    a_dt, w_dt = GEMM_COMBINATIONS[combo]
    proj = QLinearConfig(
        weights_config=MXConfig(w_dt.name), activations_config=MXConfig(a_dt.name)
    )
    if not qkv:
        return QAttentionConfig(projection_config=proj)
    return QAttentionConfig(
        projection_config=proj,
        query_config=MXConfig(w_dt.name),
        key_config=MXConfig(w_dt.name),
        value_config=MXConfig(w_dt.name),
        attention_weights_config=MXConfig(w_dt.name),
    )


def _run_attention(attn, config, x):
    b, s, _ = x.shape
    cos, sin = rope_cos_sin(
        jnp.asarray(np.asarray(attn_inv_freq(config))), jnp.arange(s)[None, :], x.dtype
    )
    mask = make_causal_mask(s, s)[None, None]
    out, _ = attn(x, cos=cos, sin=sin, attention_mask=mask)
    return out


def attn_inv_freq(config):
    from torchmx_tpu.models.llama import compute_rope_inv_freq

    return compute_rope_inv_freq(config)


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("combo", list(GEMM_COMBINATIONS))
@pytest.mark.parametrize(
    "family", ["llama", "qwen2"]
)
def test_attention_proj_only_sqnr(combo, family, hidden_states, llama_tiny_config, qwen2_tiny_config):
    config = llama_tiny_config if family == "llama" else qwen2_tiny_config
    cls = LlamaAttention if family == "llama" else Qwen2Attention
    mx_cls = MXInferenceLlamaAttention if family == "llama" else MXInferenceQwen2Attention
    attn = cls(config, 0, rngs=nnx.Rngs(3))
    mx_attn = mx_cls.from_float(attn, _qconfig(combo, qkv=False))
    ref = _run_attention(attn, config, hidden_states)
    est = _run_attention(mx_attn, config, hidden_states)
    assert sqnr_db(ref, est) >= ATTEN_PROJ_ONLY_SQNR_FLOOR[combo], (
        f"{family} combo {combo}: {sqnr_db(ref, est):.2f} dB"
    )


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("combo", list(GEMM_COMBINATIONS))
def test_attention_all_quant_sqnr(combo, hidden_states, llama_tiny_config):
    attn = LlamaAttention(llama_tiny_config, 0, rngs=nnx.Rngs(3))
    mx_attn = MXInferenceLlamaAttention.from_float(attn, _qconfig(combo, qkv=True))
    ref = _run_attention(attn, llama_tiny_config, hidden_states)
    est = _run_attention(mx_attn, llama_tiny_config, hidden_states)
    assert sqnr_db(ref, est) >= ATTEN_ALL_QUANT_SQNR_FLOOR[combo], (
        f"combo {combo}: {sqnr_db(ref, est):.2f} dB"
    )


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("combo", list(GEMM_COMBINATIONS))
@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_mlp_sqnr(combo, family, hidden_states, llama_tiny_config, qwen2_tiny_config):
    config = llama_tiny_config if family == "llama" else qwen2_tiny_config
    cls = LlamaMLP if family == "llama" else Qwen2MLP
    mx_cls = MXInferenceLlamaMLP if family == "llama" else MXInferenceQwen2MLP
    a_dt, w_dt = GEMM_COMBINATIONS[combo]
    mlp = cls(config, rngs=nnx.Rngs(5))
    qmlp = mx_cls.from_float(
        mlp,
        QLinearConfig(
            weights_config=MXConfig(w_dt.name), activations_config=MXConfig(a_dt.name)
        ),
    )
    ref = mlp(hidden_states)
    est = qmlp(hidden_states)
    assert sqnr_db(ref, est) >= MLP_SQNR_FLOOR[combo], (
        f"{family} combo {combo}: {sqnr_db(ref, est):.2f} dB"
    )


def test_qwen2_qkv_bias_present(qwen2_tiny_config):
    attn = Qwen2Attention(qwen2_tiny_config, 0, rngs=nnx.Rngs(0))
    assert attn.q_proj.bias is not None
    assert attn.o_proj.bias is None


@pytest.mark.usefixtures("set_quantization_env")
def test_attention_with_kv_cache_matches_full_forward(llama_tiny_config):
    """Prefill+decode through the static KV cache must match a full forward."""
    config = llama_tiny_config
    attn = LlamaAttention(config, 0, rngs=nnx.Rngs(4))
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 8, config.hidden_size)).astype(
        jnp.bfloat16
    )
    inv = attn_inv_freq(config)

    # Full forward.
    cos, sin = rope_cos_sin(inv, jnp.arange(8)[None, :], x.dtype)
    full, _ = attn(x, cos=cos, sin=sin, attention_mask=make_causal_mask(8, 8)[None, None])

    # Prefill 7, decode 1.
    from torchmx_tpu.models.llama import make_decode_mask, make_prefill_mask

    cache = LayerKVCache.create(1, config.num_key_value_heads, 8, config.head_dim)
    cos7, sin7 = rope_cos_sin(inv, jnp.arange(7)[None, :], x.dtype)
    _, cache = attn(
        x[:, :7],
        cos=cos7,
        sin=sin7,
        attention_mask=make_prefill_mask(7, 8)[None, None],
        cache=cache,
        cache_position=0,
    )
    cos1, sin1 = rope_cos_sin(inv, jnp.asarray([[7]]), x.dtype)
    step, _ = attn(
        x[:, 7:8],
        cos=cos1,
        sin=sin1,
        attention_mask=make_decode_mask(8, 8)[None, None, None, :],
        cache=cache,
        cache_position=7,
    )
    np.testing.assert_allclose(
        np.asarray(step[0, 0], np.float32),
        np.asarray(full[0, 7], np.float32),
        atol=0.05,
        rtol=0.05,
    )


@pytest.mark.usefixtures("set_quantization_env")
def test_mx_kv_cache_close_to_hp_cache(llama_tiny_config):
    """The MX-quantized KV cache tracks the hp cache within fp8 noise."""
    config = llama_tiny_config
    attn = LlamaAttention(config, 0, rngs=nnx.Rngs(4))
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 8, config.hidden_size)).astype(
        jnp.bfloat16
    )
    inv = attn_inv_freq(config)
    cos, sin = rope_cos_sin(inv, jnp.arange(8)[None, :], x.dtype)
    mask = make_causal_mask(8, 8)[None, None]

    hp_cache = LayerKVCache.create(1, config.num_key_value_heads, 8, config.head_dim)
    out_hp, _ = attn(x, cos=cos, sin=sin, attention_mask=mask, cache=hp_cache, cache_position=0)

    mx_cache = MXLayerKVCache.create(
        1, config.num_key_value_heads, 8, config.head_dim, "float8_e4m3", 32
    )
    out_mx, new_mx = attn(x, cos=cos, sin=sin, attention_mask=mask, cache=mx_cache, cache_position=0)
    assert new_mx.k_data.dtype == jnp.uint8
    assert sqnr_db(out_hp, out_mx) >= 20.0
