"""Module-surgery quantization API tests (model: reference
``tests/test_quanti_api.py``): exact class replacement across mixed models,
non-target modules untouched, end-to-end quantized forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.layers.linear import Linear, MXInferenceLinear
from torchmx_tpu.layers.mx_llama_attention import (
    MXInferenceLlamaAttention,
    MXInferenceLlamaMLP,
)
from torchmx_tpu.layers.mx_qwen2_attention import (
    MXInferenceQwen2Attention,
    MXInferenceQwen2MLP,
)
from torchmx_tpu.models.llama import LlamaForCausalLM
from torchmx_tpu.models.qwen2 import Qwen2ForCausalLM
from torchmx_tpu.quant_api import quantize_linear_, quantize_llm_

QLIN = QLinearConfig(
    weights_config=MXConfig("float6_e3m2"),
    activations_config=MXConfig("float8_e4m3"),
)
QATTN = QAttentionConfig(
    projection_config=QLIN,
    query_config=MXConfig("float6_e3m2"),
    key_config=MXConfig("float6_e3m2"),
    value_config=MXConfig("float6_e3m2"),
    attention_weights_config=MXConfig("float6_e3m2"),
)


class MixedModel(nnx.Module):
    """Linears mixed with non-target modules (conv analog: embedding)."""

    def __init__(self, rngs):
        self.a = Linear(64, 32, rngs=rngs)
        self.inner = nnx.List([Linear(32, 32, rngs=rngs), Linear(32, 16, rngs=rngs)])
        self.norm = nnx.LayerNorm(16, rngs=rngs)

    def __call__(self, x):
        x = self.a(x)
        for lin in self.inner:
            x = lin(x)
        return self.norm(x.astype(jnp.float32))


def test_quantize_linear_replaces_all_and_only_linears():
    m = MixedModel(nnx.Rngs(0))
    quantize_linear_(m, QLIN)
    assert isinstance(m.a, MXInferenceLinear)
    assert all(isinstance(l, MXInferenceLinear) for l in m.inner)
    assert isinstance(m.norm, nnx.LayerNorm)
    out = m(jnp.ones((2, 64), jnp.bfloat16))
    assert out.shape == (2, 16)


def test_quantize_linear_idempotent():
    m = MixedModel(nnx.Rngs(0))
    quantize_linear_(m, QLIN)
    first = m.a
    quantize_linear_(m, QLIN)
    assert m.a is first  # already-MX linears are not re-wrapped


def test_quantize_linear_filter_fn():
    m = MixedModel(nnx.Rngs(0))
    quantize_linear_(
        m, QLIN, filter_fn=lambda mod, fqn: isinstance(mod, Linear) and fqn == "a."
    )
    assert isinstance(m.a, MXInferenceLinear)
    assert not isinstance(m.inner[0], MXInferenceLinear)


@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_quantize_llm_exact_class_replacement(family, llama_model_factory):
    model, cls_attn, cls_mlp = llama_model_factory(family)
    quantize_llm_(model, QATTN, QLIN)
    for layer in model.model.layers:
        assert type(layer.self_attn) is cls_attn
        assert type(layer.mlp) is cls_mlp
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            assert isinstance(getattr(layer.self_attn, proj), MXInferenceLinear)
        for proj in ("gate_proj", "up_proj", "down_proj"):
            assert isinstance(getattr(layer.mlp, proj), MXInferenceLinear)
    # lm_head swept by the second pass (reference quant_api.py:268-271).
    assert isinstance(model.lm_head, MXInferenceLinear)
    # Embedding and norms untouched.
    from torchmx_tpu.models.llama import Embedding, RMSNorm

    assert isinstance(model.model.embed_tokens, Embedding)
    assert isinstance(model.model.norm, RMSNorm)

    ids = jnp.asarray(np.arange(16)[None, :] % 256, jnp.int32)
    logits, _ = model(ids)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())


@pytest.fixture()
def llama_model_factory(llama_tiny_config_global, qwen2_tiny_config_global):
    def factory(family):
        if family == "llama":
            model = LlamaForCausalLM(llama_tiny_config_global, rngs=nnx.Rngs(0))
            return model, MXInferenceLlamaAttention, MXInferenceLlamaMLP
        model = Qwen2ForCausalLM(qwen2_tiny_config_global, rngs=nnx.Rngs(0))
        return model, MXInferenceQwen2Attention, MXInferenceQwen2MLP

    return factory


@pytest.fixture()
def llama_tiny_config_global():
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
def qwen2_tiny_config_global():
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
