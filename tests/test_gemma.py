"""Gemma family: HF parity (GeGLU + (1+w) RMSNorm + sqrt(h) embedding
scaling + tied embeddings + explicit head_dim), quantization surgery, and
generation.  Fifth family through the same type-dispatch seams (the
reference ships Llama and Qwen2 only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.gemma import GemmaConfig, GemmaForCausalLM
from torchmx_tpu.models.generate import generate
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config():
    return GemmaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=128,
    )


def test_hf_parity_gemma():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(0)
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128,
        attn_implementation="eager",
    )
    hf = transformers.GemmaForCausalLM(hf_cfg).to(torch.float32).eval()
    ids = np.random.RandomState(0).randint(0, 256, (2, 16))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, cfg = from_hf_torch(hf)
    assert isinstance(model, GemmaForCausalLM)
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    assert cfg.rms_norm_offset == 1.0 and cfg.scale_embeddings
    assert cfg.tie_word_embeddings and model.lm_head is None
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"gemma corr {corr}"


def test_gemma_conventions_bite():
    """Each Gemma delta must actually change the forward (guards against a
    silently-Llama Gemma): zeroing the norm offset, unscaling embeddings,
    or switching back to silu all move the logits."""
    model = GemmaForCausalLM(tiny_config(), rngs=nnx.Rngs(1))
    # Give the zero-init norm deltas some signal.
    for layer in model.model.layers:
        layer.input_layernorm.weight.set_value(
            jnp.full((128,), 0.1, jnp.bfloat16)
        )
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, 12)), jnp.int32)
    ref, _ = model(ids)

    import dataclasses

    for field, value in (
        ("rms_norm_offset", 0.0),
        ("scale_embeddings", False),
        ("hidden_act", "silu"),
    ):
        clone = GemmaForCausalLM(tiny_config(), rngs=nnx.Rngs(1))
        for layer in clone.model.layers:
            layer.input_layernorm.weight.set_value(
                jnp.full((128,), 0.1, jnp.bfloat16)
            )
        cfg2 = dataclasses.replace(tiny_config(), **{field: value})
        clone.config = cfg2
        clone.model.config = cfg2
        for layer in clone.model.layers:
            layer.self_attn.config = cfg2
            layer.mlp.config = cfg2
            if field == "hidden_act":
                from torchmx_tpu.models.llama import resolve_act

                layer.mlp.act = resolve_act(value)
            if field == "rms_norm_offset":
                layer.input_layernorm.offset = 0.0
                layer.post_attention_layernorm.offset = 0.0
        if field == "rms_norm_offset":
            clone.model.norm.offset = 0.0
        out, _ = clone(ids)
        assert float(jnp.max(jnp.abs(out - ref))) > 1e-3, field


def test_gemma_quantize_and_generate():
    from torchmx_tpu.layers.mx_gemma_attention import (
        MXInferenceGemmaAttention,
        MXInferenceGemmaMLP,
    )

    model = GemmaForCausalLM(tiny_config(), rngs=nnx.Rngs(2))
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    layer = model.model.layers[0]
    assert isinstance(layer.self_attn, MXInferenceGemmaAttention)
    assert isinstance(layer.mlp, MXInferenceGemmaMLP)
    # GeGLU survived the surgery (the act seam is copied, not reset).
    assert layer.mlp.act is not jax.nn.silu
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 256, (1, 10)), jnp.int32)
    out = generate(model, ids, 4, kv_cache_config=MXConfig("int8"))
    assert out.shape == (1, 4)
