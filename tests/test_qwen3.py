"""Qwen3 family: HF parity (QK-RMSNorm actually biting, decoupled head_dim),
quantization-surgery registry dispatch, and cached decode through the MX
serving path.

The reference ships Llama and Qwen2 families only
(rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``); Qwen3
(= Llama + per-head QK-RMSNorm before RoPE, bias-free projections,
explicit head_dim) is a TPU-build extension through the same type-dispatch
seams.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.layers.mx_qwen3_attention import (
    MXInferenceQwen3Attention,
    MXInferenceQwen3MLP,
)
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaAttention
from torchmx_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config():
    # head_dim decoupled from hidden/heads (Qwen3 convention): 4 heads x 64
    # != hidden 128.
    return Qwen3Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=64,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
    )


def _hf_pair(seed=0):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(seed)
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    hf = transformers.Qwen3ForCausalLM(hf_cfg).to(torch.float32).eval()
    # Fresh-init RMSNorm weights are all-ones; perturb them so the parity
    # check exercises learned (non-trivial) QK-norm weights.
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.self_attn.q_norm.weight.mul_(
                1 + 0.1 * torch.randn_like(layer.self_attn.q_norm.weight)
            )
            layer.self_attn.k_norm.weight.mul_(
                1 + 0.1 * torch.randn_like(layer.self_attn.k_norm.weight)
            )
    model, cfg = from_hf_torch(hf)
    return torch, hf, model, cfg


def test_hf_parity_qwen3_qk_norm():
    """bf16 forward tracks HF Qwen3 (eager); skipping the QK-norm diverges."""
    torch, hf, model, cfg = _hf_pair()
    assert isinstance(model, Qwen3ForCausalLM)
    assert cfg.head_dim == 64
    ids = np.random.RandomState(0).randint(0, 256, (2, 24))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    mine = np.asarray(logits, np.float32)
    corr = np.corrcoef(mine.ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"qwen3 corr {corr}"
    # The QK-norm must actually bite: identity-norm forwards diverge.
    for layer in model.model.layers:
        layer.self_attn._norm_qk = LlamaAttention._norm_qk.__get__(layer.self_attn)
    nonorm_logits, _ = model(jnp.asarray(ids, jnp.int32))
    assert float(jnp.max(jnp.abs(nonorm_logits - logits))) > 0.05


def test_qwen3_surgery_and_mx_decode():
    """quantize_llm_ dispatches Qwen3 types; QK-norm weights survive surgery;
    greedy MX-cache decode matches the float model's argmax trajectory shape."""
    model = Qwen3ForCausalLM(tiny_config(), rngs=__import__("flax").nnx.Rngs(0))
    # Make the QK-norm weights non-trivial so surgery must carry them over.
    import jax

    for layer in model.model.layers:
        w = layer.self_attn.q_norm.weight
        w.set_value(w.get_value() * jnp.asarray(1.25, w.get_value().dtype))
    float_logits, _ = model(jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32))

    lin = QLinearConfig(
        weights_config=MXConfig(elem_dtype_name="float8_e4m3"),
        activations_config=MXConfig(elem_dtype_name="float8_e4m3"),
    )
    qattn = QAttentionConfig(
        projection_config=lin,
        kv_cache_config=MXConfig(elem_dtype_name="int8"),
    )
    quantize_llm_(model, qattn, lin)
    for layer in model.model.layers:
        assert type(layer.self_attn) is MXInferenceQwen3Attention
        assert type(layer.mlp) is MXInferenceQwen3MLP
        assert float(jnp.max(layer.self_attn.q_norm.weight.get_value())) > 1.2

    q_logits, _ = model(jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32))
    corr = np.corrcoef(
        np.asarray(q_logits, np.float32).ravel(),
        np.asarray(float_logits, np.float32).ravel(),
    )[0, 1]
    assert corr > 0.98, f"quantized qwen3 corr {corr}"

    # Cached greedy decode runs through the MX KV cache without recompile
    # drama and agrees with the cacheless forward on the next token.
    prompt = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    toks = generate(model, prompt, max_new_tokens=4, kv_cache_config=qattn.kv_cache_config)
    assert toks.shape == (1, 4)  # generate returns the NEW tokens
    full_logits, _ = model(prompt)
    assert int(toks[0, 0]) == int(jnp.argmax(full_logits[0, -1]))


def test_qwen3_hf_parity_cached_decode():
    """Greedy decode (MX int8 cache) matches HF greedy generation."""
    torch, hf, model, _ = _hf_pair(seed=1)
    ids = np.random.RandomState(1).randint(0, 256, (1, 12))
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(ids), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
    toks = generate(
        model, jnp.asarray(ids, jnp.int32), max_new_tokens=6,
        kv_cache_config=MXConfig(elem_dtype_name="int8"),
    )
    # int8 cache is quality-neutral but not bit-identical to HF fp32; gate
    # on the full greedy stream matching (ties broken identically in this
    # tiny well-separated regime).
    np.testing.assert_array_equal(np.asarray(toks), hf_out[:, ids.shape[1] :])
