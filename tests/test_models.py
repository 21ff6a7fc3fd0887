"""Model-family tests: HF parity, generation, KV-cache decode consistency,
zero-recompile decode (the analog of the reference's 0-graph-breaks test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.qwen2 import Qwen2Config, Qwen2ForCausalLM
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config(cls=LlamaConfig):
    return cls(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )


@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_hf_parity(family):
    """bf16 forward must track the HF transformers fp32 reference closely."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(0)
    if family == "llama":
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        hf = transformers.LlamaForCausalLM(hf_cfg)
    else:
        hf_cfg = transformers.Qwen2Config(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        hf = transformers.Qwen2ForCausalLM(hf_cfg)
    hf = hf.to(torch.float32).eval()

    ids = np.random.RandomState(0).randint(0, 256, (2, 16))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, _ = from_hf_torch(hf)
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    mine = np.asarray(logits, np.float32)
    corr = np.corrcoef(mine.ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"{family} corr {corr}"


def test_generate_greedy_deterministic():
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 12)), jnp.int32)
    out1 = generate(model, ids, 6)
    out2 = generate(model, ids, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (2, 6)


def test_generate_matches_full_forward_argmax():
    """First generated token == argmax of the no-cache forward's last logits."""
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(1))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, 10)), jnp.int32)
    logits, _ = model(ids)
    expect = jnp.argmax(logits[:, -1, :], axis=-1)
    out = generate(model, ids, 1)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(expect))


def test_generate_cached_decode_consistent_with_recompute():
    """Tokens from incremental decode == tokens from repeated full forwards."""
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(2))
    ids = np.random.RandomState(2).randint(0, 256, (1, 8))
    cur = jnp.asarray(ids, jnp.int32)
    full_tokens = []
    for _ in range(4):
        logits, _ = model(cur)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        full_tokens.append(int(nxt[0]))
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    out = generate(model, jnp.asarray(ids, jnp.int32), 4)
    assert full_tokens == [int(t) for t in np.asarray(out[0])]


def test_generate_with_mx_kv_cache():
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(3))
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (2, 8)), jnp.int32)
    out = generate(model, ids, 4, kv_cache_config=MXConfig("float8_e4m3"))
    assert out.shape == (2, 4)


def test_quantized_model_generate():
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(4))
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 256, (1, 8)), jnp.int32)
    out = generate(model, ids, 4)
    assert out.shape == (1, 4)


def test_decode_zero_recompiles():
    """Every decode step after the first reuses the compiled executable — the
    TPU analog of the reference's zero-graph-breaks guarantee."""
    import functools

    from torchmx_tpu.models.generate import _decode_step

    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(5))
    gdef, state = nnx.split(model)
    caches = model.init_cache(1, 32)
    decode = jax.jit(functools.partial(_decode_step, gdef), static_argnames="max_len")
    token = jnp.zeros((1, 1), jnp.int32)
    for i in range(5):
        logits, caches = decode(state, token, jnp.asarray(8 + i, jnp.int32), caches, max_len=32)
        token = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
    assert decode._cache_size() == 1


def test_llama3_rope_scaling():
    cfg = tiny_config()
    cfg.rope_scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    from torchmx_tpu.models.llama import compute_rope_inv_freq

    base = compute_rope_inv_freq(tiny_config())
    scaled = compute_rope_inv_freq(cfg)
    assert scaled.shape == base.shape
    # Low-frequency components are divided by the factor.
    assert float(scaled[-1]) < float(base[-1])


def test_streaming_quantized_load_matches_quantize_after_load(tmp_path):
    """load_hf_model_quantized (quantize-as-you-stream, the analog of the
    reference's accelerate/meta-device flow, ``mx_linear.py:45-57``) must be
    bit-equal to loading high-precision then quantizing."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import load_hf_model, load_hf_model_quantized

    torch.manual_seed(1)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    hf = transformers.LlamaForCausalLM(hf_cfg).to(torch.bfloat16).eval()
    ckpt = str(tmp_path / "ckpt")
    hf.save_pretrained(ckpt, safe_serialization=True)

    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qattn = QAttentionConfig(projection_config=qlin)

    m_ref, _ = load_hf_model(ckpt)
    quantize_llm_(m_ref, qattn, qlin)
    m_str, _ = load_hf_model_quantized(ckpt, qattn, qlin)

    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (1, 16)), jnp.int32)
    la, _ = m_ref(ids)
    lb, _ = m_str(ids)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_generate_scan_matches_stream_loop():
    """The single-dispatch lax.scan decode and the streaming Python loop must
    produce identical tokens (same per-step math, one compile each)."""
    model = LlamaForCausalLM(tiny_config(), rngs=nnx.Rngs(4))
    prompt = jnp.asarray(np.random.RandomState(5).randint(0, 256, (2, 8)), jnp.int32)
    a = generate(model, prompt, max_new_tokens=12)
    b = generate(model, prompt, max_new_tokens=12, stream=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and with the MX KV cache + sampling
    a = generate(model, prompt, max_new_tokens=8,
                 kv_cache_config=MXConfig("float8_e4m3"), temperature=0.7)
    b = generate(model, prompt, max_new_tokens=8,
                 kv_cache_config=MXConfig("float8_e4m3"), temperature=0.7, stream=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qwen2_quantize_and_generate():
    """Qwen2 family end-to-end: surgery + MX KV cache + scan decode."""
    model = Qwen2ForCausalLM(tiny_config(Qwen2Config), rngs=nnx.Rngs(3))
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    from torchmx_tpu.layers.mx_qwen2_attention import (
        MXInferenceQwen2Attention,
        MXInferenceQwen2MLP,
    )

    assert isinstance(model.model.layers[0].self_attn, MXInferenceQwen2Attention)
    assert isinstance(model.model.layers[0].mlp, MXInferenceQwen2MLP)
    prompt = jnp.asarray(np.random.RandomState(9).randint(0, 256, (2, 8)), jnp.int32)
    out = generate(model, prompt, max_new_tokens=8,
                   kv_cache_config=MXConfig("float8_e4m3"))
    assert out.shape == (2, 8)
    out2 = generate(model, prompt, max_new_tokens=8,
                    kv_cache_config=MXConfig("float8_e4m3"))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
