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


def test_hf_parity_gemma2():
    """Gemma2: sandwich norms, query_pre_attn_scalar scaling, attention +
    final logit soft caps, ALTERNATING sliding layers (layer_types) — all
    against HF eager."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.gemma import Gemma2ForCausalLM
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(0)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, sliding_window=8,
        query_pre_attn_scalar=64.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, attn_implementation="eager",
    )
    hf = transformers.Gemma2ForCausalLM(hf_cfg).to(torch.float32).eval()
    ids = np.random.RandomState(0).randint(0, 256, (2, 24))  # > window
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, cfg = from_hf_torch(hf)
    assert isinstance(model, Gemma2ForCausalLM)
    assert cfg.layer_types == (
        "sliding_attention", "full_attention",
        "sliding_attention", "full_attention",
    )
    assert cfg.query_pre_attn_scalar == 64.0
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"gemma2 corr {corr}"
    # The caps must bite: at random-init logit scale 50/30 are near-identity
    # (30·tanh(x/30) ≈ x for |x| ~ 2), so squeeze them hard and expect
    # divergence — proving the cap plumbing is live end to end.
    import dataclasses

    model.config = dataclasses.replace(
        model.config, attn_logit_softcapping=0.2, final_logit_softcapping=0.5
    )
    for layer in model.model.layers:
        layer.self_attn.attn_softcap = 0.2
    squeezed, _ = model(jnp.asarray(ids, jnp.int32))
    assert float(jnp.max(jnp.abs(squeezed - logits))) > 0.05
    assert float(jnp.max(jnp.abs(squeezed))) <= 0.5 + 1e-3  # final cap bound


def test_gemma2_fused_softcap_matches_eager():
    """The in-kernel attention soft cap (applied before masking) matches
    the eager dequantize path over an MX cache."""
    import math

    from torchmx_tpu import env_variables as env
    from torchmx_tpu.models.llama import MXLayerKVCache, repeat_kv
    from torchmx_tpu.ops import pallas_attention as pa

    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    try:
        b, hq, hkv, d, L, cap = 2, 8, 4, 128, 256, 20.0
        rng = np.random.RandomState(3)
        cache = MXLayerKVCache.create(b, hkv, L, d, "int8", 32)
        kv_len = 200
        k = jnp.asarray(rng.randn(b, hkv, kv_len, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, hkv, kv_len, d), jnp.bfloat16)
        cache = cache.write(k, v, 0)
        q = jnp.asarray(rng.randn(b, hq, 1, d), jnp.bfloat16)
        sm = 1.0 / math.sqrt(d)
        out = pa.cached_attention_any(q, cache, kv_len - 1, kv_len, sm, softcap=cap)
        assert out is not None
        kd, vd = cache.dequantize()
        kk, vv = repeat_kv(kd, 2), repeat_kv(vd, 2)
        s = jnp.matmul(q, kk.swapaxes(-2, -1), preferred_element_type=jnp.float32)
        s = cap * jnp.tanh(s.astype(jnp.float32) * sm / cap)
        j = jnp.arange(L)
        mask = jnp.where(j < kv_len, 0.0, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s + mask[None, None, None], axis=-1).astype(jnp.bfloat16)
        ref = jnp.matmul(p, vv, preferred_element_type=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
    finally:
        env.TORCHMX_FUSED_ATTENTION = old


def test_gemma2_quantize_and_generate():
    from torchmx_tpu.layers.mx_gemma_attention import (
        MXInferenceGemma2Attention,
        MXInferenceGemma2MLP,
    )
    from torchmx_tpu.models.gemma import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128,
        query_pre_attn_scalar=64.0, sliding_window=8,
        layer_types=("sliding_attention", "full_attention"),
    )
    model = Gemma2ForCausalLM(cfg, rngs=nnx.Rngs(3))
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    layer = model.model.layers[0]
    assert isinstance(layer.self_attn, MXInferenceGemma2Attention)
    assert isinstance(layer.mlp, MXInferenceGemma2MLP)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (1, 10)), jnp.int32)
    out = generate(model, ids, 4, kv_cache_config=MXConfig("int8"))
    assert out.shape == (1, 4)


def test_scan_applies_final_softcap():
    """The scan-over-layers head must apply Gemma2's final soft cap (it
    reimplements the LM head): scan logits == plain model logits."""
    from torchmx_tpu.models.gemma import Gemma2Config, Gemma2ForCausalLM
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    cfg = Gemma2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128,
        query_pre_attn_scalar=64.0, sliding_window=None,
        final_logit_softcapping=0.5,  # small enough to bite at init scale
    )
    model = Gemma2ForCausalLM(cfg, rngs=nnx.Rngs(4))
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 256, (1, 12)), jnp.int32)
    ref, _ = model(ids)
    assert float(jnp.max(jnp.abs(ref))) <= 0.5 + 1e-3
    scan = ScanLlamaForCausalLM(model)
    out, _ = scan(ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    assert float(jnp.max(jnp.abs(out))) <= 0.5 + 1e-3


def test_pipeline_applies_gemma_conventions():
    """pipeline_model reimplements the embed/head steps: it must scale
    embeddings by sqrt(h) (and would apply the final cap) — staged logits
    match the sequential Gemma."""
    import jax as J

    from torchmx_tpu.parallel.mesh import create_mesh
    from torchmx_tpu.parallel.pipeline import pipeline_model

    model = GemmaForCausalLM(tiny_config(), rngs=nnx.Rngs(5))
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 256, (4, 12)), jnp.int32)
    ref, _ = model(ids)
    mesh = create_mesh((1, 2), devices=J.devices()[:2])
    fwd, params = pipeline_model(model, mesh, n_microbatches=2)
    with mesh:
        out = J.jit(fwd)(params, ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
