"""Fused MX-KV-cache decode attention: kernel vs dequantize-then-eager
reference (interpret mode on CPU; native on TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import env_variables as env
from torchmx_tpu.models.llama import MXLayerKVCache, repeat_kv
from torchmx_tpu.ops import pallas_attention as pa


def _force_fused():
    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    return old


def ref_attention(q, cache, mask, sm_scale, hq):
    """The model's dequantized-cache path: full fp32 softmax, bf16 matmuls."""
    k, v = cache.dequantize()
    groups = hq // k.shape[1]
    k = repeat_kv(k, groups)
    v = repeat_kv(v, groups)
    s = jnp.matmul(q, k.swapaxes(-2, -1), preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * sm_scale
    if mask is not None:
        s = s + jnp.broadcast_to(mask, s.shape).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.matmul(p, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def make_cache(key, b, hkv, L, d, elem, kv_len):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    k = (jax.random.normal(k1, (b, hkv, L, d)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(k2, (b, hkv, L, d)) * 0.3).astype(jnp.bfloat16)
    cache = MXLayerKVCache.create(b, hkv, L, d, elem, 32)
    return cache.write(k, v, 0)


@pytest.mark.parametrize("elem", ["float8_e4m3", "float6_e2m3", "int8"])
@pytest.mark.parametrize("sq", [1, 4])
def test_fused_cached_attention_matches_reference(elem, sq):
    b, hq, hkv, d, L = 2, 4, 2, 128, 256
    kv_len = 100
    q = (jax.random.normal(jax.random.PRNGKey(7), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(3, b, hkv, L, d, elem, kv_len)
    # Mask off positions >= kv_len (decode semantics).
    mask = jnp.where(jnp.arange(L) < kv_len, 0.0, -jnp.inf)[None, None, None, :]

    old = _force_fused()
    try:
        out = pa.cached_attention_any(q, cache, mask, 1.0 / math.sqrt(d))
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    assert out is not None
    ref = ref_attention(q, cache, mask, 1.0 / math.sqrt(d), hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fused_cached_attention_gqa_grouping():
    """Rows fold as (head-in-group, sq): distinct q heads sharing a kv head
    must get their own outputs."""
    b, hq, hkv, d, L = 1, 8, 2, 128, 128
    q = (jax.random.normal(jax.random.PRNGKey(0), (b, hq, 1, d))).astype(jnp.bfloat16)
    cache = make_cache(1, b, hkv, L, d, "float8_e4m3", L)
    old = _force_fused()
    try:
        out = pa.cached_attention_any(q, cache, None, 1.0 / math.sqrt(d))
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    ref = ref_attention(q, cache, None, 1.0 / math.sqrt(d), hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
    # sanity: outputs differ across heads (inputs differ)
    o = np.asarray(out, np.float32)
    assert not np.allclose(o[0, 0], o[0, 1])


def test_fused_eligibility_gates():
    b, hq, hkv, d, L = 1, 4, 2, 128, 256
    q = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    old = _force_fused()
    try:
        # fp4 cache -> fallback
        c4 = MXLayerKVCache.create(b, hkv, L, d, "float4_e2m1", 32)
        assert pa.cached_attention_any(q, c4, None, 1.0) is None
        # prefill-sized rows -> fallback
        c8 = MXLayerKVCache.create(b, hkv, L, d, "float8_e4m3", 32)
        qbig = jnp.zeros((b, hq, 64, d), jnp.bfloat16)
        assert pa.cached_attention_any(qbig, c8, None, 1.0) is None
        # off -> fallback
        env.TORCHMX_FUSED_ATTENTION = "off"
        assert pa.cached_attention_any(q, c8, None, 1.0) is None
    finally:
        env.TORCHMX_FUSED_ATTENTION = old


def test_generate_with_fused_mx_cache_close_to_reference_path():
    """End-to-end decode through the model: the fused path must stay close to
    the dequantize-the-cache path on the same quantized cache (fp32
    reordering tolerance), and produce finite logits."""
    from flax import nnx

    from torchmx_tpu.config import MXConfig
    from torchmx_tpu.models.generate import generate
    from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    assert cfg.head_dim == 128
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    prompt = jnp.asarray(np.arange(64, dtype=np.int32)[None, :] % 128)

    old = env.TORCHMX_FUSED_ATTENTION
    try:
        env.TORCHMX_FUSED_ATTENTION = "pallas"
        out_fused = generate(
            model, prompt, max_new_tokens=64, kv_cache_config=MXConfig("float8_e4m3")
        )
        env.TORCHMX_FUSED_ATTENTION = "off"
        out_ref = generate(
            model, prompt, max_new_tokens=64, kv_cache_config=MXConfig("float8_e4m3")
        )
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    a, r = np.asarray(out_fused), np.asarray(out_ref)
    # Greedy decode on a random tiny model: argmax flips are possible but the
    # sequences should agree at the start (prefill path is shared).
    assert a.shape == r.shape == (1, 64)
    assert (a == r).mean() > 0.5
