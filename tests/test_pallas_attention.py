"""Fused MX-KV-cache attention: kernel vs dequantize-then-eager reference
(interpret mode on CPU; native on TPU).  Covers decode (sq=1), short prefill
(single q tile), and long prefill (q tiling), with GQA and prefix masking."""

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


def ref_attention(q, cache, q_off, kv_len, sm_scale, hq):
    """The model's dequantized-cache path: full fp32 softmax, bf16 matmuls,
    causal + prefix mask."""
    k, v = cache.dequantize()
    groups = hq // k.shape[1]
    k = repeat_kv(k, groups)
    v = repeat_kv(v, groups)
    sq, L = q.shape[2], k.shape[2]
    s = jnp.matmul(q, k.swapaxes(-2, -1), preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * sm_scale
    i = q_off + jnp.arange(sq)[:, None]
    j = jnp.arange(L)[None, :]
    mask = jnp.where((j <= i) & (j < kv_len), 0.0, jnp.finfo(jnp.float32).min)
    s = s + mask[None, None]
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.matmul(p, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def make_cache(key, b, hkv, L, d, elem, layout="seq"):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    k = (jax.random.normal(k1, (b, hkv, L, d)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(k2, (b, hkv, L, d)) * 0.3).astype(jnp.bfloat16)
    cache = MXLayerKVCache.create(b, hkv, L, d, elem, 32, layout=layout)
    return cache.write(k, v, 0)


def run_both(q, cache, q_off, kv_len, hq):
    d = q.shape[-1]
    old = _force_fused()
    try:
        out = pa.cached_attention_any(q, cache, q_off, kv_len, 1.0 / math.sqrt(d))
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    assert out is not None
    ref = ref_attention(q, cache, q_off, kv_len, 1.0 / math.sqrt(d), hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
    return out


@pytest.mark.parametrize("elem", ["float8_e4m3", "float6_e2m3", "float4_e2m1", "int8"])
@pytest.mark.parametrize("sq,q_off", [(1, 99), (4, 96)])
def test_fused_decode_matches_reference(elem, sq, q_off):
    b, hq, hkv, d, L = 2, 4, 2, 128, 256
    q = (jax.random.normal(jax.random.PRNGKey(7), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(3, b, hkv, L, d, elem)
    run_both(q, cache, q_off, q_off + sq, hq)


def test_fused_prefill_q_tiling_matches_reference():
    """sq large enough that rows = sq*g exceeds one q tile."""
    b, hq, hkv, d, L = 1, 4, 2, 128, 512
    sq = 256  # rows = 512 > MAX_ROWS -> multiple q tiles
    q = (jax.random.normal(jax.random.PRNGKey(5), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(11, b, hkv, L, d, "float8_e4m3")
    run_both(q, cache, 0, sq, hq)


def test_fused_prefill_with_cache_offset():
    """Chunked prefill: queries appended at q_off > 0."""
    b, hq, hkv, d, L = 1, 2, 2, 128, 256
    sq, q_off = 64, 128
    q = (jax.random.normal(jax.random.PRNGKey(6), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(12, b, hkv, L, d, "float8_e4m3")
    run_both(q, cache, q_off, q_off + sq, hq)


def test_fused_gqa_grouping():
    """Distinct q heads sharing a kv head must get their own outputs."""
    b, hq, hkv, d, L = 1, 8, 2, 128, 128
    q = (jax.random.normal(jax.random.PRNGKey(0), (b, hq, 1, d))).astype(jnp.bfloat16)
    cache = make_cache(1, b, hkv, L, d, "float8_e4m3")
    out = run_both(q, cache, L - 1, L, hq)
    o = np.asarray(out, np.float32)
    assert not np.allclose(o[0, 0], o[0, 1])


@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 2), (8, 2)])
def test_chunkdot_int8_decode(hq, hkv):
    """int8 decode routes through the chunk-dot kernel (scales factored out
    of the dots); it must engage for sq=1 int8 and match both the eager
    reference (run_both) and the general tiled kernel closely."""
    b, d, L = 2, 128, 256
    assert pa.use_chunkdot("int8", 1, d)
    assert not pa.use_chunkdot("int8", 4, d)
    assert not pa.use_chunkdot("float8_e4m3", 1, d)

    q = (jax.random.normal(jax.random.PRNGKey(2), (b, hq, 1, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(9, b, hkv, L, d, "int8")
    out = run_both(q, cache, L - 1, L, hq)

    # Same inputs through the general tiled kernel: the two kernels differ
    # only in summation order (chunked partial sums vs full-d dots).
    g = hq // hkv
    q4 = (
        q.reshape(b, hkv, g, 1, d).transpose(0, 1, 3, 2, 4).reshape(b, hkv, g, d)
    )
    tiled = pa._mx_cached_attention(
        q4, cache.k_data, cache.k_scale, cache.v_data, cache.v_scale,
        jnp.full((b,), L - 1, jnp.int32), jnp.full((b,), L, jnp.int32),
        "int8", 1.0 / math.sqrt(d), 256, g, 1,
    ).reshape(b, hkv, 1, g, d).transpose(0, 1, 3, 2, 4).reshape(b, hq, 1, d)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(tiled, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_chunkdot_respects_prefix_mask():
    """Partial visible prefix (kv_len < L) must mask identically to eager."""
    b, hq, hkv, d, L = 1, 4, 2, 128, 256
    q = (jax.random.normal(jax.random.PRNGKey(3), (b, hq, 1, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(13, b, hkv, L, d, "int8")
    run_both(q, cache, 99, 100, hq)


@pytest.mark.parametrize("elem", ["float8_e4m3", "float6_e2m3", "float4_e2m1", "int8"])
@pytest.mark.parametrize("sq,q_off", [(1, 99), (4, 96)])
def test_dmajor_matches_reference(elem, sq, q_off):
    """d-major cache layout: fused kernel vs eager over the same cache, and
    bit-equal element decode vs the seq layout (same codes, transposed)."""
    b, hq, hkv, d, L = 2, 4, 2, 128, 256
    q = (jax.random.normal(jax.random.PRNGKey(7), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(3, b, hkv, L, d, elem, layout="dmajor")
    out = run_both(q, cache, q_off, q_off + sq, hq)

    seq_cache = make_cache(3, b, hkv, L, d, elem, layout="seq")
    # Identical quantization in both layouts.
    k_dm, v_dm = cache.dequantize()
    k_sq, v_sq = seq_cache.dequantize()
    np.testing.assert_array_equal(np.asarray(k_dm), np.asarray(k_sq))
    np.testing.assert_array_equal(np.asarray(v_dm), np.asarray(v_sq))
    # Same fused result up to dot-order fp32 rounding.
    out_seq = run_both(q, seq_cache, q_off, q_off + sq, hq)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_seq, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_dmajor_prefill_tiling_and_offset():
    """d-major prefill: multi-q-tile and chunked-prefill offsets."""
    b, hq, hkv, d, L = 1, 4, 2, 128, 512
    sq = 256
    q = (jax.random.normal(jax.random.PRNGKey(5), (b, hq, sq, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(11, b, hkv, L, d, "float8_e4m3", layout="dmajor")
    run_both(q, cache, 0, sq, hq)
    cache2 = make_cache(12, 1, 2, 256, d, "float8_e4m3", layout="dmajor")
    q2 = (jax.random.normal(jax.random.PRNGKey(6), (1, 2, 64, d)) * 0.3).astype(
        jnp.bfloat16
    )
    run_both(q2, cache2, 128, 192, 2)


def test_dmajor_incremental_write_roundtrip():
    """Decode-step writes along the lane dim land at the right positions."""
    b, hkv, L, d = 1, 2, 128, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    k = (jax.random.normal(k1, (b, hkv, 4, d)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(k2, (b, hkv, 4, d)) * 0.3).astype(jnp.bfloat16)
    dm = MXLayerKVCache.create(b, hkv, L, d, "int8", 32, layout="dmajor")
    sq_ = MXLayerKVCache.create(b, hkv, L, d, "int8", 32, layout="seq")
    for i in range(4):
        dm = dm.write(k[:, :, i : i + 1], v[:, :, i : i + 1], i)
        sq_ = sq_.write(k[:, :, i : i + 1], v[:, :, i : i + 1], i)
    np.testing.assert_array_equal(
        np.asarray(dm.dequantize()[0]), np.asarray(sq_.dequantize()[0])
    )
    np.testing.assert_array_equal(
        np.asarray(dm.dequantize()[1]), np.asarray(sq_.dequantize()[1])
    )
    assert dm.max_len == L and sq_.max_len == L


@pytest.mark.parametrize("hq,hkv", [(4, 2), (8, 2)])
def test_int8dot_decode_close_to_reference(hq, hkv):
    """All-int8 MXU-dot decode (opt-in): q + attention weights requantize to
    int8 in-kernel, so the gate is SQNR vs the exact-decode path, not
    elementwise equality."""
    b, d, L = 2, 128, 256
    q = (jax.random.normal(jax.random.PRNGKey(2), (b, hq, 1, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(9, b, hkv, L, d, "int8", layout="dmajor")
    assert not pa.use_int8dot(cache, 1, d)  # off by default
    old_flag = env.TORCHMX_ATTN_INT8_DOT
    env.TORCHMX_ATTN_INT8_DOT = "1"
    try:
        assert pa.use_int8dot(cache, 1, d)
        assert not pa.use_int8dot(make_cache(9, b, hkv, L, d, "int8"), 1, d)  # seq
        old = _force_fused()
        try:
            out = pa.cached_attention_any(
                q, cache, L - 1, L, 1.0 / math.sqrt(d)
            )
        finally:
            env.TORCHMX_FUSED_ATTENTION = old
    finally:
        env.TORCHMX_ATTN_INT8_DOT = old_flag
    assert out is not None
    ref = ref_attention(q, cache, L - 1, L, 1.0 / math.sqrt(d), hq)
    o = np.asarray(out, np.float64)
    r = np.asarray(ref, np.float64)
    err = o - r
    sqnr = 10 * np.log10(np.sum(r * r) / max(np.sum(err * err), 1e-30))
    assert sqnr > 30.0, f"int8dot SQNR {sqnr:.1f} dB"


def test_int8dot_respects_prefix_mask():
    b, hq, hkv, d, L = 1, 4, 2, 128, 256
    q = (jax.random.normal(jax.random.PRNGKey(3), (b, hq, 1, d)) * 0.3).astype(
        jnp.bfloat16
    )
    cache = make_cache(13, b, hkv, L, d, "int8", layout="dmajor")
    old_flag = env.TORCHMX_ATTN_INT8_DOT
    env.TORCHMX_ATTN_INT8_DOT = "1"
    old = _force_fused()
    try:
        out = pa.cached_attention_any(q, cache, 99, 100, 1.0 / math.sqrt(d))
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
        env.TORCHMX_ATTN_INT8_DOT = old_flag
    ref = ref_attention(q, cache, 99, 100, 1.0 / math.sqrt(d), hq)
    o, r = np.asarray(out, np.float64), np.asarray(ref, np.float64)
    sqnr = 10 * np.log10(np.sum(r * r) / max(np.sum((o - r) ** 2), 1e-30))
    assert sqnr > 30.0, f"masked int8dot SQNR {sqnr:.1f} dB"


def test_fused_eligibility_gates():
    b, hq, hkv, d, L = 1, 4, 2, 128, 256
    q = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    old = _force_fused()
    try:
        # fp4 caches are eligible (halves-packed along head_dim)
        c4 = MXLayerKVCache.create(b, hkv, L, d, "float4_e2m1", 32)
        assert pa.cached_attention_any(q, c4, 0, 1, 1.0) is not None
        # head_dim not a lane multiple -> fallback
        c96 = MXLayerKVCache.create(b, hkv, L, 96, "float8_e4m3", 32)
        q96 = jnp.zeros((b, hq, 1, 96), jnp.bfloat16)
        assert pa.cached_attention_any(q96, c96, 0, 1, 1.0) is None
        # off -> fallback
        c8 = MXLayerKVCache.create(b, hkv, L, d, "float8_e4m3", 32)
        env.TORCHMX_FUSED_ATTENTION = "off"
        assert pa.cached_attention_any(q, c8, 0, 1, 1.0) is None
    finally:
        env.TORCHMX_FUSED_ATTENTION = old


def test_generate_with_fused_mx_cache_close_to_reference_path():
    """End-to-end decode through the model: the fused path must stay close to
    the dequantize-the-cache path on the same quantized cache (fp32
    reordering tolerance)."""
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
    # sequences should agree at the start (same prefill numerics class).
    assert a.shape == r.shape == (1, 64)
    assert (a == r).mean() > 0.5


def test_bf16_cached_attention_baseline_matches_eager():
    """The no-decode bf16-cache kernel variant (bench baseline) must match
    eager full-softmax attention within online-softmax fp32 tolerance."""
    import math

    from torchmx_tpu.models.llama import repeat_kv

    b, hq, hkv, L, d = 2, 8, 4, 256, 128
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, L, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, L, d)) * 0.3, jnp.bfloat16)
    sm = 1.0 / math.sqrt(d)
    out = pa.bf16_cached_attention(q, k, v, L - 1, L, sm)
    assert out is not None
    g = hq // hkv
    kk, vv = repeat_kv(k, g), repeat_kv(v, g)
    s = jnp.matmul(q, kk.swapaxes(-2, -1), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s.astype(jnp.float32) * sm, axis=-1).astype(jnp.bfloat16)
    ref = jnp.matmul(p, vv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_qkv_quantized_fused_cache_attention():
    """Round 3 (VERDICT item 6): with Q/K/V quantization configured AND the
    cache in the same format as key/value configs, attention runs the FUSED
    cache kernel (Q fake-quantized per query config; cache quantization ==
    K/V quantization; attn-weights fq eager-only) instead of dropping to
    eager O(L^2).  Output must be close to the eager QKV path (which
    double-quantizes K/V and fq's the post-softmax weights)."""
    import math

    from flax import nnx

    from torchmx_tpu import env_variables as env
    from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
    from torchmx_tpu.layers.mx_llama_attention import MXInferenceLlamaAttention
    from torchmx_tpu.models.llama import (
        LlamaAttention,
        LlamaConfig,
        MXLayerKVCache,
        rope_cos_sin,
    )

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        head_dim=128,
        max_position_embeddings=256,
    )
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qattn = QAttentionConfig(
        projection_config=qlin,
        query_config=MXConfig("float8_e4m3"),
        key_config=MXConfig("float8_e4m3"),
        value_config=MXConfig("float8_e4m3"),
        attention_weights_config=MXConfig("float8_e4m3"),
    )
    base = LlamaAttention(cfg, 0, rngs=nnx.Rngs(0))
    attn = MXInferenceLlamaAttention.from_float(base, qattn)

    cache = MXLayerKVCache.create(2, 2, 256, 128, "float8_e4m3", 32)
    assert attn._fused_cache_attention_ok(cache)
    mismatched = MXLayerKVCache.create(2, 2, 256, 128, "int8", 32)
    assert not attn._fused_cache_attention_ok(mismatched)
    assert not attn._fused_cache_attention_ok(None)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 256)) * 0.3, jnp.bfloat16)
    pos = jnp.arange(8)[None, :]
    cos, sin = rope_cos_sin(
        jnp.asarray(1.0 / (10000.0 ** (np.arange(0, 128, 2) / 128.0))), pos,
        jnp.bfloat16,
    )

    calls = []
    orig = pa.cached_attention_any

    def spy(*a, **k):
        r = orig(*a, **k)
        calls.append(r is not None)
        return r

    old_mode = env.TORCHMX_FUSED_ATTENTION
    try:
        env.TORCHMX_FUSED_ATTENTION = "pallas"  # interpret mode off-TPU
        # llama.py imports the pallas_attention MODULE and resolves the
        # function at call time, so patching the module attribute suffices.
        pa.cached_attention_any = spy
        out_fused, _ = attn(
            x, cos=cos, sin=sin, attention_mask=None,
            cache=cache, cache_position=0,
        )
        assert calls and calls[-1], "fused kernel did not engage"
    finally:
        pa.cached_attention_any = orig
        env.TORCHMX_FUSED_ATTENTION = old_mode

    # Eager QKV reference (fused disabled).
    try:
        env.TORCHMX_FUSED_ATTENTION = "off"
        out_eager, _ = attn(
            x, cos=cos, sin=sin, attention_mask=None,
            cache=MXLayerKVCache.create(2, 2, 256, 128, "float8_e4m3", 32),
            cache_position=0,
        )
    finally:
        env.TORCHMX_FUSED_ATTENTION = old_mode

    a = np.asarray(out_fused, np.float32)
    b = np.asarray(out_eager, np.float32)
    # Different quantization seams (single vs double K/V quantization, no
    # attn-weights fq in the kernel): close, not bit-equal.
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
    assert err < 0.15, err
