"""Mistral family + sliding-window attention: HF parity (the window
actually biting), window masks vs brute force, the fused MX-cache kernel's
in-kernel window vs the eager reference, cached-decode consistency, and the
quantization-surgery registry.

The reference ships Llama and Qwen2 families only; Mistral (= Llama +
sliding window, rain-neuromorphics/torchmx has no counterpart) is a
TPU-build extension through the same type-dispatch seams.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu import env_variables as env
from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import MXLayerKVCache, make_causal_mask, repeat_kv
from torchmx_tpu.models.mistral import MistralConfig, MistralForCausalLM
from torchmx_tpu.ops import pallas_attention as pa
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config(window=8):
    return MistralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        sliding_window=window,
    )


def test_window_mask_matches_bruteforce():
    for q_len, kv_len, w in [(16, 16, 4), (4, 12, 3), (16, 16, 1), (8, 8, 32)]:
        m = np.asarray(make_causal_mask(q_len, kv_len, window=w))
        for i in range(q_len):
            qp = i + (kv_len - q_len)
            for j in range(kv_len):
                allowed = (j <= qp) and (j > qp - w)
                assert (m[i, j] == 0.0) == allowed, (q_len, kv_len, w, i, j)


def test_hf_parity_mistral_sliding_window():
    """bf16 forward tracks HF Mistral (eager) with the window biting."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(0)
    hf_cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=8,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    hf = transformers.MistralForCausalLM(hf_cfg).to(torch.float32).eval()
    ids = np.random.RandomState(0).randint(0, 256, (2, 24))  # 24 > window 8
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, _ = from_hf_torch(hf)
    assert isinstance(model, MistralForCausalLM)
    assert model.config.sliding_window == 8
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    mine = np.asarray(logits, np.float32)
    corr = np.corrcoef(mine.ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"mistral corr {corr}"
    # The window must actually bite: the same weights without it diverge.
    model.config.sliding_window = None
    for layer in model.model.layers:
        layer.self_attn.config.sliding_window = None
    full_logits, _ = model(jnp.asarray(ids, jnp.int32))
    assert float(jnp.max(jnp.abs(full_logits - logits))) > 0.05


def _ref_attention_window(q, cache, q_off, kv_len, sm_scale, hq, window):
    k, v = cache.dequantize()
    groups = hq // k.shape[1]
    k, v = repeat_kv(k, groups), repeat_kv(v, groups)
    sq, L = q.shape[2], k.shape[2]
    s = jnp.matmul(q, k.swapaxes(-2, -1), preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * sm_scale
    i = q_off + jnp.arange(sq)[:, None]
    j = jnp.arange(L)[None, :]
    valid = (j <= i) & (j < kv_len) & (j > i - window)
    s = s + jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.matmul(p, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("layout", ["seq", "dmajor"])
@pytest.mark.parametrize("sq,q_off", [(1, 300), (1, 40), (128, 0)])
def test_fused_kernel_window_matches_eager(layout, sq, q_off):
    """In-kernel sliding-window masking == the dequantize+dense-mask path,
    including windows that straddle KV-tile boundaries."""
    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    try:
        b, hq, hkv, d, L, window = 2, 8, 4, 128, 512, 100
        rng = np.random.RandomState(sq + q_off)
        cache = MXLayerKVCache.create(b, hkv, L, d, "int8", 32, layout=layout)
        kv_len = q_off + sq
        k = jnp.asarray(rng.randn(b, hkv, kv_len, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, hkv, kv_len, d), jnp.bfloat16)
        cache = cache.write(k, v, 0)
        q = jnp.asarray(rng.randn(b, hq, sq, d), jnp.bfloat16)
        sm = 1.0 / math.sqrt(d)
        out = pa.cached_attention_any(q, cache, q_off, kv_len, sm, window=window)
        assert out is not None, "fused path must be eligible"
        ref = _ref_attention_window(q, cache, q_off, kv_len, sm, hq, window)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
    finally:
        env.TORCHMX_FUSED_ATTENTION = old


def test_mistral_cached_decode_matches_recompute():
    """Window-masked attention through the cache == the cacheless forward's
    window mask: per-step last logits agree bitwise (eager both sides; token
    streams can flip on random-init near-ties under jit fusion drift, so the
    gate is on logits)."""
    model = MistralForCausalLM(tiny_config(window=6), rngs=nnx.Rngs(2))
    ids = np.random.RandomState(2).randint(0, 256, (1, 10))
    cur = jnp.asarray(ids, jnp.int32)
    caches = model.init_cache(1, 16)
    # Prefill: cached last logits == cacheless last logits, bit for bit.
    cached_logits, caches = model(
        cur,
        position_ids=jnp.arange(10)[None, :],
        caches=caches,
        cache_position=0,
    )
    for step in range(4):
        full_logits, _ = model(cur)
        np.testing.assert_array_equal(
            np.asarray(cached_logits[:, -1], np.float32),
            np.asarray(full_logits[:, -1], np.float32),
        )
        nxt = jnp.argmax(full_logits[:, -1, :], axis=-1).astype(jnp.int32)
        pos = cur.shape[1]
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
        cached_logits, caches = model(
            nxt[:, None],
            position_ids=jnp.full((1, 1), pos, jnp.int32),
            caches=caches,
            cache_position=jnp.asarray(pos, jnp.int32),
        )


def test_mistral_mx_cache_generate_matches_hp_cache():
    """Window masking is cache-format independent: greedy tokens through the
    MX KV cache (dequantize path, int8 = 38 dB) match the hp cache."""
    model = MistralForCausalLM(tiny_config(window=6), rngs=nnx.Rngs(3))
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (2, 10)), jnp.int32)
    hp = generate(model, ids, 6)
    mx = generate(model, ids, 6, kv_cache_config=MXConfig("int8"))
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(mx))


def test_mistral_quantize_registry():
    from torchmx_tpu.layers.mx_mistral_attention import (
        MXInferenceMistralAttention,
        MXInferenceMistralMLP,
    )

    model = MistralForCausalLM(tiny_config(), rngs=nnx.Rngs(4))
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    layer = model.model.layers[0]
    assert isinstance(layer.self_attn, MXInferenceMistralAttention)
    assert isinstance(layer.mlp, MXInferenceMistralMLP)
    # The quantized module keeps the window config, and generation runs.
    assert layer.self_attn.config.sliding_window == 8
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 256, (1, 10)), jnp.int32)
    out = generate(model, ids, 4)
    assert out.shape == (1, 4)


# ---------------------------------------------------------------------------
# Rolling-buffer (ring) KV cache
# ---------------------------------------------------------------------------


def test_ring_write_holds_last_capacity_positions():
    """After writing past capacity, slot p%R holds position p's values for
    the last R positions exactly (quantize-roundtrip equality)."""
    from torchmx_tpu.mx_array import quantize_mx, dequantize_mx

    b, h, d, R = 1, 2, 64, 8
    rng = np.random.RandomState(0)
    ks = jnp.asarray(rng.randn(b, h, 14, d), jnp.bfloat16)
    vs = jnp.asarray(rng.randn(b, h, 14, d), jnp.bfloat16)
    for layout in ("seq", "dmajor"):
        cache = MXLayerKVCache.create(b, h, R, d, "int8", 32, layout=layout, ring=True)
        for t in range(14):
            cache = cache.write(ks[:, :, t : t + 1], vs[:, :, t : t + 1], t)
        k_got, _ = cache.dequantize()
        for p in range(6, 14):  # the last R=8 positions
            s, q = quantize_mx(ks[:, :, p : p + 1], "int8", 32)
            want = dequantize_mx(q, s, "int8", 32, jnp.bfloat16, 3)
            np.testing.assert_array_equal(
                np.asarray(k_got[:, :, p % R], np.float32),
                np.asarray(want[:, :, 0], np.float32),
                err_msg=f"{layout} pos {p}",
            )


def test_ring_write_bulk_longer_than_capacity():
    """A single write longer than the ring keeps the LAST R tokens."""
    b, h, d, R = 1, 1, 64, 8
    rng = np.random.RandomState(1)
    ks = jnp.asarray(rng.randn(b, h, 13, d), jnp.bfloat16)
    cache = MXLayerKVCache.create(b, h, R, d, "int8", 32, ring=True)
    cache = cache.write(ks, ks, 0)
    ref = MXLayerKVCache.create(b, h, R, d, "int8", 32, ring=True)
    for t in range(13):
        ref = ref.write(ks[:, :, t : t + 1], ks[:, :, t : t + 1], t)
    np.testing.assert_array_equal(np.asarray(cache.k_data), np.asarray(ref.k_data))
    np.testing.assert_array_equal(np.asarray(cache.k_scale), np.asarray(ref.k_scale))


def _ref_ring_attention(q, cache, q_off, kv_len, sm_scale, hq, window):
    """Dequantize the ring + dense ring mask (the model's eager path)."""
    from torchmx_tpu.models.llama import _ring_cache_mask

    k, v = cache.dequantize()
    groups = hq // k.shape[1]
    k, v = repeat_kv(k, groups), repeat_kv(v, groups)
    sq = q.shape[2]
    s = jnp.matmul(q, k.swapaxes(-2, -1), preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * sm_scale
    mask = _ring_cache_mask(q_off, sq, k.shape[2], window)
    s = s + mask
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.matmul(p, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("layout", ["seq", "dmajor"])
@pytest.mark.parametrize("sq,q_off", [(1, 100), (1, 500), (8, 380)])
def test_fused_ring_kernel_matches_eager(layout, sq, q_off):
    """In-kernel ring position reconstruction == dequantize + ring mask,
    before and after the ring wraps."""
    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    try:
        b, hq, hkv, d, R, window = 2, 8, 4, 128, 256, 200
        rng = np.random.RandomState(sq + q_off)
        cache = MXLayerKVCache.create(
            b, hkv, R, d, "int8", 32, layout=layout, ring=True
        )
        # Fill positions 0..q_off+sq-1 through the ring in chunks.
        T = q_off + sq
        pos = 0
        while pos < T:
            c = min(R, T - pos)
            k = jnp.asarray(rng.randn(b, hkv, c, d), jnp.bfloat16)
            v = jnp.asarray(rng.randn(b, hkv, c, d), jnp.bfloat16)
            cache = cache.write(k, v, pos)
            pos += c
        q = jnp.asarray(rng.randn(b, hq, sq, d), jnp.bfloat16)
        sm = 1.0 / math.sqrt(d)
        out = pa.cached_attention_any(
            q, cache, q_off, q_off + sq, sm, window=window, ring=True
        )
        assert out is not None, "fused ring path must be eligible"
        ref = _ref_ring_attention(q, cache, q_off, q_off + sq, sm, hq, window)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
    finally:
        env.TORCHMX_FUSED_ATTENTION = old


def test_ring_generate_matches_full_cache_stepwise():
    """Eager decode through a ring cache == through a full-length cache:
    per-step last logits agree (tolerance: slot order changes the softmax
    summation order after the wrap) across the wrap boundary."""
    w = 6
    model = MistralForCausalLM(tiny_config(window=w), rngs=nnx.Rngs(5))
    ids = np.random.RandomState(5).randint(0, 256, (1, 10))
    cur = jnp.asarray(ids, jnp.int32)
    cfg = MXConfig("int8")
    ring = model.init_cache(1, 16, cfg, ring=True)  # wraps at position 16
    full = model.init_cache(1, 40, cfg)
    pos_ids = jnp.arange(10)[None, :]
    lr, ring = model(cur, position_ids=pos_ids, caches=ring, cache_position=0)
    lf, full = model(cur, position_ids=pos_ids, caches=full, cache_position=0)
    np.testing.assert_allclose(
        np.asarray(lr[:, -1], np.float32), np.asarray(lf[:, -1], np.float32),
        atol=2e-2, rtol=2e-2,
    )
    tok = jnp.argmax(lf[:, -1, :], axis=-1).astype(jnp.int32)
    for pos in range(10, 24):  # crosses the slot-16 wrap
        pid = jnp.full((1, 1), pos, jnp.int32)
        cp = jnp.asarray(pos, jnp.int32)
        lr, ring = model(tok[:, None], position_ids=pid, caches=ring, cache_position=cp)
        lf, full = model(tok[:, None], position_ids=pid, caches=full, cache_position=cp)
        np.testing.assert_allclose(
            np.asarray(lr[:, -1], np.float32), np.asarray(lf[:, -1], np.float32),
            atol=2e-2, rtol=2e-2, err_msg=f"pos {pos}",
        )
        tok = jnp.argmax(lf[:, -1, :], axis=-1).astype(jnp.int32)


def test_ring_generate_end_to_end():
    """generate(ring_cache=True) runs a full decode in bounded HBM."""
    model = MistralForCausalLM(tiny_config(window=6), rngs=nnx.Rngs(6))
    ids = jnp.asarray(np.random.RandomState(6).randint(0, 256, (2, 10)), jnp.int32)
    out = generate(model, ids, 8, kv_cache_config=MXConfig("int8"), ring_cache=True)
    assert out.shape == (2, 8)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < 256))


def test_ring_errors():
    # Ring without a sliding-window model: generate refuses.
    llama = MistralForCausalLM(tiny_config(window=None), rngs=nnx.Rngs(7))
    ids = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="sliding-window"):
        generate(llama, ids, 2, kv_cache_config=MXConfig("int8"), ring_cache=True)
    # Ring without an MX config: init_cache refuses.
    mist = MistralForCausalLM(tiny_config(window=4), rngs=nnx.Rngs(8))
    with pytest.raises(ValueError, match="MX KV caches"):
        mist.init_cache(1, 16, None, ring=True)
    # Capacity too small for the prefill chunk: attention refuses.
    caches = mist.init_cache(1, 8, MXConfig("int8"), ring=True)
    with pytest.raises(ValueError, match="capacity"):
        mist(
            jnp.zeros((1, 8), jnp.int32),
            position_ids=jnp.arange(8)[None, :],
            caches=caches,
            cache_position=0,
        )


def test_qwen2_layer_types_gating_hf_parity():
    """Qwen2's max_window_layers gates the window per layer (layers >= it
    slide, earlier ones run full causal); our per-layer masks must track
    HF eager exactly."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_sliding_window=True,
        sliding_window=8, max_window_layers=2, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = transformers.Qwen2ForCausalLM(hf_cfg).to(torch.float32).eval()
    ids = np.random.RandomState(0).randint(0, 256, (2, 24))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, cfg = from_hf_torch(hf)
    assert cfg.layer_types == ("full_attention",) * 2 + ("sliding_attention",) * 2
    assert cfg.layer_window(0) is None and cfg.layer_window(3) == 8
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"qwen2 layer_types corr {corr}"
    # The gating must bite: windowing ALL layers diverges.
    model.config.layer_types = None
    for layer in model.model.layers:
        layer.self_attn.config.layer_types = None
    allwin, _ = model(jnp.asarray(ids, jnp.int32))
    assert float(jnp.max(jnp.abs(allwin - logits))) > 0.05


def test_mixed_layer_types_supported_by_scan():
    """Round 4: mixed layer_types no longer raise — the scan model plans one
    compiled body per attention KIND (plan_layer_bodies) and matches the
    plain per-layer forward."""
    from torchmx_tpu.models.llama import plan_layer_bodies
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    cfg = tiny_config(window=4)
    cfg.layer_types = ("full_attention", "sliding_attention")
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(13))
    assert plan_layer_bodies(cfg)[0] in ("period", "runs")
    scan_model = ScanLlamaForCausalLM(model)
    ids = jnp.asarray(np.random.RandomState(13).randint(0, 256, (2, 12)), jnp.int32)
    ref, _ = model(ids)
    got, _ = scan_model(ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_pipeline_model_honors_sliding_window():
    """pipeline_model's shared dense mask must window (it previously built
    plain causal): staged logits == the sequential model's."""
    import jax as J
    from jax.sharding import PartitionSpec as P, NamedSharding
    from torchmx_tpu.parallel.mesh import create_mesh
    from torchmx_tpu.parallel.pipeline import pipeline_model

    model = MistralForCausalLM(tiny_config(window=5), rngs=nnx.Rngs(14))
    ids = jnp.asarray(np.random.RandomState(14).randint(0, 256, (4, 16)), jnp.int32)
    ref, _ = model(ids)
    mesh = create_mesh((1, 2), devices=J.devices()[:2])
    fwd, params = pipeline_model(model, mesh, n_microbatches=2)
    with mesh:
        out = J.jit(fwd)(params, ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    # And the window must matter: a windowless clone diverges.
    full = MistralForCausalLM(tiny_config(window=None), rngs=nnx.Rngs(14))
    full_ref, _ = full(ids)
    assert float(jnp.max(jnp.abs(full_ref - ref))) > 0.05
