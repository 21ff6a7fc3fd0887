"""Scan-over-layers model: logits must match the unrolled model's.

One compiled layer body (lax.scan over stacked params) instead of N copies —
the deep-model compile-time fix.  The unrolled jit fuses ACROSS layer
boundaries (residual adds into the next layer's rsqrt, different fp32
reduction orders), so scan-vs-unrolled logits drift at the bf16 rounding
level (measured max ~0.03 on ~N(0,1) logits for the tiny 4-layer model);
the tests bound that drift elementwise and require exact greedy-token
agreement end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.scan import ScanLlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_


def tiny_model(seed=0, layers=4):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def _jit_logits(model, ids, **kw):
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids, **kw)
        return logits

    return np.asarray(fwd(state, ids), np.float32)


def _assert_close(got, ref, max_frac=0.1, mean_frac=0.02):
    d = np.abs(got - ref)
    scale = ref.std()
    assert d.max() <= max_frac * scale, (d.max(), scale)
    assert d.mean() <= mean_frac * scale, (d.mean(), scale)


def test_scan_matches_unrolled_plain():
    model = tiny_model()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 16)), jnp.int32)
    ref = _jit_logits(model, ids)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    got = _jit_logits(scan_model, ids)
    _assert_close(got, ref)


def test_scan_matches_unrolled_quantized():
    model = tiny_model(seed=1)
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 16)), jnp.int32)
    ref = _jit_logits(model, ids)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    got = _jit_logits(scan_model, ids)
    # Fusion-order bf16 drift flips occasional activation-RNE rounding
    # decisions through dynamic quantization, amplifying the plain-model
    # drift (measured max ~0.24 sigma on the tiny model).
    _assert_close(got, ref, max_frac=0.5, mean_frac=0.1)
    # The stacked MXArray payload bits are the unrolled model's, unchanged.
    w_stacked = scan_model.layers_stacked.self_attn.q_proj.weight.get_value()
    w0 = model.model.layers[0].self_attn.q_proj.weight.get_value()
    np.testing.assert_array_equal(np.asarray(w_stacked.data[0]), np.asarray(w0.data))


def test_scan_cached_decode_matches_generate():
    from torchmx_tpu.models.generate import generate

    model = tiny_model(seed=2)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    prompt = np.random.RandomState(2).randint(0, 128, (1, 9)).astype(np.int32)
    ref = np.asarray(generate(model, jnp.asarray(prompt), max_new_tokens=8))
    got = np.asarray(generate(scan_model, jnp.asarray(prompt), max_new_tokens=8))
    np.testing.assert_array_equal(got, ref)


def test_scan_engine_mx_cache_matches_unrolled_engine():
    from torchmx_tpu.models.serve import DecodeEngine

    model = tiny_model(seed=3)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    kv = MXConfig("float8_e4m3")
    prompt = np.random.RandomState(3).randint(0, 128, (7,)).tolist()

    def run(m):
        eng = DecodeEngine(m, max_batch=2, max_len=64, kv_cache_config=kv)
        slot = eng.add(prompt)
        toks = []
        while len(toks) < 6:
            out = eng.step()
            if slot in out:
                toks.append(out[slot])
        return toks

    assert run(scan_model) == run(model)


def mixed_model(layer_types, seed=4, window=8, layers=4):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        sliding_window=window,
        layer_types=list(layer_types),
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def test_scan_mixed_periodic_windows_matches_unrolled():
    """Gemma2-shaped alternating sliding/full layers: the scan model groups
    layers by period (two compiled bodies) and matches the plain model —
    cacheless logits AND cached greedy decode."""
    from torchmx_tpu.models.generate import generate
    from torchmx_tpu.models.llama import plan_layer_bodies

    model = mixed_model(["sliding_attention", "full_attention"] * 2)
    assert plan_layer_bodies(model.config) == ("period", 2)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 128, (2, 24)), jnp.int32)
    ref = _jit_logits(model, ids)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    got = _jit_logits(scan_model, ids)
    _assert_close(got, ref)
    prompt = np.random.RandomState(5).randint(0, 128, (1, 12)).astype(np.int32)
    want = np.asarray(generate(model, jnp.asarray(prompt), max_new_tokens=8))
    toks = np.asarray(generate(scan_model, jnp.asarray(prompt), max_new_tokens=8))
    np.testing.assert_array_equal(toks, want)


def test_scan_mixed_run_windows_matches_unrolled():
    """Qwen2-shaped window gating (windowed prefix, full suffix): the scan
    model splits into per-run scans and matches the plain model."""
    from torchmx_tpu.models.generate import generate
    from torchmx_tpu.models.llama import plan_layer_bodies

    model = mixed_model(
        ["sliding_attention"] * 2 + ["full_attention"] * 2, seed=6
    )
    assert plan_layer_bodies(model.config) == ("runs", [(0, 2), (2, 4)])
    ids = jnp.asarray(np.random.RandomState(6).randint(0, 128, (2, 24)), jnp.int32)
    ref = _jit_logits(model, ids)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    got = _jit_logits(scan_model, ids)
    _assert_close(got, ref)
    prompt = np.random.RandomState(7).randint(0, 128, (1, 12)).astype(np.int32)
    want = np.asarray(generate(model, jnp.asarray(prompt), max_new_tokens=8))
    toks = np.asarray(generate(scan_model, jnp.asarray(prompt), max_new_tokens=8))
    np.testing.assert_array_equal(toks, want)


def test_scan_mixed_quantized_mx_cache_engine():
    """Mixed windows + MX quantization + MX KV cache through the serving
    engine: scan and unrolled engines emit the same stream."""
    from torchmx_tpu.models.serve import DecodeEngine

    model = mixed_model(["sliding_attention", "full_attention"] * 2, seed=8)
    qlin = QLinearConfig(
        weights_config=MXConfig("int8"), activations_config=MXConfig("int8")
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    kv = MXConfig("int8")
    prompt = np.random.RandomState(8).randint(0, 128, (7,)).tolist()

    def run(m):
        eng = DecodeEngine(m, max_batch=2, max_len=64, kv_cache_config=kv)
        slot = eng.add(prompt)
        toks = []
        while len(toks) < 6:
            out = eng.step()
            if slot in out:
                toks.append(out[slot])
        return toks

    assert run(scan_model) == run(model)
