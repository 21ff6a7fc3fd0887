"""Phi-3 family: HF parity with the fused-projection split, LongRoPE
(short/long factors + attention scaling) actually biting, sliding window,
quantization-surgery dispatch, and MX-cache decode.

The reference ships Llama and Qwen2 families only
(rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``); Phi-3
(= Llama + fused HF projections split at import + LongRoPE context
extension) is a TPU-build extension through the same type-dispatch seams.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.layers.mx_phi3_attention import (
    MXInferencePhi3Attention,
    MXInferencePhi3MLP,
)
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import rope_attention_scaling
from torchmx_tpu.models.phi3 import Phi3Config, Phi3ForCausalLM
from torchmx_tpu.quant_api import quantize_llm_


def _hf_pair(seed=0, longrope=True, window=None):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(seed)
    kw = {}
    if longrope:
        # original_max 16 << max_position 128: inputs longer than 16 put HF
        # on the long factors; the static capacity rule picks long too.
        rng = np.random.RandomState(seed)
        kw.update(
            original_max_position_embeddings=16,
            rope_scaling={
                "type": "longrope",
                "short_factor": (1 + rng.rand(16)).tolist(),
                "long_factor": (2 + rng.rand(16)).tolist(),
            },
        )
    hf_cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=window,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        **kw,
    )
    hf = transformers.Phi3ForCausalLM(hf_cfg).to(torch.float32).eval()
    model, cfg = from_hf_torch(hf)
    return torch, hf, model, cfg


def test_hf_parity_phi3_longrope():
    """Fused-weight split + LongRoPE forward tracks HF Phi-3 (eager), and
    the LongRoPE factors actually bite."""
    torch, hf, model, cfg = _hf_pair()
    assert isinstance(model, Phi3ForCausalLM)
    scale = rope_attention_scaling(cfg)
    assert scale > 1.0  # factor 128/16 = 8 -> sqrt(1 + ln8/ln16) ~ 1.32
    ids = np.random.RandomState(0).randint(0, 256, (2, 24))  # 24 > orig 16
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(
        np.asarray(logits, np.float32).ravel(), hf_logits.ravel()
    )[0, 1]
    assert corr > 0.999, f"phi3 longrope corr {corr}"
    # Dropping the scaling must diverge (the factor is not cosmetic).  The
    # shift on a tiny random-init model is real but modest (~10% of the
    # logit std, measured 0.024 at std 0.23); gate well above bf16 noise.
    model.model.rope_scale = 1.0
    unscaled, _ = model(jnp.asarray(ids, jnp.int32))
    assert float(jnp.max(jnp.abs(unscaled - logits))) > 0.01


def test_hf_parity_phi3_sliding_window():
    """Window semantics shared with Mistral match HF Phi-3's."""
    torch, hf, model, cfg = _hf_pair(seed=1, longrope=False, window=8)
    assert cfg.sliding_window == 8
    ids = np.random.RandomState(1).randint(0, 256, (2, 24))  # 24 > window
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(
        np.asarray(logits, np.float32).ravel(), hf_logits.ravel()
    )[0, 1]
    assert corr > 0.999, f"phi3 window corr {corr}"


def test_phi3_surgery_and_mx_decode():
    """quantize_llm_ dispatches Phi3 types; the HP cached decode matches HF
    greedy generation exactly (LongRoPE active through the whole pipeline);
    the quantized MX-cache decode is internally exact (stream == scan)."""
    torch, hf, model, _ = _hf_pair(seed=2)
    ids = np.random.RandomState(2).randint(0, 256, (1, 20))
    # HP greedy decode == HF greedy generation: pins import + fused-weight
    # split + LongRoPE + the cached decode pipeline, bit-for-bit on tokens.
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(ids), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
    toks_hp = generate(model, jnp.asarray(ids, jnp.int32), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(toks_hp), hf_out[:, ids.shape[1] :])

    lin = QLinearConfig(
        weights_config=MXConfig(elem_dtype_name="float8_e4m3"),
        activations_config=MXConfig(elem_dtype_name="float8_e4m3"),
    )
    qattn = QAttentionConfig(projection_config=lin)
    quantize_llm_(model, qattn, lin)
    for layer in model.model.layers:
        assert type(layer.self_attn) is MXInferencePhi3Attention
        assert type(layer.mlp) is MXInferencePhi3MLP

    # fp8 projections on a tiny RANDOM-init model legitimately move the
    # argmax (no well-separated logits to protect), so the quantized gate is
    # internal exactness: the one-dispatch scan decode and the streaming
    # decode must emit identical tokens through the int8 MX cache.
    toks = generate(
        model, jnp.asarray(ids, jnp.int32), max_new_tokens=6,
        kv_cache_config=MXConfig(elem_dtype_name="int8"),
    )
    toks_stream = generate(
        model, jnp.asarray(ids, jnp.int32), max_new_tokens=6,
        kv_cache_config=MXConfig(elem_dtype_name="int8"), stream=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_stream))
    assert np.asarray(toks).shape == (1, 6)
