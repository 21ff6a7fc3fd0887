"""Prompt-lookup speculative decoding: exactness and acceptance."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaForCausalLM
from torchmx_tpu.models.speculate import _draft, generate_speculative
from torchmx_tpu.quant_api import quantize_llm_

from tests.test_parallel import trained_tiny_quantized


def test_draft_lookup():
    # 3-gram (7, 8, 9) occurred earlier, followed by 4, 5: draft continues it.
    row = [1, 7, 8, 9, 4, 5, 6, 2, 7, 8, 9]
    assert _draft(row, ngram=3, k=2) == [4, 5]
    # Most recent match wins.
    row = [7, 8, 1, 1, 7, 8, 2, 9, 7, 8]
    assert _draft(row, ngram=2, k=1) == [2]
    # No match at any n-gram length: repeat the last token.
    assert _draft([1, 2, 3], ngram=3, k=3) == [3, 3, 3]
    # Short continuation pads with the last token.
    row = [5, 6, 9, 5, 6]
    assert _draft(row, ngram=2, k=3) == [9, 5, 6]


def test_speculative_matches_plain_greedy_unquantized():
    """On the unquantized trained checkpoint (decisive margins, ~1-ulp
    cross-compilation drift) the speculative stream must EQUAL plain greedy:
    every emitted token is an argmax of the full model's logits."""
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(
        np.stack([corpus[i * 1777 : i * 1777 + 24] for i in range(4)]), jnp.int32
    )
    ref = np.asarray(generate(model, prompt, max_new_tokens=24))
    got, stats = generate_speculative(
        model, prompt, max_new_tokens=24, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)
    # Repo text is repetitive: prompt lookup must actually accept drafts
    # (otherwise the test regresses to 1 token/step and proves nothing).
    assert stats["mean_accepted"] > 0.3, stats
    assert stats["steps"] < 4 * 24, stats


def test_speculative_quantized_with_mx_cache():
    """Quantized model + MX KV cache: fake-quantization amplifies the legal
    drift between the 1-token and (K+1)-token executables (see the PP×TP
    note in docs/serving.md), so the gate is high agreement + the guarantee
    that acceptance only emits the verify pass's own argmax tokens."""
    model, cfg, corpus = trained_tiny_quantized()
    prompt = jnp.asarray(
        np.stack([corpus[i * 1913 : i * 1913 + 24] for i in range(2)]), jnp.int32
    )
    ref = np.asarray(
        generate(model, prompt, max_new_tokens=24, kv_cache_config=MXConfig("int8"))
    )
    got, stats = generate_speculative(
        model, prompt, max_new_tokens=24,
        kv_cache_config=MXConfig("int8"), return_stats=True,
    )
    got = np.asarray(got)
    agree = (got == ref).mean()
    assert agree >= 0.8, (agree, got, ref)
    assert got.shape == ref.shape
    assert stats["tokens"] == got.size


def test_speculative_single_row_and_draft_params():
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(corpus[None, 500:532], jnp.int32)
    ref = np.asarray(generate(model, prompt, max_new_tokens=16))
    for k, g in ((3, 2), (7, 3)):
        got = generate_speculative(
            model, prompt, max_new_tokens=16, draft_len=k, ngram=g
        )
        np.testing.assert_array_equal(np.asarray(got), ref)
