"""Evaluation-harness tests (the scoring protocol behind the reference's
published PIQA/ARC/HellaSwag/Winogrande tables)."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu.models.evaluate import accuracy, perplexity, score_choices, sequence_logprob
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM


def tiny_model(seed=0):
    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def test_sequence_logprob_additivity():
    model = tiny_model()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 12)), jnp.int32)
    full = sequence_logprob(model, ids)
    # log-probs are negative and finite
    assert np.all(np.isfinite(np.asarray(full))) and np.all(np.asarray(full) < 0)
    # conditioning on a longer context can only drop terms
    tail = sequence_logprob(model, ids, start=jnp.asarray([6, 6]))
    assert np.all(np.asarray(tail) >= np.asarray(full))


def test_score_choices_picks_likelier_continuation():
    """Against a model, the gold continuation is the argmax of its own
    scoring function by construction: take the model's greedy continuation
    as gold and a random string as distractor."""
    from torchmx_tpu.models.generate import generate

    model = tiny_model(seed=1)
    rng = np.random.RandomState(1)
    ctx = rng.randint(0, 64, (6,)).tolist()
    greedy = generate(model, jnp.asarray([ctx], jnp.int32), max_new_tokens=4)
    gold = np.asarray(greedy)[0].tolist()
    distractor = [(t + 17) % 64 for t in gold]
    picks = score_choices(model, [ctx], [[gold, distractor]])
    assert picks == [0]
    acc = accuracy(model, [(ctx, [gold, distractor], 0), (ctx, [distractor, gold], 1)])
    assert acc == 1.0


def test_perplexity_finite_and_batched():
    model = tiny_model(seed=2)
    stream = np.random.RandomState(2).randint(0, 64, (300,))
    ppl = perplexity(model, stream, seq_len=32, batch_size=4)
    assert np.isfinite(ppl) and ppl > 1.0
    # Random model on random tokens: ppl should be near vocab size.
    assert 10 < ppl < 400


def test_perplexity_decode_mode_matches_prefill():
    """decode=True scores teacher-forced sq=1 steps through the cache (the
    serving decode path, incl. decode-specialized kernels); same likelihoods
    as the single prefill forward up to bf16 step-order noise.  Regression:
    the decode scan must pass explicit position_ids — without them RoPE sits
    at position 0 every step and PPL explodes 20x."""
    from torchmx_tpu.config import MXConfig

    model = tiny_model(seed=3)
    stream = np.random.RandomState(3).randint(0, 64, (256,))
    base = perplexity(model, stream, seq_len=32, batch_size=4)
    dec = perplexity(model, stream, seq_len=32, batch_size=4, decode=True)
    assert abs(dec - base) / base < 5e-2
    dec_kv = perplexity(
        model, stream, seq_len=32, batch_size=4,
        kv_cache_config=MXConfig("int8"), decode=True,
    )
    assert np.isfinite(dec_kv) and abs(dec_kv - base) / base < 0.5


def test_perplexity_through_mx_kv_cache():
    """kv_cache_config scores the SAME chunks through an MX cache: close to
    the uncached PPL (quantization noise only), never identical-by-skipping."""
    from torchmx_tpu.config import MXConfig

    model = tiny_model()
    rng = np.random.RandomState(9)
    stream = rng.randint(0, 64, (300,))
    base = perplexity(model, stream, seq_len=32, batch_size=4)
    cached = perplexity(
        model, stream, seq_len=32, batch_size=4,
        kv_cache_config=MXConfig("float8_e4m3"),
    )
    assert np.isfinite(cached)
    # fp8 cache error is small but nonzero on a random-init model.
    assert abs(cached - base) / base < 0.5
