"""Sampling warper stack: top-k / top-p / min-p filters vs brute-force
numpy references, their degenerate-limit equivalences to greedy, and the
plumbing through ``generate()`` and the ``DecodeEngine``.

The reference serves greedily only (its chat example argmaxes —
``examples/quantized_llama_chat.py``); these controls are TPU-build
serving extensions following the HF warper semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.sampling import filter_logits, sample_logits
from torchmx_tpu.models.serve import DecodeEngine


def tiny_model(seed=0):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def collect(engine, slot, n):
    toks = []
    while len(toks) < n:
        out = engine.step()
        if slot in out:
            toks.append(out[slot])
    return toks


def _np_top_p_keep(logits_row, top_p):
    """Brute-force nucleus set: smallest prefix of the descending-prob
    ordering whose mass reaches top_p (the crossing token included)."""
    p = np.exp(logits_row - logits_row.max())
    p = p / p.sum()
    order = np.argsort(-p, kind="stable")
    csum = np.cumsum(p[order])
    # token i in the sorted order is kept iff mass BEFORE it is < top_p
    kept_sorted = np.concatenate([[True], csum[:-1] < top_p])
    keep = np.zeros(len(p), bool)
    keep[order[kept_sorted]] = True
    return keep


def test_top_p_matches_bruteforce():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 64).astype(np.float32) * 3.0
    for top_p in (0.1, 0.5, 0.9):
        out = np.asarray(filter_logits(jnp.asarray(logits), top_p=top_p))
        for r in range(16):
            keep = _np_top_p_keep(logits[r], top_p)
            assert np.all(np.isfinite(out[r]) == keep), (top_p, r)
            # surviving logits pass through unchanged
            np.testing.assert_array_equal(out[r][keep], logits[r][keep])


def test_min_p_matches_bruteforce():
    rng = np.random.RandomState(1)
    logits = rng.randn(8, 64).astype(np.float32) * 2.0
    for min_p in (0.02, 0.1, 0.5):
        out = np.asarray(filter_logits(jnp.asarray(logits), min_p=min_p))
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        keep = p >= min_p * p.max(-1, keepdims=True)
        assert np.all(np.isfinite(out) == keep), min_p


def test_top_k_then_top_p_compose_in_hf_order():
    rng = np.random.RandomState(2)
    logits = rng.randn(4, 64).astype(np.float32) * 3.0
    out = np.asarray(filter_logits(jnp.asarray(logits), top_k=8, top_p=0.7))
    for r in range(4):
        # top-k first…
        kth = np.sort(logits[r])[-8]
        masked = np.where(logits[r] < kth, -np.inf, logits[r])
        # …then nucleus over the k survivors' renormalized distribution
        keep = _np_top_p_keep(masked, 0.7) & np.isfinite(masked)
        assert np.all(np.isfinite(out[r]) == keep)


def test_argmax_always_survives():
    # Degenerate thresholds must never mask every token.
    logits = jnp.asarray([[0.0, 10.0, -5.0, 1.0]])
    for kw in ({"top_p": 1e-9}, {"min_p": 1.0}, {"top_k": 1}):
        out = filter_logits(logits, **kw)
        assert bool(jnp.isfinite(out[0, 1]))
        assert int(jnp.sum(jnp.isfinite(out))) == 1


def test_degenerate_sampling_equals_greedy():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(8, 64).astype(np.float32) * 3.0)
    key = jax.random.PRNGKey(0)
    greedy = jnp.argmax(logits, axis=-1)
    for kw in ({"top_p": 1e-9}, {"min_p": 1.0}, {"top_k": 1}):
        got = sample_logits(logits, key, 0.8, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(greedy))


def test_sampled_tokens_respect_the_filter():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 2.0)
    filt = np.asarray(filter_logits(logits, top_k=8, top_p=0.8, min_p=0.05))
    for seed in range(5):
        toks = np.asarray(
            sample_logits(
                logits, jax.random.PRNGKey(seed), 1.0,
                top_k=8, top_p=0.8, min_p=0.05,
            )
        )
        assert np.all(np.isfinite(filt[np.arange(32), toks]))


def test_generate_top_p_reproducible_and_valid():
    model = tiny_model()
    ids = jnp.asarray([[3, 17, 9, 44]], jnp.int32)
    kw = dict(max_new_tokens=12, temperature=0.9, top_p=0.85, top_k=16)
    a = generate(model, ids, rng=jax.random.PRNGKey(5), **kw)
    b = generate(model, ids, rng=jax.random.PRNGKey(5), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all((np.asarray(a) >= 0) & (np.asarray(a) < 128))
    # min_p=1.0 collapses sampling to greedy token-for-token.
    g = generate(model, ids, max_new_tokens=12)
    s = generate(
        model, ids, max_new_tokens=12, temperature=0.7, min_p=1.0,
        rng=jax.random.PRNGKey(5),
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


def test_engine_top_p_min_p_streams():
    model = tiny_model()
    prompt = [5, 99, 23, 60, 8]
    # Same seed -> identical streams through the nucleus path.
    a = DecodeEngine(model, max_batch=1, max_len=64,
                     temperature=0.9, top_p=0.8, min_p=0.02, seed=11)
    b = DecodeEngine(model, max_batch=1, max_len=64,
                     temperature=0.9, top_p=0.8, min_p=0.02, seed=11)
    ta = collect(a, a.add(prompt), 10)
    tb = collect(b, b.add(prompt), 10)
    assert ta == tb
    assert all(0 <= t < 128 for t in ta)
    # min_p=1.0 engine == greedy engine, token for token.
    g = DecodeEngine(model, max_batch=1, max_len=64)
    m = DecodeEngine(model, max_batch=1, max_len=64,
                     temperature=0.6, min_p=1.0, seed=3)
    tg = collect(g, g.add(prompt), 10)
    tm = collect(m, m.add(prompt), 10)
    assert tg == tm
