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


def test_lookup_index_matches_bruteforce():
    """The incremental LookupIndex must draft exactly what the O(n)
    brute-force scan drafts, over random sequences, incremental extension
    patterns, and every (ngram, k) combination."""
    from torchmx_tpu.models.speculate import LookupIndex

    rng = np.random.RandomState(7)
    for trial in range(30):
        vocab = int(rng.choice([3, 5, 17]))  # small vocab -> frequent matches
        row = rng.randint(0, vocab, size=rng.randint(2, 80)).tolist()
        for g in (1, 2, 3, 5):
            idx = LookupIndex(g)
            # Extend in random-sized chunks (mirrors accept bursts).
            i = 0
            while i < len(row):
                step = int(rng.randint(1, 6))
                idx.extend(row[i : i + step])
                i += step
                for k in (1, 4):
                    assert idx.draft(k) == _draft(idx.row, g, k), (
                        g, k, idx.row,
                    )


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
    assert stats["tokens"] == 4 * 24, stats


def test_speculative_acceptance_on_repetitive_text():
    """The acceptance gate: on a longer generation over repo text the
    prompt-lookup drafts must actually land (mean accepted well above zero,
    i.e. measurably fewer verify steps than tokens) — otherwise speculation
    degrades to 1 token/forward and the speedup claim is empty."""
    from tests.test_parallel import (
        _greedy_stream_sequential,
        assert_streams_equal_outside_ties,
    )

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(np.asarray(corpus[4985 : 4985 + 64])[None], jnp.int32)
    n = 128
    ref, margins = _greedy_stream_sequential(model, prompt, n, None, 64 + n + 16)
    got, stats = generate_speculative(
        model, prompt, max_new_tokens=n, return_stats=True
    )
    # 128 tokens give legal sq=1-vs-sq=8 compilation drift a chance to flip
    # a near-tie argmax, after which the streams legitimately diverge — the
    # tie-aware gate requires any divergence to sit at a sub-tie margin but
    # does not bound where it happens (exactness at short horizons is pinned
    # by the tests above; this test's subject is ACCEPTANCE).
    assert_streams_equal_outside_ties(np.asarray(got), ref, margins,
                                      min_compared=0.0)
    # Measured 0.55 accepted drafts/step on this stretch; gate at 0.3 to
    # absorb checkpoint retrains.
    assert stats["mean_accepted"] > 0.3, stats
    assert stats["steps"] < 0.85 * n, stats


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


def _engine_collect(engine, slot, n):
    toks, steps = [], 0
    while len(toks) < n and engine.is_active(slot):
        out = engine.step()
        if slot in out:
            toks.append(out[slot])
        steps += 1
        assert steps < 20 * n
    return toks, steps


def test_engine_speculative_matches_plain_stream():
    """DecodeEngine with speculation: emitted streams equal plain greedy
    generate() on the unquantized trained checkpoint, and the engine runs
    FEWER forwards than tokens (queued tokens pop without a dispatch)."""
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = [int(t) for t in corpus[3000:3024]]
    n = 24
    ref = np.asarray(
        generate(model, jnp.asarray([prompt], jnp.int32), max_new_tokens=n)
    )[0].tolist()

    from torchmx_tpu.models.serve import DecodeEngine

    engine = DecodeEngine(model, max_batch=2, max_len=128,
                          speculative_draft_len=7)
    slot = engine.add(prompt)
    got, steps = _engine_collect(engine, slot, n)
    assert got == ref
    # Acceptance on repo text must make some steps dispatch-free: the engine
    # counts its verify forwards, and there must be meaningfully fewer than
    # tokens emitted (every verify emits at least one accepted token).
    assert 0 < engine.spec_verify_count < n, (engine.spec_verify_count, n)


def test_engine_speculative_staggered_and_eos():
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    from torchmx_tpu.models.serve import DecodeEngine

    p1 = [int(t) for t in corpus[4000:4016]]
    p2 = [int(t) for t in corpus[5000:5020]]
    r1 = np.asarray(
        generate(model, jnp.asarray([p1], jnp.int32), max_new_tokens=12)
    )[0].tolist()
    r2 = np.asarray(
        generate(model, jnp.asarray([p2], jnp.int32), max_new_tokens=8)
    )[0].tolist()

    engine = DecodeEngine(model, max_batch=2, max_len=128,
                          speculative_draft_len=5)
    s1 = engine.add(p1)
    got1 = []
    for _ in range(4):  # s1 decodes alone first
        out = engine.step()
        if s1 in out:
            got1.append(out[s1])
    s2 = engine.add(p2)
    got2 = []
    while len(got1) < 12 or len(got2) < 8:
        out = engine.step()
        if s1 in out and len(got1) < 12:
            got1.append(out[s1])
        if s2 in out and len(got2) < 8:
            got2.append(out[s2])
    assert got1 == r1 and got2 == r2

    # EOS: declare the 3rd greedy token EOS — the engine must emit exactly
    # the first two and auto-release without emitting the EOS (even when the
    # EOS was accepted mid-draft).
    eng2 = DecodeEngine(model, max_batch=1, max_len=128,
                        speculative_draft_len=5, eos_token_id=r1[2])
    # r1 must not repeat the EOS earlier.
    if r1[2] not in r1[:2]:
        slot = eng2.add(p1)
        emitted = []
        steps = 0
        while eng2.is_active(slot):
            out = eng2.step()
            emitted += [out[slot]] if slot in out else []
            steps += 1
            assert steps < 64
        assert emitted == r1[:2]
        assert eng2.finished_reason[slot] == "eos"


def test_engine_speculative_cache_full_drains():
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    from torchmx_tpu.models.serve import DecodeEngine

    prompt = [int(t) for t in corpus[6000:6008]]
    engine = DecodeEngine(model, max_batch=1, max_len=32,
                          speculative_draft_len=5)
    slot = engine.add(prompt)
    ref = np.asarray(
        generate(model, jnp.asarray([prompt], jnp.int32), max_new_tokens=30)
    )[0].tolist()
    emitted = []
    steps = 0
    while engine.is_active(slot):
        out = engine.step()
        emitted += [out[slot]] if slot in out else []
        steps += 1
        assert steps < 128
    assert engine.finished_reason[slot] == "cache_full"
    # Every emitted token is the true greedy continuation (a prefix of ref);
    # capacity loss vs the plain engine is at most draft_len + 1 tokens.
    assert emitted == ref[: len(emitted)]
    assert len(emitted) >= 32 - len(prompt) + 1 - 6


def test_engine_speculative_composes_with_tp():
    """Speculation rides a TP-sharded engine unchanged: the verify step is
    an ordinary cached forward, so GSPMD shards it like any decode step.
    Streams must equal the unsharded speculative engine's exactly (same
    executable class on the CPU mesh; TP is bit-exact here, see
    test_tp_sharded_decode_engine...)."""
    from torchmx_tpu.models.serve import DecodeEngine
    from torchmx_tpu.parallel import create_mesh, shard_model

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = [int(t) for t in corpus[3000:3024]]
    n = 16

    ref_engine = DecodeEngine(model, max_batch=2, max_len=128,
                              speculative_draft_len=5)
    slot = ref_engine.add(prompt)
    ref, _ = _engine_collect(ref_engine, slot, n)

    tp_model, _, _ = trained_tiny_quantized(quantize=False)
    mesh = create_mesh()  # pure TP over 8 devices
    shard_model(tp_model, mesh)
    with mesh:
        engine = DecodeEngine(tp_model, max_batch=2, max_len=128,
                              speculative_draft_len=5)
        s1 = engine.add(prompt)
        got, _ = _engine_collect(engine, s1, n)
    assert got == ref


def test_speculative_on_scan_model():
    """generate_speculative must serve ScanLlamaForCausalLM unchanged (the
    8B serving path is scan-over-layers): same greedy stream as the layered
    model's speculative run."""
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(np.asarray(corpus[700:724])[None], jnp.int32)
    ref = np.asarray(generate_speculative(model, prompt, max_new_tokens=16))
    scan_model = ScanLlamaForCausalLM.from_model(model)
    got = np.asarray(generate_speculative(scan_model, prompt, max_new_tokens=16))
    # Scan vs unrolled is a recompilation of the same math; greedy streams
    # agree exactly on the trained checkpoint's decisive margins here.
    np.testing.assert_array_equal(got, ref)


def test_speculative_single_row_and_draft_params():
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(corpus[None, 500:532], jnp.int32)
    ref = np.asarray(generate(model, prompt, max_new_tokens=16))
    for k, g in ((3, 2), (7, 3)):
        got = generate_speculative(
            model, prompt, max_new_tokens=16, draft_len=k, ngram=g
        )
        np.testing.assert_array_equal(np.asarray(got), ref)


# -- rejection-sampling speculation (temperature > 0) -------------------------


def _tv(counts_a, counts_b):
    pa = counts_a / counts_a.sum()
    pb = counts_b / counts_b.sum()
    return 0.5 * np.abs(pa - pb).sum()


def test_spec_sample_decisions_preserves_distribution():
    """The acceptance rule is DISTRIBUTION-PRESERVING: with a deterministic
    draft, `emit = draft if accept else resid` is a faithful sample from the
    target (temperature-scaled, filtered) distribution — whatever the draft
    is.  40k independent rows over one logits row; empirical TV distance vs
    the exact target must be at sampling-noise scale, for a GOOD draft (the
    argmax), a BAD draft (the least likely token), and a random draft."""
    import jax

    from torchmx_tpu.models.sampling import filter_logits
    from torchmx_tpu.models.speculate import spec_sample_decisions

    rng = np.random.RandomState(0)
    V, B, K = 16, 40_000, 2
    logits_row = rng.randn(V).astype(np.float32) * 2.0
    temperature, top_k = 0.9, 0
    x = jnp.asarray(logits_row, jnp.float32) / temperature
    target = np.asarray(jax.nn.softmax(filter_logits(x, top_k=top_k)))

    logits = jnp.broadcast_to(
        jnp.asarray(logits_row), (B, K + 1, V)
    )
    for name, draft0 in (
        ("argmax", int(np.argmax(logits_row))),
        ("worst", int(np.argmin(logits_row))),
        ("random", 7),
    ):
        drafts = jnp.full((B, K), draft0, jnp.int32)
        accept, resid, bonus = spec_sample_decisions(
            logits, drafts, jax.random.PRNGKey(hash(name) % 2**31),
            jnp.asarray(temperature, jnp.float32), top_k=top_k,
        )
        accept, resid = np.asarray(accept), np.asarray(resid)
        emitted = np.where(accept[:, 0], draft0, resid[:, 0])
        counts = np.bincount(emitted, minlength=V).astype(np.float64)
        tv = _tv(counts, target * B)
        assert tv < 0.02, (name, tv)
        # Acceptance rate must equal the draft's target probability.
        acc_rate = accept[:, 0].mean()
        assert abs(acc_rate - target[draft0]) < 0.02, (name, acc_rate)
        # Residual samples never return the draft itself.
        assert not (resid[:, 0][~accept[:, 0]] == draft0).any()

    # The SECOND position, conditioned on the first accepting, follows the
    # position-1 target too (independent key branches per position).
    drafts = jnp.full((B, K), int(np.argmax(logits_row)), jnp.int32)
    accept, resid, bonus = spec_sample_decisions(
        logits, drafts, jax.random.PRNGKey(3),
        jnp.asarray(temperature, jnp.float32),
    )
    accept, resid, bonus = (np.asarray(a) for a in (accept, resid, bonus))
    sel = accept[:, 0]
    emitted2 = np.where(accept[sel, 1], int(np.argmax(logits_row)), resid[sel, 1])
    counts2 = np.bincount(emitted2, minlength=V).astype(np.float64)
    assert _tv(counts2, target * sel.sum()) < 0.03
    # The bonus token (all drafts accepted) also follows its target.
    sel_all = accept.all(axis=1)
    counts3 = np.bincount(bonus[sel_all], minlength=V).astype(np.float64)
    assert _tv(counts3, target * sel_all.sum()) < 0.03


def test_spec_sample_decisions_respects_filters():
    """top-k / top-p filters define the TARGET: neither accepted drafts nor
    residual/bonus samples may emit a filtered-out token, and a draft
    OUTSIDE the filter set always rejects (its target probability is 0)."""
    import jax

    from torchmx_tpu.models.speculate import spec_sample_decisions

    rng = np.random.RandomState(1)
    V, B, K = 32, 4_000, 1
    logits_row = rng.randn(V).astype(np.float32)
    top3 = set(np.argsort(logits_row)[-3:].tolist())
    out_tok = int(np.argsort(logits_row)[0])  # least likely: outside top-3

    logits = jnp.broadcast_to(jnp.asarray(logits_row), (B, K + 1, V))
    drafts = jnp.full((B, K), out_tok, jnp.int32)
    accept, resid, bonus = spec_sample_decisions(
        logits, drafts, jax.random.PRNGKey(0),
        jnp.asarray(1.0, jnp.float32), top_k=3,
    )
    accept, resid, bonus = (np.asarray(a) for a in (accept, resid, bonus))
    assert not accept.any()  # p(draft) == 0 under the filtered target
    assert all(int(t) in top3 for t in resid[:, 0])
    assert all(int(t) in top3 for t in bonus)


def test_generate_speculative_sampling_deterministic_and_valid():
    """Sampling-mode speculation: same seed -> same stream, different seed
    -> (overwhelmingly) different stream, every run emits exactly
    max_new_tokens valid ids, and stats still account the speedup."""
    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = jnp.asarray(np.asarray(corpus[1000:1032])[None], jnp.int32)
    kw = dict(max_new_tokens=24, temperature=0.8, top_k=40, draft_len=5)
    a, stats = generate_speculative(model, prompt, return_stats=True, seed=1, **kw)
    b = generate_speculative(model, prompt, seed=1, **kw)
    c = generate_speculative(model, prompt, seed=2, **kw)
    a, b, c = (np.asarray(t) for t in (a, b, c))
    assert a.shape == (1, 24)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    assert ((a >= 0) & (a < cfg.vocab_size)).all()
    assert stats["steps"] < 24  # speculation accepted something on repo text


def test_speculative_sampling_matches_plain_marginal():
    """End-to-end distribution equivalence on a micro model: the SECOND
    emitted token (the first to flow through the rejection-sampling verify)
    must have the same marginal distribution as plain sampled generate()'s
    second token, over thousands of independent batch rows."""
    from torchmx_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=32,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(3))
    B = 4096
    prompt = jnp.broadcast_to(
        jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32), (B, 8)
    )
    plain = np.asarray(
        generate(model, prompt, max_new_tokens=2, temperature=1.0,
                 rng=__import__('jax').random.PRNGKey(0))
    )
    spec = np.asarray(
        generate_speculative(
            model, prompt, max_new_tokens=2, temperature=1.0,
            draft_len=3, seed=1,
        )
    )
    ca = np.bincount(plain[:, 1], minlength=32).astype(np.float64)
    cb = np.bincount(spec[:, 1], minlength=32).astype(np.float64)
    assert _tv(ca, cb) < 0.05, _tv(ca, cb)


def test_engine_speculative_sampling_runs():
    """DecodeEngine composes speculation with sampling: emits the requested
    tokens, the stream is reproducible per seed, and verify dispatches stay
    below tokens emitted (speculation still pays off under sampling)."""
    from torchmx_tpu.models.serve import DecodeEngine

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    prompt = [int(t) for t in corpus[2000:2024]]
    n = 24

    def run(seed):
        engine = DecodeEngine(
            model, max_batch=2, max_len=128,
            temperature=0.8, top_k=40, seed=seed,
            speculative_draft_len=5,
        )
        slot = engine.add(prompt)
        toks, _ = _engine_collect(engine, slot, n)
        return toks, engine.spec_verify_count

    a, va = run(1)
    b, _ = run(1)
    c, _ = run(2)
    assert a == b
    assert a != c
    assert len(a) == n and all(0 <= t < cfg.vocab_size for t in a)
    assert 0 < va < n, va


def test_speculative_on_deepseek_mla():
    """Prompt-lookup speculation serves DeepSeek: the (K+1)-token verify
    writes MLA LATENT cache rows (per-row kv_len hides stale ones), and the
    emitted stream matches plain greedy tie-aware on the trained MLA
    checkpoint."""
    import pathlib
    import sys as _sys

    from torchmx_tpu import checkpoint as ckpt
    from torchmx_tpu.config import MXConfig
    from torchmx_tpu.models.deepseek import DeepseekV3ForCausalLM

    root = pathlib.Path(__file__).resolve().parent.parent
    if str(root) not in _sys.path:
        _sys.path.insert(0, str(root))
    from tools.train_tiny_lm import PRESETS, load_corpus

    from tests.test_deepseek import _greedy_stream_with_margins
    from tests.test_parallel import assert_streams_equal_outside_ties

    _, cfg = PRESETS["mla"]
    model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    model = ckpt.load_model(str(root / "artifacts" / "lm_mla"), model)
    corpus = load_corpus("lm_mla")
    prompt = jnp.asarray(np.asarray(corpus[900:924])[None], jnp.int32)

    kv = MXConfig("int8")
    ref, margins = _greedy_stream_with_margins(model, prompt, 16, kv)
    got, stats = generate_speculative(
        model, prompt, max_new_tokens=16, kv_cache_config=kv,
        draft_len=5, return_stats=True,
    )
    assert_streams_equal_outside_ties(
        np.asarray(got), ref, margins, min_compared=0.0
    )
    # Speculation must actually accept on repo text (fewer verifies than
    # tokens), or the MLA verify path is silently degenerate.
    assert stats["steps"] < 16, stats
