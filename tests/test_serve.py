"""Continuous-batching engine tests: slot outputs must match single-stream
generate() exactly (batch rows are independent), including staggered joins."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu.config import MXConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
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


def ref_tokens(model, prompt, n):
    out = generate(model, jnp.asarray([prompt], jnp.int32), max_new_tokens=n)
    return np.asarray(out)[0].tolist()


def collect(engine, slot, n):
    toks = []
    while len(toks) < n:
        out = engine.step()
        if slot in out:
            toks.append(out[slot])
    return toks


def test_engine_matches_generate_single_slot():
    model = tiny_model()
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 128, (9,)).tolist()
    want = ref_tokens(model, prompt, 10)

    engine = DecodeEngine(model, max_batch=4, max_len=64)
    slot = engine.add(prompt)
    got = collect(engine, slot, 10)
    assert got == want


def test_engine_mx_cache_matches_generate():
    model = tiny_model(seed=1)
    prompt = np.random.RandomState(1).randint(0, 128, (12,)).tolist()
    kv = MXConfig("float8_e4m3")
    want = np.asarray(
        generate(model, jnp.asarray([prompt], jnp.int32), max_new_tokens=8,
                 kv_cache_config=kv)
    )[0].tolist()
    engine = DecodeEngine(model, max_batch=2, max_len=64, kv_cache_config=kv)
    slot = engine.add(prompt)
    assert collect(engine, slot, 8) == want


def test_engine_staggered_requests_are_independent():
    """A request joining mid-flight must produce the same tokens as running
    alone, and slots recycle after release."""
    model = tiny_model(seed=2)
    rng = np.random.RandomState(2)
    p_a = rng.randint(0, 128, (6,)).tolist()
    p_b = rng.randint(0, 128, (11,)).tolist()
    p_c = rng.randint(0, 128, (4,)).tolist()
    want_a = ref_tokens(model, p_a, 12)
    want_b = ref_tokens(model, p_b, 8)
    want_c = ref_tokens(model, p_c, 5)

    engine = DecodeEngine(model, max_batch=2, max_len=64)
    sa = engine.add(p_a)
    got_a = collect(engine, sa, 4)  # A decodes alone for a while
    sb = engine.add(p_b)
    assert sb != sa
    # interleaved decoding
    got_b = []
    while len(got_b) < 8:
        out = engine.step()
        if sa in out and len(got_a) < 12:
            got_a.append(out[sa])
        if sb in out:
            got_b.append(out[sb])
    while len(got_a) < 12:
        out = engine.step()
        got_a.append(out[sa])
    assert got_a == want_a
    assert got_b == want_b

    engine.release(sa)
    engine.release(sb)
    sc = engine.add(p_c)
    assert sc in (sa, sb)  # slot recycled
    assert collect(engine, sc, 5) == want_c


def test_engine_eos_auto_release():
    model = tiny_model()
    rng = np.random.RandomState(3)
    prompt = rng.randint(0, 128, (6,)).tolist()
    # Declare the SECOND greedily generated token EOS: the engine must emit
    # the first token, then auto-release without emitting the EOS itself.
    want = ref_tokens(model, prompt, 2)
    engine = DecodeEngine(model, max_batch=2, max_len=64, eos_token_id=want[1])
    slot = engine.add(prompt)
    assert engine.is_active(slot)
    emitted = []
    steps = 0
    while engine.is_active(slot):
        out = engine.step()
        emitted += [out[slot]] if slot in out else []
        steps += 1
        assert steps < 64
    assert emitted == [want[0]]  # EOS not emitted
    assert engine.finished_reason[slot] == "eos"
    assert not engine.is_active(slot)
    assert slot in engine.free_slots()
    # add() on the recycled slot clears the reason.
    slot2 = engine.add(prompt)
    assert slot2 == slot and slot not in engine.finished_reason


def test_engine_cache_full_eviction_is_signaled():
    model = tiny_model()
    rng = np.random.RandomState(4)
    prompt = rng.randint(0, 128, (4,)).tolist()
    engine = DecodeEngine(model, max_batch=1, max_len=32)
    slot = engine.add(prompt)
    n = 0
    while engine.is_active(slot):
        out = engine.step()
        n += len(out)
        assert n <= 32
    assert engine.finished_reason[slot] == "cache_full"
    assert engine.pos[slot] == 0  # stale position zeroed on eviction
    # Every emittable token arrives: positions len(prompt)..max_len, where
    # the last one needs no further cache write (drained after the fill).
    assert n == 32 - len(prompt) + 1


def test_engine_sampling_temperature_topk():
    model = tiny_model()
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 128, (8,)).tolist()
    a = DecodeEngine(model, max_batch=1, max_len=64, temperature=0.8, top_k=8, seed=7)
    b = DecodeEngine(model, max_batch=1, max_len=64, temperature=0.8, top_k=8, seed=7)
    sa, sb = a.add(prompt), b.add(prompt)
    ta = collect(a, sa, 8)
    tb = collect(b, sb, 8)
    # Same seed -> identical streams; tokens must be valid vocab ids.
    assert ta == tb
    assert all(0 <= t < 128 for t in ta)
    # A different seed must diverge somewhere over enough sampled steps
    # (top-k 8 at temperature 0.8: 24 identical draws is ~impossible).
    c = DecodeEngine(model, max_batch=1, max_len=64, temperature=0.8, top_k=8, seed=99)
    sc = c.add(prompt)
    tc = collect(c, sc, 24)
    ta24 = collect(a, sa, 16)  # extend a's stream to 24 total
    assert tc != ta + ta24
    # Greedy default is unchanged by the sampling plumbing.
    g = DecodeEngine(model, max_batch=1, max_len=64)
    sg = g.add(prompt)
    assert collect(g, sg, 8) == ref_tokens(model, prompt, 8)


def test_chunked_prefill_matches_and_keeps_decode_cadence():
    """prefill_chunk engines admit long prompts in chunks: (1) the admitted
    stream equals the whole-prompt-prefill engine's exactly; (2) during the
    admission, an already-active slot keeps emitting a token at EVERY
    step() — the admission never stalls decode for more than one chunk."""
    model = tiny_model()
    prompt_a = [5, 9, 2, 7, 1, 3]
    prompt_b = list(range(1, 49))  # long admission: 6 chunks of 8

    ref_engine = DecodeEngine(model, max_batch=2, max_len=64)
    sa = ref_engine.add(prompt_a)
    ref_a_first = collect(ref_engine, sa, 3)
    sb = ref_engine.add(prompt_b)
    ref_mix = [ref_engine.step() for _ in range(10)]
    ref_b = [o[sb] for o in ref_mix if sb in o]

    eng = DecodeEngine(model, max_batch=2, max_len=64, prefill_chunk=8)
    ca = eng.add(prompt_a)  # chunked too (single chunk: 6 <= 8)
    # the admission itself takes one step() before slot A decodes
    got_a_first = collect(eng, ca, 3)
    assert got_a_first == ref_a_first
    cb = eng.add(prompt_b)
    assert eng.is_active(cb)  # reserved immediately
    cadence = []
    got_b = []
    for _ in range(16):
        out = eng.step()
        cadence.append(ca in out)
        if cb in out:
            got_b.append(out[cb])
    # Slot A emitted at every single step, including the 6 admission steps.
    assert all(cadence), cadence
    # Slot B's stream matches the unchunked engine's exactly.
    assert got_b[: len(ref_b)] == ref_b[: len(got_b)] and got_b, (got_b, ref_b)


def test_chunked_prefill_short_prompt_and_release():
    model = tiny_model()
    eng = DecodeEngine(model, max_batch=1, max_len=64, prefill_chunk=16)
    s = eng.add([3, 1, 4])
    assert eng.free_slots() == []  # reserved while pending
    toks = collect(eng, s, 4)
    ref = ref_tokens(model, [3, 1, 4], 4)
    assert toks == ref
    eng.release(s)
    assert eng.free_slots() == [0]
    # releasing a still-pending slot clears the queue
    s2 = eng.add(list(range(40)))
    eng.release(s2)
    assert not eng._pending and eng.free_slots() == [0]


def test_prefix_cache_exact_streams():
    """Prompts extending a registered prefix must emit EXACTLY the same
    greedy stream as a prefix-less engine (reuse is byte-identical), and
    the prefill must actually be skipped (prefix_hit_tokens > 0)."""
    model = tiny_model(seed=3)
    rng = np.random.RandomState(3)
    system = rng.randint(0, 128, (24,)).tolist()
    user_a = rng.randint(0, 128, (7,)).tolist()
    user_b = rng.randint(0, 128, (13,)).tolist()

    ref = DecodeEngine(model, max_batch=2, max_len=64)
    ra = ref.add(system + user_a)
    rb = ref.add(system + user_b)
    want_a = collect(ref, ra, 8)
    want_b = collect(ref, rb, 8)

    eng = DecodeEngine(model, max_batch=2, max_len=64)
    eng.cache_prefix(system)
    sa = eng.add(system + user_a)
    sb = eng.add(system + user_b)
    assert eng.prefix_hit_tokens == 2 * len(system)
    assert collect(eng, sa, 8) == want_a
    assert collect(eng, sb, 8) == want_b


def test_prefix_cache_mx_kv_and_miss():
    """Prefix reuse through an MX-quantized cache stays exact; prompts NOT
    extending the prefix are unaffected (no false matches, including the
    prompt == prefix case, which must prefill at least one token)."""
    model = tiny_model(seed=4)
    rng = np.random.RandomState(4)
    system = rng.randint(0, 128, (16,)).tolist()
    user = rng.randint(0, 128, (9,)).tolist()
    other = rng.randint(0, 128, (20,)).tolist()
    kv = MXConfig("float8_e4m3")

    ref = DecodeEngine(model, max_batch=3, max_len=64, kv_cache_config=kv)
    wants = [
        collect(ref, ref.add(p), 6)
        for p in (system + user, other, list(system))
    ]

    eng = DecodeEngine(model, max_batch=3, max_len=64, kv_cache_config=kv)
    eng.cache_prefix(system)
    got_hit = collect(eng, eng.add(system + user), 6)
    hits_after_first = eng.prefix_hit_tokens
    got_miss = collect(eng, eng.add(other), 6)
    got_exact = collect(eng, eng.add(list(system)), 6)  # == prefix: no match
    assert got_hit == wants[0]
    assert got_miss == wants[1]
    assert got_exact == wants[2]
    assert hits_after_first == len(system)
    assert eng.prefix_hit_tokens == len(system)  # miss paths added nothing


def test_prefix_cache_longest_match_and_drop():
    model = tiny_model(seed=5)
    rng = np.random.RandomState(5)
    base = rng.randint(0, 128, (8,)).tolist()
    longer = base + rng.randint(0, 128, (8,)).tolist()
    tail = rng.randint(0, 128, (5,)).tolist()

    ref = DecodeEngine(model, max_batch=1, max_len=64)
    want = collect(ref, ref.add(longer + tail), 6)

    eng = DecodeEngine(model, max_batch=1, max_len=64)
    eng.cache_prefix(base)
    h = eng.cache_prefix(longer)
    s = eng.add(longer + tail)
    assert eng.prefix_hit_tokens == len(longer)  # longest match wins
    assert collect(eng, s, 6) == want
    eng.release(s)
    eng.drop_prefix(h)
    eng.prefix_hit_tokens = 0
    s2 = eng.add(longer + tail)
    assert eng.prefix_hit_tokens == len(base)  # falls back to the shorter
    assert collect(eng, s2, 6) == want


def test_prefix_cache_with_chunked_prefill():
    """Prefix reuse composes with chunked admissions: the reused length
    rounds down to a chunk multiple and streams stay exact."""
    model = tiny_model(seed=6)
    rng = np.random.RandomState(6)
    system = rng.randint(0, 128, (21,)).tolist()  # rounds down to 16
    user = rng.randint(0, 128, (9,)).tolist()

    ref = DecodeEngine(model, max_batch=1, max_len=64)
    want = collect(ref, ref.add(system + user), 8)

    eng = DecodeEngine(model, max_batch=1, max_len=64, prefill_chunk=8)
    eng.cache_prefix(system)
    s = eng.add(system + user)
    assert eng.prefix_hit_tokens == 16  # 21 rounded down to the chunk grid
    assert collect(eng, s, 8) == want


def test_prefix_cache_near_full_window_shift():
    """A remainder window that would cross max_len shifts down and
    recomputes the overlap — streams stay exact (no clamped writes)."""
    model = tiny_model(seed=7)
    rng = np.random.RandomState(7)
    system = rng.randint(0, 128, (40,)).tolist()
    user = rng.randint(0, 128, (20,)).tolist()
    # n=60, rem=20 -> width 32, start 40: 40+32 > max_len 64 -> the window
    # shifts to start 32 and recomputes positions [32, 40).
    eng_len = 64
    assert 40 + 32 > eng_len  # sanity: the shift path IS exercised

    ref = DecodeEngine(model, max_batch=1, max_len=eng_len)
    want = collect(ref, ref.add(system + user), 3)

    eng = DecodeEngine(model, max_batch=1, max_len=eng_len)
    eng.cache_prefix(system)
    s = eng.add(system + user)
    assert eng.prefix_hit_tokens == 32  # reused up to the shifted window
    assert collect(eng, s, 3) == want


def test_prefix_cache_composes_with_speculation():
    model = tiny_model(seed=8)
    rng = np.random.RandomState(8)
    system = rng.randint(0, 128, (16,)).tolist()
    user = rng.randint(0, 128, (6,)).tolist()

    ref = DecodeEngine(model, max_batch=1, max_len=128)
    want = collect(ref, ref.add(system + user), 10)

    eng = DecodeEngine(model, max_batch=1, max_len=128,
                       speculative_draft_len=3)
    eng.cache_prefix(system)
    s = eng.add(system + user)
    assert eng.prefix_hit_tokens == len(system)
    assert collect(eng, s, 10) == want


def test_engine_stop_sequences():
    """A slot auto-releases (reason "stop") when its emitted stream ends
    with a stop sequence; the matching tokens ARE emitted (incremental
    emission cannot retract) and other slots keep decoding."""
    model = tiny_model()
    prompt = [5, 99, 23, 60, 8]
    ref = ref_tokens(model, prompt, 16)
    # Pick a stop = tokens 3..5 of the greedy stream so the match crosses
    # several steps; a second slot with a different prompt must be unbothered.
    stop = tuple(ref[3:6])
    eng = DecodeEngine(model, max_batch=2, max_len=64, stop_sequences=[stop])
    s1 = eng.add(prompt)
    s2 = eng.add([9, 1, 2])
    got1, got2 = [], []
    for _ in range(16):
        out = eng.step()
        if s1 in out:
            got1.append(out[s1])
        if s2 in out:
            got2.append(out[s2])
    # Earliest match wins: the emitted stream is the shortest ref prefix
    # ending with the stop sequence (a repetitive random-init stream can
    # match before position 6).
    expect = next(
        ref[: i + 1]
        for i in range(len(ref))
        if i + 1 >= len(stop) and tuple(ref[i + 1 - len(stop) : i + 1]) == stop
    )
    assert got1 == expect
    assert eng.finished_reason[s1] == "stop"
    assert not eng.is_active(s1)
    assert eng.is_active(s2) and len(got2) == 16


def test_engine_logprobs_match_full_forward():
    """Opt-in per-token logprobs equal log_softmax of the model's own
    logits at each emitted position (greedy, teacher-forced recompute)."""
    model = tiny_model()
    prompt = [5, 99, 23, 60, 8]
    eng = DecodeEngine(model, max_batch=1, max_len=64, return_logprobs=True)
    slot = eng.add(prompt)
    toks = collect(eng, slot, 6)
    lps = eng.logprobs[slot]
    assert len(lps) == 6
    # Recompute: logprob of token t_i under the full forward over
    # prompt + tokens[:i].
    import jax
    seq = list(prompt)
    for i, (t, lp) in enumerate(zip(toks, lps)):
        logits, _ = model(jnp.asarray([seq], jnp.int32))
        full = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        np.testing.assert_allclose(float(full[t]), lp, atol=5e-2, rtol=5e-2)
        seq.append(t)
    # release() clears the record
    eng.release(slot)
    assert slot not in eng.logprobs


def test_engine_speculative_logprobs_match_plain_engine():
    """Speculative decoding + return_logprobs (round 5 — previously
    refused): greedy streams AND per-token logprobs match the plain
    engine's (the verify forward computes every accepted position's full
    logits row, so logprobs come for free)."""
    model = tiny_model(seed=3)
    prompt = [7, 42, 99, 3, 15, 8]

    ref = DecodeEngine(model, max_batch=1, max_len=128, return_logprobs=True)
    rs = ref.add(prompt)
    want = collect(ref, rs, 12)
    want_lps = list(ref.logprobs[rs])

    eng = DecodeEngine(model, max_batch=1, max_len=128,
                       speculative_draft_len=3, return_logprobs=True)
    s = eng.add(prompt)
    got = collect(eng, s, 12)
    lps = eng.logprobs[s]
    assert got == want
    assert len(lps) == 12
    # Verify-forward logits vs decode-step logits: same math, different
    # executables — compilation drift only.
    np.testing.assert_allclose(lps, want_lps, atol=5e-2, rtol=5e-2)
    # Fewer verify forwards than emitted tokens (the speedup), even while
    # recording logprobs.
    assert eng.spec_verify_count < 12


def test_engine_speculative_sampling_logprobs_teacher_forced():
    """Sampling-mode speculation + logprobs: each recorded logprob equals
    log_softmax of the model's own logits at that emitted position
    (teacher-forced recompute — the same contract the plain logprobs test
    checks), regardless of where rejections landed."""
    import jax

    model = tiny_model(seed=4)
    prompt = [5, 99, 23, 60, 8]
    eng = DecodeEngine(model, max_batch=1, max_len=128, temperature=0.8,
                       top_k=40, seed=11, speculative_draft_len=3,
                       return_logprobs=True)
    slot = eng.add(prompt)
    toks = collect(eng, slot, 8)
    lps = eng.logprobs[slot]
    assert len(lps) == 8
    seq = list(prompt)
    for t, lp in zip(toks, lps):
        logits, _ = model(jnp.asarray([seq], jnp.int32))
        full = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        np.testing.assert_allclose(float(full[t]), lp, atol=5e-2, rtol=5e-2)
        seq.append(t)


def test_engine_ring_cache_serves_past_capacity():
    """Ring-cache serving: a sliding-window model decodes PAST the ring
    capacity in bounded HBM (no cache_full eviction); pre-wrap the stream
    equals the full-cache engine's exactly (identical arrays until slot
    order diverges at the wrap)."""
    from torchmx_tpu.models.mistral import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, sliding_window=6,
    )
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(11))
    prompt = [5, 99, 23, 60, 8]
    kv = MXConfig("int8")
    # Control: plain engine, large cache (rounds to 256).
    ctl = DecodeEngine(model, max_batch=1, max_len=200, kv_cache_config=kv)
    # Ring: capacity 128 (rounded), window 6 -> admits whole prompts.
    ring = DecodeEngine(model, max_batch=1, max_len=100, kv_cache_config=kv,
                        ring=True)
    assert ring.max_len == 128 and ring.ring
    sc, sr = ctl.add(prompt), ring.add(prompt)
    pre_wrap = 128 - len(prompt) - 2
    a = collect(ctl, sc, pre_wrap)
    b = collect(ring, sr, pre_wrap)
    assert a == b  # identical math while nothing has wrapped
    # Decode well past the ring capacity: stays active and valid.
    more = collect(ring, sr, 200)
    assert ring.is_active(sr)
    assert all(0 <= t < 128 for t in more)
    assert ring.pos[sr] > 128  # positions beyond the physical ring


def test_engine_ring_admission_guard():
    from torchmx_tpu.models.mistral import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, sliding_window=120,
    )
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(12))
    eng = DecodeEngine(model, max_batch=1, max_len=128,
                       kv_cache_config=MXConfig("int8"), ring=True)
    # window 120, capacity 128 -> admit width bound is 9; bucket(16)=16 > 9.
    with pytest.raises(ValueError, match="ring admission"):
        eng.add(list(range(16)))


def test_engine_ring_chunked_prefill_matches_unchunked():
    """Ring + chunked prefill: (1) a prompt that fits produces exactly the
    whole-prompt ring engine's stream (chunks write the same bytes);
    (2) a prompt WIDER than the ring admits through chunks that wrap,
    evicting prompt positions older than the window, and decodes on."""
    from torchmx_tpu.models.mistral import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, sliding_window=8,
    )
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(15))
    kv = MXConfig("int8")
    prompt = np.random.RandomState(15).randint(0, 128, (20,)).tolist()
    whole = DecodeEngine(model, max_batch=1, max_len=128, kv_cache_config=kv,
                         ring=True)
    chunked = DecodeEngine(model, max_batch=1, max_len=128, kv_cache_config=kv,
                           ring=True, prefill_chunk=32)
    sw, sc = whole.add(prompt), chunked.add(prompt)
    a = collect(whole, sw, 40)
    b = collect(chunked, sc, 40)
    assert a == b
    # Wider-than-ring admission: 300 tokens through a 128-slot ring.
    long_prompt = (np.arange(300) % 128).tolist()
    eng = DecodeEngine(model, max_batch=1, max_len=128, kv_cache_config=kv,
                       ring=True, prefill_chunk=64)
    s = eng.add(long_prompt)
    toks = collect(eng, s, 50)
    assert eng.is_active(s) and eng.pos[s] == 350
    assert all(0 <= t < 128 for t in toks)
