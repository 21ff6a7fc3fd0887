"""Headline benchmark: MX fused dequant-matmul throughput vs bf16 matmul.

Llama-3-8B MLP shape (M=1024 tokens, K=4096, N=14336) with MXFP4 weights and
MXFP8 activations — the BASELINE.json north-star configuration.  Prints the
headline JSON line

    {"metric": "mxfp4w_fp8a_matmul_frac_of_bf16", "value": r, "unit": "ratio",
     "vs_baseline": r / 0.80}

IMMEDIATELY after the matmul measurement (value = bf16 time / MX time;
vs_baseline normalizes by the >=0.80-of-bf16 target), then runs the detail
sections (decode attention, 8B serving, grouped MoE, composition smoke) each
gated on the remaining wall-clock budget, and prints ONE updated final line
with the same headline metric plus the detail fields.  Both the first and the
last JSON line on stdout are therefore valid headline records, and a timeout
mid-section can no longer void the run (the round-3 failure mode:
BENCH_r03.json rc=124, parsed null, because the only print was at the very
end).

Budget: ``BENCH_BUDGET_S`` env (default 480s of wall clock).  A section only
starts if its estimated cost fits in the remaining budget; otherwise it is
recorded as ``{"skipped": "time budget"}``.
"""

import json
import os
import sys
import time

import jax

# Persistent XLA compilation cache (round-5 fix): on driver day the two
# headline loop compiles alone ate 461 s of the 480 s budget (BENCH_r04) —
# the tunneled device's compile cost swings 3x between runs.  The builder's
# own verification run primes this repo-local cache, so a cold process on
# driver day re-loads the serialized executables in seconds instead of
# recompiling them (measured on this backend: see docs/results.md).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))

M, K, N = 1024, 4096, 14336
REPS_LO, REPS_HI, TRIALS = 40, 120, 5


def _left() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def _note(msg: str) -> None:
    print(f"bench[{time.perf_counter() - T_START:5.0f}s] {msg}", file=sys.stderr)


def _timed_loop(step_fn, x, *consts):
    """Per-step wall time of a data-dependent scan of ``step_fn``, measured
    differentially between two scan lengths.

    The execution path here has a large fixed per-call overhead and
    acknowledges short calls asynchronously, so absolute timings lie; the
    marginal cost (T(hi) - T(lo)) / (hi - lo) isolates the real device time.
    The loop body folds the output back into the carry so XLA cannot elide or
    reorder the work.  The rep count is a DYNAMIC fori_loop bound so each
    step_fn compiles exactly once (two static scan lengths doubled the
    compile bill — the round-4 bench overran its budget on compiles alone).
    """

    @jax.jit
    def loop(x, reps, *consts):
        def body(_, c):
            y = step_fn(c, *consts)  # (M, N)
            # Consume every output column NON-linearly (a linear reduction
            # like sum gets strength-reduced into the weights, deleting
            # the matmul).
            col = jnp.max(y, axis=1, keepdims=True).astype(jnp.bfloat16)
            return c * 0.5 + col * 1e-6

        c = jax.lax.fori_loop(0, reps, body, x)
        # Scalar output: forcing the value to host is the only reliable
        # sync point on this execution path.
        return jnp.sum(c.astype(jnp.float32))

    r_lo = jnp.asarray(REPS_LO, jnp.int32)
    r_hi = jnp.asarray(REPS_HI, jnp.int32)
    float(loop(x, r_lo, *consts))
    float(loop(x, r_hi, *consts))

    def one_trial():
        t0 = time.perf_counter()
        float(loop(x, r_lo, *consts))
        t1 = time.perf_counter()
        float(loop(x, r_hi, *consts))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (REPS_HI - REPS_LO)

    return one_trial


def _paired(trial_a, trial_b, trials: int = TRIALS, reserve: float = 0.0,
            on_first=None, warmup: int = 0):
    """Measure two warmed-up measurements with trials INTERLEAVED
    (a, b, a, b, ...): the tunneled device drifts several percent over
    minutes, and sequential measurement biases a ratio of the two; pairing
    cancels the drift.

    ``reserve``: stop adding trials (keeping at least 2) once the remaining
    budget falls below this many seconds — the tunnel's per-call overhead
    swings 3x between runs (measured 165 s vs 438 s for the same headline),
    and a median of 2 beats a timeout that voids the section.

    ``on_first``: called with (a, b) after the FIRST pair — the headline
    prints a provisional record there, so even a timeout one trial in
    leaves a parseable result.

    ``warmup``: DISCARDED leading pairs.  The very first differential after
    an executable loads from the persistent cache is unreliable on this
    backend (measured a 7.8x bogus first-pair ratio on a warm-cache run —
    deserialization/paging noise lands inside the first timed window); one
    throwaway pair restores sane provisionals."""
    for _ in range(warmup):
        trial_a()
        trial_b()
    a, b = [], []
    for i in range(trials):
        a.append(trial_a())
        b.append(trial_b())
        if i == 0 and on_first is not None:
            on_first(a[0], b[0])
        if reserve and i >= 1 and _left() < reserve:
            _note(f"paired: stopping at {i + 1}/{trials} trials "
                  f"({_left():.0f}s left < {reserve:.0f}s reserve)")
            break
    return float(np.median(a)), float(np.median(b))


def _headline(on_first=None):
    from torchmx_tpu.mx_array import MXArray
    from torchmx_tpu.ops import mx_dynamic_matmul

    # Inputs generated ON DEVICE (host-materialized arrays this size cost
    # ~120 MB of tunnel transfer before the first compile even starts).
    x, w = jax.jit(
        lambda k: (
            jax.random.normal(k, (M, K), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1), (N, K), jnp.bfloat16)
            * 0.02,
        )
    )(jax.random.key(0))

    # K-major kernel layout with fp4 halves packing, as stored by
    # MXInferenceLinear.
    w_mx = MXArray.to_mx(w, "float4_e2m1", 32).T.to_fp4_halves()
    w_mx = jax.tree_util.tree_map(jax.device_put, w_mx)

    def bf16_step(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def mx_step(x, w_mx):
        # Dynamic activation quantization fused into the matmul kernel
        # (exactly what MXInferenceLinear runs per forward).
        return mx_dynamic_matmul(x, w_mx, "float8_e4m3", 32, out_dtype=jnp.bfloat16)

    _note("headline: weights packed")
    tr_bf16 = _timed_loop(bf16_step, x, w)
    _note("headline: bf16 loop compiled")
    tr_mx = _timed_loop(mx_step, x, w_mx)
    _note("headline: mx loop compiled; trials starting")
    # Reserve >half the budget for the detail sections: on a slow-tunnel day
    # 2 interleaved trials still give a sound median, and the headline MUST
    # print with time to spare.
    t_bf16, t_mx = _paired(
        tr_bf16, tr_mx, reserve=0.55 * BUDGET_S, on_first=on_first, warmup=1
    )
    return t_bf16, t_mx


def _decode_attention():
    """Fused MX-KV-cache decode attention vs a bf16 cache
    (b=4 hq=32 hkv=8 d=128 L=8192 fp8; the serving hot path)."""
    import math

    from torchmx_tpu.models.llama import MXLayerKVCache, repeat_kv
    from torchmx_tpu.ops import pallas_attention as pa

    B, HQ, HKV, D, L = 4, 32, 8, 128, 8192
    # K/V caches generated ON DEVICE (host-side arrays would ship ~130 MB
    # through the tunnel).
    qd, kc, vc = jax.jit(
        lambda k: (
            jax.random.normal(k, (B, HQ, 1, D), jnp.bfloat16) * 0.3,
            jax.random.normal(jax.random.fold_in(k, 1), (B, HKV, L, D),
                              jnp.bfloat16) * 0.3,
            jax.random.normal(jax.random.fold_in(k, 2), (B, HKV, L, D),
                              jnp.bfloat16) * 0.3,
        )
    )(jax.random.key(2))
    sm = 1.0 / math.sqrt(D)

    def fused_trial(ename, layout="seq"):
        cache0 = MXLayerKVCache.create(
            B, HKV, L, D, ename, 32, layout=layout
        ).write(kc, vc, 0)

        def step(q, kd, ks, vd, vs):
            cache = MXLayerKVCache(
                k_data=kd, k_scale=ks, v_data=vd, v_scale=vs,
                elem_dtype_name=ename, block_size=32, layout=layout,
            )
            return pa.cached_attention_any(q, cache, L - 1, L, sm)

        return _timed_loop(
            step, qd, cache0.k_data, cache0.k_scale, cache0.v_data, cache0.v_scale
        )

    def bf16_attn_step(q, kf, vf):
        kk = repeat_kv(kf, HQ // HKV)
        vv = repeat_kv(vf, HQ // HKV)
        s = jnp.matmul(q, kk.swapaxes(-2, -1), preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s.astype(jnp.float32) * sm, axis=-1).astype(jnp.bfloat16)
        return jnp.matmul(p, vv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # Honest iso-kernel baseline: the SAME blockwise kernel with bf16 K/V
    # tiles (no decode).  The eager bf16 path overstates the MX speedup;
    # the MX-vs-fused-bf16 ratio is the defensible number.
    def bf16_fused_step(q, kf, vf):
        return pa.bf16_cached_attention(q, kf, vf, L - 1, L, sm)

    # One trial closure per variant (a fresh _timed_loop closure means a
    # fresh jit compile; reusing them keeps this section at 5 compiles).
    tr_fp8 = fused_trial("float8_e4m3")
    tr_int8 = fused_trial("int8")
    tr_int8_dm = fused_trial("int8", layout="dmajor")
    tr_eager = _timed_loop(bf16_attn_step, qd, kc, vc)
    tr_fused_bf16 = _timed_loop(bf16_fused_step, qd, kc, vc)

    t_attn_mx, t_attn_bf16 = _paired(tr_fp8, tr_eager, reserve=0.30 * BUDGET_S)
    # int8 cache: same bytes as fp8 but ~3x cheaper VPU decode — the
    # recommended serving format (docs/results.md).
    t_attn_int8, _ = _paired(tr_int8, tr_fp8, reserve=0.26 * BUDGET_S)
    t_attn_bf16_fused, t_attn_int8_b = _paired(
        tr_fused_bf16, tr_int8, reserve=0.22 * BUDGET_S
    )
    # d-major int8 layout: blocks on sublanes (free scale broadcast, no
    # in-kernel transposes) — what the serving turbo recipe deploys.
    t_attn_int8_dm, t_attn_bf16_fused_b = _paired(
        tr_int8_dm, tr_fused_bf16, reserve=0.185 * BUDGET_S
    )
    return {
        "shape": {"b": B, "hq": HQ, "hkv": HKV, "d": D, "L": L},
        "fused_mx_fp8_cache_ms": round(t_attn_mx * 1e3, 3),
        "fused_mx_int8_cache_ms": round(t_attn_int8 * 1e3, 3),
        "fused_mx_int8_dmajor_cache_ms": round(t_attn_int8_dm * 1e3, 3),
        "bf16_cache_ms": round(t_attn_bf16 * 1e3, 3),
        "fused_bf16_cache_ms": round(t_attn_bf16_fused * 1e3, 3),
        "speedup_vs_bf16_cache": round(t_attn_bf16 / t_attn_mx, 2),
        "int8_speedup_vs_bf16_cache": round(t_attn_bf16 / t_attn_int8, 2),
        "int8_speedup_vs_fused_bf16": round(t_attn_bf16_fused / t_attn_int8_b, 2),
        "int8_dmajor_speedup_vs_fused_bf16": round(
            t_attn_bf16_fused_b / t_attn_int8_dm, 2
        ),
    }


def _serving_toks():
    """8B-shape greedy-decode tok/s (scan-over-layers model, single-dispatch
    lax.scan decode), measured the way the docs table is: steady-state wall
    clock of a full generate() call (prefill + 128 decode steps) AFTER the
    compile call, min over repeats — `tools/bench_8b_decode.py`'s method.
    Affordable inside the driver budget since round 5's persistent
    compilation cache (the big generate compiles load from disk)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_8b_decode import LLAMA3_8B, build_zeros_quantized

    from torchmx_tpu.models.llama import LlamaConfig
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    prompt_len, new_tokens = 64, 128
    cfg = LlamaConfig(max_position_embeddings=1024, **LLAMA3_8B)
    # Default quantized config (MXFP4-halves weights / fp8 activations /
    # int8 KV).  The docs' TURBO recipe (int8-domain weights, d-major KV,
    # all-int8 attention dot; 60.5 tok/s) does not fit this bench: the
    # int8-domain 8.8 GB weights OOM beside the scan-stacking transient
    # (measured RESOURCE_EXHAUSTED), and the int8-dot attention generate
    # compile alone took >650 s on-chip (measured rc=124) — the driver
    # budget cannot carry it.  tools/bench_8b_decode measures the turbo
    # config on the plain model instead.
    t0 = time.perf_counter()
    model = build_zeros_quantized(cfg)
    # Scan-over-layers: the decoder layer compiles ONCE (~17x faster 8B
    # compiles), keeping the serving metric inside the bench time budget.
    model = ScanLlamaForCausalLM.from_model(model)
    _note(f"serving: built 8B in {time.perf_counter() - t0:.0f}s")
    return _serving_toks_timed(model, prompt_len, new_tokens)


def _serving_toks_timed(model, prompt_len, new_tokens):
    from torchmx_tpu import MXConfig
    from torchmx_tpu.models.generate import generate

    kv = MXConfig("int8")
    out = {"config": "mxfp4w_fp8a_int8kv_prompt64_new128_steady"}
    rng = np.random.default_rng(0)
    # b=1 costs the big compile (warm cache: seconds; cold: ~75-650s);
    # b=32 reuses most of it.  Steady-state runtime per timed call is
    # ~new_tokens/35 s at b=1 (~4s) — the estimates cover compile + 2 calls.
    for batch, key, est in ((1, "tok_s_b1", 120.0), (32, "tok_s_b32", 60.0)):
        if _left() < est:
            out[key] = None
            out[f"{key}_skipped"] = "time budget"
            continue
        prompt = jnp.asarray(
            rng.integers(0, 1000, (batch, prompt_len), np.int64), jnp.int32
        )
        t0 = time.perf_counter()
        toks = generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
        int(jnp.sum(toks))  # compile + sync (block_until_ready lies here)
        _note(f"serving: b={batch} compile+first {time.perf_counter() - t0:.0f}s")
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            toks = generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
            int(jnp.sum(toks))
            times.append(time.perf_counter() - t0)
        out[key] = round(batch * new_tokens / min(times), 1)
    del model
    return out


def _moe_grouped(E=8, K_=4096, N_=14336, T=8, k=2, tm=8, bn=512, bk=512):
    """Grouped-MX MoE GEMM at a Mixtral-8x7B decode shape: routed top-2
    of 8 experts vs all-experts compute through the SAME kernel.  The
    routed/all ratio shows the dead-tile DMA skip working (the kernel
    reads only the routed experts' packed weights)."""
    from torchmx_tpu.mx_array import quantize_mx
    from torchmx_tpu.ops.pallas_moe import group_tokens, grouped_matmul

    # Generate + quantize the (E, N, K) weights ON DEVICE: materializing
    # them host-side shipped ~1 GB bf16 through the tunnel (measured: the
    # transfer, not compute, dominated this section's 230 s wall).
    @jax.jit
    def make_weights(key):
        w = jax.random.normal(key, (E, N_, K_), jnp.bfloat16) * 0.02
        ws, wq = quantize_mx(w, "int8", 32)  # blocked along K
        return wq.swapaxes(1, 2), ws.swapaxes(1, 2)  # (E, K, N)

    w_codes, w_scale = make_weights(jax.random.key(1))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((T, K_)) * 0.3, jnp.bfloat16
    )

    def trial(top_idx):
        # jit the grouping: EAGER ops on the tunneled backend cost ~0.5-100s
        # per dispatch, and group_tokens is ~15 ops — eager, this section
        # "hangs" for minutes before the kernel ever runs (the round-3/4
        # moe-section timeouts).
        xs, te, rows, _ = jax.jit(group_tokens, static_argnums=(2, 3))(
            x, top_idx, tm, E
        )
        xs, te, rows = jax.device_put((xs, te, rows))

        # Weights ride as ARGUMENTS, never closure constants: a closed-over
        # (E, K, N) int8 array bakes ~470 MB of literals into the HLO and
        # the tunneled compile request dies with HTTP 413.
        def step(xs_, te_, rows_, w_codes_, w_scale_):
            return grouped_matmul(
                xs_, w_codes_, te_, rows_, tm=tm, bn=bn, bk=bk,
                w_scale=w_scale_, elem_name="int8",
            )

        return _timed_loop(step, xs, te, rows, w_codes, w_scale)

    # Routed: all T tokens pick the same 2 experts (decode worst/best case
    # for locality); All: tokens spread over every expert.
    routed = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (T, 1))
    spread = jnp.stack(
        [jnp.arange(T, dtype=jnp.int32) % E, (jnp.arange(T, dtype=jnp.int32) + 1) % E],
        axis=1,
    )
    t_routed, t_all = _paired(trial(routed), trial(spread), reserve=30.0)
    return {
        "shape": {"E": E, "K": K_, "N": N_, "T": T, "k": k},
        "routed2_ms": round(t_routed * 1e3, 3),
        "all8_ms": round(t_all * 1e3, 3),
        "dead_tile_skip_ratio": round(t_all / t_routed, 2),
    }


def _compositions():
    """Compile-and-run smoke of the CORE multi-chip compositions (DPxTP QAT
    step, quantized TP forward, PP cached decode, MX ring attention) on a
    virtual 8-device CPU mesh, in a subprocess so the CPU platform switch
    cannot disturb this process's TPU backend.  Driver-visible regression
    canary for the sharding paths; the FULL dryrun (scan/PPxTP/CP/EP/MLA
    too) lives in MULTICHIP_r{N}.json."""
    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8, sections=('qat', 'tp', 'ppd', 'ring'))\n"
        "print('COMPOSITIONS_OK')\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        # The CPU-mesh compiles cache too (separate keys from the TPU ones);
        # a primed cache cuts this section from ~60-95s of compiles to IO.
        JAX_COMPILATION_CACHE_DIR=_CACHE_DIR,
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
    )
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=max(30.0, _left() - 10.0),
    )
    ok = "COMPOSITIONS_OK" in proc.stdout
    res = {"ok": ok, "wall_s": round(time.perf_counter() - t0, 1)}
    if not ok:
        res["tail"] = (proc.stderr or proc.stdout)[-300:]
    return res


def _mla_decode(L=8192, b=8, n=32, r=512, dr=64):
    """Absorbed-MLA decode attention at a 32-head DeepSeek-V3 slice: the
    all-int8 MXU-dot latent tier (d-major per-position cache, round 5) vs
    the fused bf16-latent iso-kernel baseline.  The quantized latent must
    WIN on latency here (it reads half the bytes and contracts raw codes
    on the MXU) — ratio > 1 means int8-dot is faster."""
    from torchmx_tpu import env_variables as envmod
    from torchmx_tpu.models.deepseek import MLACache, MXMLACache
    from torchmx_tpu.ops.pallas_mla import mla_cached_attention

    sm = 1.0 / float(np.sqrt(r + dr))

    @jax.jit
    def make_inputs(key):
        ks = jax.random.split(key, 4)
        return (
            jax.random.normal(ks[0], (b, L, r), jnp.bfloat16) * 0.3,
            jax.random.normal(ks[1], (b, L, dr), jnp.bfloat16) * 0.3,
            jax.random.normal(ks[2], (b, n, 1, r), jnp.bfloat16) * 0.3,
            jax.random.normal(ks[3], (b, n, 1, dr), jnp.bfloat16) * 0.3,
        )

    latent, k_rot, q_lat, q_rot = make_inputs(jax.random.key(3))
    zero_pos = jnp.zeros((b,), jnp.int32)
    dm = jax.jit(lambda c, a, k: c.write(a, k, zero_pos))(
        MXMLACache.create(b, L, r, dr, "int8", 32, layout="dmajor"),
        latent, k_rot,
    )
    hp = jax.jit(lambda c, a, k: c.write(a, k, zero_pos))(
        MLACache.create(b, L, r, dr), latent, k_rot
    )
    q_off = jnp.full((b,), L - 1, jnp.int32)
    kv_len = jnp.full((b,), L, jnp.int32)

    def step(c, cache):
        out = mla_cached_attention(
            q_lat + c[None, :, None, :] * 1e-6, q_rot, cache, q_off, kv_len, sm
        )
        assert out is not None, "fused MLA path ineligible at this shape"
        return out[0, :, 0, :]

    c0 = jnp.zeros((n, r), jnp.bfloat16)
    old = envmod.TORCHMX_ATTN_INT8_DOT
    envmod.TORCHMX_ATTN_INT8_DOT = "1"
    try:
        t_int8dot, t_bf16 = _paired(
            _timed_loop(step, c0, dm), _timed_loop(step, c0, hp),
            reserve=30.0, warmup=1,
        )
    finally:
        envmod.TORCHMX_ATTN_INT8_DOT = old
    return {
        "config": f"b{b}_n{n}_L{L}_r{r}_int8dot_dmajor_vs_bf16_latent",
        "int8dot_ms": round(t_int8dot * 1e3, 3),
        "bf16_latent_ms": round(t_bf16 * 1e3, 3),
        "speedup_vs_bf16_latent": round(t_bf16 / t_int8dot, 2),
    }


def main():
    _note(f"budget {BUDGET_S:.0f}s; headline matmul starting")

    def emit(tb, tm, provisional):
        r = tb / tm
        rec = {
            "metric": "mxfp4w_fp8a_matmul_frac_of_bf16",
            "value": round(r, 4),
            "unit": "ratio",
            "vs_baseline": round(r / 0.80, 4),
        }
        if provisional:
            rec["detail"] = {"provisional": "first trial pair"}
        print(json.dumps(rec), flush=True)
        _note(f"headline {'provisional ' if provisional else ''}printed: {r:.4f}")

    # A provisional record lands after the FIRST trial pair: on a
    # slow-compile day (measured 440 s for the two loop compiles alone) a
    # driver timeout right after still finds a parseable headline.
    t_bf16, t_mx = _headline(on_first=lambda a, b: emit(a, b, True))
    ratio = t_bf16 / t_mx
    flops = 2.0 * M * K * N
    detail = {
        "bf16_ms": round(t_bf16 * 1e3, 3),
        "mx_ms": round(t_mx * 1e3, 3),
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "mx_tflops": round(flops / t_mx / 1e12, 1),
        "shape": [M, K, N],
        "backend": jax.devices()[0].platform,
    }
    result = {
        "metric": "mxfp4w_fp8a_matmul_frac_of_bf16",
        "value": round(ratio, 4),
        "unit": "ratio",
        "vs_baseline": round(ratio / 0.80, 4),
        "detail": detail,
    }
    # Headline prints NOW — a timeout in any later section cannot void it.
    print(json.dumps(result), flush=True)
    _note("headline printed; running detail sections")

    # (name, fn, estimated cost in seconds) — priority order.  A section
    # only starts when its estimate fits the remaining budget.
    sections = (
        # Estimates are COLD-cache costs; with the persistent compilation
        # cache primed (the normal case — the builder's verification run
        # writes it) each section's compiles load from disk in seconds and
        # the actual cost is a fraction of the estimate.
        ("decode_attention", _decode_attention, 170.0),
        # moe before serving: it is cheap (~45 s measured) while serving's
        # first compile alone swings 20-90 s; serving's per-batch guards
        # degrade gracefully when the budget runs short.
        ("moe_grouped", _moe_grouped, 55.0),
        ("serving_8b", _serving_toks, 75.0),  # per-batch guards inside
        # MLA latent decode (round 5): 3 jit compiles + one kernel pair;
        # ~100 s cold, ~25 s with the cache primed.
        ("mla_decode", _mla_decode, 100.0),
        # Core-subset dryrun (qat/tp/ppd/ring; measured 59 s quiet / 96 s
        # under load on this CPU): fits the budget most days;
        # MULTICHIP_r{N}.json carries the full composition story
        # (scan, PPxTP, CP, EP, MLA).
        ("compositions", _compositions, 110.0),
    )
    for name, fn, est in sections:
        if _left() < est:
            detail[name] = {"skipped": "time budget"}
            _note(f"{name}: skipped ({_left():.0f}s left < {est:.0f}s estimate)")
            continue
        try:
            detail[name] = fn()
            _note(f"{name}: done")
        except Exception as e:  # noqa: BLE001 — never break the headline metric
            detail[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            _note(f"{name}: error {type(e).__name__}")

    # Final line: same headline, full detail.  First and last JSON lines on
    # stdout both carry the headline fields.
    print(json.dumps(result), flush=True)
    _note("done")


if __name__ == "__main__":
    main()
