"""DeepSeek-V3 family: MLA attention (HF parity, absorbed cached decode ==
full forward), the noaux-tc sigmoid router, YaRN rope, the MX latent cache,
and quantization-surgery dispatch.

The reference ships Llama and Qwen2 families only
(rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``); DeepSeek-V3
(MLA + shared-expert MoE) is a TPU-build extension through the same
type-dispatch seams — and the compressed-latent KV cache quantized with MX
(``MXMLACache``) is exactly the cache-bandwidth story the reference left as
a TODO (``mx_llama_attention.py:180``).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.deepseek import (
    DeepseekV3Config,
    DeepseekV3ForCausalLM,
    DeepseekV3MoE,
    MLAAttention,
    MXMLACache,
)
from torchmx_tpu.models.generate import generate
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config(**kw):
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, q_lora_rank=64, kv_lora_rank=64,
        qk_rope_head_dim=32, qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=64, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
    )
    base.update(kw)
    return DeepseekV3Config(**base)


def _hf_pair(seed=0, **kw):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    torch.manual_seed(seed)
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=64, kv_lora_rank=64, qk_rope_head_dim=32,
        qk_nope_head_dim=32, v_head_dim=32, n_routed_experts=8,
        n_shared_experts=1, num_experts_per_tok=2, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
        norm_topk_prob=True, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    base.update(kw)
    hf_cfg = transformers.DeepseekV3Config(**base)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).to(torch.float32).eval()
    # Fresh-init correction biases are zeros; perturb them so the
    # choice-only-bias semantics actually bite in the parity check.
    with torch.no_grad():
        for layer in hf.model.layers[hf_cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.copy_(
                torch.randn(hf_cfg.n_routed_experts) * 0.1
            )
    model, cfg = from_hf_torch(hf)
    return torch, hf, model, cfg


def test_hf_parity_deepseek_v3():
    """Full MLA + MoE forward tracks HF DeepseekV3 (eager, fp32)."""
    torch, hf, model, cfg = _hf_pair()
    assert isinstance(model, DeepseekV3ForCausalLM)
    assert cfg.kv_lora_rank == 64 and cfg.qk_head_dim == 64
    assert cfg.head_dim == cfg.qk_rope_head_dim  # rope tables at rotary width
    ids = np.random.RandomState(0).randint(0, 256, (2, 16))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"deepseek corr {corr}"


def test_hf_parity_deepseek_no_qlora():
    """q_lora_rank=None uses the plain q_proj (DeepSeek-V3-Lite layout)."""
    torch, hf, model, cfg = _hf_pair(seed=1, q_lora_rank=None)
    assert cfg.q_lora_rank is None
    assert not hasattr(model.model.layers[0].self_attn, "q_a_proj")
    ids = np.random.RandomState(1).randint(0, 256, (2, 12))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"deepseek no-qlora corr {corr}"


def test_router_matches_hf_semantics():
    """Sigmoid scores; correction bias steers CHOICE only; group-limited
    top-k; renormalize; times routed_scaling_factor (HF DeepseekV3TopkRouter)."""
    cfg = tiny_config()
    moe = DeepseekV3MoE(cfg, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    bias = rng.randn(8).astype(np.float32) * 0.5
    moe.gate.e_score_correction_bias.set_value(jnp.asarray(bias))
    x = jnp.asarray(rng.randn(16, 128) * 0.5, jnp.float32)
    top_w, top_idx = moe._route_raw(x)
    w = np.asarray(moe.gate.weight.get_value(), np.float32)
    scores = 1.0 / (1.0 + np.exp(-(np.asarray(x) @ w.T)))
    choice = scores + bias[None, :]
    for t in range(16):
        g = choice[t].reshape(2, 4)
        g_scores = np.sort(g, axis=-1)[:, -2:].sum(-1)
        keep_g = np.argmax(g_scores)
        masked = np.where(
            np.repeat(np.arange(2) == keep_g, 4), choice[t], 0.0
        )
        want_idx = set(np.argsort(-masked)[:2])
        assert set(np.asarray(top_idx[t])) == want_idx
        ws = scores[t][sorted(want_idx)]
        ws = ws / (ws.sum() + 1e-20) * 1.5
        np.testing.assert_allclose(
            np.sort(np.asarray(top_w[t])), np.sort(ws), rtol=2e-5
        )
    # Every row's total routed weight is the scaling factor.
    np.testing.assert_allclose(np.asarray(top_w).sum(-1), 1.5, rtol=1e-5)


def test_absorbed_matches_expanded_fp32():
    """The absorbed (cached) and expanded (cacheless) MLA forms are the same
    algebra — prove it in fp32 at the attention-module level, where the only
    difference is einsum association order.  This is the exactness anchor;
    the token-level gates below are tie-aware because bf16 model forwards
    legally round differently across compilations."""
    import math

    cfg = tiny_config()
    attn = MLAAttention(cfg, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    b, s = 2, 12
    x = jnp.asarray(rng.randn(b, s, cfg.hidden_size) * 0.3, jnp.float32)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, 32, 2) / 32))
    ang = np.arange(s)[:, None] * inv[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), 2)[None], jnp.float32)
    sin = jnp.asarray(np.tile(np.sin(ang), 2)[None], jnp.float32)

    out_exp, _ = attn(x, cos=cos, sin=sin)
    from torchmx_tpu.models.deepseek import MLACache

    cache = MLACache.create(b, s, cfg.kv_lora_rank, cfg.qk_rope_head_dim,
                            dtype=jnp.float32)
    out_abs, _ = attn(x, cos=cos, sin=sin, cache=cache, cache_position=0)
    np.testing.assert_allclose(
        np.asarray(out_abs, np.float32), np.asarray(out_exp, np.float32),
        rtol=2e-4, atol=2e-5,
    )
    assert math.isfinite(float(jnp.sum(out_abs)))


def _greedy_stream_with_margins(model, ids, new_tokens, kv_cfg=None):
    """Reference greedy stream via per-step model() calls through the cache
    (the ``stream=True`` compilation), plus the top-2 logit margin at every
    step — the tie-aware gates compare other compilations against this."""
    b, s = ids.shape
    max_len = s + new_tokens
    if kv_cfg is not None:
        max_len = (max_len + 127) // 128 * 128
    caches = model.init_cache(b, max_len, kv_cfg)
    logits, caches = model(
        ids, position_ids=jnp.arange(s)[None, :], caches=caches, cache_position=0
    )
    stream, margins = [], []
    last = np.asarray(logits[:, -1, :], np.float32)
    for i in range(new_tokens):
        top2 = np.sort(last, -1)[:, -2:]
        margins.append(top2[:, 1] - top2[:, 0])
        tok = np.argmax(last, -1).astype(np.int32)
        stream.append(tok)
        if i == new_tokens - 1:
            break
        logits, caches = model(
            jnp.asarray(tok[:, None]),
            position_ids=jnp.full((b, 1), s + i, jnp.int32),
            caches=caches,
            cache_position=jnp.asarray(s + i),
        )
        last = np.asarray(logits[:, -1, :], np.float32)
    return np.stack(stream, 1), np.stack(margins, 1)


def test_absorbed_decode_matches_full_forward():
    """Greedy cached decode (absorbed MQA over the latent) emits the same
    tokens as step-by-step full forwards (expanded form) — tie-aware: the
    two forms associate einsums differently, so bf16 rounding legally flips
    argmax at near-tie logits on a random-init model (the fp32 algebra
    identity is pinned by test_absorbed_matches_expanded_fp32).  Round-3
    lesson: this was an exact-equality gate and flaked on the TPU."""
    from tests.test_parallel import assert_streams_equal_outside_ties

    model = DeepseekV3ForCausalLM(tiny_config(), rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 12)), jnp.int32)
    cur = np.asarray(ids)
    want, margins = [], []
    for _ in range(5):
        lg, _ = model(jnp.asarray(cur, jnp.int32))
        last = np.asarray(lg[:, -1, :], np.float32)
        top2 = np.sort(last, -1)[:, -2:]
        margins.append(top2[:, 1] - top2[:, 0])
        nxt = np.argmax(last, -1)
        want.append(nxt)
        cur = np.concatenate([cur, nxt[:, None]], 1)
    want = np.stack(want, 1)
    margins = np.stack(margins, 1)
    toks_hp = generate(model, ids, max_new_tokens=5)
    assert_streams_equal_outside_ties(
        np.asarray(toks_hp), want, margins, min_compared=0.0
    )
    toks_mx = generate(model, ids, max_new_tokens=5, kv_cache_config=MXConfig("int8"))
    assert_streams_equal_outside_ties(
        np.asarray(toks_mx), want, margins, min_compared=0.0
    )


def test_mx_latent_cache_roundtrip():
    """MXMLACache write/read == quantize-dequantize of the written slices,
    at scalar and per-row positions; capacity bytes are ~8x under bf16 MHA."""
    from torchmx_tpu.mx_array import dequantize_mx, quantize_mx

    rng = np.random.RandomState(0)
    cache = MXMLACache.create(2, 32, 64, 32, "float8_e4m3", 32)
    lat = jnp.asarray(rng.randn(2, 4, 64), jnp.bfloat16)
    rot = jnp.asarray(rng.randn(2, 4, 32), jnp.bfloat16)
    cache = cache.write(lat, rot, 3)
    lat_r, rot_r = cache.read()
    s, q = quantize_mx(lat, "float8_e4m3", 32)
    want = dequantize_mx(q, s, "float8_e4m3", 32, jnp.bfloat16, 2)
    np.testing.assert_array_equal(
        np.asarray(lat_r[:, 3:7], np.float32), np.asarray(want, np.float32)
    )
    # Per-row positions (continuous batching).
    cache2 = cache.write(lat[:, :1], rot[:, :1], jnp.asarray([10, 20]))
    lat2, _ = cache2.read()
    np.testing.assert_array_equal(
        np.asarray(lat2[0, 10], np.float32), np.asarray(want[0, 0], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(lat2[1, 20], np.float32), np.asarray(want[1, 0], np.float32)
    )


def test_yarn_rope_matches_hf():
    """Our YaRN inverse frequencies and attention factor match HF's
    ``_compute_yarn_parameters`` (DeepSeek long-context convention:
    mscale == mscale_all_dim folds the factor into attention scaling)."""
    torch = pytest.importorskip("torch")
    from transformers.modeling_rope_utils import _compute_yarn_parameters

    from torchmx_tpu.models.llama import (
        compute_rope_inv_freq,
        rope_attention_scaling,
    )

    rs = {
        "rope_type": "yarn", "factor": 40.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "mscale": 1.0, "mscale_all_dim": 1.0,
        "original_max_position_embeddings": 64,
    }
    cfg = tiny_config(rope_scaling=rs, max_position_embeddings=2048)

    class _HFShim:
        rope_theta = cfg.rope_theta
        hidden_size = cfg.hidden_size
        num_attention_heads = cfg.num_attention_heads
        head_dim = cfg.qk_rope_head_dim
        max_position_embeddings = 2048
        rope_scaling = rs

    hf_inv, hf_att = _compute_yarn_parameters(_HFShim(), torch.device("cpu"))
    ours = np.asarray(compute_rope_inv_freq(cfg))
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)
    assert abs(rope_attention_scaling(cfg) - hf_att) < 1e-6
    # mscale_all_dim also folds mscale^2 into the attention scaling.
    attn = MLAAttention(cfg)
    import math
    want = (64 ** -0.5) * (0.1 * math.log(40.0) + 1.0) ** 2
    assert abs(attn.scaling - want) < 1e-9


def test_deepseek_surgery_and_mx_decode():
    """quantize_llm_ dispatches the MLA/MoE types; the quantized model
    decodes through the MX latent cache with internal stream/scan
    exactness; QKV-quantization configs are rejected with guidance."""
    from torchmx_tpu.layers.mx_deepseek_attention import (
        MXInferenceDeepseekV3MoE,
        MXInferenceMLAAttention,
    )
    from torchmx_tpu.layers.mx_llama_attention import MXInferenceLlamaMLP

    model = DeepseekV3ForCausalLM(tiny_config(), rngs=nnx.Rngs(2))
    lin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=lin), lin)
    layers = model.model.layers
    assert all(type(l.self_attn) is MXInferenceMLAAttention for l in layers)
    assert type(layers[0].mlp) is MXInferenceLlamaMLP  # dense first layer
    assert all(type(l.mlp) is MXInferenceDeepseekV3MoE for l in layers[1:])

    ids = jnp.asarray(np.random.RandomState(2).randint(0, 256, (1, 10)), jnp.int32)
    kv = MXConfig("int8")
    # Tie-aware: the scan and stream paths are different compilations of
    # the same math on a random-init model (see
    # test_absorbed_decode_matches_full_forward).
    from tests.test_parallel import assert_streams_equal_outside_ties

    ref, margins = _greedy_stream_with_margins(model, ids, 4, kv)
    toks = generate(model, ids, max_new_tokens=4, kv_cache_config=kv)
    toks_stream = generate(
        model, ids, max_new_tokens=4, kv_cache_config=kv, stream=True
    )
    assert_streams_equal_outside_ties(
        np.asarray(toks), ref, margins, min_compared=0.0
    )
    assert_streams_equal_outside_ties(
        np.asarray(toks_stream), ref, margins, min_compared=0.0
    )

    # QKV configs don't map onto latent-space contractions: reject loudly.
    model2 = DeepseekV3ForCausalLM(tiny_config(), rngs=nnx.Rngs(3))
    qkv = QAttentionConfig(
        projection_config=lin,
        query_config=MXConfig("float8_e4m3"),
        key_config=MXConfig("float8_e4m3"),
        value_config=MXConfig("float8_e4m3"),
        attention_weights_config=MXConfig("float8_e4m3"),
    )
    with pytest.raises(NotImplementedError, match="latent"):
        quantize_llm_(model2, qkv, lin)


def test_deepseek_serves_through_decode_engine():
    """DeepSeek end-to-end in the continuous-batching engine: MLA latent
    caches scatter per slot (the engine treats cache pytrees generically),
    per-row cache positions drive the absorbed decode, and the emitted
    streams match the stepwise reference tie-aware (the engine's per-row
    decode step is a different compilation of the same math)."""
    from tests.test_parallel import assert_streams_equal_outside_ties
    from torchmx_tpu.models.serve import DecodeEngine

    model = DeepseekV3ForCausalLM(tiny_config(), rngs=nnx.Rngs(0))
    rng = np.random.RandomState(5)
    prompts = [rng.randint(0, 256, (n,)).tolist() for n in (12, 7)]
    new_tokens = 5
    kv = MXConfig("int8")

    refs, margins = [], []
    for p in prompts:
        ids = jnp.asarray(np.asarray(p)[None], jnp.int32)
        r, m = _greedy_stream_with_margins(model, ids, new_tokens, kv)
        refs.append(r[0])
        margins.append(m[0])

    engine = DecodeEngine(model, max_batch=2, max_len=64, kv_cache_config=kv)
    slots = [engine.add(p) for p in prompts]
    got = {s: [] for s in slots}
    for _ in range(new_tokens):
        out = engine.step()
        for s, t in out.items():
            got[s].append(t)
    streams = np.stack([np.asarray(got[s][:new_tokens]) for s in slots])
    assert_streams_equal_outside_ties(
        streams, np.stack(refs), np.stack(margins), min_compared=0.0
    )
    # Slot reuse after release keeps serving (cache scatter fully replaces
    # the slot's latent rows).
    engine.release(slots[0])
    s2 = engine.add(prompts[1])
    assert engine.is_active(s2)
    assert engine.step()


def test_deepseek_grouped_moe_path():
    """The dropless grouped GEMM path serves the DeepSeek router too (the
    routing seam feeds the same expert machinery): argmax-stable vs the
    dense-exact path."""
    model = DeepseekV3ForCausalLM(tiny_config(num_hidden_layers=2), rngs=nnx.Rngs(4))
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 256, (2, 16)), jnp.int32)
    exact, _ = model(ids)
    for layer in model.model.layers:
        if isinstance(layer.mlp, DeepseekV3MoE):
            layer.mlp.grouped = True
            layer.mlp.grouped_tm = 8
    grouped, _ = model(ids)
    np.testing.assert_allclose(
        np.asarray(exact, np.float32), np.asarray(grouped, np.float32),
        atol=1e-1, rtol=1e-1,
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(exact[:, -1], -1)),
        np.asarray(jnp.argmax(grouped[:, -1], -1)),
    )


def test_deepseek_context_parallel_forward_matches_plain():
    """Round 4: a DeepSeek cacheless causal forward runs under
    context_parallel (previously NotImplementedError) — the expanded-form
    per-head K/V ride the standard ring from each device's local latent
    shard (dq != dv exercises the V-dim accumulator) — and matches the
    plain dense-mask forward.  All-dense layers (first_k_dense_replace=n):
    the subject is MLA attention under CP — routed-MoE top-k flips at
    near-tie scores between two compilations would only add noise here
    (the MoE seam is CP-agnostic token-wise math)."""
    from torchmx_tpu.parallel import create_mesh
    from torchmx_tpu.parallel.context import context_parallel
    from torchmx_tpu.parallel.mesh import MODEL_AXIS

    import jax

    model = DeepseekV3ForCausalLM(
        tiny_config(first_k_dense_replace=3), rngs=nnx.Rngs(31)
    )
    ids = jnp.asarray(
        np.random.RandomState(31).randint(0, 256, (2, 64)), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def plain(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(plain(state, ids), np.float32)
    mesh = create_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    with mesh, context_parallel(mesh, MODEL_AXIS):

        @jax.jit
        def cp(state, ids):
            logits, _ = nnx.merge(graphdef, state)(ids)
            return logits

        ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, MODEL_AXIS)))
        got = np.asarray(cp(state, ids_sh), np.float32)
    d = np.abs(got - ref)
    scale = ref.std()
    assert d.max() <= 0.1 * scale, (d.max(), scale)
    assert d.mean() <= 0.02 * scale, (d.mean(), scale)


def test_deepseek_scan_over_layers_matches_plain():
    """Round 4: scan-over-layers serves DeepSeek (the 61-layer V3 compile
    story).  Layers mix a dense-MLP prefix with MoE layers — same windows,
    different graphdefs — so the plan refines into structure runs; logits,
    cached greedy decode (MX latent caches), and the serving engine stream
    must match the plain per-layer model."""
    import pathlib
    import sys as _sys

    from torchmx_tpu import checkpoint as ckpt
    from torchmx_tpu.models.generate import generate
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM
    from torchmx_tpu.models.serve import DecodeEngine

    # The TRAINED MLA checkpoint: random-init MoE routing flips experts at
    # near-tie scores between two compilations (scan vs plain), turning
    # logit comparisons into coin flips; the trained router's margins are
    # decisive (same rationale as trained_tiny_quantized).
    root = pathlib.Path(__file__).resolve().parent.parent
    if str(root) not in _sys.path:
        _sys.path.insert(0, str(root))
    from tools.train_tiny_lm import PRESETS, load_corpus

    _, cfg = PRESETS["mla"]
    model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    model = ckpt.load_model(str(root / "artifacts" / "lm_mla"), model)
    corpus = load_corpus("lm_mla")
    scan_model = ScanLlamaForCausalLM.from_model(model)
    assert scan_model._plan[0] == "runs" and scan_model._plan[1] == [(0, 1), (1, 4)]

    ids = jnp.asarray(
        np.stack([corpus[i * 911 : i * 911 + 24] for i in range(2)]), jnp.int32
    )

    def logits_of(m):
        graphdef, state = nnx.split(m)

        import jax

        @jax.jit
        def fwd(state, ids):
            out, _ = nnx.merge(graphdef, state)(ids)
            return out

        return np.asarray(fwd(state, ids), np.float32)

    ref = logits_of(model)
    got = logits_of(scan_model)
    # Per-position gate with a routing-flip allowance: scan vs unrolled is
    # a recompilation — hidden-state ulp drift can flip the MoE top-k at
    # near-tie router scores on a few tokens (large but LEGAL logit
    # changes there); everywhere else the drift must stay at bf16 scale.
    d = np.abs(got - ref).max(-1)  # (b, s)
    tight = d <= 0.1 * ref.std()
    # Observed: flips cluster on EARLY positions (short context -> router
    # scores near-tie); an all-dense config matches everywhere at bf16
    # scale (max 0.023 vs std 0.71), pinning the loose positions on
    # routing, not the scan machinery.
    assert tight.mean() >= 0.8, (tight.mean(), d.max())
    assert np.median(d) <= 0.05 * ref.std()

    # And the MLA scan body itself is tight: all-dense layers, same seed
    # recipe, strict elementwise gate.
    dense = DeepseekV3ForCausalLM(
        tiny_config(first_k_dense_replace=3), rngs=nnx.Rngs(7)
    )
    dense_scan = ScanLlamaForCausalLM.from_model(dense)
    ids2 = jnp.asarray(
        np.random.RandomState(7).randint(0, 256, (2, 24)), jnp.int32
    )

    def logits2(m):
        graphdef, state = nnx.split(m)

        import jax

        @jax.jit
        def fwd(state, ids):
            out, _ = nnx.merge(graphdef, state)(ids)
            return out

        return np.asarray(fwd(state, ids2), np.float32)

    rd, gd = logits2(dense), logits2(dense_scan)
    assert np.abs(gd - rd).max() <= 0.1 * rd.std()

    # Cached greedy decode through the MX LATENT caches, tie-aware (the
    # same flip allowance at the stream level).
    from tests.test_parallel import assert_streams_equal_outside_ties

    prompt = jnp.asarray(np.asarray(corpus[5000:5012])[None], jnp.int32)
    kv = MXConfig("int8")
    refs, margins = _greedy_stream_with_margins(model, prompt, 6, kv)
    toks = np.asarray(
        generate(scan_model, prompt, max_new_tokens=6, kv_cache_config=kv)
    )[:, -6:]
    assert_streams_equal_outside_ties(
        toks, refs, margins, min_compared=0.0
    )

    # Serving engine: stacked latent caches scatter per slot (slot axis 1).
    p = [int(t) for t in corpus[7000:7009]]

    def run(m):
        eng = DecodeEngine(m, max_batch=2, max_len=64, kv_cache_config=kv)
        slot = eng.add(p)
        toks = []
        while len(toks) < 5:
            out = eng.step()
            if slot in out:
                toks.append(out[slot])
        return toks

    e_ref, e_margins = _greedy_stream_with_margins(
        model, jnp.asarray(np.asarray(p)[None], jnp.int32), 5, kv
    )
    assert_streams_equal_outside_ties(
        np.asarray(run(scan_model))[None], e_ref, e_margins, min_compared=0.0
    )


def test_engine_ring_rejected_for_deepseek():
    """DecodeEngine(ring=True) on DeepSeek fails with the clean
    full-causal/sliding-window message (capability surfaced at construction,
    not as a deep kernel error; model.generate(ring_cache=True) raises the
    matching init_cache guard)."""
    import pytest as _pytest

    from torchmx_tpu.models.serve import DecodeEngine

    model = DeepseekV3ForCausalLM(tiny_config(num_hidden_layers=1),
                                  rngs=nnx.Rngs(9))
    with _pytest.raises(ValueError, match="sliding-window"):
        DecodeEngine(model, max_batch=1, max_len=64, ring=True,
                     kv_cache_config=MXConfig("int8"))
    with _pytest.raises(NotImplementedError, match="full-causal"):
        model.init_cache(1, 64, MXConfig("int8"), ring=True)
