"""Parallelism tests on the virtual 8-device CPU mesh (the reference has no
distributed code at all — SURVEY §2.3; these cover the TPU-build's GSPMD
TP/DP sharding of packed MX payloads + scales)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.parallel import DATA_AXIS, MODEL_AXIS, create_mesh, input_sharding, shard_model
from torchmx_tpu.parallel.mesh import spec_for_path
from torchmx_tpu.quant_api import quantize_llm_


def tiny_model(seed=0):
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed)), cfg


def quantize(model, elem="float8_e4m3"):
    qlin = QLinearConfig(
        weights_config=MXConfig(elem), activations_config=MXConfig("float8_e4m3")
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    return model


def test_create_mesh_shapes():
    assert len(jax.devices()) == 8
    m = create_mesh()
    assert m.devices.shape == (1, 8) and m.axis_names == (DATA_AXIS, MODEL_AXIS)
    m2 = create_mesh((2, 4))
    assert m2.devices.shape == (2, 4)
    with pytest.raises(AssertionError):
        create_mesh((3, 3))


def test_spec_for_path_rules():
    # Column-parallel plain weight (out, in).
    assert spec_for_path("layers.0.self_attn.q_proj.weight", 2) == P(MODEL_AXIS, None)
    # Row-parallel plain weight.
    assert spec_for_path("layers.0.self_attn.o_proj.weight", 2) == P(None, MODEL_AXIS)
    # MXArray weights (K-major storage): transposed spec, payload and scale alike.
    assert spec_for_path("layers.0.self_attn.q_proj.weight.value", 2, is_mx=True) == P(None, MODEL_AXIS)
    assert spec_for_path("layers.0.mlp.down_proj.weight.value", 2, is_mx=True) == P(MODEL_AXIS, None)
    # Norms replicated.
    assert spec_for_path("layers.0.input_layernorm.weight", 1) == P(None)


def test_mx_payload_scale_shard_congruently():
    model, _ = tiny_model()
    quantize(model)
    w0 = model.model.layers[0].self_attn.q_proj.weight.get_value()
    data_before = np.asarray(w0.data).copy()
    scale_before = np.asarray(w0.scale_e8m0).copy()
    mesh = create_mesh()
    shard_model(model, mesh)
    w = model.model.layers[0].self_attn.q_proj.weight.get_value()
    assert isinstance(w, MXArray)
    data_spec = w.data.sharding.spec
    scale_spec = w.scale_e8m0.sharding.spec
    assert data_spec == scale_spec == P(None, MODEL_AXIS)
    # Shard shapes stay block-aligned: scale dim == payload dim / 32 per shard.
    assert w.data.shape[1] % 8 == 0
    # Sharding is a layout operation: payload and scale BITS are unchanged
    # (the quantized weights are never re-quantized when distributed).
    np.testing.assert_array_equal(np.asarray(w.data), data_before)
    np.testing.assert_array_equal(np.asarray(w.scale_e8m0), scale_before)


def test_tp_column_parallel_linear_bit_exact():
    """A column-parallel MXInferenceLinear under TP is bit-identical to the
    unsharded layer: x is replicated and each device contracts the full K
    with its N-shard — no cross-device reduction exists to reorder."""
    from jax.sharding import NamedSharding

    from torchmx_tpu.layers.linear import MXInferenceLinear

    qcfg = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 128) * 0.3, jnp.bfloat16)  # (out, in)
    x = jnp.asarray(rng.randn(16, 128) * 0.5, jnp.bfloat16)
    lin = MXInferenceLinear.from_weights(w, None, qcfg)
    y_ref = np.asarray(lin(x), np.float32)

    mesh = create_mesh()
    sh = NamedSharding(mesh, P(None, MODEL_AXIS))  # K-major payload: N on model
    lin.weight.set_value(
        jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), lin.weight.get_value())
    )
    graphdef, state = nnx.split(lin)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    with mesh:
        y_tp = np.asarray(fwd(state, x), np.float32)
    np.testing.assert_array_equal(y_tp, y_ref)


def test_tp_row_parallel_linear_matches_shard_ordered_sum():
    """A row-parallel (K-sharded) MXInferenceLinear must equal the explicit
    TP simulation: per-shard fp32 partial dots summed in shard order."""
    from jax.sharding import NamedSharding

    from torchmx_tpu.layers.linear import MXInferenceLinear
    from torchmx_tpu.ops import mx_fake_quantize

    qcfg = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(128, 256) * 0.3, jnp.bfloat16)  # (out, in=K)
    x = jnp.asarray(rng.randn(16, 256) * 0.5, jnp.bfloat16)
    lin = MXInferenceLinear.from_weights(w, None, qcfg)
    w_mx = lin.weight.get_value()  # K-major (256, 128), scale (8, 128)

    mesh = create_mesh()
    sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    lin.weight.set_value(jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), w_mx))
    graphdef, state = nnx.split(lin)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    with mesh:
        y_tp = np.asarray(fwd(state, x), np.float32)

    x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    w_hp = w_mx.to_dtype(jnp.bfloat16)
    ks = 256 // 8
    acc = None
    for s in range(8):
        p = jnp.matmul(
            x_fq[:, s * ks : (s + 1) * ks],
            w_hp[s * ks : (s + 1) * ks],
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    sim = np.asarray(acc.astype(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(y_tp, sim)


def test_tp_sharded_quantized_forward_matches_replicated():
    """The TP-sharded full-model forward is BIT-IDENTICAL to the replicated
    jit forward: quantized weights shard without requantization, column-
    parallel shards contract the full K locally, and the row-parallel psum
    reproduces the same fp32 sums on this input.  (The comparison must be
    jit-vs-jit: eager XLA fuses differently and can flip activation-RNE
    rounding decisions — that drift is fusion, not TP.)"""
    model, _ = tiny_model()
    quantize(model)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 16)), jnp.int32)
    graphdef0, state0 = nnx.split(model)

    @jax.jit
    def fwd_rep(state, ids):
        logits, _ = nnx.merge(graphdef0, state)(ids)
        return logits

    ref_logits = np.asarray(fwd_rep(state0, ids), np.float32)

    mesh = create_mesh()  # pure TP over 8 devices
    shard_model(model, mesh)
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    with mesh:
        tp_logits = np.asarray(fwd(state, ids), np.float32)
    np.testing.assert_array_equal(tp_logits, ref_logits)


def test_dp_batch_sharded_forward_matches_replicated():
    model, _ = tiny_model(seed=1)
    quantize(model)
    mesh = create_mesh((8, 1))
    shard_model(model, mesh)
    graphdef, state = nnx.split(model)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (8, 16)), jnp.int32)

    @jax.jit
    def fwd(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = fwd(state, ids)  # same executable class, replicated input
    with mesh:
        ids_sharded = jax.device_put(ids, input_sharding(mesh))
        out = fwd(state, ids_sharded)
    # Batch rows are independent under DP: bit-identical to the replicated
    # jit run.
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


def test_qat_train_step_on_2x4_mesh():
    from torchmx_tpu.train import make_qat_train_step

    model, cfg = tiny_model(seed=2)
    mesh = create_mesh((2, 4))
    with mesh:
        shard_model(model, mesh)
        qlin = QLinearConfig(
            weights_config=MXConfig("float8_e4m3"),
            activations_config=MXConfig("float8_e4m3"),
        )
        train_step, state, opt_state, _ = make_qat_train_step(model, qlin)
        step = jax.jit(train_step)
        batch = jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P(DATA_AXIS, None))
        )
        state, opt_state, loss = step(state, opt_state, batch, batch)
        assert np.isfinite(float(loss))
        # Second step reuses the executable (no recompilation crash) and
        # changes the loss.
        state, opt_state, loss2 = step(state, opt_state, batch, batch)
        assert np.isfinite(float(loss2)) and float(loss2) != float(loss)


def test_multihost_single_process_fallbacks():
    """Single-process environment: initialize is a no-op, the hybrid mesh
    degenerates to the local (data, model) mesh."""
    from torchmx_tpu.parallel import multihost

    assert multihost.initialize() == 1
    mesh = multihost.create_hybrid_mesh(model_parallelism=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    mesh_tp = multihost.create_hybrid_mesh()  # all-local TP
    assert mesh_tp.devices.shape == (1, 8)
    assert multihost.process_local_batch(16) == 16


def test_pipeline_apply_matches_sequential():
    """GPipe stage rotation must equal sequential stage application, for
    plain and MX-quantized stage weights."""
    from torchmx_tpu.parallel.pipeline import pipeline_apply
    from torchmx_tpu.ops import mx_linear

    mesh = create_mesh()  # (1, 8): 8 pipeline stages on the model axis
    S, d, b = 8, 64, 16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(S, d, d) * 0.3, jnp.bfloat16)
    x = jnp.asarray(rng.randn(b, d), jnp.bfloat16)

    def stage(params, x):
        return jax.nn.gelu(
            jnp.matmul(x, params.T, preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)

    ref = x
    for s in range(S):
        ref = stage(w[s], ref)

    with mesh:
        out = pipeline_apply(stage, w, x, mesh, n_microbatches=4)
    # XLA fuses the scan body differently from the eager reference: allow
    # 1-ulp bf16 drift.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2
    )

    # MX-quantized stage weights: stacked payload/scale arrays, MXArray
    # rebuilt per stage inside the stage fn (per-stage slicing changes ndim,
    # so the static metadata is reapplied there).
    w_mx = MXArray.to_mx(w, "float8_e4m3", 32)
    packed = {"scale": w_mx.scale_e8m0, "data": w_mx.data}

    def stage_mx(params, x):
        w_s = MXArray(
            params["scale"], params["data"], "float8_e4m3", 32, jnp.bfloat16
        )
        return jax.nn.gelu(
            mx_linear(x, w_s, out_dtype=jnp.float32)
        ).astype(jnp.bfloat16)

    ref = x
    for s in range(S):
        ref = stage_mx({"scale": w_mx.scale_e8m0[s], "data": w_mx.data[s]}, ref)

    with mesh:
        out = pipeline_apply(stage_mx, packed, x, mesh, n_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2
    )


def _assert_greedy_tokens_match(got, ref, min_compared=0.6):
    """Per-position greedy-token equality between two COMPILATIONS of the
    same math (see _TIE_MARGIN): positions whose sequential top-2 margin is
    below the drift bound are excluded (argmax there is decided by legal
    rounding differences), everything else must match exactly."""
    srt = np.sort(ref, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    confident = margin >= _TIE_MARGIN
    assert confident.mean() >= min_compared, (
        f"only {confident.mean():.0%} of positions have confident margins"
    )
    np.testing.assert_array_equal(
        got.argmax(-1)[confident], ref.argmax(-1)[confident]
    )


def test_pipeline_model_matches_sequential():
    """Full-model PP: LlamaForCausalLM staged over the model axis must match
    the sequential jit forward — greedy tokens EQUAL at every confident
    position (trained checkpoint), logits tight elementwise."""
    from torchmx_tpu.parallel import pipeline_model

    model, cfg, corpus = trained_tiny_quantized()
    ids = jnp.asarray(
        np.stack([corpus[i * 773 : i * 773 + 16] for i in range(8)]), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def seq(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(seq(state, ids), np.float32)

    mesh = create_mesh((4, 2))  # 2 stages of 2 layers each (data axis unused)
    fwd, params = pipeline_model(model, mesh, n_microbatches=4)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        got = np.asarray(jax.jit(fwd)(params, ids), np.float32)
    _assert_greedy_tokens_match(got, ref)
    # Secondary: elementwise drift stays at quantization-grid level (one
    # activation fq bin flip from re-jit ulp drift moves a logit by up to
    # ~0.3 sigma on this stack; the token gate above is the primary).
    d = np.abs(got - ref)
    # Secondary statistical bound (the PRIMARY gate above is greedy-token
    # equality): bf16 fusion-order drift between the staged and sequential
    # compilations; 0.5*std absorbs ulp-level changes in the attention
    # scale (x * (1/sqrt(d)), the HF order) without hiding real breaks.
    assert d.max() <= 0.5 * ref.std(), (d.max(), ref.std())
    assert d.mean() <= 0.05 * ref.std(), (d.mean(), ref.std())


def test_pipeline_model_composes_with_dp():
    from torchmx_tpu.parallel import pipeline_model

    model, cfg, corpus = trained_tiny_quantized()
    ids = jnp.asarray(
        np.stack([corpus[i * 881 : i * 881 + 16] for i in range(8)]), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def seq(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(seq(state, ids), np.float32)

    mesh = create_mesh((4, 2))  # DP=4 x PP=2
    fwd, params = pipeline_model(
        model, mesh, n_microbatches=2, data_axis=DATA_AXIS
    )
    with mesh:
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P(MODEL_AXIS))),
            params["staged"],
        )
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        got = np.asarray(jax.jit(fwd)(params, ids), np.float32)
    _assert_greedy_tokens_match(got, ref)
    d = np.abs(got - ref)
    # Secondary statistical bound (the PRIMARY gate above is greedy-token
    # equality): bf16 fusion-order drift between the staged and sequential
    # compilations; 0.5*std absorbs ulp-level changes in the attention
    # scale (x * (1/sqrt(d)), the HF order) without hiding real breaks.
    assert d.max() <= 0.5 * ref.std(), (d.max(), ref.std())
    assert d.mean() <= 0.05 * ref.std(), (d.mean(), ref.std())


def test_tp_sharded_decode_engine_matches_replicated():
    """The continuous-batching DecodeEngine runs a TP-sharded quantized
    model unchanged (multi-chip serving): greedy tokens match the
    unsharded engine exactly (TP logits are bit-identical jit-vs-jit, so
    the argmax stream is too)."""
    from torchmx_tpu.models.serve import DecodeEngine

    prompt = np.random.RandomState(7).randint(0, 256, (6,)).tolist()

    ref_model, _ = tiny_model(seed=3)
    quantize(ref_model)
    ref_engine = DecodeEngine(ref_model, max_batch=2, max_len=32)
    s0 = ref_engine.add(prompt)
    ref_tokens = []
    while len(ref_tokens) < 8 and ref_engine.is_active(s0):
        out = ref_engine.step()
        if s0 in out:
            ref_tokens.append(out[s0])

    tp_model, _ = tiny_model(seed=3)
    quantize(tp_model)
    mesh = create_mesh()  # pure TP over 8 devices
    shard_model(tp_model, mesh)
    with mesh:
        engine = DecodeEngine(tp_model, max_batch=2, max_len=32)
        s1 = engine.add(prompt)
        tp_tokens = []
        while len(tp_tokens) < 8 and engine.is_active(s1):
            out = engine.step()
            if s1 in out:
                tp_tokens.append(out[s1])
    assert tp_tokens == ref_tokens and len(tp_tokens) == 8


def test_dp_sharded_decode_engine_matches_replicated():
    """DecodeEngine with slot-axis-sharded caches over the data axis (DP
    serving): slot rows are independent, so tokens match the unsharded
    engine exactly."""
    from torchmx_tpu.models.serve import DecodeEngine

    prompt = np.random.RandomState(11).randint(0, 256, (5,)).tolist()

    ref_model, _ = tiny_model(seed=4)
    quantize(ref_model)
    ref_engine = DecodeEngine(ref_model, max_batch=8, max_len=32)
    s0 = ref_engine.add(prompt)
    ref_tokens = []
    while len(ref_tokens) < 8 and ref_engine.is_active(s0):
        out = ref_engine.step()
        if s0 in out:
            ref_tokens.append(out[s0])

    dp_model, _ = tiny_model(seed=4)
    quantize(dp_model)
    mesh = create_mesh((8, 1))  # pure DP
    shard_model(dp_model, mesh)  # replicated weights under pure DP
    engine = DecodeEngine(dp_model, max_batch=8, max_len=32, mesh=mesh)
    s1 = engine.add(prompt)
    # A second concurrent request on a different shard's slot group.
    s2 = engine.add(prompt[::-1])
    dp_tokens = []
    while len(dp_tokens) < 8 and engine.is_active(s1):
        out = engine.step()
        if s1 in out:
            dp_tokens.append(out[s1])
    assert dp_tokens == ref_tokens and len(dp_tokens) == 8
    assert engine.is_active(s2)


def test_dp_tp_hybrid_decode_engine_matches_replicated():
    """DP x TP serving composition: TP-sharded weights AND slot-axis-sharded
    caches on a (2, 4) mesh; tokens still match the unsharded engine."""
    from torchmx_tpu.models.serve import DecodeEngine

    prompt = np.random.RandomState(13).randint(0, 256, (6,)).tolist()

    ref_model, _ = tiny_model(seed=5)
    quantize(ref_model)
    ref_engine = DecodeEngine(ref_model, max_batch=4, max_len=32)
    s0 = ref_engine.add(prompt)
    ref_tokens = []
    while len(ref_tokens) < 6 and ref_engine.is_active(s0):
        out = ref_engine.step()
        if s0 in out:
            ref_tokens.append(out[s0])

    hy_model, _ = tiny_model(seed=5)
    quantize(hy_model)
    mesh = create_mesh((2, 4))  # DP=2 x TP=4
    shard_model(hy_model, mesh)
    with mesh:
        engine = DecodeEngine(hy_model, max_batch=4, max_len=32, mesh=mesh)
        s1 = engine.add(prompt)
        hy_tokens = []
        while len(hy_tokens) < 6 and engine.is_active(s1):
            out = engine.step()
            if s1 in out:
                hy_tokens.append(out[s1])
    assert hy_tokens == ref_tokens and len(hy_tokens) == 6


def _greedy_stream_sequential(model, prompt, new_tokens, kv_cfg, max_len):
    """Greedy reference: explicit cached prefill + per-token steps (the same
    call pattern the pipeline fwd uses).  Returns (stream, margins) where
    ``margins[b, t]`` is the top-2 logit gap behind token ``stream[b, t]``."""
    graphdef, state = nnx.split(model)
    caches = model.init_cache(prompt.shape[0], max_len, kv_cfg)

    @jax.jit
    def call(state, caches, ids, position_ids, cache_position):
        m = nnx.merge(graphdef, state)
        return m(
            ids,
            attention_mask=None,
            position_ids=position_ids,
            caches=caches,
            cache_position=cache_position,
        )

    def _margin(logits):
        top2 = jax.lax.top_k(logits.astype(jnp.float32), 2)[0]
        return np.asarray(top2[:, 0] - top2[:, 1])

    b, s = prompt.shape
    logits, caches = call(
        state, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
    )
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    stream, margins = [np.asarray(tok)], [_margin(logits[:, -1, :])]
    for i in range(new_tokens - 1):
        pos = jnp.full((b,), s + i, jnp.int32)
        logits, caches = call(state, caches, tok[:, None], pos[:, None], pos)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream.append(np.asarray(tok))
        margins.append(_margin(logits[:, -1, :]))
    return np.stack(stream, axis=1), np.stack(margins, axis=1)  # (b, T) each


#: Greedy streams from two DIFFERENT compilations of the same math (pipeline
#: schedule vs sequential jit) are compared tie-aware: re-jit legally moves
#: f32->bf16 rounding points (measured logit drift ~0.1 on the tiny stack),
#: so a row may diverge only at a step whose top-2 margin is below this
#: bound; from there its inputs legitimately differ and comparison stops.
#: Any mismatch at a confident margin is a real schedule bug and fails.
#: (Same-program replicas — the TP/DP engine tests — assert exact streams.)
_TIE_MARGIN = 0.5


def assert_streams_equal_outside_ties(got, ref, margins, min_compared=0.6):
    b, T = ref.shape
    compared = 0
    for r in range(b):
        for t in range(T):
            if got[r, t] != ref[r, t]:
                assert margins[r, t] < _TIE_MARGIN, (
                    f"row {r} diverged at step {t} with a confident margin "
                    f"{margins[r, t]:.3f} (>= {_TIE_MARGIN}): schedule bug, "
                    f"not rounding.  got {got[r, t]} != ref {ref[r, t]}"
                )
                break
            compared += 1
    assert compared >= min_compared * b * T, (
        f"only {compared}/{b * T} stream positions were comparable — the "
        f"gate lost its teeth (model margins too small?)"
    )


def trained_tiny_quantized(elem="float8_e4m3", quantize=True):
    """The committed trained 6M checkpoint (artifacts/tiny_lm), MX-quantized.

    Token-stream equality gates need CONFIDENT logit margins: a random-init
    model's near-flat logits flip argmax on the bf16-ulp drift any re-jit
    (microbatch boundaries, scan fusion) legally introduces, making "streams
    equal" a coin flip rather than a correctness statement.  The trained LM
    predicts repo text with decisive margins, so stream equality is a real
    schedule-correctness gate.

    ``quantize=False`` returns the bf16 checkpoint unmodified — for gates
    where per-layer fake-quantization would amplify legal cross-compilation
    drift into quantization-bin flips (see the PP×TP decode test)."""
    import pathlib
    import sys as _sys

    root = pathlib.Path(__file__).resolve().parent.parent
    if str(root) not in _sys.path:
        _sys.path.insert(0, str(root))
    from tools.train_tiny_lm import CONFIG, load_corpus

    from torchmx_tpu import checkpoint as ckpt

    model = LlamaForCausalLM(CONFIG, rngs=nnx.Rngs(0))
    model = ckpt.load_model(str(root / "artifacts" / "tiny_lm"), model)
    tokens = load_corpus()
    if not quantize:
        return model, CONFIG, tokens
    # int8 activations: per-step activation fake-quantization AMPLIFIES
    # cross-compilation ulp drift to a full quantization step (fp8: ~6% of
    # the value); the int8 grid keeps that amplification ~8x smaller so the
    # tie-aware stream gate keeps a tight margin bound.
    qlin = QLinearConfig(
        weights_config=MXConfig(elem), activations_config=MXConfig("int8")
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    return model, CONFIG, tokens


@pytest.mark.parametrize("kv", [None, "float8_e4m3"])
def test_pipeline_decode_token_stream_matches_sequential(kv):
    """PP decode (round 3): cached prefill + token steps through the staged
    pipeline — per-stage KV caches sharded over the model axis (MX formats
    included) — must produce greedy token streams EQUAL to the sequential
    model's (trained checkpoint: decisive margins make this a schedule gate,
    see trained_tiny_quantized)."""
    from torchmx_tpu.parallel import pipeline_decode_model

    model, cfg, corpus = trained_tiny_quantized()
    kv_cfg = MXConfig(kv) if kv else None
    b, s, new_tokens, max_len = 8, 32, 8, 64
    prompt = jnp.asarray(
        np.stack([corpus[i * 997 : i * 997 + s] for i in range(b)]), jnp.int32
    )
    ref, margins = _greedy_stream_sequential(model, prompt, new_tokens, kv_cfg, max_len)

    mesh = create_mesh((4, 2))  # 2 stages x 2 layers
    fwd, params, init_caches = pipeline_decode_model(model, mesh, n_microbatches=2)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        # Checkpoint-restored leaves are committed to one device; replicate
        # the non-staged params over the mesh explicitly.
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        caches = init_caches(b, max_len, kv_cfg)
        caches = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P(MODEL_AXIS))), caches
        )
        fwd_j = jax.jit(fwd, donate_argnums=(1,))
        logits, caches = fwd_j(
            params, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
        )
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream = [np.asarray(tok)]
        for i in range(new_tokens - 1):
            pos = jnp.full((b,), s + i, jnp.int32)
            logits, caches = fwd_j(params, caches, tok[:, None], pos[:, None], pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            stream.append(np.asarray(tok))
    got = np.stack(stream, axis=1)
    assert_streams_equal_outside_ties(got, ref, margins)


def test_pipeline_decode_composes_with_dp():
    """PP x DP decode: microbatch rows shard over the data axis, per-stage
    caches shard congruently; token streams stay equal."""
    from torchmx_tpu.parallel import pipeline_decode_model

    model, cfg, corpus = trained_tiny_quantized()
    kv_cfg = MXConfig("float8_e4m3")
    b, s, new_tokens, max_len = 8, 32, 4, 64
    prompt = jnp.asarray(
        np.stack([corpus[i * 1499 : i * 1499 + s] for i in range(b)]), jnp.int32
    )
    ref, margins = _greedy_stream_sequential(model, prompt, new_tokens, kv_cfg, max_len)

    mesh = create_mesh((4, 2))  # DP=4 x PP=2
    fwd, params, init_caches = pipeline_decode_model(
        model, mesh, n_microbatches=2, data_axis=DATA_AXIS
    )
    with mesh:
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P(MODEL_AXIS))),
            params["staged"],
        )
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        caches = init_caches(b, max_len, kv_cfg)
        caches = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(MODEL_AXIS, None, DATA_AXIS))
            ),
            caches,
        )
        fwd_j = jax.jit(fwd, donate_argnums=(1,))
        logits, caches = fwd_j(
            params, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
        )
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream = [np.asarray(tok)]
        for i in range(new_tokens - 1):
            pos = jnp.full((b,), s + i, jnp.int32)
            logits, caches = fwd_j(params, caches, tok[:, None], pos[:, None], pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            stream.append(np.asarray(tok))
    got = np.stack(stream, axis=1)
    assert_streams_equal_outside_ties(got, ref, margins)


def _pp_tp_mesh():
    """(pipe=2, model=4): PP stages rotate manually over ``pipe`` while the
    Megatron TP rules (which name the ``model`` axis) shard the within-stage
    math — GSPMD inserts the TP collectives because ``model`` is left as a
    shard_map auto axis."""
    devs = np.asarray(jax.devices()).reshape(2, 4)
    return jax.sharding.Mesh(devs, ("pipe", MODEL_AXIS))


def test_pipeline_model_composes_with_tp():
    """PP×TP: stage rotation on the manual ``pipe`` axis with within-stage
    math GSPMD-sharded over ``model`` must match the sequential forward —
    greedy tokens equal at confident positions."""
    from torchmx_tpu.parallel.pipeline import pipeline_model, shard_staged_params

    model, cfg, corpus = trained_tiny_quantized()
    ids = jnp.asarray(
        np.stack([corpus[i * 773 : i * 773 + 16] for i in range(8)]), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def seq(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(seq(state, ids), np.float32)

    mesh = _pp_tp_mesh()
    fwd, params = pipeline_model(
        model, mesh, n_microbatches=4, axis="pipe", tp_axis=MODEL_AXIS
    )
    with mesh:
        params["staged"] = shard_staged_params(
            params["staged"], mesh, "pipe", MODEL_AXIS
        )
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        got = np.asarray(jax.jit(fwd)(params, ids), np.float32)
    # The gate has teeth only if TP sharding actually landed: at least one
    # staged 2-D weight must carry the model axis in its spec.
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(params["staged"])
        if hasattr(leaf, "sharding")
    ]
    assert any(MODEL_AXIS in [ax for ax in sp if ax] for sp in specs), specs
    _assert_greedy_tokens_match(got, ref)


def test_pipeline_decode_composes_with_tp():
    """PP×TP cached decode: token steps through the staged pipeline with
    TP-sharded stage weights must reproduce the sequential greedy stream.

    Uses the UNQUANTIZED trained checkpoint: the schedule/sharding under
    test is identical either way, but per-layer fake-quantization amplifies
    the legal cross-compilation ulp drift of the partial-auto shard_map body
    into quantization-bin flips (measured: logit drift 0.047 unquantized vs
    1.66 MX-quantized on this stack), which would turn the exact stream gate
    into a statistical one.  MX cache formats under PP are covered by the
    manual-axes decode tests above."""
    from torchmx_tpu.parallel.pipeline import (
        pipeline_decode_model,
        shard_staged_params,
    )

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    b, s, new_tokens, max_len = 8, 32, 8, 64
    prompt = jnp.asarray(
        np.stack([corpus[i * 997 : i * 997 + s] for i in range(b)]), jnp.int32
    )
    ref, margins = _greedy_stream_sequential(model, prompt, new_tokens, None, max_len)

    mesh = _pp_tp_mesh()
    fwd, params, init_caches = pipeline_decode_model(
        model, mesh, n_microbatches=2, axis="pipe", tp_axis=MODEL_AXIS
    )
    with mesh:
        params["staged"] = shard_staged_params(
            params["staged"], mesh, "pipe", MODEL_AXIS
        )
        repl = NamedSharding(mesh, P())
        for k in ("embed", "norm", "head", "inv_freq"):
            if params[k] is not None:
                params[k] = jax.tree.map(lambda a: jax.device_put(a, repl), params[k])
        caches = init_caches(b, max_len, None)
        caches = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))), caches
        )
        fwd_j = jax.jit(fwd, donate_argnums=(1,))
        logits, caches = fwd_j(
            params, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
        )
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream = [np.asarray(tok)]
        for i in range(new_tokens - 1):
            pos = jnp.full((b,), s + i, jnp.int32)
            logits, caches = fwd_j(params, caches, tok[:, None], pos[:, None], pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            stream.append(np.asarray(tok))
    got = np.stack(stream, axis=1)
    assert_streams_equal_outside_ties(got, ref, margins)


def test_pipeline_decode_mixed_periodic_windows():
    """Gemma2-shaped alternating sliding/full layers through PP decode: the
    stage body unrolls the period-2 sub-bodies (each graphdef pinning its
    static window) per scan step, per-stage caches keep local layer-major
    order, and greedy token streams match the sequential model tie-aware.
    Prefill logits are additionally gated with a bf16-scale tolerance — a
    margin-free correctness check on the random-init model (a WRONG window
    assignment shifts logits by O(1), far past this band)."""
    from tests.test_scan_model import mixed_model
    from torchmx_tpu.models.llama import plan_layer_bodies
    from torchmx_tpu.parallel import pipeline_decode_model

    model = mixed_model(["sliding_attention", "full_attention"] * 2, seed=11)
    assert plan_layer_bodies(model.config) == ("period", 2)
    b, s, new_tokens, max_len = 4, 24, 6, 64
    prompt = jnp.asarray(
        np.random.RandomState(11).randint(0, 128, (b, s)), jnp.int32
    )
    from tests.test_scan_model import _jit_logits

    ref_logits = _jit_logits(model, prompt)
    ref, margins = _greedy_stream_sequential(model, prompt, new_tokens, None, max_len)

    mesh = create_mesh((4, 2))  # 2 stages x 2 layers (one period-2 group each)
    fwd, params, init_caches = pipeline_decode_model(model, mesh, n_microbatches=2)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        caches = init_caches(b, max_len, None)
        caches = jax.tree.map(lambda a: jax.device_put(a, staged_sh), caches)
        fwd_j = jax.jit(fwd, donate_argnums=(1,))
        logits, caches = fwd_j(
            params, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
        )
        from tests.test_scan_model import _assert_close

        _assert_close(np.asarray(logits, np.float32), ref_logits)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream = [np.asarray(tok)]
        for i in range(new_tokens - 1):
            pos = jnp.full((b,), s + i, jnp.int32)
            logits, caches = fwd_j(params, caches, tok[:, None], pos[:, None], pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            stream.append(np.asarray(tok))
    got = np.stack(stream, axis=1)
    assert_streams_equal_outside_ties(got, ref, margins, min_compared=0.0)


def test_pipeline_decode_aperiodic_mix():
    """Qwen2-style run gating (windowed prefix + full suffix; round 5 —
    previously raised) through PP decode: the stage body lax.switches one
    compiled body per attention KIND on a stage-sharded kind index, so
    stages need not align with run boundaries.  The [s, s, s, f] split over
    2 stages puts BOTH kinds inside stage 1 — the non-aligned case.  Greedy
    token streams match the sequential model tie-aware; prefill logits
    gated with the bf16-scale tolerance."""
    from tests.test_scan_model import _assert_close, _jit_logits, mixed_model
    from torchmx_tpu.models.llama import plan_layer_bodies
    from torchmx_tpu.parallel import pipeline_decode_model

    model = mixed_model(
        ["sliding_attention"] * 3 + ["full_attention"], seed=12
    )
    assert plan_layer_bodies(model.config)[0] == "runs"
    b, s, new_tokens, max_len = 4, 24, 6, 64
    prompt = jnp.asarray(
        np.random.RandomState(12).randint(0, 128, (b, s)), jnp.int32
    )
    ref_logits = _jit_logits(model, prompt)
    ref, margins = _greedy_stream_sequential(model, prompt, new_tokens, None, max_len)

    mesh = create_mesh((4, 2))  # 2 stages x 2 layers; stage 1 mixes kinds
    fwd, params, init_caches = pipeline_decode_model(model, mesh, n_microbatches=2)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        caches = init_caches(b, max_len, None)
        caches = jax.tree.map(lambda a: jax.device_put(a, staged_sh), caches)
        fwd_j = jax.jit(fwd, donate_argnums=(1,))
        logits, caches = fwd_j(
            params, caches, prompt, jnp.arange(s)[None, :], jnp.zeros((b,), jnp.int32)
        )
        _assert_close(np.asarray(logits, np.float32), ref_logits)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        stream = [np.asarray(tok)]
        for i in range(new_tokens - 1):
            pos = jnp.full((b,), s + i, jnp.int32)
            logits, caches = fwd_j(params, caches, tok[:, None], pos[:, None], pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            stream.append(np.asarray(tok))
    got = np.stack(stream, axis=1)
    assert_streams_equal_outside_ties(got, ref, margins, min_compared=0.0)


def test_pipeline_model_aperiodic_mix():
    """The full-forward pipeline on the same run-gated config (round 5 —
    previously raised): per-layer kind switch with one static mask per
    kind; staged logits match the sequential model's and the window bites."""
    from tests.test_scan_model import _assert_close, mixed_model
    from torchmx_tpu.parallel import pipeline_model

    model = mixed_model(
        ["sliding_attention"] * 3 + ["full_attention"], seed=52
    )
    ids = jnp.asarray(
        np.random.RandomState(52).randint(0, 128, (4, 24)), jnp.int32
    )
    ref, _ = model(ids)
    mesh = create_mesh((4, 2))
    fwd, params = pipeline_model(model, mesh, n_microbatches=2)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        out = jax.jit(fwd)(params, ids)
    _assert_close(np.asarray(out, np.float32), np.asarray(ref, np.float32))
    # And the window must bite: a windowless clone diverges.
    full = mixed_model(["full_attention"] * 4, seed=52)
    full_ref, _ = full(ids)
    assert float(jnp.max(jnp.abs(full_ref - ref))) > 0.05


def test_pipeline_decode_rejects_structure_mix():
    """A layer-STRUCTURE mix (DeepSeek dense-MLP prefix before MoE layers)
    still cannot stack into one per-layer-switched state: construction
    raises with remediation, it does not build silently-wrong stages."""
    from flax import nnx

    from tests.test_deepseek import tiny_config
    from torchmx_tpu.models.deepseek import DeepseekV3ForCausalLM
    from torchmx_tpu.parallel import pipeline_decode_model

    cfg = tiny_config(num_hidden_layers=4, first_k_dense_replace=1)
    model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    mesh = create_mesh((4, 2))
    with pytest.raises(NotImplementedError, match="STRUCTURE"):
        pipeline_decode_model(model, mesh, n_microbatches=2)


def test_pipeline_model_mixed_periodic_windows():
    """Gemma2-shaped alternating sliding/full layers through the full-
    forward pipeline (round 4; previously raised): the stage body unrolls
    the period's sub-bodies with their own static masks, and staged logits
    match the sequential model's."""
    from tests.test_scan_model import _assert_close, mixed_model
    from torchmx_tpu.parallel import pipeline_model

    model = mixed_model(["sliding_attention", "full_attention"] * 2, seed=51)
    ids = jnp.asarray(
        np.random.RandomState(51).randint(0, 128, (4, 24)), jnp.int32
    )
    ref, _ = model(ids)
    mesh = create_mesh((4, 2))
    fwd, params = pipeline_model(model, mesh, n_microbatches=2)
    with mesh:
        staged_sh = NamedSharding(mesh, P(MODEL_AXIS))
        params["staged"] = jax.tree.map(
            lambda a: jax.device_put(a, staged_sh), params["staged"]
        )
        out = jax.jit(fwd)(params, ids)
    _assert_close(np.asarray(out, np.float32), np.asarray(ref, np.float32))
    # And the window must bite: a windowless clone diverges.
    full = mixed_model(["full_attention"] * 4, seed=51)
    full_ref, _ = full(ids)
    assert float(jnp.max(jnp.abs(full_ref - ref))) > 0.05
