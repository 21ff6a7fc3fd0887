"""Ring attention (context parallelism): sharded-sequence attention must
match single-device full causal attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.parallel import create_mesh
from torchmx_tpu.parallel.context import ring_attention, ring_attention_mx


def _full_causal(q, k, v, sm_scale):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    L = q.shape[2]
    mask = np.tril(np.ones((L, L), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        jnp.bfloat16
    )


def _qkv(seed, b=2, h=4, L=256, d=64):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, L, d) * 0.4, jnp.bfloat16)  # noqa: E731
    return mk(), mk(), mk()


def test_ring_attention_matches_full():
    q, k, v = _qkv(0)
    sm = 1.0 / np.sqrt(q.shape[-1])
    ref = np.asarray(_full_causal(q, k, v, sm), np.float32)
    mesh = create_mesh()  # 8-way over the model axis
    with mesh:
        out = np.asarray(ring_attention(q, k, v, mesh, sm_scale=sm), np.float32)
    # fp32 flash merge vs fp32 full softmax: only bf16 p-rounding differs.
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_ring_attention_short_heads_tail():
    # L not a power-of-two multiple of anything special; 8 devices need
    # L % 8 == 0 only.
    q, k, v = _qkv(1, b=1, h=2, L=64, d=128)
    sm = 1.0 / np.sqrt(128)
    ref = np.asarray(_full_causal(q, k, v, sm), np.float32)
    mesh = create_mesh()
    with mesh:
        out = np.asarray(ring_attention(q, k, v, mesh, sm_scale=sm), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_context_parallel_model_forward_matches_plain():
    """Full-model CP: a cacheless causal forward inside context_parallel()
    (sequence sharded, ring attention, no dense mask) must match the plain
    jit forward — greedy tokens equal at confident positions."""
    from flax import nnx

    from tests.test_parallel import (
        _assert_greedy_tokens_match,
        trained_tiny_quantized,
    )
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    ids = jnp.asarray(
        np.stack([corpus[i * 991 : i * 991 + 64] for i in range(2)]), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def plain(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(plain(state, ids), np.float32)

    mesh = create_mesh()  # 8-way sequence sharding over the model axis
    from jax.sharding import NamedSharding, PartitionSpec as P

    with mesh, context_parallel(mesh, MODEL_AXIS):

        @jax.jit
        def cp(state, ids):
            logits, _ = nnx.merge(graphdef, state)(ids)
            return logits

        # Checkpoint-restored leaves are committed to one device; replicate
        # them over the mesh explicitly (weights replicated, sequence sharded).
        state_r = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), state
        )
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, MODEL_AXIS)))
        got = np.asarray(cp(state_r, ids_sh), np.float32)
    _assert_greedy_tokens_match(got, ref)


def test_context_parallel_composes_with_tp():
    """CP×TP: sequence sharded over a dedicated ``seq`` axis (ring manual)
    while the projections stay Megatron-TP-sharded over ``model`` (GSPMD
    auto through the ring's partial-auto shard_map — head shards flow in
    without an allgather).  Greedy tokens match the plain forward."""
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tests.test_parallel import (
        _assert_greedy_tokens_match,
        trained_tiny_quantized,
    )
    from torchmx_tpu.parallel import MODEL_AXIS, shard_model
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    ids = jnp.asarray(
        np.stack([corpus[i * 883 : i * 883 + 64] for i in range(2)]), jnp.int32
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def plain(state, ids):
        logits, _ = nnx.merge(graphdef, state)(ids)
        return logits

    ref = np.asarray(plain(state, ids), np.float32)

    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("seq", MODEL_AXIS))  # CP=2 x TP=4
    tp_model, _, _ = trained_tiny_quantized(quantize=False)
    shard_model(tp_model, mesh)
    tp_graphdef, tp_state = nnx.split(tp_model)
    with mesh, context_parallel(mesh, "seq"):

        @jax.jit
        def cp(state, ids):
            logits, _ = nnx.merge(tp_graphdef, state)(ids)
            return logits

        ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, "seq")))
        got = np.asarray(cp(tp_state, ids_sh), np.float32)
    _assert_greedy_tokens_match(got, ref)


def test_context_parallel_perplexity_matches_plain():
    """evaluate.perplexity composes with context_parallel out of the box
    (cacheless forwards) — and the jit cache must NOT reuse a plain
    executable inside the CP context (the key includes active_cp)."""
    from tests.test_parallel import trained_tiny_quantized
    from torchmx_tpu.models import evaluate
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    val = np.asarray(corpus[-2048:], np.int32)
    # Prime the plain executable FIRST so cache reuse would be caught.
    ppl_plain = evaluate.perplexity(model, val, seq_len=128, batch_size=4)
    mesh = create_mesh()
    # Checkpoint-restored weights are committed to one device; replicate
    # them over the mesh for the sharded forward.
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    _, state = nnx.split(model)
    nnx.update(
        model,
        jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P()))
            if hasattr(a, "shape")
            else a,
            state,
        ),
    )
    with mesh, context_parallel(mesh, MODEL_AXIS):
        ppl_cp = evaluate.perplexity(model, val, seq_len=128, batch_size=4)
    # Same math, different schedule: PPL agrees to cross-compilation drift.
    assert abs(ppl_cp - ppl_plain) < 0.02 * ppl_plain, (ppl_cp, ppl_plain)


def _qkv_quant_model():
    from tests.test_parallel import trained_tiny_quantized
    from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
    from torchmx_tpu.quant_api import quantize_llm_

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(
        model,
        QAttentionConfig(
            projection_config=qlin,
            query_config=MXConfig("float6_e3m2"),
            key_config=MXConfig("float6_e3m2"),
            value_config=MXConfig("float6_e3m2"),
            attention_weights_config=MXConfig("float6_e3m2"),
        ),
        qlin,
    )
    return model, cfg, corpus


def test_context_parallel_qkv_quant_matches_dense():
    """CP forwards with Q/K/V quantization configs (round-5: previously a
    NotImplementedError): the ring applies the SAME `_quantize_qkv` seam as
    the dense eager path — Q/K fq'd along head_dim, V along the kv length.

    Gate 1 (semantics, tight): ONE attention layer, ring vs dense with
    identical fq — the only difference is the flash-merge rounding, so the
    outputs must match elementwise.  A single layer avoids the known
    amplification of legal rounding into quantization-bin flips across a
    fully-MX-quantized stack (the PP×TP precedent: per-layer activation fq
    turns ulp drift into O(1) logit spikes at a few positions, regardless
    of QKV quantization — measured here too with the QKV seam DISABLED).

    Gate 2 (serving sanity, quantified): the full 4-layer quantized model's
    CP greedy tokens agree with the dense forward's on >= 95% of
    confidently-decided positions (margin >= 1.0)."""
    from flax import nnx

    from tests.test_scan_model import _assert_close
    from torchmx_tpu.layers.mx_llama_attention import MXInferenceLlamaAttention
    from torchmx_tpu.models.llama import make_causal_mask, rope_cos_sin
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, cfg, corpus = _qkv_quant_model()
    mesh = create_mesh()
    # Attn-weights quantization does not apply inside the ring's online
    # softmax (the documented CP deviation) — patch it out of the dense
    # reference for the elementwise gate.
    patched = MXInferenceLlamaAttention._quantize_attn_weights
    MXInferenceLlamaAttention._quantize_attn_weights = lambda self, w: w
    try:
        # --- Gate 1: single layer, ring vs dense, same fq semantics.
        attn = model.model.layers[0].self_attn
        a_gd, a_state = nnx.split(attn)
        b, s = 2, 256  # 32-token chunks over 8 devices: whole V blocks
        hidden = jnp.asarray(
            np.random.RandomState(7).standard_normal((b, s, cfg.hidden_size)),
            jnp.bfloat16,
        )
        pos = jnp.arange(s)[None]
        cos, sin = rope_cos_sin(model.model.inv_freq.get_value(), pos, jnp.bfloat16)
        cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
        sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
        mask = make_causal_mask(s, s)[None, None]

        @jax.jit
        def dense_layer(a_state, hidden, cos, sin):
            out, _ = nnx.merge(a_gd, a_state)(
                hidden, cos=cos, sin=sin, attention_mask=mask
            )
            return out

        ref1 = np.asarray(dense_layer(a_state, hidden, cos, sin), np.float32)
        with mesh, context_parallel(mesh, MODEL_AXIS):

            @jax.jit
            def cp_layer(a_state, hidden, cos, sin):
                out, _ = nnx.merge(a_gd, a_state)(
                    hidden, cos=cos, sin=sin, attention_mask=None
                )
                return out

            seq_sh = NamedSharding(mesh, P(None, MODEL_AXIS))
            got1 = np.asarray(
                cp_layer(
                    jax.device_put(a_state, NamedSharding(mesh, P())),
                    jax.device_put(hidden, seq_sh),
                    jax.device_put(cos, seq_sh),
                    jax.device_put(sin, seq_sh),
                ),
                np.float32,
            )
        # max_frac 0.25: the layer ends in o_proj, whose fp8 activation fq
        # can flip one quantization bin where the flash-merge rounding
        # lands on a bin edge (one flip ≈ one quantum through one dot row —
        # measured 0.033 on a 0.21-std output).  Mean stays at the default
        # 2% gate, which a wrong window/fq semantics would blow past.
        _assert_close(got1, ref1, max_frac=0.25)

        # --- Gate 2: full quantized model, CP vs dense greedy tokens.
        ids = jnp.asarray(
            np.stack([corpus[i * 991 : i * 991 + 256] for i in range(2)]),
            jnp.int32,
        )
        graphdef, state = nnx.split(model)

        @jax.jit
        def plain(state, ids):
            logits, _ = nnx.merge(graphdef, state)(ids)
            return logits

        ref = np.asarray(plain(state, ids), np.float32)
        with mesh, context_parallel(mesh, MODEL_AXIS):

            @jax.jit
            def cp(state, ids):
                logits, _ = nnx.merge(graphdef, state)(ids)
                return logits

            got = np.asarray(
                cp(
                    jax.device_put(state, NamedSharding(mesh, P())),
                    jax.device_put(ids, seq_sh),
                ),
                np.float32,
            )
    finally:
        MXInferenceLlamaAttention._quantize_attn_weights = patched

    srt = np.sort(ref, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    confident = margin >= 1.0
    assert confident.mean() >= 0.5, f"only {confident.mean():.0%} confident"
    agree = (got.argmax(-1) == ref.argmax(-1))[confident].mean()
    assert agree >= 0.95, f"CP greedy agreement {agree:.1%} on confident positions"


def test_context_parallel_qkv_quant_chunk_guard():
    """V blocks lie along the sharded sequence: a per-device chunk that
    cannot hold whole V blocks is rejected with a clear error."""
    import pytest as _pytest
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = _qkv_quant_model()
    # 64 tokens over 8 devices -> 8-token chunks < block_size 32.
    ids = jnp.asarray(np.asarray(corpus[:64])[None], jnp.int32)
    mesh = create_mesh()
    with mesh, context_parallel(mesh):
        with _pytest.raises(ValueError, match="per-device chunk"):
            model(ids)


def test_ring_attention_gqa_matches_repeated_full():
    """GQA: K/V enter the ring with their own (smaller) head count; the
    result must equal full causal attention over repeat_kv'd K/V."""
    rng = np.random.RandomState(7)
    b, h, hkv, L, d = 2, 8, 2, 128, 64
    q = jnp.asarray(rng.randn(b, h, L, d) * 0.4, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, hkv, L, d) * 0.4, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, hkv, L, d) * 0.4, jnp.bfloat16)
    sm = 1.0 / np.sqrt(d)
    kf = jnp.repeat(k, h // hkv, axis=1)
    vf = jnp.repeat(v, h // hkv, axis=1)
    ref = np.asarray(_full_causal(q, kf, vf, sm), np.float32)
    mesh = create_mesh()
    with mesh:
        out = np.asarray(ring_attention(q, k, v, mesh, sm_scale=sm), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_ring_attention_mx_mixed_kv_formats():
    """K and V may use DIFFERENT MX formats; each must dequantize with its
    own metadata (a K-metadata-for-V bug corrupts V silently)."""
    q, k, v = _qkv(5, b=1, h=2, L=64, d=64)
    sm = 1.0 / np.sqrt(64)
    k_mx = MXArray.to_mx(k, "int8", 32)
    v_mx = MXArray.to_mx(v, "float4_e2m1", 32)
    ref = np.asarray(
        _full_causal(
            q, k_mx.to_dtype(jnp.bfloat16), v_mx.to_dtype(jnp.bfloat16), sm
        ),
        np.float32,
    )
    mesh = create_mesh()
    with mesh:
        out = np.asarray(
            ring_attention_mx(q, k_mx, v_mx, mesh, sm_scale=sm), np.float32
        )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_context_parallel_scan_model_forward_matches_plain():
    """ScanLlamaForCausalLM (the compile-scalable serving model) must ride
    the ring under context_parallel: its cacheless forward may NOT build
    the dense (L, L) mask (which would silently force the eager path)."""
    from flax import nnx

    from tests.test_parallel import (
        _assert_greedy_tokens_match,
        trained_tiny_quantized,
    )
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    scan_model = ScanLlamaForCausalLM.from_model(model)
    ids = jnp.asarray(
        np.stack([corpus[i * 701 : i * 701 + 64] for i in range(2)]), jnp.int32
    )
    graphdef, state = nnx.split(scan_model)

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

        state_r = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), state
        )
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, MODEL_AXIS)))
        got = np.asarray(cp(state_r, ids_sh), np.float32)
    _assert_greedy_tokens_match(got, ref)


def test_zigzag_order_roundtrip():
    from torchmx_tpu.parallel.context import zigzag_inverse, zigzag_order

    L, n = 64, 8
    perm = zigzag_order(L, n)
    inv = zigzag_inverse(L, n)
    assert sorted(perm.tolist()) == list(range(L))
    np.testing.assert_array_equal(perm[inv], np.arange(L))
    # Device 0's shard = chunks 0 and 2n-1 (first and last).
    c = L // (2 * n)
    np.testing.assert_array_equal(perm[: 2 * c][:c], np.arange(c))
    np.testing.assert_array_equal(perm[c : 2 * c], np.arange(L - c, L))


def test_ring_attention_zigzag_matches_full():
    """Zigzag layout: inputs permuted into the striped order, output
    inverse-permuted, must equal full causal attention — including GQA."""
    from torchmx_tpu.parallel.context import zigzag_inverse, zigzag_order

    rng = np.random.RandomState(11)
    b, h, hkv, L, d = 2, 4, 2, 256, 64
    q = jnp.asarray(rng.randn(b, h, L, d) * 0.4, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, hkv, L, d) * 0.4, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, hkv, L, d) * 0.4, jnp.bfloat16)
    sm = 1.0 / np.sqrt(d)
    g = h // hkv
    ref = np.asarray(
        _full_causal(q, jnp.repeat(k, g, 1), jnp.repeat(v, g, 1), sm), np.float32
    )
    mesh = create_mesh()
    n = 8
    perm, inv = zigzag_order(L, n), zigzag_inverse(L, n)
    with mesh:
        out_z = np.asarray(
            ring_attention(
                q[:, :, perm], k[:, :, perm], v[:, :, perm], mesh,
                sm_scale=sm, layout="zigzag",
            ),
            np.float32,
        )
    np.testing.assert_allclose(out_z[:, :, inv], ref, atol=2e-2, rtol=2e-2)


def test_ring_attention_mx_zigzag_matches_dequantized_full():
    from torchmx_tpu.parallel.context import zigzag_inverse, zigzag_order

    q, k, v = _qkv(13, b=1, h=4, L=128, d=64)
    sm = 1.0 / np.sqrt(64)
    k_mx = MXArray.to_mx(k, "float8_e4m3", 32)
    v_mx = MXArray.to_mx(v, "int8", 32)
    ref = np.asarray(
        _full_causal(
            q, k_mx.to_dtype(jnp.bfloat16), v_mx.to_dtype(jnp.bfloat16), sm
        ),
        np.float32,
    )
    mesh = create_mesh()
    perm, inv = zigzag_order(128, 8), zigzag_inverse(128, 8)
    k_z = MXArray.to_mx(k[:, :, perm], "float8_e4m3", 32)
    v_z = MXArray.to_mx(v[:, :, perm], "int8", 32)
    with mesh:
        out_z = np.asarray(
            ring_attention_mx(
                q[:, :, perm], k_z, v_z, mesh, sm_scale=sm, layout="zigzag"
            ),
            np.float32,
        )
    np.testing.assert_allclose(out_z[:, :, inv], ref, atol=2e-2, rtol=2e-2)


def test_context_parallel_zigzag_perplexity_matches_plain():
    """Model-level zigzag: evaluate's scoring permutes tokens/positions into
    the striped layout automatically; PPL must match the plain forward."""
    from tests.test_parallel import trained_tiny_quantized
    from torchmx_tpu.models import evaluate
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    model, cfg, corpus = trained_tiny_quantized(quantize=False)
    val = np.asarray(corpus[-1024:], np.int32)
    ppl_plain = evaluate.perplexity(model, val, seq_len=128, batch_size=4)
    mesh = create_mesh()
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    _, state = nnx.split(model)
    nnx.update(
        model,
        jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P()))
            if hasattr(a, "shape")
            else a,
            state,
        ),
    )
    with mesh, context_parallel(mesh, MODEL_AXIS, layout="zigzag"):
        ppl_z = evaluate.perplexity(model, val, seq_len=128, batch_size=4)
    assert abs(ppl_z - ppl_plain) < 0.02 * ppl_plain, (ppl_z, ppl_plain)


@pytest.mark.parametrize("elem", ["float8_e4m3", "int8", "float4_e2m1"])
def test_ring_attention_mx_matches_dequantized_full(elem):
    """MX ring: packed K/V codes rotate the ring; result equals full causal
    attention over the DEQUANTIZED K/V (quantization error is in the data,
    not the schedule)."""
    q, k, v = _qkv(2)
    sm = 1.0 / np.sqrt(q.shape[-1])
    k_mx = MXArray.to_mx(k, elem, 32)
    v_mx = MXArray.to_mx(v, elem, 32)
    ref = np.asarray(
        _full_causal(
            q, k_mx.to_dtype(jnp.bfloat16), v_mx.to_dtype(jnp.bfloat16), sm
        ),
        np.float32,
    )
    mesh = create_mesh()
    with mesh:
        out = np.asarray(
            ring_attention_mx(q, k_mx, v_mx, mesh, sm_scale=sm), np.float32
        )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


# -- sliding windows and logit softcaps on the ring ---------------------------


def _full_masked(q, k, v, sm_scale, window=None, softcap=None):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    L = q.shape[2]
    mask = np.tril(np.ones((L, L), bool))
    if window is not None:
        mask &= ~np.tril(np.ones((L, L), bool), -window)
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        jnp.bfloat16
    )


@pytest.mark.parametrize("layout", ["contig", "zigzag"])
def test_ring_attention_window_matches_dense(layout):
    """Sliding-window ring attention (per-chunk window predication; chunks
    wholly below the window skip their math via lax.cond) must match the
    dense windowed-mask reference in both layouts — windows smaller than a
    shard, spanning shards, and larger than the sequence."""
    from torchmx_tpu.parallel.context import zigzag_order

    q, k, v = _qkv(3, b=1, h=2, L=128, d=64)
    sm = 1.0 / np.sqrt(64)
    mesh = create_mesh()
    n = mesh.shape["model"]
    for window in (8, 48, 1024):
        ref = np.asarray(_full_masked(q, k, v, sm, window=window), np.float32)
        with mesh:
            if layout == "zigzag":
                perm = zigzag_order(q.shape[2], n)
                out_z = ring_attention(
                    q[:, :, perm], k[:, :, perm], v[:, :, perm], mesh,
                    sm_scale=sm, layout="zigzag", window=window,
                )
                inv = np.empty_like(perm)
                inv[perm] = np.arange(len(perm))
                out = np.asarray(out_z[:, :, inv], np.float32)
            else:
                out = np.asarray(
                    ring_attention(q, k, v, mesh, sm_scale=sm, window=window),
                    np.float32,
                )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2,
                                   err_msg=f"{layout} window={window}")


@pytest.mark.parametrize("layout", ["contig", "zigzag"])
def test_ring_attention_softcap_matches_dense(layout):
    """Gemma2-style logit softcapping rides the ring: the cap is applied to
    each block's scaled scores before masking (HF order), and the flash
    merge over capped blocks equals the dense capped softmax."""
    from torchmx_tpu.parallel.context import zigzag_order

    q, k, v = _qkv(4, b=1, h=2, L=128, d=64)
    sm = 1.0 / np.sqrt(64)
    cap = 0.9  # tight cap so the tanh actually bends the scores
    ref = np.asarray(_full_masked(q, k, v, sm, softcap=cap), np.float32)
    mesh = create_mesh()
    n = mesh.shape["model"]
    with mesh:
        if layout == "zigzag":
            perm = zigzag_order(q.shape[2], n)
            out_z = ring_attention(
                q[:, :, perm], k[:, :, perm], v[:, :, perm], mesh,
                sm_scale=sm, layout="zigzag", softcap=cap,
            )
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            out = np.asarray(out_z[:, :, inv], np.float32)
        else:
            out = np.asarray(
                ring_attention(q, k, v, mesh, sm_scale=sm, softcap=cap),
                np.float32,
            )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_ring_attention_mx_window():
    """MX-packed K/V shards + sliding window: skipped chunks never pay the
    dequantize (cond) and the result matches the dequantized dense mask."""
    q, k, v = _qkv(5, b=1, h=2, L=128, d=64)
    sm = 1.0 / np.sqrt(64)
    k_mx = MXArray.to_mx(k, "float8_e4m3", 32)
    v_mx = MXArray.to_mx(v, "float8_e4m3", 32)
    kd = k_mx.to_dtype(jnp.bfloat16)
    vd = v_mx.to_dtype(jnp.bfloat16)
    ref = np.asarray(_full_masked(q, kd, vd, sm, window=48), np.float32)
    mesh = create_mesh()
    with mesh:
        out = np.asarray(
            ring_attention_mx(q, k_mx, v_mx, mesh, sm_scale=sm, window=48),
            np.float32,
        )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_context_parallel_windowed_model_matches_plain():
    """A Mistral-shaped sliding-window model forwards under CP (previously
    a NotImplementedError): logits match the plain dense-mask forward."""
    from flax import nnx

    from tests.test_scan_model import mixed_model
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    model = mixed_model(["sliding_attention"] * 4, seed=21, window=8)
    ids = jnp.asarray(
        np.random.RandomState(21).randint(0, 128, (2, 64)), jnp.int32
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
    from tests.test_scan_model import _assert_close

    _assert_close(got, ref)


def test_context_parallel_gemma2_model_matches_plain():
    """A Gemma2-shaped model (alternating sliding/full layers + attention
    logit softcap) forwards under CP and matches the plain forward."""
    from flax import nnx

    from torchmx_tpu.models.gemma import Gemma2Config, Gemma2ForCausalLM
    from torchmx_tpu.parallel import MODEL_AXIS
    from torchmx_tpu.parallel.context import context_parallel

    cfg = Gemma2Config(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        sliding_window=16,
        query_pre_attn_scalar=32.0,
        attn_logit_softcapping=30.0,
        final_logit_softcapping=30.0,
    )
    model = Gemma2ForCausalLM(cfg, rngs=__import__("flax").nnx.Rngs(22))
    ids = jnp.asarray(
        np.random.RandomState(22).randint(0, 128, (2, 64)), jnp.int32
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
    from tests.test_scan_model import _assert_close

    _assert_close(got, ref)
