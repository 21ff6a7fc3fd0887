"""Mixtral MoE family: HF parity, routing semantics, capacity dispatch,
expert parallelism on the 8-device mesh, MX quantization through the
surgery registry, and checkpoint import (stacked expert weights, streaming
quantize-on-load).

The reference has no MoE code at all (SURVEY §2.3 marks expert parallelism
"n/a"); this family and its EP sharding are TPU-build extensions.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.mixtral import (
    MixtralConfig,
    MixtralForCausalLM,
    MixtralSparseMoeBlock,
    route_topk,
)
from torchmx_tpu.quant_api import quantize_llm_


def tiny_config(experts=4, k=2):
    return MixtralConfig(
        vocab_size=256,
        hidden_size=128,  # head_dim 32: the MX KV cache needs >= one block
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_local_experts=experts,
        num_experts_per_tok=k,
    )


def hf_tiny(torch, transformers, experts=4, k=2, seed=0):
    torch.manual_seed(seed)
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, num_local_experts=experts,
        num_experts_per_tok=k, tie_word_embeddings=False,
        attn_implementation="eager", sliding_window=None,
    )
    return transformers.MixtralForCausalLM(cfg).to(torch.float32).eval()


def test_route_topk_matches_hf_semantics():
    """fp32 softmax over ALL experts -> top-k -> renormalize the selected."""
    rng = np.random.RandomState(0)
    logits = rng.randn(32, 8).astype(np.float32) * 2.0
    cw = np.asarray(route_topk(jnp.asarray(logits), 2))
    for t in range(32):
        p = np.exp(logits[t] - logits[t].max())
        p = p / p.sum()
        top = np.argsort(-p)[:2]
        want = np.zeros(8, np.float32)
        want[top] = p[top] / p[top].sum()
        np.testing.assert_allclose(cw[t], want, atol=1e-6)
    # exactly k nonzeros per row
    assert np.all((cw > 0).sum(-1) == 2)


def test_hf_parity_mixtral():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import from_hf_torch

    hf = hf_tiny(torch, transformers)
    ids = np.random.RandomState(0).randint(0, 256, (2, 16))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    model, cfg = from_hf_torch(hf)
    assert isinstance(model, MixtralForCausalLM)
    assert cfg.num_local_experts == 4 and cfg.num_experts_per_tok == 2
    logits, _ = model(jnp.asarray(ids, jnp.int32))
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.999, f"mixtral corr {corr}"


def test_capacity_dispatch_matches_exact_when_roomy():
    """capacity_factor with no drops == the exact dense-masked routing."""
    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(1))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (2, 16)), jnp.int32)
    exact, _ = model(ids)
    for layer in model.model.layers:
        layer.mlp.capacity_factor = 4.0  # C = ceil(4*k*T/E) >= T -> no drops
    roomy, _ = model(ids)
    # Model-level logits: 2 layers of bf16 summation-order drift compound
    # (the forms contract in different orders); the block-level grouped test
    # holds the tight bound.
    np.testing.assert_allclose(
        np.asarray(exact, np.float32), np.asarray(roomy, np.float32),
        atol=1e-1, rtol=1e-1,
    )
    # And the two forms must agree on what matters: the argmax tokens.
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(exact[:, -1], -1)),
        np.asarray(jnp.argmax(roomy[:, -1], -1)),
    )


def test_capacity_dispatch_drops_and_renormalizes():
    """A tiny capacity drops tokens but outputs stay finite and the combine
    weights renormalize over the surviving experts."""
    blk = MixtralSparseMoeBlock(tiny_config(experts=4, k=2), rngs=nnx.Rngs(2))
    blk.capacity_factor = 0.25  # C = ceil(0.25 * 2 * 32 / 4) = 4 slots
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 128), jnp.bfloat16)
    y = blk(x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y, np.float32)))


def test_quantize_registry_and_generate():
    from torchmx_tpu.layers.mx_mixtral_moe import MXInferenceMixtralMoeBlock
    from torchmx_tpu.layers.linear import MXInferenceLinear

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(3))
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (1, 12)), jnp.int32)
    ref, _ = model(ids)
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    blk = model.model.layers[0].mlp
    assert isinstance(blk, MXInferenceMixtralMoeBlock)
    # Router stays high-precision (raw param, not a quantized linear).
    assert not isinstance(getattr(blk, "gate_weight"), MXInferenceLinear)
    assert blk.gate_weight.get_value().dtype == jnp.bfloat16
    # Expert GEMMs are MXInferenceLinears.
    assert isinstance(blk.experts_w1[0], MXInferenceLinear)
    q_logits, _ = model(ids)
    # fp8 W+A keeps the forward close (router decisions identical: hp gate).
    err = float(jnp.max(jnp.abs(q_logits - ref)))
    assert err < 1.0, err
    out = generate(model, ids, 4, kv_cache_config=MXConfig("int8"))
    assert out.shape == (1, 4)


def test_expert_parallel_matches_unsharded():
    """Dense-exact MoE under an 8-way expert mesh == unsharded to bf16
    psum-ordering tolerance (GSPMD shards the expert contraction and psums
    over the expert axis — the reduction order legally differs)."""
    from torchmx_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS, create_mesh, shard_model

    model = MixtralForCausalLM(tiny_config(experts=8), rngs=nnx.Rngs(4))
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 256, (2, 16)), jnp.int32)
    ref, _ = jax.jit(lambda m, i: m(i))(model, ids)
    mesh = create_mesh(shape=(1, 8), axis_names=(DATA_AXIS, EXPERT_AXIS))
    shard_model(model, mesh)
    w1 = model.model.layers[0].mlp.w1.get_value()
    assert w1.sharding.spec == P(EXPERT_AXIS, None, None)
    out, _ = jax.jit(lambda m, i: m(i))(model, ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # Capacity mode under the same mesh stays close (all-to-all pattern).
    for layer in model.model.layers:
        layer.mlp.capacity_factor = 8.0
    out2, _ = jax.jit(lambda m, i: m(i))(model, ids)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def _save_hf_checkpoint(hf, tmp_path):
    from safetensors.numpy import save_file

    tensors = {
        n: p.detach().cpu().float().numpy() for n, p in hf.state_dict().items()
    }
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))
    cfg = hf.config.to_dict()
    cfg["architectures"] = ["MixtralForCausalLM"]
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_checkpoint_import_stacks_experts(tmp_path):
    """load_hf_model stacks per-expert w1/w2/w3 into (E, ...) arrays and the
    loaded model matches from_hf_torch; the streaming quantized load accepts
    the same stream through the import_weight hook."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from torchmx_tpu.models.hf_import import (
        from_hf_torch,
        load_hf_model,
        load_hf_model_quantized,
    )

    hf = hf_tiny(torch, transformers, seed=5)
    _save_hf_checkpoint(hf, str(tmp_path))
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 256, (1, 12)), jnp.int32)

    ref_model, _ = from_hf_torch(hf)
    ref, _ = ref_model(ids)
    disk_model, _ = load_hf_model(str(tmp_path))
    disk, _ = disk_model(ids)
    np.testing.assert_array_equal(np.asarray(disk), np.asarray(ref))

    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qmodel, _ = load_hf_model_quantized(
        str(tmp_path), QAttentionConfig(projection_config=qlin), qlin
    )
    # Streaming-quantized == quantize-after-load, bit for bit.
    quantize_llm_(ref_model, QAttentionConfig(projection_config=qlin), qlin)
    a, _ = qmodel(ids)
    b, _ = ref_model(ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Dropless grouped (ragged) GEMM — ops/pallas_moe.py
# ---------------------------------------------------------------------------


def test_group_tokens_layout():
    """Every assignment lands in its expert's padded span, ranks are unique,
    and tile_expert labels each row tile with the owning expert."""
    from torchmx_tpu.ops.pallas_moe import group_tokens, plan_group_layout

    rng = np.random.RandomState(0)
    T, k, E, tm = 50, 2, 4, 8
    top_idx = jnp.asarray(rng.randint(0, E, (T, k)), jnp.int32)
    x = jnp.asarray(rng.randn(T, 16), jnp.bfloat16)
    xs, tile_expert, tile_rows, dest = group_tokens(x, top_idx, tm, E)
    R = plan_group_layout(T, k, E, tm)
    assert xs.shape == (R, 16) and tile_expert.shape == (R // tm,)
    d = np.asarray(dest)
    assert len(np.unique(d)) == T * k  # no collisions
    te = np.asarray(tile_expert)
    eids = np.asarray(top_idx).reshape(-1)
    for a in range(T * k):
        assert te[d[a] // tm] == eids[a], (a, d[a], eids[a], te[d[a] // tm])
    # gathered rows hold the right tokens
    xs_np = np.asarray(xs, np.float32)
    x_np = np.asarray(x, np.float32)
    toks = np.repeat(np.arange(T), k)
    for a in range(0, T * k, 7):
        np.testing.assert_array_equal(xs_np[d[a]], x_np[toks[a]])


@pytest.mark.parametrize("elem", [None, "int8", "float8_e4m3"])
def test_grouped_matmul_matches_per_expert(elem):
    """Grouped kernel == per-expert jnp matmuls on the same sorted layout
    (bf16 exact; MX variants vs dequantized weights)."""
    from torchmx_tpu import env_variables as env
    from torchmx_tpu.mx_array import dequantize_mx, quantize_mx
    from torchmx_tpu.ops.pallas_moe import grouped_matmul, group_tokens

    old = env.TORCHMX_QUANTIZE_BACKEND
    rng = np.random.RandomState(1)
    E, K, N, T, k, tm = 4, 128, 256, 64, 2, 8
    w = jnp.asarray(rng.randn(E, K, N), jnp.bfloat16)
    top_idx = jnp.asarray(rng.randint(0, E, (T, k)), jnp.int32)
    x = jnp.asarray(rng.randn(T, K), jnp.bfloat16)
    xs, tile_expert, tile_rows, dest = group_tokens(x, top_idx, tm, E)
    if elem is None:
        out = grouped_matmul(xs, w, tile_expert, tile_rows, tm=tm, bn=128, bk=128)
        w_eff = w
    else:
        # Quantize along K (the contraction dim — same axis the linear
        # kernels block): scale (E, K/32, N) after a transpose round trip.
        ws, wq = quantize_mx(w.swapaxes(1, 2), elem, 32)  # blocked along K
        w_codes = wq.swapaxes(1, 2)
        w_scale = ws.swapaxes(1, 2)
        out = grouped_matmul(
            xs, w_codes, tile_expert, tile_rows, tm=tm, bn=128, bk=128,
            w_scale=w_scale, elem_name=elem,
        )
        w_eff = dequantize_mx(wq, ws, elem, 32, jnp.bfloat16, 2).swapaxes(1, 2)
    te = np.asarray(tile_expert)
    ref = np.zeros((xs.shape[0], N), np.float32)
    xs_np = np.asarray(xs, np.float32)
    w_np = np.asarray(w_eff, np.float32)
    for t in range(xs.shape[0] // tm):
        rows = slice(t * tm, (t + 1) * tm)
        ref[rows] = xs_np[rows] @ w_np[te[t]]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref.astype(np.float32), atol=2e-1, rtol=2e-2,
    )


def test_grouped_moe_block_matches_dense():
    """block.grouped=True == the dense-exact routing (same tokens, same
    combine weights; grouped pads with dead rows that never combine)."""
    blk = MixtralSparseMoeBlock(tiny_config(experts=4, k=2), rngs=nnx.Rngs(7))
    x = jnp.asarray(np.random.RandomState(7).randn(2, 32, 128), jnp.bfloat16)
    dense = blk(x)
    blk.grouped = True
    blk.grouped_tm = 8
    grouped = blk(x)
    np.testing.assert_allclose(
        np.asarray(dense, np.float32), np.asarray(grouped, np.float32),
        atol=4e-2, rtol=4e-2,
    )


def test_grouped_moe_model_generates():
    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(8))
    for layer in model.model.layers:
        layer.mlp.grouped = True
        layer.mlp.grouped_tm = 8
    ids = jnp.asarray(np.random.RandomState(8).randint(0, 256, (1, 10)), jnp.int32)
    out = generate(model, ids, 4)
    assert out.shape == (1, 4)


def test_scan_over_layers_serves_mixtral():
    """The scan-over-layers wrapper stacks MoE layers unchanged (stacked
    expert weights just gain a leading layer dim): greedy tokens match."""
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(9))
    ids = jnp.asarray(np.random.RandomState(9).randint(0, 256, (1, 10)), jnp.int32)
    scan = ScanLlamaForCausalLM(model)
    np.testing.assert_array_equal(
        np.asarray(generate(model, ids, 6)), np.asarray(generate(scan, ids, 6))
    )


def test_quantized_checkpoint_roundtrip(tmp_path):
    """Quantized Mixtral (per-expert MXArrays, hp router) saves/restores
    bit-exact through the orbax checkpointer."""
    from torchmx_tpu.checkpoint import load_model, save_model

    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    m = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(10))
    quantize_llm_(m, QAttentionConfig(projection_config=qlin), qlin)
    ids = jnp.asarray(np.random.RandomState(10).randint(0, 256, (1, 8)), jnp.int32)
    ref, _ = m(ids)
    save_model(os.path.join(str(tmp_path), "ck"), m)
    m2 = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(11))
    quantize_llm_(m2, QAttentionConfig(projection_config=qlin), qlin)
    m2 = load_model(os.path.join(str(tmp_path), "ck"), m2)
    out, _ = m2(ids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qat_trains_mixtral_with_expert_fq():
    """The STE QAT step trains router + experts with the stacked expert
    weights fake-quantized along K (the same grid inference uses): loss
    drops, and the transform actually touches the 3-D leaves."""
    from torchmx_tpu.mx_array import fake_quantize
    from torchmx_tpu.train import fake_quantize_linear_weights, make_qat_train_step

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(12))
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    # Transform check: the stacked w1 leaf is fq'd along K (axis 1).
    _, params, _ = nnx.split(model, nnx.Param, ...)
    tf = fake_quantize_linear_weights(model, qlin)
    fq_params = tf(params)
    w1 = model.model.layers[0].mlp.w1.get_value()
    got = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(fq_params):
        if any(getattr(k, "key", None) == "w1" for k in path) and hasattr(leaf, "ndim") and leaf.ndim == 3:
            got = leaf
            break
    want = fake_quantize(w1.swapaxes(1, 2), "float8_e4m3", 32).swapaxes(1, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert not np.array_equal(np.asarray(got), np.asarray(w1))  # it did change
    # Training: loss decreases over a few steps.
    step, params, opt_state, _ = make_qat_train_step(model, qlin)
    ids = jnp.asarray(np.random.RandomState(12).randint(0, 256, (4, 17)), jnp.int32)
    f = jax.jit(step)
    l0 = None
    for _ in range(8):
        params, opt_state, loss = f(params, opt_state, ids, ids)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0


def test_qat_keeps_the_router_high_precision():
    """The STE transform must NOT fake-quantize the MoE router gate —
    inference serves it hp and a quantized-gate QAT would train different
    routing than it serves."""
    from torchmx_tpu.train import fake_quantize_linear_weights

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(13))
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    _, params, _ = nnx.split(model, nnx.Param, ...)
    fq_params = fake_quantize_linear_weights(model, qlin)(params)
    gate = model.model.layers[0].mlp.gate.weight.get_value()
    for path, leaf in jax.tree_util.tree_leaves_with_path(fq_params):
        keys = [getattr(k, "key", None) for k in path]
        if "gate" in keys:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(gate))
            break
    else:
        raise AssertionError("gate leaf not found")


def test_quantize_routes_grouped_blocks_to_stacked_class():
    """quantize_llm_ on a grouped-routing model builds the stacked-MX
    grouped block (one-byte formats); the per-expert class's own grouped
    seam stays a clear error."""
    from torchmx_tpu.layers.mx_mixtral_moe import (
        MXInferenceMixtralMoeBlock,
        MXInferenceMixtralMoeBlockGrouped,
    )

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(14))
    for layer in model.model.layers:
        layer.mlp.grouped = True
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    blk = model.model.layers[0].mlp
    assert isinstance(blk, MXInferenceMixtralMoeBlockGrouped)
    # The per-expert class rejects its (unsupported) grouped seam clearly.
    dense = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(14))
    quantize_llm_(dense, QAttentionConfig(projection_config=qlin), qlin)
    per_expert = dense.model.layers[0].mlp
    assert isinstance(per_expert, MXInferenceMixtralMoeBlock)
    with pytest.raises(NotImplementedError, match="grouped"):
        per_expert._expert_ffn_grouped(None, None, None, 8)


def test_grouped_mx_block_matches_per_expert_bitwise():
    """quantize_llm_ on a grouped-routing model builds the stacked-MX
    grouped block; its forward is BIT-IDENTICAL to the per-expert fused
    block under the same qconfig (same weight grid along K, same act fq,
    fp32 accumulation — only the kernel organization differs)."""
    from torchmx_tpu.layers.mx_mixtral_moe import (
        MXInferenceMixtralMoeBlock,
        MXInferenceMixtralMoeBlockGrouped,
    )

    qlin = QLinearConfig(
        weights_config=MXConfig("int8"),
        activations_config=MXConfig("float8_e4m3"),
    )
    ids = jnp.asarray(np.random.RandomState(15).randint(0, 256, (1, 16)), jnp.int32)
    m_dense = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(15))
    m_grp = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(15))
    for layer in m_grp.model.layers:
        layer.mlp.grouped = True
        layer.mlp.grouped_tm = 8
    quantize_llm_(m_dense, QAttentionConfig(projection_config=qlin), qlin)
    quantize_llm_(m_grp, QAttentionConfig(projection_config=qlin), qlin)
    assert isinstance(m_dense.model.layers[0].mlp, MXInferenceMixtralMoeBlock)
    assert isinstance(m_grp.model.layers[0].mlp, MXInferenceMixtralMoeBlockGrouped)
    a, _ = m_dense(ids)
    b, _ = m_grp(ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Decode through it (MX KV cache) runs.
    out = generate(m_grp, ids, 4, kv_cache_config=MXConfig("int8"))
    assert out.shape == (1, 4)


def test_grouped_mx_fp4_recodes_to_int8_domain():
    """fp4 grouped blocks quantize on the FP4 grid then re-code exactly
    into int8 codes: the stored weights dequantize bit-equal to fp4
    quantization, and the forward matches the per-expert fp4 block."""
    from torchmx_tpu.layers.mx_mixtral_moe import MXInferenceMixtralMoeBlockGrouped
    from torchmx_tpu.mx_array import MXArray, dequantize_mx

    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    m_grp = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(16))
    m_dense = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(16))
    w1_hp = m_grp.model.layers[0].mlp.w1.get_value()
    for layer in m_grp.model.layers:
        layer.mlp.grouped = True
        layer.mlp.grouped_tm = 8
    quantize_llm_(m_grp, QAttentionConfig(projection_config=qlin), qlin)
    quantize_llm_(m_dense, QAttentionConfig(projection_config=qlin), qlin)
    blk = m_grp.model.layers[0].mlp
    assert isinstance(blk, MXInferenceMixtralMoeBlockGrouped)
    assert blk.kernel_elem == "int8"
    # Stored int8-domain codes dequantize bit-equal to fp4 quantization.
    got = dequantize_mx(
        blk.w1_codes.get_value().swapaxes(1, 2),
        blk.w1_scale.get_value().swapaxes(1, 2),
        "int8", 32, jnp.bfloat16, 2,
    )
    want = MXArray.to_mx(w1_hp.swapaxes(1, 2), "float4_e2m1", 32).to_dtype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # Forward matches the per-expert fp4 path (identical values decode).
    ids = jnp.asarray(np.random.RandomState(16).randint(0, 256, (1, 12)), jnp.int32)
    a, _ = m_grp(ids)
    b, _ = m_dense(ids)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-2, rtol=5e-2
    )


def test_grouped_mx_import_weight_quantizes_stacked():
    """The streaming-load hook quantizes stacked hp checkpoint weights
    straight into the stacked codes (bit-equal to from_float)."""
    from torchmx_tpu.layers.mx_mixtral_moe import MXInferenceMixtralMoeBlockGrouped

    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    blk = MixtralSparseMoeBlock(tiny_config(), rngs=nnx.Rngs(17))
    blk.grouped = True
    ref = MXInferenceMixtralMoeBlockGrouped.from_float(blk, qlin)
    # Build a zero-init grouped block, then stream the hp weights in
    # (torch-layout (E, out, in), as the checkpoint stacker yields them).
    zero = MixtralSparseMoeBlock(tiny_config())
    zero.grouped = True
    target = MXInferenceMixtralMoeBlockGrouped.from_float(zero, qlin)
    for name in ("w1", "w2", "w3"):
        hp = getattr(blk, name).get_value().swapaxes(1, 2)  # (E, out, in)
        assert target.import_weight(name, hp)
    for name in ("w1", "w2", "w3"):
        np.testing.assert_array_equal(
            np.asarray(getattr(target, f"{name}_codes").get_value()),
            np.asarray(getattr(ref, f"{name}_codes").get_value()),
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(target, f"{name}_scale").get_value()),
            np.asarray(getattr(ref, f"{name}_scale").get_value()),
        )


def test_mixtral_composes_with_pipeline_and_context_parallel():
    """The MoE block is pipeline- and CP-transparent: stacked expert
    weights stage over pipeline stages like any layer param, and ring
    attention never touches the MLP.  Logits match the sequential model to
    bf16 reorder tolerance with agreeing argmax."""
    from torchmx_tpu.parallel.context import context_parallel
    from torchmx_tpu.parallel.mesh import create_mesh
    from torchmx_tpu.parallel.pipeline import pipeline_model

    model = MixtralForCausalLM(tiny_config(), rngs=nnx.Rngs(18))
    ids = jnp.asarray(np.random.RandomState(18).randint(0, 256, (4, 16)), jnp.int32)
    ref, _ = model(ids)

    mesh = create_mesh((1, 2), devices=jax.devices()[:2])
    fwd, params = pipeline_model(model, mesh, n_microbatches=2)
    with mesh:
        pp = jax.jit(fwd)(params, ids)
    np.testing.assert_allclose(
        np.asarray(pp, np.float32), np.asarray(ref, np.float32), atol=2e-1, rtol=2e-1
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(pp[:, -1], -1)), np.asarray(jnp.argmax(ref[:, -1], -1))
    )

    mesh4 = create_mesh((1, 4), devices=jax.devices()[:4])
    gd, state = nnx.split(model)
    with mesh4, context_parallel(mesh4, "model"):

        @jax.jit
        def cp_fwd(state, ids):
            logits, _ = nnx.merge(gd, state)(ids)
            return logits

        cp = cp_fwd(state, ids)
    np.testing.assert_allclose(
        np.asarray(cp, np.float32), np.asarray(ref, np.float32), atol=2e-1, rtol=2e-1
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(cp[:, -1], -1)), np.asarray(jnp.argmax(ref[:, -1], -1))
    )
