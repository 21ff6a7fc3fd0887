"""Pallas kernel correctness tests (interpret mode on CPU; native on TPU).

The kernels must be bit-identical to the jnp reference paths:
* fused dequant-matmul == dequantize-then-dot (fp8/fp6/int8 exactly; fp4 has
  a different accumulation order from the two half-K nibble-plane dots, so it
  is compared within fp32-accumulation tolerance);
* quantize kernel == ``quantize_mx`` (bit-exact, all formats);
* fake-quantize kernel == quantize->dequantize roundtrip (bit-exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import dtypes
from torchmx_tpu import env_variables as env
from torchmx_tpu.mx_array import MXArray, quantize_mx
from torchmx_tpu.ops import pallas_matmul as pm
from torchmx_tpu.ops import pallas_quantize as pq

ALL_NAMES = ["float8_e4m3", "float6_e3m2", "float6_e2m3", "float4_e2m1", "int8"]


def rand_bf16(key, shape, spread=3.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    mag = jax.random.normal(k1, shape) * jnp.exp2(
        jax.random.normal(k2, shape) * spread
    )
    return mag.astype(jnp.bfloat16)


@pytest.mark.parametrize("ename", ALL_NAMES)
def test_fused_matmul_matches_dequant_then_dot(ename):
    x = rand_bf16(0, (128, 256), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(1), (128, 256)) * 0.05).astype(
        jnp.bfloat16
    )
    w_km = MXArray.to_mx(w, ename, 32).T  # kernel layout (K, N)
    out = pm.matmul_any(x, w_km, jnp.bfloat16)
    assert out is not None
    gt = jnp.matmul(
        x, w_km.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    a, r = np.asarray(out, np.float32), np.asarray(gt, np.float32)
    if ename == "float4_e2m1":
        # Two half-K nibble-plane dots accumulate in a different order.
        np.testing.assert_allclose(a, r, rtol=2e-2, atol=1e-2)
    elif jax.default_backend() == "tpu":
        # On hardware the kernel reproduces the MXU bf16 dot bit-for-bit.
        np.testing.assert_array_equal(a, r)
    else:
        # Interpret mode runs an f32-upcast dot; the XLA CPU bf16 dot used
        # for the ground truth may differ by 1 ulp in reduction order.
        np.testing.assert_allclose(a, r, rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize("ename", ALL_NAMES)
def test_quantize_kernel_bit_exact(ename):
    x = rand_bf16(2, (128, 128))
    s_ref, c_ref = quantize_mx(x, ename, 32)
    out = pq.quantize_mx_pallas(x, ename, 32)
    assert out is not None
    s, c = out
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))


@pytest.mark.parametrize("ename", ALL_NAMES)
def test_fake_quantize_kernel_bit_exact(ename):
    x = rand_bf16(3, (128, 128))
    # Include some specials: a NaN block and a zero block.
    x = x.at[0, 0].set(jnp.nan).at[1, :32].set(0.0)
    ref = MXArray.to_mx(x, ename, 32).to_dtype(jnp.bfloat16)
    out = pq.fake_quantize_pallas(x, ename, 32)
    assert out is not None
    a = np.asarray(out, np.float32)
    r = np.asarray(ref, np.float32)
    both_nan = np.isnan(a) & np.isnan(r)
    np.testing.assert_array_equal(np.where(both_nan, 0, a), np.where(both_nan, 0, r))


def test_decode_helper_matches_dequantize():
    """The in-kernel decode (bit-surgery scale fold) must agree with the
    reference element decode x power-of-two scale over every code and a range
    of reachable scales."""
    from torchmx_tpu.mx_quantization import dequantize_to_dtype, pow2_split_factors

    for elem in dtypes.SUPPORTED_FP_ELEM_DTYPES:
        nbits = 1 + elem.exponent_bits + elem.mantissa_bits
        codes = np.arange(2**nbits, dtype=np.int32)
        # Scales reachable from quantizing finite bf16: se <= 254 - max_pow2.
        for se_val in [1, 64, 127, 200, 254 - elem.max_pow2]:
            se = np.full_like(codes, se_val)
            got = pm.decode_codes_to_bf16(
                jnp.asarray(codes).reshape(1, -1), jnp.asarray(se).reshape(1, -1), elem
            ).reshape(-1)
            elems_f32 = dequantize_to_dtype(
                jnp.asarray(codes, jnp.uint8), elem, jnp.float32, is_packed_fp4=False
            )
            s1, s2 = pow2_split_factors(jnp.asarray(se) - 127)
            ref = ((elems_f32 * s1) * s2).astype(jnp.bfloat16)
            g = np.asarray(got, np.float32)
            r = np.asarray(ref, np.float32)
            # The kernel flushes sub-bf16-normal results to 0; the reference
            # keeps bf16 subnormals.  Compare where the reference is normal.
            keep = (np.abs(r) >= 2.0**-126) | (r == 0)
            both_nan = np.isnan(g) & np.isnan(r)
            keep &= ~both_nan
            np.testing.assert_array_equal(g[keep], r[keep])


def test_attention_forward_pallas_backend_all_quant():
    """Fully-quantized attention (projections + Q/K/V + attention weights)
    must run through the Pallas backend (interpret mode off-TPU) and match
    the jnp backend within fp32-accumulation tolerance; regression for the
    DType-vs-name coercion in mx_fake_quantize."""
    from flax import nnx

    from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
    from torchmx_tpu.layers.mx_llama_attention import MXInferenceLlamaAttention
    from torchmx_tpu.models.llama import LlamaAttention, LlamaConfig

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    attn = LlamaAttention(cfg, 0, rngs=nnx.Rngs(0))
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    q6 = MXConfig("float6_e3m2")
    qattn = QAttentionConfig(
        projection_config=qlin,
        query_config=q6,
        key_config=q6,
        value_config=q6,
        attention_weights_config=q6,
    )
    mx_attn = MXInferenceLlamaAttention.from_float(attn, qattn)
    x = rand_bf16(8, (1, 32, 128), spread=0.5)
    cos = jnp.ones((1, 32, cfg.head_dim), jnp.bfloat16)
    sin = jnp.zeros_like(cos)

    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out_p, _ = mx_attn(x, cos=cos, sin=sin)
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        out_j, _ = mx_attn(x, cos=cos, sin=sin)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_j, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fp4_halves_layout_roundtrip_and_matmul():
    """The fp4 kernel "halves" packing dequantizes identically to the
    reference "pair" packing, and the single-dot halves kernel matches the
    dequant-then-dot ground truth."""
    x = rand_bf16(6, (64, 512), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(7), (128, 512)) * 0.05).astype(
        jnp.bfloat16
    )
    w_km = MXArray.to_mx(w, "float4_e2m1", 32).T  # (K=512, N=128), pair
    w_h = w_km.to_fp4_halves()
    assert w_h.fp4_pack == "halves" and w_h.shape == w_km.shape
    np.testing.assert_array_equal(
        np.asarray(w_h.to_dtype(jnp.bfloat16)),
        np.asarray(w_km.to_dtype(jnp.bfloat16)),
    )
    out = pm.matmul_any(x, w_h, jnp.bfloat16)
    assert out is not None
    gt = jnp.matmul(
        x, w_km.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(gt, np.float32), rtol=2e-2, atol=1e-2
    )


@pytest.mark.parametrize("ename", ["float8_e4m3", "float4_e2m1"])
def test_mx_matmul_auto_backend_dispatch(ename):
    """mx_matmul with backend=pallas routes K-major weights to the kernel."""
    from torchmx_tpu.ops import mx_matmul

    x = rand_bf16(4, (64, 128), spread=1.0)
    w_km = MXArray.to_mx(
        (jax.random.normal(jax.random.PRNGKey(5), (64, 128)) * 0.1).astype(jnp.bfloat16),
        ename,
        32,
    ).T
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out_pallas = mx_matmul(x, w_km, out_dtype=jnp.bfloat16)
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        out_jnp = mx_matmul(x, w_km, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    np.testing.assert_allclose(
        np.asarray(out_pallas, np.float32),
        np.asarray(out_jnp, np.float32),
        rtol=2e-2,
        atol=1e-2,
    )


def test_decode_fp4_specialized_matches_generic():
    """The arithmetic fp4 decode must equal the generic bit-surgery decode
    for every (code, reachable-scale) pair."""
    codes = np.arange(16, dtype=np.int32)
    for se_val in [1, 64, 127, 200, 252]:
        se = jnp.full((1, 16), se_val, jnp.int32)
        a = pm.decode_fp4_to_bf16(jnp.asarray(codes).reshape(1, -1), se)
        b = pm.decode_codes_to_bf16(
            jnp.asarray(codes).reshape(1, -1), se, dtypes.float4_e2m1
        )
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16)
        )


@pytest.mark.parametrize("ename", ALL_NAMES)
def test_fused_act_quant_matmul_bit_matches_two_pass(ename):
    """matmul_any(act_fq=...) (fq fused into the kernel prologue) must be
    bit-identical to fake-quantize -> matmul_any on the same backend."""
    from torchmx_tpu.ops import mx_fake_quantize

    x = rand_bf16(7, (128, 256), spread=2.0)
    w = (jax.random.normal(jax.random.PRNGKey(8), (128, 256)) * 0.05).astype(
        jnp.bfloat16
    )
    w_km = MXArray.to_mx(w, ename, 32).T
    fused = pm.matmul_any(x, w_km, jnp.bfloat16, act_fq="float8_e4m3")
    assert fused is not None
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    two_pass = pm.matmul_any(x_fq, w_km, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(two_pass, np.float32)
    )


def test_fused_act_quant_fp4_pair_joint_scale():
    """The fp4 'pair' kernel splits x into even/odd K-planes; the fused fq
    must still compute block scales over the *original* 32-element blocks."""
    from torchmx_tpu.ops import mx_fake_quantize

    x = rand_bf16(9, (16, 512), spread=2.0)
    w = (jax.random.normal(jax.random.PRNGKey(10), (512, 256)) * 0.1).astype(
        jnp.bfloat16
    )
    w_mx = MXArray.to_mx(w.T, "float4_e2m1", 32).T  # pair-packed kernel layout
    assert w_mx.fp4_pack == "pair"
    fused = pm.matmul_any(x, w_mx, jnp.bfloat16, act_fq="float8_e4m3")
    assert fused is not None
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    two_pass = pm.matmul_any(x_fq, w_mx, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(two_pass, np.float32)
    )


def test_fused_act_quant_fp4_halves():
    x = rand_bf16(11, (8, 512), spread=2.0)
    w = (jax.random.normal(jax.random.PRNGKey(12), (512, 256)) * 0.1).astype(
        jnp.bfloat16
    )
    w_mx = MXArray.to_mx(w.T, "float4_e2m1", 32).T.to_fp4_halves()
    from torchmx_tpu.ops import mx_fake_quantize

    fused = pm.matmul_any(x, w_mx, jnp.bfloat16, act_fq="float8_e4m3")
    assert fused is not None
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    two_pass = pm.matmul_any(x_fq, w_mx, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(two_pass, np.float32)
    )


def test_mx_dynamic_matmul_matches_jnp_reference():
    """The public fused op must match fake-quantize + dequant-dot on jnp."""
    from torchmx_tpu.ops import mx_dynamic_matmul, mx_fake_quantize, mx_matmul

    x = rand_bf16(13, (32, 128), spread=1.0)
    w_km = MXArray.to_mx(
        (jax.random.normal(jax.random.PRNGKey(14), (64, 128)) * 0.1).astype(
            jnp.bfloat16
        ),
        "float8_e4m3",
        32,
    ).T
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        fused = mx_dynamic_matmul(x, w_km, "float8_e4m3", 32, out_dtype=jnp.bfloat16)
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        ref = mx_matmul(
            mx_fake_quantize(x, "float8_e4m3", 32), w_km, out_dtype=jnp.bfloat16
        )
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    if jax.default_backend() == "tpu":
        np.testing.assert_array_equal(
            np.asarray(fused, np.float32), np.asarray(ref, np.float32)
        )
    else:
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(ref, np.float32),
            rtol=5e-3, atol=1e-3,
        )


@pytest.mark.parametrize("ename", ["float6_e3m2", "float6_e2m3"])
def test_fp6_quarters_roundtrip_and_matmul(ename):
    """Planar 4-per-3-byte fp6: pack/unpack roundtrip is lossless and the
    fused quarters kernel is bit-identical to dequantize-then-dot."""
    K, N, M = 1024, 256, 16
    w = (jax.random.normal(jax.random.PRNGKey(20), (N, K)) * 0.1).astype(jnp.bfloat16)
    w_km = MXArray.to_mx(w, ename, 32).T  # kernel layout (K, N), 1 byte/code
    w_q = w_km.to_fp6_quarters()
    assert w_q.data.shape == (K * 3 // 4, N)
    assert w_q.shape == (K, N)
    # Roundtrip: flat codes and dequantized values identical.
    np.testing.assert_array_equal(
        np.asarray(w_q._quarters_to_flat().data), np.asarray(w_km.data)
    )
    np.testing.assert_array_equal(
        np.asarray(w_q.to_dtype(jnp.bfloat16), np.float32),
        np.asarray(w_km.to_dtype(jnp.bfloat16), np.float32),
    )

    x = rand_bf16(21, (M, K), spread=1.0)
    out = pm.matmul_any(x, w_q, jnp.bfloat16)
    assert out is not None
    ref = pm.matmul_any(x, w_km, jnp.bfloat16)  # same tiling -> same order
    if ref is not None and pm.plan_matmul(M, N, K, ename, "quarters") == pm.plan_matmul(
        M, N, K, ename, "pair"
    ):
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )
    gt = jnp.matmul(
        x, w_km.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(gt, np.float32), rtol=5e-3, atol=1e-3
    )


def test_fp6_quarters_fused_act_quant():
    K, N, M = 1024, 128, 8
    w = (jax.random.normal(jax.random.PRNGKey(22), (N, K)) * 0.1).astype(jnp.bfloat16)
    w_q = MXArray.to_mx(w, "float6_e3m2", 32).T.to_fp6_quarters()
    x = rand_bf16(23, (M, K), spread=1.0)
    from torchmx_tpu.ops import mx_fake_quantize

    fused = pm.matmul_any(x, w_q, jnp.bfloat16, act_fq="float8_e4m3")
    assert fused is not None
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    two_pass = pm.matmul_any(x_fq, w_q, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(two_pass, np.float32)
    )


def test_fp6_quarters_linear_layer_uses_quarters():
    from torchmx_tpu.config import MXConfig, QLinearConfig
    from torchmx_tpu.layers.linear import MXInferenceLinear

    qcfg = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    w = (jax.random.normal(jax.random.PRNGKey(24), (128, 1024)) * 0.1).astype(
        jnp.bfloat16
    )
    lin = MXInferenceLinear.from_weights(w, None, qcfg)
    assert lin.weight.get_value().fp4_pack == "quarters"
    x = rand_bf16(25, (8, 1024), spread=1.0)
    out = lin(x)
    # jnp-path reference through the same quantized weight values.
    ref_w = lin.weight.get_value().to_dtype(jnp.bfloat16)
    from torchmx_tpu.ops import mx_fake_quantize

    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    ref = jnp.matmul(x_fq, ref_w, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-3, atol=1e-3
    )


@pytest.mark.parametrize("ename,pack", [
    ("float8_e4m3", "pair"),
    ("float4_e2m1", "halves"),
    ("float8_e4m3", "halves"),
    ("float6_e3m2", "quarters"),
])
def test_x_cache_path_bit_identical(ename, pack):
    """The j==0 VMEM x-cache variant must be bit-identical to the uncached
    kernel and engage for multi-sweep prefill shapes (the plan oracle says
    when).  M=2048 x N=4096 forces N//bn > 1 under the cached VMEM budget."""
    M, K, N = 2048, 1024, 4096
    plan_c = pm.plan_matmul_cached(M, N, K, ename, pack)
    assert plan_c is not None and N // plan_c[0] > 1, plan_c
    w = (jax.random.normal(jax.random.PRNGKey(30), (N, K)) * 0.1).astype(jnp.bfloat16)
    w_km = MXArray.to_mx(w, ename, 32).T
    if pack == "halves":
        w_km = (
            w_km.to_fp8_halves() if ename == "float8_e4m3"
            else w_km.to_fp4_halves()
        )
    elif pack == "quarters":
        w_km = w_km.to_fp6_quarters()
    x = rand_bf16(31, (M, K), spread=1.0)

    # Weight-only (x already high-precision): cached vs uncached bitwise.
    out = pm.matmul_any(x, w_km, jnp.bfloat16)
    bn, bk = plan_c
    run = {
        "pair": lambda xc, cache: pm._pallas_matmul_1byte(
            xc, w_km.data, w_km.scale_e8m0, ename, bn, bk, jnp.bfloat16, None, cache
        ),
        "halves": lambda xc, cache: pm._pallas_matmul_fp4_halves(
            xc, w_km.data, w_km.scale_e8m0, bn, bk, jnp.bfloat16, None, cache,
            elem_name=ename,
        ),
        "quarters": lambda xc, cache: pm._pallas_matmul_fp6q(
            xc, w_km.data, w_km.scale_e8m0, ename, bn, bk, jnp.bfloat16, None, cache
        ),
    }[pack]
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(run(x, False), np.float32)
    )

    # Dynamic activation quantization: the fq lands inside the cached kernel
    # and must equal the standalone-fq + uncached-matmul reference bitwise.
    from torchmx_tpu.ops import mx_fake_quantize

    fused = pm.matmul_any(x, w_km, jnp.bfloat16, act_fq="float8_e4m3")
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        x_fq = mx_fake_quantize(x, "float8_e4m3", 32)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(run(x_fq, False), np.float32)
    )


@pytest.mark.parametrize("ename,pack", [
    ("float8_e4m3", "pair"),
    ("float4_e2m1", "halves"),
    ("float8_e4m3", "halves"),
    ("float6_e3m2", "quarters"),
])
def test_pipelined_fq_cache_bit_identical(ename, pack):
    """The software-pipelined j==0 fq fill (fq tile k+1 while dotting cached
    tile k — TORCHMX_FQ_PIPELINE) must be bit-identical to the serial fill:
    same fq, same accumulation order, only the schedule differs."""
    M, K, N = 2048, 1024, 4096
    plan_c = pm.plan_matmul_cached(M, N, K, ename, pack)
    assert plan_c is not None
    bn, bk = plan_c
    w = (jax.random.normal(jax.random.PRNGKey(40), (N, K)) * 0.1).astype(jnp.bfloat16)
    w_km = MXArray.to_mx(w, ename, 32).T
    if pack == "halves":
        w_km = (
            w_km.to_fp8_halves() if ename == "float8_e4m3"
            else w_km.to_fp4_halves()
        )
    elif pack == "quarters":
        w_km = w_km.to_fp6_quarters()
    x = rand_bf16(41, (M, K), spread=1.0)
    run = {
        "pair": lambda pipe: pm._pallas_matmul_1byte(
            x, w_km.data, w_km.scale_e8m0, ename, bn, bk, jnp.bfloat16,
            "float8_e4m3", True, pipe,
        ),
        "halves": lambda pipe: pm._pallas_matmul_fp4_halves(
            x, w_km.data, w_km.scale_e8m0, bn, bk, jnp.bfloat16,
            "float8_e4m3", True, pipe, elem_name=ename,
        ),
        "quarters": lambda pipe: pm._pallas_matmul_fp6q(
            x, w_km.data, w_km.scale_e8m0, ename, bn, bk, jnp.bfloat16,
            "float8_e4m3", True, pipe,
        ),
    }[pack]
    np.testing.assert_array_equal(
        np.asarray(run(True), np.float32), np.asarray(run(False), np.float32)
    )


def test_shared_activation_quantize_bit_identical():
    """The MLP/attention shared-activation path (quantize x once, feed
    gate+up / q+k+v) must be bit-identical to per-linear dynamic
    quantization at prefill sizes."""
    from flax import nnx

    from torchmx_tpu.config import MXConfig, QLinearConfig
    from torchmx_tpu.layers.linear import MXInferenceLinear, shared_activation_fq
    from torchmx_tpu.layers.mx_llama_attention import MXInferenceLlamaMLP
    from torchmx_tpu.models.llama import LlamaConfig, LlamaMLP

    qcfg = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=128,
    )
    mlp = LlamaMLP(cfg, rngs=nnx.Rngs(5))
    qmlp = MXInferenceLlamaMLP.from_float(mlp, qcfg)
    x = rand_bf16(6, (2, 64, 512), spread=1.0)  # 128 rows > fuse threshold

    shared = qmlp(x)
    # Per-linear reference: the exact ops __call__ would run without sharing.
    ref_h = jax.nn.silu(qmlp.gate_proj(x)) * qmlp.up_proj(x)
    ref = qmlp.down_proj(ref_h)
    np.testing.assert_array_equal(
        np.asarray(shared, np.float32), np.asarray(ref, np.float32)
    )

    # Decode-sized input takes the unshared path (sharing returns None).
    assert shared_activation_fq(
        rand_bf16(7, (1, 8, 512)), qmlp.gate_proj, qmlp.up_proj
    ) is None
    # Mismatched activation configs never share.
    other = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float6_e3m2"),
    )
    lin_other = MXInferenceLinear.from_weights(
        jnp.zeros((1024, 512), jnp.bfloat16), None, other
    )
    assert shared_activation_fq(x, qmlp.gate_proj, lin_other) is None


def test_quantize_tiles_obey_scale_block_rule():
    """Regression: K=384 (divisible by 128 but not 256) used to pick bk=128,
    whose (bk/32, bm) scale block Mosaic rejects on real TPU (sublane count
    4 neither divisible by 8 nor the full dim).  Every plan must use
    bk >= 256 or a full-dim block."""
    for K in (32, 64, 96, 128, 160, 256, 384, 512, 768, 1024, 1152, 4096, 14336):
        t = pq._tiles(K, 384)
        if t is None:
            continue
        bk, bm = t
        assert K % bk == 0 and 384 % bm == 0
        assert (bk // 32) % 8 == 0 or bk == K, (K, t)
    # The failing shape from the 384-hidden model resolves to a plan.
    assert pq._tiles(384, 384) is not None


# ---------------------------------------------------------------------------
# int8-domain decode path (round 3): exact re-coding + int8-MXU-dot kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ename", ["float4_e2m1", "float6_e2m3", "int8"])
def test_to_int8_domain_exact(ename):
    """fp4/fp6_e2m3 values are integer multiples of 2^-1 / 2^-3, so the
    int8-domain re-coding must dequantize bit-equal to the original."""
    w = rand_bf16(40, (256, 128), spread=3.0)
    wm = MXArray.to_mx(w, ename, 32).T
    wi = wm.to_int8_domain()
    assert wi.elem_dtype == dtypes.int8 and wi.data.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(wm.to_dtype(jnp.bfloat16), np.float32),
        np.asarray(wi.to_dtype(jnp.bfloat16), np.float32),
    )


def test_to_int8_domain_halves_and_flush_contract():
    w = rand_bf16(41, (128, 256), spread=1.0)
    wm = MXArray.to_mx(w, "float4_e2m1", 32).T.to_fp4_halves()
    wi = wm.to_int8_domain()
    np.testing.assert_array_equal(
        np.asarray(wm.to_dtype(jnp.bfloat16), np.float32),
        np.asarray(wi.to_dtype(jnp.bfloat16), np.float32),
    )
    # Blocks whose shared scale sits below the offset flush to zero (their
    # values are at the bf16-subnormal boundary; unreachable for real model
    # weights — documented conversion contract).
    tiny = jnp.full((32, 1), 2.0**-125, jnp.bfloat16)
    tm = MXArray.to_mx(tiny.T, "float6_e2m3", 32).T
    ti = tm.to_int8_domain()
    assert int(jnp.max(jnp.abs(ti.data.astype(jnp.int32)))) == 0
    # Formats whose value set is not int8-representable refuse.
    w8 = MXArray.to_mx(w, "float8_e4m3", 32).T
    with pytest.raises(AssertionError):
        w8.to_int8_domain()


@pytest.mark.parametrize("src", ["int8", "float4_e2m1", "float6_e2m3"])
def test_int8dot_matmul_matches_sim(src):
    """The int8-MXU-dot decode kernel: per-32-block integer partial sums are
    exact; only the cross-block f32 accumulation order differs from the
    dequantize-then-dot reference, so results agree to f32 reordering
    tolerance."""
    M, K, N = 8, 512, 1024
    x = rand_bf16(42, (M, K), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(43), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    wm = MXArray.to_mx(w, src, 32).T.to_int8_domain()
    assert pm.plan_int8dot(M, N, K) is not None
    out = pm.int8dot_any(x, wm, jnp.bfloat16)
    assert out is not None
    xq = MXArray.to_mx(x, "int8", 32)
    ref = jnp.matmul(
        xq.to_dtype(jnp.float32), wm.to_dtype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        rtol=1e-2,
        atol=1e-2,
    )


def test_int8dot_dispatch_and_eligibility():
    """mx_dynamic_matmul with int8 activations routes decode-size shapes with
    int8 kernel-layout weights through the int8-dot kernel; prefill-size M
    falls back to the regular fused kernel path."""
    from torchmx_tpu.ops import mx_dynamic_matmul

    M, K, N = 8, 512, 1024
    x = rand_bf16(44, (2, 4, K), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(45), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    wm = MXArray.to_mx(w, "int8", 32).T
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out_k = mx_dynamic_matmul(x, wm, "int8", 32, out_dtype=jnp.bfloat16)
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        out_j = mx_dynamic_matmul(x, wm, "int8", 32, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    assert out_k.shape == (2, 4, N)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_j, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    # Plan oracle: decode M engages, prefill M does not (regular kernel wins
    # there), production 8B shapes stay eligible.
    assert pm.plan_int8dot(8, 14336, 4096) is not None
    assert pm.plan_int8dot(64, 14336, 4096) is not None
    assert pm.plan_int8dot(1024, 14336, 4096) is None


def test_fp8dot_matmul_matches_sim():
    """The fp8-MXU-dot decode kernel (round 5, TORCHMX_FP8_DOT): raw e4m3
    codes contract on the MXU; every e4m3xe4m3 product is exact in f32, so
    results agree with the dequantize-then-dot reference to f32
    accumulation tolerance (one rounding class wider than int8-dot's
    bit-exact partials)."""
    M, K, N = 8, 512, 1024
    x = rand_bf16(52, (M, K), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(53), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    wm = MXArray.to_mx(w, "float8_e4m3", 32).T  # flat 1-byte kernel layout
    assert wm.fp4_pack == "pair"
    out = pm.fp8dot_any(x, wm, jnp.bfloat16)
    assert out is not None
    xq = MXArray.to_mx(x, "float8_e4m3", 32)
    ref = jnp.matmul(xq.to_dtype(jnp.float32), wm.to_dtype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        rtol=1e-2,
        atol=1e-2,
    )
    # Halves-packed weights are ineligible (u16 words don't feed the MXU raw).
    wh = MXArray.to_mx(w * 1e-0, "float8_e4m3", 32).T.to_fp8_halves()
    assert pm.fp8dot_any(x, wh, jnp.bfloat16) is None


def test_fp8dot_dispatch_env():
    """mx_dynamic_matmul with fp8 activations routes decode-size shapes
    through the fp8-dot kernel only under TORCHMX_FP8_DOT=1; the result
    matches the jnp simulation within f32 accumulation tolerance."""
    from torchmx_tpu.ops import mx_dynamic_matmul

    M, K, N = 8, 512, 1024
    x = rand_bf16(54, (M, K), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(55), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    wm = MXArray.to_mx(w, "float8_e4m3", 32).T
    old_b, old_f = env.TORCHMX_QUANTIZE_BACKEND, env.TORCHMX_FP8_DOT
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        env.TORCHMX_FP8_DOT = "1"
        out_k = mx_dynamic_matmul(x, wm, "float8_e4m3", 32, out_dtype=jnp.bfloat16)
        env.TORCHMX_QUANTIZE_BACKEND = "jnp"
        out_j = mx_dynamic_matmul(x, wm, "float8_e4m3", 32, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old_b
        env.TORCHMX_FP8_DOT = old_f
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32),
        np.asarray(out_j, np.float32),
        rtol=1e-2,
        atol=1e-2,
    )


def test_int8_domain_linear_layer_env():
    """TORCHMX_INT8_DOMAIN=1 re-codes eligible fp4/fp6_e2m3 linear weights;
    forward matches the packed-layout layer within f32 accumulation
    tolerance (same MX values either way)."""
    from torchmx_tpu.config import MXConfig, QLinearConfig
    from torchmx_tpu.layers.linear import MXInferenceLinear

    K, N = 512, 1024
    w = (jax.random.normal(jax.random.PRNGKey(46), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    qcfg = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("int8"),
    )
    old = env.TORCHMX_INT8_DOMAIN
    try:
        env.TORCHMX_INT8_DOMAIN = "1"
        lin_i8 = MXInferenceLinear.from_weights(w, None, qcfg)
        env.TORCHMX_INT8_DOMAIN = "0"
        lin_ref = MXInferenceLinear.from_weights(w, None, qcfg)
    finally:
        env.TORCHMX_INT8_DOMAIN = old
    assert lin_i8.weight.get_value().elem_dtype == dtypes.int8
    assert lin_ref.weight.get_value().elem_dtype == dtypes.float4_e2m1
    x = rand_bf16(47, (8, K), spread=1.0)
    a = lin_i8(x)
    b = lin_ref(x)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fp4_swar_decode_exhaustive():
    """The SWAR two-per-lane fp4 decode must be bit-identical to the
    two-plane specialized decode over EVERY (hi code, lo code, sa, se_b)
    combination — including the se<=1 flush region and se==0 blocks whose
    large codes still decode to bf16 normals (3*2^-126 etc.)."""
    ses = [0, 1, 2, 3, 64, 127, 200, 252]
    bytes_all = np.arange(256, dtype=np.int32)
    rows = []
    for sa in ses:
        for sb in ses:
            b = jnp.asarray(np.tile(bytes_all, (32, 1)))  # (32, 256)
            sa_a = jnp.full((1, 256), sa, jnp.int32)
            sb_a = jnp.full((1, 256), sb, jnp.int32)
            w_hi, w_lo = pm.decode_fp4_swar_planes(b, sa_a, sb_a)
            se_a = pm._expand_scale(sa_a, 32)
            se_b = pm._expand_scale(sb_a, 32)
            r_hi = pm.decode_fp4_to_bf16((b >> 4) & 0xF, se_a)
            r_lo = pm.decode_fp4_to_bf16(b & 0xF, se_b)
            np.testing.assert_array_equal(
                np.asarray(w_hi, np.float32), np.asarray(r_hi, np.float32),
                err_msg=f"hi sa={sa} sb={sb}",
            )
            np.testing.assert_array_equal(
                np.asarray(w_lo, np.float32), np.asarray(r_lo, np.float32),
                err_msg=f"lo sa={sa} sb={sb}",
            )
            rows.append(1)
    assert len(rows) == len(ses) ** 2


def test_fp8_swar_decode_exhaustive():
    """The SWAR two-per-lane fp8 decode must be bit-identical to the generic
    scalar decode (dot_operand contract) over EVERY (hi code, lo code)
    combination and a scale sweep of the eligible domain (se >= 10 — the
    no-underflow precondition MXArray.to_fp8_halves enforces), including
    subnormal codes (element exponent 0) and zero codes in both halves."""
    from torchmx_tpu import dtypes as dt

    ses = [10, 11, 16, 64, 127, 200, 252, 254]
    codes_all = np.arange(256, dtype=np.int32)
    for sa in ses:
        for sb in ses:
            # words (32, 256): row r pairs hi code r*8 % 256 ... simpler:
            # all 256 codes in the lo half against 32 representative hi
            # codes per scale pair (subnormals 0..7, normals, negatives).
            hi = np.asarray(
                [0, 1, 2, 3, 4, 5, 6, 7, 8, 15, 16, 63, 64, 100, 126, 127,
                 128, 129, 130, 135, 136, 143, 144, 191, 192, 228, 254, 255,
                 9, 17, 33, 65], np.int32,
            )[:, None]
            w = jnp.asarray((hi << 8) | codes_all[None, :])  # (32, 256)
            sa_a = jnp.full((1, 256), sa, jnp.int32)
            sb_a = jnp.full((1, 256), sb, jnp.int32)
            w_hi, w_lo = pm.decode_fp8_swar_planes(w, sa_a, sb_a)
            se_a = pm._expand_scale(sa_a, 32)
            se_b = pm._expand_scale(sb_a, 32)
            r_hi = pm.decode_codes_to_bf16(
                jnp.asarray(np.tile(hi, (1, 256))), se_a,
                dt.float8_e4m3, dot_operand=True,
            )
            r_lo = pm.decode_codes_to_bf16(
                jnp.asarray(np.tile(codes_all[None, :], (32, 1))), se_b,
                dt.float8_e4m3, dot_operand=True,
            )
            np.testing.assert_array_equal(
                np.asarray(w_hi, np.float32), np.asarray(r_hi, np.float32),
                err_msg=f"hi sa={sa} sb={sb}",
            )
            np.testing.assert_array_equal(
                np.asarray(w_lo, np.float32), np.asarray(r_lo, np.float32),
                err_msg=f"lo sa={sa} sb={sb}",
            )


def test_fp8_halves_layout_roundtrip_and_matmul():
    """The fp8 kernel "halves" packing dequantizes identically to the flat
    layout, and the SWAR halves kernel matches the dequant-then-dot ground
    truth through matmul_any."""
    x = rand_bf16(16, (64, 512), spread=1.0)
    w = (jax.random.normal(jax.random.PRNGKey(17), (128, 512)) * 0.05).astype(
        jnp.bfloat16
    )
    w_km = MXArray.to_mx(w, "float8_e4m3", 32).T  # (K=512, N=128), flat
    assert int(jnp.min(w_km.scale_e8m0)) >= 10
    w_h = w_km.to_fp8_halves()
    assert w_h.fp4_pack == "halves" and w_h.shape == w_km.shape
    assert w_h.data.dtype == jnp.uint16 and w_h.data.shape == (256, 128)
    np.testing.assert_array_equal(
        np.asarray(w_h.to_dtype(jnp.bfloat16)),
        np.asarray(w_km.to_dtype(jnp.bfloat16)),
    )
    out = pm.matmul_any(x, w_h, jnp.bfloat16)
    assert out is not None
    gt = jnp.matmul(
        x, w_km.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(gt, np.float32), rtol=2e-2, atol=1e-2
    )
    # Fused activation fq rides the halves kernel too (the serving config).
    out_fq = pm.matmul_any(x[:8], w_h, jnp.bfloat16, act_fq="float8_e4m3")
    assert out_fq is not None
    x_fq = MXArray.to_mx(x[:8], "float8_e4m3", 32).to_dtype(jnp.bfloat16)
    gt_fq = jnp.matmul(
        x_fq, w_km.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out_fq, np.float32), np.asarray(gt_fq, np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_fp8_halves_linear_layer_selection():
    """MXInferenceLinear repacks eligible fp8 weights into the halves layout
    (env-gated) and the layer forward matches the flat-layout layer."""
    from torchmx_tpu.config import MXConfig, QLinearConfig
    from torchmx_tpu.layers.linear import MXInferenceLinear

    K, N = 512, 256
    w = (jax.random.normal(jax.random.PRNGKey(3), (N, K)) * 0.05).astype(
        jnp.bfloat16
    )
    qcfg = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    old = env.TORCHMX_FP8_HALVES
    try:
        env.TORCHMX_FP8_HALVES = "1"
        lin_h = MXInferenceLinear.from_weights(w, None, qcfg)
        env.TORCHMX_FP8_HALVES = "0"
        lin_flat = MXInferenceLinear.from_weights(w, None, qcfg)
    finally:
        env.TORCHMX_FP8_HALVES = old
    assert lin_h.weight.get_value().fp4_pack == "halves"
    assert lin_flat.weight.get_value().fp4_pack == "pair"
    x = rand_bf16(21, (8, K), spread=1.0)
    a = lin_h(x)
    b = lin_flat(x)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-2, atol=2e-2
    )
