"""Kernel-path eligibility + fallback observability.

The fused Pallas kernels fall back to the XLA dequantize path when a shape
fails the tiling rules — correct but ~10x slower on weight-bound shapes.
These tests pin the production shapes (Llama-3-8B decode/prefill/MLP and the
tiny CI model) to the kernel path via the static planning oracle, and assert
the fallback counter fires (never silently) when a shape is ineligible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import env_variables as env
from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.ops import fallback_counts, mx_matmul, reset_fallback_counts
from torchmx_tpu.ops import pallas_matmul as pm
from torchmx_tpu.ops.pallas_attention import plan_cached_attention

# (M, K, N) of every matmul in a Llama-3-8B decode/prefill step
# (hidden 4096, kv 8 heads x 128, MLP intermediate 14336).
LLAMA_8B_SHAPES = [
    ("decode-qo", 1, 4096, 4096),
    ("decode-kv", 1, 4096, 1024),
    ("decode-gate-up", 1, 4096, 14336),
    ("decode-down", 1, 14336, 4096),
    ("decode-b32-qo", 32, 4096, 4096),
    ("prefill-qo", 2048, 4096, 4096),
    ("prefill-kv", 2048, 4096, 1024),
    ("prefill-gate-up", 2048, 4096, 14336),
    ("prefill-down", 2048, 14336, 4096),
    ("prefill-b4-gate-up", 8192, 4096, 14336),
    # Tiny CI model (tests/test_models.py): hidden 128, intermediate 256.
    ("tiny-proj", 8, 128, 128),
    ("tiny-mlp", 8, 128, 256),
    ("tiny-down", 8, 256, 128),
]


@pytest.mark.parametrize("name,M,K,N", LLAMA_8B_SHAPES)
@pytest.mark.parametrize(
    "elem,pack",
    [("float8_e4m3", "pair"), ("float6_e3m2", "pair"), ("float4_e2m1", "pair")],
)
def test_production_shapes_take_kernel_path(name, M, K, N, elem, pack):
    assert pm.plan_matmul(M, N, K, elem, pack) is not None, (
        f"{name} ({M},{K})x({K},{N}) {elem}/{pack} regressed off the kernel path"
    )


@pytest.mark.parametrize(
    "name,M,K,N",
    [s for s in LLAMA_8B_SHAPES if s[2] % 512 == 0],
)
def test_production_shapes_fp4_halves_kernel_path(name, M, K, N):
    # The halves layout (MXInferenceLinear's fp4 storage when K % 512 == 0)
    # must stay eligible too.
    assert pm.plan_matmul(M, N, K, "float4_e2m1", "halves") is not None


@pytest.mark.parametrize("fmt", ["float8_e4m3", "int8"])
def test_8b_attention_shapes_take_kernel_path(fmt):
    # Llama-3-8B MX-KV-cache attention: 32 q heads / 8 kv heads, head_dim
    # 128, cache lengths up to 8192 — both decode (q_len 1) and the tiny CI
    # config (4 heads x 32 dim) must plan onto the fused kernel.
    for kv_len in (1024, 8192):
        assert plan_cached_attention(32, 8, 1, kv_len, 128, fmt) is not None
        assert plan_cached_attention(32, 8, 2048, kv_len, 128, fmt) is not None


def test_ineligible_shape_counts_fallback():
    reset_fallback_counts()
    w = MXArray.to_mx(
        (jax.random.normal(jax.random.PRNGKey(0), (100, 32)) * 0.1).astype(
            jnp.bfloat16
        ),
        "float8_e4m3",
        32,
    ).T  # kernel layout (K=32, N=100): N % 128 != 0 -> ineligible
    x = jnp.ones((8, 32), jnp.bfloat16)
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out = mx_matmul(x, w, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    assert out.shape == (8, 100)
    counts = fallback_counts()
    assert any(k.startswith("mx_matmul") for k in counts), counts
    reset_fallback_counts()
    assert fallback_counts() == {}


def test_eligible_shape_does_not_count_fallback():
    reset_fallback_counts()
    w = MXArray.to_mx(
        (jax.random.normal(jax.random.PRNGKey(1), (128, 128)) * 0.1).astype(
            jnp.bfloat16
        ),
        "float8_e4m3",
        32,
    ).T
    x = jnp.ones((8, 128), jnp.bfloat16)
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out = mx_matmul(x, w, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    assert not fallback_counts()
    # And the kernel output matches the jnp path on this shape.
    ref = jnp.matmul(
        x, w.to_dtype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-3, atol=1e-3
    )
