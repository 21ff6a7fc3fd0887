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


@pytest.mark.parametrize("elem", ["float8_e4m3", "int8"])
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
