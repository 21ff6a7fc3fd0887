"""MXArray semantics tests: roundtrip SQNR gates, structural-op equivalence
against dequantize-then-op ground truth (atol=0), padding paths, special
values, packing roundtrips, pytree/jit integration, and STE gradients.

Model: reference ``tests/test_mx_tensor.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import dtypes
from torchmx_tpu.mx_array import MXArray, fake_quantize, make_quantize_gradient, quantize_mx
from torchmx_tpu.ops import mx_linear, mx_matmul
from torchmx_tpu.packing import pack_uint4, pack_uint6, unpack_uint4, unpack_uint6

# Roundtrip SQNR gates (reference ``tests/test_mx_tensor.py:44-64``).
SQNR_GATES = {
    "float8_e4m3": 19.0,
    "int8": 38.0,
    "float6_e3m2": 14.0,
    "float6_e2m3": 14.0,
    "float4_e2m1": 14.0,
}


def sqnr(ref, est):
    ref = np.asarray(ref, np.float32)
    est = np.asarray(est, np.float32)
    return 10 * np.log10((ref**2).mean() / ((ref - est) ** 2).mean())


def rand_bf16(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32).astype(
        jnp.bfloat16
    )


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("elem_dtype", dtypes.SUPPORTED_ELEM_DTYPES, ids=str)
def test_roundtrip_sqnr(elem_dtype):
    x = rand_bf16(0, (128, 256))
    y = MXArray.to_mx(x, elem_dtype, 32).to_dtype(jnp.bfloat16)
    assert sqnr(x, y) >= SQNR_GATES[elem_dtype.name]


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("elem_dtype", dtypes.SUPPORTED_FP_ELEM_DTYPES, ids=str)
def test_transpose_2d_matches_dequant_then_op(elem_dtype):
    x = rand_bf16(1, (8, 64))
    x_mx = MXArray.to_mx(x, elem_dtype, 32)
    gt = jnp.transpose(x_mx.to_dtype(jnp.bfloat16))
    out = x_mx.T.to_dtype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))
    assert x_mx.T.block_dim == 0
    assert x_mx.T.shape == (64, 8)


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("elem_dtype", dtypes.SUPPORTED_FP_ELEM_DTYPES, ids=str)
def test_transpose_4d_matches_dequant_then_op(elem_dtype):
    x = rand_bf16(2, (2, 3, 8, 64))
    x_mx = MXArray.to_mx(x, elem_dtype, 32)
    gt = jnp.swapaxes(x_mx.to_dtype(jnp.bfloat16), 2, 3)
    out = x_mx.swapaxes(2, 3).to_dtype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))
    assert x_mx.swapaxes(2, 3).block_dim == 2


@pytest.mark.usefixtures("set_quantization_env")
def test_reshape_merge_leading_dims():
    x = rand_bf16(3, (2, 4, 8, 64))
    x_mx = MXArray.to_mx(x, dtypes.float8_e4m3, 32)
    r = x_mx.reshape(8, 8, 64)
    gt = x_mx.to_dtype(jnp.bfloat16).reshape(8, 8, 64)
    np.testing.assert_array_equal(np.asarray(r.to_dtype(jnp.bfloat16)), np.asarray(gt))


@pytest.mark.usefixtures("set_quantization_env")
def test_reshape_second_last_block_dim():
    # The 4-D attention lowering case: block_dim second-last (like V blocked
    # on q_len), reshape merging the batch dims (reference ``ops.py:181-248``).
    x = rand_bf16(4, (2, 3, 64, 16))
    x_mx = MXArray.to_mx(x.swapaxes(2, 3), dtypes.float8_e4m3, 32).swapaxes(2, 3)
    assert x_mx.block_dim == 2
    r = x_mx.reshape(6, 64, 16)
    gt = x_mx.to_dtype(jnp.bfloat16).reshape(6, 64, 16)
    np.testing.assert_array_equal(np.asarray(r.to_dtype(jnp.bfloat16)), np.asarray(gt))


@pytest.mark.usefixtures("set_quantization_env")
def test_broadcast_to_gqa_expand():
    # GQA-style expand: (b, 1, s, d) -> (b, h, s, d).
    x = rand_bf16(5, (2, 1, 8, 32))
    x_mx = MXArray.to_mx(x, dtypes.float6_e3m2, 32)
    e = x_mx.broadcast_to((2, 4, 8, 32))
    gt = jnp.broadcast_to(x_mx.to_dtype(jnp.bfloat16), (2, 4, 8, 32))
    np.testing.assert_array_equal(np.asarray(e.to_dtype(jnp.bfloat16)), np.asarray(gt))


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("padding", [0, 1, 3, 12, 21, 25])
@pytest.mark.parametrize("elem_dtype", dtypes.SUPPORTED_ELEM_DTYPES, ids=str)
def test_padding_roundtrip(elem_dtype, padding):
    d = 64 - padding
    x = rand_bf16(6, (4, d))
    x_mx = MXArray.to_mx(x, elem_dtype, 32)
    assert x_mx.padding == padding
    assert x_mx.shape == (4, d)
    y = x_mx.to_dtype(jnp.bfloat16)
    assert y.shape == (4, d)
    assert sqnr(x, y) >= SQNR_GATES[elem_dtype.name]


@pytest.mark.usefixtures("set_quantization_env")
@pytest.mark.parametrize("elem_dtype", dtypes.SUPPORTED_ELEM_DTYPES, ids=str)
def test_special_values(elem_dtype, special_bfloat16_vector):
    """inf/NaN blocks: scale 255, payload +0, dequant all-NaN with sign 0
    (reference ``test_mx_tensor.py:105-161``)."""
    x = special_bfloat16_vector
    scale, data = quantize_mx(x, elem_dtype.name, 4)
    gt = np.zeros(x.shape, dtype=np.uint8)
    if elem_dtype == dtypes.float4_e2m1:
        gt = np.asarray(pack_uint4(jnp.asarray(gt)))
    special_rows = [0, 1, 2, 3, 4]
    s = np.asarray(scale)
    assert (s[special_rows, 0] == 255).all()
    d = np.asarray(data).astype(np.uint8)
    # Rows with specials quantize to +0 payloads in the affected block.
    np.testing.assert_array_equal(d[special_rows], gt[special_rows])

    x_mx = MXArray.to_mx(x, elem_dtype, 4)
    deq = np.asarray(x_mx.to_dtype(jnp.bfloat16), np.float32)
    assert np.isnan(deq[special_rows]).all()


@pytest.mark.usefixtures("set_quantization_env")
def test_mx_matmul_2d_equals_dequant_then_op():
    a = rand_bf16(7, (16, 64))
    b = rand_bf16(8, (64, 32))
    a_mx = MXArray.to_mx(a, dtypes.float8_e4m3, 32)
    b_mx = MXArray.to_mx(b.T, dtypes.float6_e3m2, 32).T
    out = mx_matmul(a_mx, b_mx)
    gt = jnp.matmul(
        a_mx.to_dtype(jnp.bfloat16),
        b_mx.to_dtype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))


@pytest.mark.usefixtures("set_quantization_env")
def test_mx_bmm_4d_equals_dequant_then_op():
    a = rand_bf16(9, (2, 4, 8, 32))
    b = rand_bf16(10, (2, 4, 8, 32))
    a_mx = MXArray.to_mx(a, dtypes.float8_e4m3, 32)
    b_mx = MXArray.to_mx(b, dtypes.float8_e4m3, 32)
    out = mx_matmul(a_mx, b_mx.swapaxes(2, 3))
    gt = jnp.matmul(
        a_mx.to_dtype(jnp.bfloat16),
        b_mx.swapaxes(2, 3).to_dtype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))


def test_fp4_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 16, size=(6, 8), dtype=np.uint8))
    assert (np.asarray(unpack_uint4(pack_uint4(x))) == np.asarray(x)).all()
    # Axis-0 packing too.
    assert (np.asarray(unpack_uint4(pack_uint4(x, 0), 0)) == np.asarray(x)).all()


def test_fp6_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 64, size=(5, 16), dtype=np.uint8))
    packed = pack_uint6(x)
    assert packed.shape == (5, 12)
    assert (np.asarray(unpack_uint6(packed)) == np.asarray(x)).all()
    p0 = pack_uint6(x.T, 0)
    assert (np.asarray(unpack_uint6(p0, 0)) == np.asarray(x.T)).all()


@pytest.mark.usefixtures("set_quantization_env")
def test_pytree_roundtrip_and_jit():
    x = rand_bf16(11, (4, 64))
    x_mx = MXArray.to_mx(x, dtypes.float4_e2m1, 32)
    leaves, treedef = jax.tree_util.tree_flatten(x_mx)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.elem_dtype == x_mx.elem_dtype
    assert rebuilt.shape == x_mx.shape

    # MXArray flows through jit as argument and return value.
    @jax.jit
    def f(mx):
        return mx.to_dtype(jnp.bfloat16) * 2

    np.testing.assert_array_equal(
        np.asarray(f(x_mx)), np.asarray(x_mx.to_dtype(jnp.bfloat16) * 2)
    )

    @jax.jit
    def g(x):
        return MXArray.to_mx(x, dtypes.float8_e4m3, 32)

    out = g(x)
    assert isinstance(out, MXArray)
    np.testing.assert_array_equal(
        np.asarray(out.data), np.asarray(MXArray.to_mx(x, dtypes.float8_e4m3, 32).data)
    )


def test_fake_quantize_straight_through_gradient():
    x = rand_bf16(12, (4, 64)).astype(jnp.float32).astype(jnp.bfloat16)

    def loss(x):
        return jnp.sum(fake_quantize(x, "float8_e4m3", 32).astype(jnp.float32))

    g = jax.grad(loss)(x.astype(jnp.float32).astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(g, np.float32), np.ones((4, 64), np.float32))


def test_quantize_gradient_hook():
    f = make_quantize_gradient("float8_e4m3", 32)
    x = rand_bf16(13, (4, 64))
    # forward identity
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))
    # backward quantizes the cotangent
    g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32)))(x)
    ones_q = MXArray.to_mx(jnp.ones_like(x), "float8_e4m3", 32).to_dtype(x.dtype)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ones_q))


@pytest.mark.usefixtures("set_quantization_env")
def test_linear_with_bias_matches_ground_truth():
    x = rand_bf16(14, (8, 64))
    w = rand_bf16(15, (16, 64))
    b = rand_bf16(16, (16,))
    x_mx = MXArray.to_mx(x, dtypes.float8_e4m3, 32)
    w_mx = MXArray.to_mx(w, dtypes.float6_e3m2, 32)
    out = mx_linear(x_mx, w_mx, b)
    gt = (
        jnp.matmul(
            x_mx.to_dtype(jnp.bfloat16),
            w_mx.to_dtype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        + b
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))


def test_astype_rebrands_orig_dtype_only():
    """The autocast `_to_copy` analog (reference ops.py:251-276): payload and
    scale bits unchanged, only the dequantization target dtype moves."""
    import jax.numpy as jnp
    import numpy as np

    from torchmx_tpu.mx_array import MXArray

    x = (jnp.arange(64, dtype=jnp.float32) / 7.0).astype(jnp.bfloat16).reshape(2, 32)
    mx = MXArray.to_mx(x, "float8_e4m3", 32)
    mx32 = mx.astype(jnp.float32)
    assert mx32.orig_dtype == jnp.float32 and mx.orig_dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(mx32.data), np.asarray(mx.data))
    np.testing.assert_array_equal(
        np.asarray(mx32.scale_e8m0), np.asarray(mx.scale_e8m0)
    )
    out = mx32.to_dtype(mx32.orig_dtype)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(mx.to_dtype(jnp.bfloat16), np.float32)
    )


def test_to_mx_mse_scale_search():
    """Per-block MSE scale search: shift-0-only reproduces to_mx bitwise;
    the multi-shift search never does worse than the max-based rule (and on
    realistic distributions selects shift 0 — see the docstring caveat)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchmx_tpu.mx_array import MXArray

    rng = np.random.default_rng(6)
    w_np = (rng.standard_normal((32, 256)) * 0.05).astype(np.float32)
    w_np[:, ::32] *= 50.0
    w = jnp.asarray(w_np, jnp.bfloat16)

    a = MXArray.to_mx(w, "float4_e2m1", 32)
    b = MXArray.to_mx_mse(w, "float4_e2m1", 32, shifts=(0,))
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
    np.testing.assert_array_equal(
        np.asarray(a.scale_e8m0), np.asarray(b.scale_e8m0)
    )

    def mse(mx):
        d = np.asarray(mx.to_dtype(jnp.bfloat16), np.float32)
        return float(np.mean((d - w_np) ** 2))

    opt = MXArray.to_mx_mse(w, "float4_e2m1", 32)
    assert mse(opt) <= mse(a) + 1e-12
    assert opt.shape == a.shape and opt.elem_dtype == a.elem_dtype
