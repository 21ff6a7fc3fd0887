"""Block Hadamard rotation (outlier-resilient MX quantization, rotation.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchmx_tpu.config import MXConfig, QLinearConfig
from torchmx_tpu.layers.linear import MXInferenceLinear, shared_activation_fq
from torchmx_tpu.ops import mx_fake_quantize
from torchmx_tpu.rotation import hadamard, rotate_blocks


def test_hadamard_orthogonality():
    h = np.asarray(hadamard(32, jnp.float32))
    np.testing.assert_array_equal(h @ h.T, 32 * np.eye(32, dtype=np.float32))
    assert set(np.unique(h)) == {-1.0, 1.0}


def test_rotation_roundtrip_exact_on_small_ints():
    """(x H) (H/B) == x exactly when every intermediate is bf16-exact."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-4, 5, size=(8, 128)), jnp.bfloat16)
    back = rotate_blocks(rotate_blocks(x), inverse=True)
    np.testing.assert_array_equal(np.asarray(back, np.float32), np.asarray(x, np.float32))


def test_rotated_linear_wiring_bit_exact():
    """A rotated MXInferenceLinear must compute exactly: rotate x, quantize,
    matmul against the (rotated, quantized) weight."""
    qcfg = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
        rotate_blocks=True,
    )
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.bfloat16)
    lin = MXInferenceLinear.from_weights(w, None, qcfg)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    out = lin(x)

    x_rot = rotate_blocks(x)
    x_fq = mx_fake_quantize(x_rot, "float8_e4m3", 32)
    ref = jnp.matmul(
        x_fq, lin.weight.get_value().to_dtype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-3, atol=1e-3
    )
    # Round-trip through the config dict keeps the flag.
    assert QLinearConfig.load_from_dict(qcfg.to_dict()) == qcfg


def test_rotation_improves_outlier_quantization():
    """With outlier input channels in the fp4 weight, rotated MXFP4 output
    error must be well below unrotated (the whole point of the extension —
    fp4's 8 magnitude codes span only ~2 binades, so one outlier per
    32-block crushes the rest of the block to zero)."""
    rng = np.random.default_rng(2)
    w_np = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
    w_np[:, ::32] *= 50.0  # one outlier input-channel per MX weight block
    w = jnp.asarray(w_np, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((16, 512)), jnp.bfloat16)
    gt = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)

    def err(rotate):
        qcfg = QLinearConfig(
            weights_config=MXConfig("float4_e2m1"),
            activations_config=MXConfig("float8_e4m3"),
            rotate_blocks=rotate,
        )
        lin = MXInferenceLinear.from_weights(w, None, qcfg)
        out = lin(x).astype(jnp.float32)
        return float(jnp.mean((out - gt) ** 2))

    e_plain, e_rot = err(False), err(True)
    assert e_rot < 0.5 * e_plain, (e_plain, e_rot)


def test_shared_activation_fq_respects_rotation():
    qr = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
        rotate_blocks=True,
    )
    qp = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.bfloat16)
    lin_r = MXInferenceLinear.from_weights(w, None, qr)
    lin_r2 = MXInferenceLinear.from_weights(w, None, qr)
    lin_p = MXInferenceLinear.from_weights(w, None, qp)
    x = jnp.asarray(rng.standard_normal((128, 256)), jnp.bfloat16)
    # Mixed rotation flags: no sharing.
    assert shared_activation_fq(x, lin_r, lin_p) is None
    # Same flags: shared fq equals the rotated+quantized activation.
    x_fq = shared_activation_fq(x, lin_r, lin_r2)
    assert x_fq is not None
    ref = mx_fake_quantize(rotate_blocks(x), "float8_e4m3", 32)
    np.testing.assert_array_equal(
        np.asarray(x_fq, np.float32), np.asarray(ref, np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(lin_r.apply_prequantized(x_fq), np.float32),
        np.asarray(lin_r(x), np.float32),
        rtol=5e-3, atol=1e-3,
    )
