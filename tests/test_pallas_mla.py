"""Fused absorbed-MLA latent-cache attention: kernel vs the eager
dequantize-the-cache reference (interpret mode on CPU; native on TPU).
Covers decode (sq=1), prefill through the cache (sq>1), per-row positions
(continuous batching), the MX formats and the bf16 (hp MLACache) variant,
and the fp4 fallback."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmx_tpu import env_variables as env
from torchmx_tpu.models.deepseek import MLACache, MXMLACache
from torchmx_tpu.ops.pallas_mla import mla_cached_attention, plan_mla_attention

B, N, R, DR, L = 2, 4, 64, 32, 256


def _force_fused():
    old = env.TORCHMX_FUSED_ATTENTION
    env.TORCHMX_FUSED_ATTENTION = "pallas"
    return old


def make_mx_cache(key, elem):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    lat = (jax.random.normal(k1, (B, L, R)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, DR)) * 0.3).astype(jnp.bfloat16)
    cache = MXMLACache.create(B, L, R, DR, elem, 32)
    return cache.write(lat, rot, 0)


def make_hp_cache(key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    lat = (jax.random.normal(k1, (B, L, R)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, DR)) * 0.3).astype(jnp.bfloat16)
    return MLACache.create(B, L, R, DR).write(lat, rot, 0)


def ref_absorbed(q_lat, q_rot, cache, q_off, kv_len, sm_scale):
    """The model's eager cached path: dequantize the whole latent buffer,
    full fp32 softmax, einsum contractions (models/deepseek.py)."""
    lat, rot = cache.read()
    lat32, rot32 = lat.astype(jnp.float32), rot.astype(jnp.float32)
    s = jnp.einsum("bhsr,blr->bhsl", q_lat.astype(jnp.float32), lat32)
    s = s + jnp.einsum("bhsd,bld->bhsl", q_rot.astype(jnp.float32), rot32)
    s = s * sm_scale
    sq = q_lat.shape[2]
    i = jnp.asarray(q_off, jnp.int32).reshape(-1, 1, 1) + jnp.arange(sq)[None, :, None]
    j = jnp.arange(lat.shape[1])[None, None, :]
    kvl = jnp.asarray(kv_len, jnp.int32).reshape(-1, 1, 1)
    mask = jnp.where((j <= i) & (j < kvl), 0.0, jnp.finfo(jnp.float32).min)
    s = s + mask[:, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhsl,blr->bhsr", p, lat32)


def run_both(q_lat, q_rot, cache, q_off, kv_len):
    sm = 1.0 / math.sqrt(R + DR)
    old = _force_fused()
    try:
        out = mla_cached_attention(q_lat, q_rot, cache, q_off, kv_len, sm)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    assert out is not None
    ref = ref_absorbed(q_lat, q_rot, cache, q_off, kv_len, sm)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def make_q(key, sq):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    q_lat = (jax.random.normal(k1, (B, N, sq, R)) * 0.3).astype(jnp.bfloat16)
    q_rot = (jax.random.normal(k2, (B, N, sq, DR)) * 0.3).astype(jnp.bfloat16)
    return q_lat, q_rot


@pytest.mark.parametrize("elem", ["int8", "float8_e4m3", "float6_e3m2"])
def test_mla_decode_matches_eager(elem):
    q_lat, q_rot = make_q(0, 1)
    cache = make_mx_cache(1, elem)
    run_both(q_lat, q_rot, cache, L - 1, L)


def test_mla_prefill_matches_eager():
    sq = 16
    q_lat, q_rot = make_q(2, sq)
    cache = make_mx_cache(3, "int8")
    run_both(q_lat, q_rot, cache, 32, 32 + sq)


def test_mla_per_row_positions():
    q_lat, q_rot = make_q(4, 1)
    cache = make_mx_cache(5, "int8")
    q_off = jnp.asarray([17, 200], jnp.int32)
    run_both(q_lat, q_rot, cache, q_off, q_off + 1)


def test_mla_hp_cache_variant():
    q_lat, q_rot = make_q(6, 1)
    cache = make_hp_cache(7)
    run_both(q_lat, q_rot, cache, L - 1, L)


def test_mla_fp4_halves_fused():
    """fp4 latents (halves-packed, round 5 — previously an eager fallback)
    run the fused kernel and match the eager dequantized reference.  Widths
    must split into whole 32-blocks per nibble plane (% 64), so this test
    uses dr=64 (the production DeepSeek-V3 value; the file default DR=32
    is fp4-ineligible and stays a fallback, tested below)."""
    dr = 64
    assert plan_mla_attention(N, 1, L, R, dr, "float4_e2m1") is not None
    # dr=32: one nibble plane would hold half a block — ineligible.
    assert plan_mla_attention(N, 1, L, R, 32, "float4_e2m1") is None

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    lat = (jax.random.normal(k1, (B, L, R)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, dr)) * 0.3).astype(jnp.bfloat16)
    cache = MXMLACache.create(B, L, R, dr, "float4_e2m1", 32).write(lat, rot, 0)
    k3, k4 = jax.random.split(jax.random.PRNGKey(12))
    q_lat = (jax.random.normal(k3, (B, N, 1, R)) * 0.3).astype(jnp.bfloat16)
    q_rot = (jax.random.normal(k4, (B, N, 1, dr)) * 0.3).astype(jnp.bfloat16)
    sm = 1.0 / math.sqrt(R + dr)
    old = _force_fused()
    try:
        out = mla_cached_attention(q_lat, q_rot, cache, L - 1, L, sm)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    assert out is not None
    ref = ref_absorbed(q_lat, q_rot, cache, L - 1, L, sm)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_mla_fp4_halves_roundtrip():
    """MXMLACache fp4 write/read: halves-packed storage dequantizes to the
    same values as a plain pair-packed quantize (the packing is layout, not
    numerics)."""
    from torchmx_tpu.mx_array import dequantize_mx, quantize_mx

    dr = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    lat = (jax.random.normal(k1, (B, L, R)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, dr)) * 0.3).astype(jnp.bfloat16)
    cache = MXMLACache.create(B, L, R, dr, "float4_e2m1", 32).write(lat, rot, 0)
    got_lat, got_rot = cache.read()
    s, d = quantize_mx(lat, "float4_e2m1", 32)
    want_lat = dequantize_mx(d, s, "float4_e2m1", 32, jnp.bfloat16, 2)
    s, d = quantize_mx(rot, "float4_e2m1", 32)
    want_rot = dequantize_mx(d, s, "float4_e2m1", 32, jnp.bfloat16, 2)
    np.testing.assert_array_equal(np.asarray(got_lat), np.asarray(want_lat))
    np.testing.assert_array_equal(np.asarray(got_rot), np.asarray(want_rot))


def test_mla_int8dot_decode_close_to_reference():
    """The all-int8 MXU-dot MLA decode tier (d-major latent cache, round 5):
    opt-in, decode-only, SQNR vs the eager dequantized reference above the
    30 dB gate (q int8 quantization + fixed-point P requant are the only
    error sources — above the fp8 the reference's QKV configs would apply)."""
    from torchmx_tpu.ops.pallas_mla import use_mla_int8dot

    r = 128  # int8-dot needs r % 128 == 0 (lane-multiple latent rank)
    k1, k2 = jax.random.split(jax.random.PRNGKey(14))
    lat = (jax.random.normal(k1, (B, L, r)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, DR)) * 0.3).astype(jnp.bfloat16)
    cache = MXMLACache.create(B, L, r, DR, "int8", 32, layout="dmajor")
    cache = cache.write(lat, rot, 0)
    assert cache.lat_data.shape == (B, r, L)
    k3, k4 = jax.random.split(jax.random.PRNGKey(15))
    q_lat = (jax.random.normal(k3, (B, N, 1, r)) * 0.3).astype(jnp.bfloat16)
    q_rot = (jax.random.normal(k4, (B, N, 1, DR)) * 0.3).astype(jnp.bfloat16)
    sm = 1.0 / math.sqrt(r + DR)

    assert not use_mla_int8dot(cache, 1, r, DR)  # off by default
    old_flag = env.TORCHMX_ATTN_INT8_DOT
    env.TORCHMX_ATTN_INT8_DOT = "1"
    old = _force_fused()
    try:
        assert use_mla_int8dot(cache, 1, r, DR)
        assert not use_mla_int8dot(cache, 4, r, DR)  # decode-only
        out = mla_cached_attention(q_lat, q_rot, cache, L - 1, L, sm)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
        env.TORCHMX_ATTN_INT8_DOT = old_flag
    assert out is not None
    ref = ref_absorbed(q_lat, q_rot, cache, L - 1, L, sm)
    o = np.asarray(out, np.float64)
    rf = np.asarray(ref, np.float64)
    err = o - rf
    sqnr = 10 * np.log10(np.sum(rf * rf) / max(np.sum(err * err), 1e-30))
    assert sqnr > 30.0, f"MLA int8dot SQNR {sqnr:.1f} dB"


def test_mla_int8dot_respects_prefix_mask():
    from torchmx_tpu.ops.pallas_mla import use_mla_int8dot

    r = 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(16))
    lat = (jax.random.normal(k1, (B, L, r)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, DR)) * 0.3).astype(jnp.bfloat16)
    cache = MXMLACache.create(B, L, r, DR, "int8", 32, layout="dmajor")
    cache = cache.write(lat, rot, 0)
    k3, k4 = jax.random.split(jax.random.PRNGKey(17))
    q_lat = (jax.random.normal(k3, (B, N, 1, r)) * 0.3).astype(jnp.bfloat16)
    q_rot = (jax.random.normal(k4, (B, N, 1, DR)) * 0.3).astype(jnp.bfloat16)
    sm = 1.0 / math.sqrt(r + DR)
    old_flag = env.TORCHMX_ATTN_INT8_DOT
    env.TORCHMX_ATTN_INT8_DOT = "1"
    old = _force_fused()
    try:
        assert use_mla_int8dot(cache, 1, r, DR)
        out = mla_cached_attention(q_lat, q_rot, cache, 99, 100, sm)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
        env.TORCHMX_ATTN_INT8_DOT = old_flag
    assert out is not None
    ref = ref_absorbed(q_lat, q_rot, cache, 99, 100, sm)
    o, rf = np.asarray(out, np.float64), np.asarray(ref, np.float64)
    sqnr = 10 * np.log10(np.sum(rf * rf) / max(np.sum((o - rf) ** 2), 1e-30))
    assert sqnr > 30.0, f"masked MLA int8dot SQNR {sqnr:.1f} dB"


def test_mla_dmajor_cache_roundtrip_and_fallback():
    """d-major MLA caches quantize PER POSITION (one shared exponent over
    each width — what lets the int8-dot kernel run unchunked): read() is
    close to the source (int8 per-512 SQNR gate), per-row scatter lands on
    the lane dim, and without the int8-dot flag the fused path declines
    (returns None) so the model's eager read() path serves."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(18))
    lat = (jax.random.normal(k1, (B, L, R)) * 0.3).astype(jnp.bfloat16)
    rot = (jax.random.normal(k2, (B, L, DR)) * 0.3).astype(jnp.bfloat16)
    dm = MXMLACache.create(B, L, R, DR, "int8", 32, layout="dmajor").write(
        lat, rot, 0
    )
    assert dm.lat_scale.shape == (B, 1, L)  # per-position scales
    for got, src in zip(dm.read(), (lat, rot)):
        g = np.asarray(got, np.float64)
        s = np.asarray(src, np.float64)
        err = g - s
        sqnr = 10 * np.log10(np.sum(s * s) / max(np.sum(err * err), 1e-30))
        assert sqnr > 30.0, f"dmajor per-position roundtrip SQNR {sqnr:.1f} dB"
    # Per-row scatter parity: scattering rows at positions must equal
    # building the cache with those rows already in place.
    pos = jnp.asarray([5, 40], jnp.int32)
    dm2 = dm.write(lat[:, :3], rot[:, :3], pos)
    lat_exp = np.asarray(lat).copy()
    rot_exp = np.asarray(rot).copy()
    for i, p in enumerate(np.asarray(pos)):
        lat_exp[i, p : p + 3] = np.asarray(lat[i, :3])
        rot_exp[i, p : p + 3] = np.asarray(rot[i, :3])
    dm_exp = MXMLACache.create(B, L, R, DR, "int8", 32, layout="dmajor").write(
        jnp.asarray(lat_exp, jnp.bfloat16), jnp.asarray(rot_exp, jnp.bfloat16), 0
    )
    for a, b_ in zip(dm2.read(), dm_exp.read()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    q_lat, q_rot = make_q(19, 1)
    old = _force_fused()
    try:
        out = mla_cached_attention(q_lat, q_rot, dm, L - 1, L, 1.0)
    finally:
        env.TORCHMX_FUSED_ATTENTION = old
    assert out is None  # flag off -> eager fallback


def test_mla_plan_oracle():
    # Production DeepSeek-V3 decode shape is eligible.
    assert plan_mla_attention(128, 1, 8192, 512, 64, "int8") is not None
    # Non-tileable cache length is not.
    assert plan_mla_attention(128, 1, 100, 512, 64, "int8") is None


def test_model_fused_matches_eager_end_to_end():
    """MLAAttention's cached forward with the fused kernel on vs forced off
    — same numbers within kernel tolerance, both cache kinds."""
    from flax import nnx

    from tests.test_deepseek import tiny_config
    from torchmx_tpu.models.deepseek import MLAAttention

    cfg = tiny_config()
    attn = MLAAttention(cfg, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    b, s = 2, 12
    x = jnp.asarray(rng.randn(b, s, cfg.hidden_size) * 0.3, jnp.bfloat16)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, 32, 2) / 32))
    ang = np.arange(s)[:, None] * inv[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), 2)[None], jnp.bfloat16)
    sin = jnp.asarray(np.tile(np.sin(ang), 2)[None], jnp.bfloat16)

    for mk in (
        lambda: MLACache.create(b, 128, cfg.kv_lora_rank, cfg.qk_rope_head_dim),
        lambda: MXMLACache.create(
            b, 128, cfg.kv_lora_rank, cfg.qk_rope_head_dim, "int8", 32
        ),
    ):
        old = env.TORCHMX_FUSED_ATTENTION
        env.TORCHMX_FUSED_ATTENTION = "pallas"
        try:
            got, _ = attn(x, cos=cos, sin=sin, cache=mk(), cache_position=0)
            env.TORCHMX_FUSED_ATTENTION = "off"
            want, _ = attn(x, cos=cos, sin=sin, cache=mk(), cache_position=0)
        finally:
            env.TORCHMX_FUSED_ATTENTION = old
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=3e-2, atol=3e-2,
        )
