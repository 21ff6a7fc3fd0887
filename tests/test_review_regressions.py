"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM, MXLayerKVCache
from torchmx_tpu.quant_api import quantize_llm_


def tiny_model(seed=0, heads=4):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=heads,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def test_generate_ragged_prompt_len_matches_unpadded():
    """A padded row with prompt_len < width must produce the same tokens as
    generating from the unpadded prompt alone (pad K/V masked, per-row RoPE
    positions)."""
    model = tiny_model()
    rng = np.random.RandomState(0)
    short = rng.randint(0, 128, (6,)).tolist()
    long_ = rng.randint(0, 128, (10,)).tolist()
    batch = np.zeros((2, 10), np.int32)
    batch[0, :10] = long_
    batch[1, :6] = short

    out = generate(
        model,
        jnp.asarray(batch),
        max_new_tokens=8,
        prompt_len=jnp.asarray([10, 6], jnp.int32),
    )
    ref_long = generate(model, jnp.asarray([long_], jnp.int32), max_new_tokens=8)
    ref_short = generate(model, jnp.asarray([short], jnp.int32), max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(ref_long)[0])
    np.testing.assert_array_equal(np.asarray(out)[1], np.asarray(ref_short)[0])


def test_custom_attention_mask_honored_with_mx_cache():
    """An explicit (non-causal) mask must change the output — the fused
    cache path may not silently drop it."""
    model = tiny_model(seed=1)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (1, 8)), jnp.int32)
    caches = model.init_cache(1, 128, MXConfig("float8_e4m3"))
    std, _ = model(
        ids,
        attention_mask=None,
        position_ids=jnp.arange(8)[None, :],
        caches=caches,
        cache_position=0,
    )
    # Mask that only ever exposes position 0.
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.full((1, 1, 8, 128), neg).at[:, :, :, 0].set(0.0)
    caches2 = model.init_cache(1, 128, MXConfig("float8_e4m3"))
    custom, _ = model(
        ids,
        attention_mask=mask,
        position_ids=jnp.arange(8)[None, :],
        caches=caches2,
        cache_position=0,
    )
    assert not np.allclose(
        np.asarray(std, np.float32), np.asarray(custom, np.float32)
    )


def test_qat_train_does_not_update_inv_freq():
    from torchmx_tpu.train import make_qat_train_step

    model = tiny_model(seed=2)
    inv_freq_before = np.asarray(model.model.inv_freq.get_value())
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    train_step, params, opt_state, graphdef = make_qat_train_step(model, qlin)
    step = jax.jit(train_step)
    batch = jnp.asarray(np.random.RandomState(2).randint(0, 128, (2, 16)), jnp.int32)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch, batch)
    # inv_freq is not in the trainable params at all.
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    assert not any("inv_freq" in str(p) for p, _ in leaves)
    assert np.array_equal(
        inv_freq_before, np.asarray(model.model.inv_freq.get_value())
    )
    assert np.isfinite(float(loss))


def test_surgery_handles_tuple_children():
    from torchmx_tpu.layers import Linear, MXInferenceLinear
    from torchmx_tpu.quant_api import quantize_linear_

    class TupleModel(nnx.Module):
        def __init__(self):
            self.projs = nnx.data(
                (Linear(64, 32, rngs=nnx.Rngs(0)), Linear(32, 64, rngs=nnx.Rngs(1)))
            )

        def __call__(self, x):
            for p in self.projs:
                x = p(x)
            return x

    m = TupleModel()
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_linear_(m, qlin)
    assert all(isinstance(p, MXInferenceLinear) for p in m.projs)
    y = m(jnp.ones((2, 64), jnp.bfloat16))
    assert y.shape == (2, 64)


def test_evaluate_reflects_weight_updates():
    from torchmx_tpu.models.evaluate import perplexity

    model = tiny_model(seed=3)
    stream = np.random.RandomState(3).randint(0, 128, (128,))
    p1 = perplexity(model, stream, seq_len=32, batch_size=2)
    # Mutate the weights in place; the cached executable must see new state.
    emb = model.model.embed_tokens.weight
    emb.set_value(emb.get_value() * 2.0)
    p2 = perplexity(model, stream, seq_len=32, batch_size=2)
    assert p1 != p2


def test_large_m_matmul_falls_back_not_crash():
    """Huge-M inputs must take the XLA fallback instead of a VMEM error."""
    from torchmx_tpu import MXArray
    from torchmx_tpu import env_variables as env
    from torchmx_tpu.ops import mx_matmul

    x = jnp.ones((32768, 256), jnp.bfloat16)
    w = MXArray.to_mx(jnp.ones((128, 256), jnp.bfloat16), "float8_e4m3", 32).T
    old = env.TORCHMX_QUANTIZE_BACKEND
    try:
        env.TORCHMX_QUANTIZE_BACKEND = "pallas"
        out = mx_matmul(x, w, out_dtype=jnp.bfloat16)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old
    assert out.shape == (32768, 128)
