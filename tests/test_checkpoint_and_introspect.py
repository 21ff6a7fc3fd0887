"""Checkpoint/resume and introspection-tooling tests.

The reference's checkpoint surface is ``MXTensor`` state-dict serialization
(``mx_tensor.py:495-528``); here MX-quantized NNX model states round-trip
through orbax with a metadata sidecar.  The introspection tools mirror the
reference's AtenIR dump + zero-graph-breaks assertions (SURVEY §5).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torchmx_tpu import checkpoint
from torchmx_tpu.config import MXConfig, QLinearConfig
from torchmx_tpu.layers import Linear, MXInferenceLinear
from torchmx_tpu.mx_array import MXArray
from torchmx_tpu.utils import introspect


def _qlinear(seed=0, elem="float4_e2m1"):
    lin = Linear(512, 64, rngs=nnx.Rngs(seed))
    cfg = QLinearConfig(
        weights_config=MXConfig(elem),
        activations_config=MXConfig("float8_e4m3"),
    )
    return MXInferenceLinear.from_float(lin, cfg)


def test_flatten_unflatten_mx_state():
    model = _qlinear()
    state = nnx.state(model)
    flat, meta = checkpoint.flatten_with_mx(state)
    mx_keys = [k for k in flat if k.endswith(".data")]
    assert len(mx_keys) == 1 and len(meta) == 1
    m = next(iter(meta.values()))
    assert m["elem_dtype"] == "float4_e2m1" and m["fp4_pack"] == "halves"
    rebuilt = checkpoint.unflatten_with_mx(state, flat, meta)
    w0 = model.weight.get_value()
    w1 = rebuilt["weight"].value
    assert isinstance(w1, MXArray)
    np.testing.assert_array_equal(np.asarray(w0.data), np.asarray(w1.data))
    np.testing.assert_array_equal(np.asarray(w0.scale_e8m0), np.asarray(w1.scale_e8m0))
    assert (w1.elem_dtype, w1.block_size, w1.block_dim, w1.fp4_pack) == (
        w0.elem_dtype,
        w0.block_size,
        w0.block_dim,
        w0.fp4_pack,
    )


@pytest.mark.parametrize("elem", ["float4_e2m1", "float8_e4m3"])
def test_checkpoint_roundtrip_quantized_model(tmp_path, elem):
    model = _qlinear(seed=1, elem=elem)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)), jnp.bfloat16)
    y_before = model(x)

    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    checkpoint.save_model(ckpt_dir, model)
    assert os.path.exists(os.path.join(ckpt_dir, "mx_meta.json"))

    fresh = _qlinear(seed=2, elem=elem)  # different weights
    assert not np.array_equal(
        np.asarray(fresh.weight.get_value().data),
        np.asarray(model.weight.get_value().data),
    )
    checkpoint.load_model(ckpt_dir, fresh)
    np.testing.assert_array_equal(
        np.asarray(fresh.weight.get_value().data),
        np.asarray(model.weight.get_value().data),
    )
    y_after = fresh(x)
    np.testing.assert_array_equal(np.asarray(y_before), np.asarray(y_after))


def test_checkpoint_roundtrip_llm(tmp_path):
    from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from torchmx_tpu.quant_api import quantize_linear_

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    quantize_linear_(
        model,
        QLinearConfig(
            weights_config=MXConfig("float6_e3m2"),
            activations_config=MXConfig("float8_e4m3"),
        ),
    )
    ids = jnp.arange(8, dtype=jnp.int32)[None, :] % 64
    logits_before, _ = model(ids)

    ckpt_dir = os.path.join(str(tmp_path), "llm")
    checkpoint.save_model(ckpt_dir, model)

    fresh = LlamaForCausalLM(cfg, rngs=nnx.Rngs(7))
    quantize_linear_(
        fresh,
        QLinearConfig(
            weights_config=MXConfig("float6_e3m2"),
            activations_config=MXConfig("float8_e4m3"),
        ),
    )
    checkpoint.load_model(ckpt_dir, fresh)
    logits_after, _ = fresh(ids)
    np.testing.assert_array_equal(np.asarray(logits_before), np.asarray(logits_after))


def test_lowered_and_compiled_text_dump(tmp_path):
    model = _qlinear()
    graphdef, state = nnx.split(model)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jnp.zeros((4, 512), jnp.bfloat16)
    txt = introspect.lowered_text(fwd, state, x)
    assert "module" in txt and "dot" in txt  # StableHLO with a matmul inside
    p = os.path.join(str(tmp_path), "graphs", "fwd.hlo")
    out = introspect.dump_lowered(fwd, state, x, path=p)
    assert os.path.exists(p) and out == txt


def test_recompile_counter_zero_recompiles():
    """Same-shape calls must hit the compile cache (the TPU analog of the
    reference's zero-graph-breaks guarantee, ``tests/test_mx_tensor.py:453``)."""
    model = _qlinear()
    graphdef, state = nnx.split(model)
    counter = introspect.RecompileCounter(
        lambda state, x: nnx.merge(graphdef, state)(x)
    )
    x = jnp.zeros((4, 512), jnp.bfloat16)
    for _ in range(3):
        counter.fn(state, x)
    assert counter.count == 1
    counter.fn(state, jnp.zeros((8, 512), jnp.bfloat16))  # new shape recompiles
    assert counter.count == 2


def test_trace_annotation_smoke(tmp_path):
    with introspect.annotate("mx_quantize"):
        _ = jnp.ones((8, 32)) * 2


def test_checkpoint_fp6_bit_packed(tmp_path):
    """fp6 payloads stored 4-codes-per-3-bytes round-trip bit-exactly and
    shrink the array bytes by 25%."""
    model = _qlinear(seed=3, elem="float6_e3m2")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 512)), jnp.bfloat16)
    y_before = model(x)

    state = nnx.state(model)
    flat_plain, _ = checkpoint.flatten_with_mx(state)
    flat_packed, meta = checkpoint.flatten_with_mx(state, compress_fp6=True)
    key = next(k for k in flat_packed if k.endswith(".data"))
    assert flat_packed[key].nbytes == flat_plain[key].nbytes * 3 // 4
    assert next(iter(meta.values()))["fp6_packed"]

    ckpt = os.path.join(str(tmp_path), "fp6")
    checkpoint.save_model(ckpt, model, compress_fp6=True)
    fresh = _qlinear(seed=4, elem="float6_e3m2")
    checkpoint.load_model(ckpt, fresh)
    np.testing.assert_array_equal(
        np.asarray(fresh.weight.get_value().data),
        np.asarray(model.weight.get_value().data),
    )
    np.testing.assert_array_equal(np.asarray(y_before), np.asarray(fresh(x)))
