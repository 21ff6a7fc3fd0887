"""Quantization-aware training step (straight-through estimator).

The reference exposes training hooks (``ToMXConstrFunc`` STE backward and
``NoopFwToMXBw`` gradient quantization, ``mx_tensor.py:196-354``) but no
training loop.  The TPU build provides a full jittable, mesh-shardable QAT
step: forward with MX fake-quantization on the weights (STE), cross-entropy
loss, optax update.  Used by the multi-chip dry run and as the training-path
surface of the framework.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from .config import QLinearConfig
from .mx_array import fake_quantize


def fake_quantize_linear_weights(model, qconfig: QLinearConfig):
    """Return a pure state transform applying STE MX fake-quantization to the
    model's weight matrices before the forward pass.

    Selection: every 2-D bf16 param is a weight matrix (linear weights and
    the embedding table), blocked along its last (contraction) dim; stacked
    MoE expert weights (3-D, path ``mlp.w1/w2/w3`` — stored K-MAJOR
    ``(E, K, N)``) block along K so QAT sees the same grid inference
    quantizes to; 1-D params (biases, norms) pass through untouched.
    """
    del model  # selection is shape/path-based; kept for future rules
    w_cfg = qconfig.weights_config

    def transform_state(state):
        def fq(path, leaf):
            if not hasattr(leaf, "ndim") or leaf.dtype != jnp.bfloat16:
                return leaf
            if any(getattr(k, "key", None) == "gate" for k in path):
                # The MoE router stays high-precision at inference (a
                # quantization bin-flip changes WHICH experts run) — QAT
                # must train under the same routing numerics it serves.
                return leaf
            if leaf.ndim == 2:
                return fake_quantize(leaf, w_cfg.elem_dtype_name, w_cfg.block_size)
            if leaf.ndim == 3 and any(
                getattr(k, "key", None) in ("w1", "w2", "w3") for k in path
            ):
                # K-major stacked expert weights: block the contraction dim.
                return fake_quantize(
                    leaf.swapaxes(1, 2), w_cfg.elem_dtype_name, w_cfg.block_size
                ).swapaxes(1, 2)
            return leaf

        return jax.tree_util.tree_map_with_path(fq, state)

    return transform_state


def make_qat_train_step(model, qconfig: QLinearConfig, learning_rate: float = 1e-4):
    """Build (train_step, opt_state) for STE quantization-aware training.

    ``train_step(state, opt_state, batch) -> (state, opt_state, loss)`` is a
    pure jittable function over the NNX state pytree; shard the state with
    ``parallel.shard_model`` before jitting for multi-chip execution.
    """
    # Split trainable params from non-trainable buffers (e.g. the RoPE
    # ``inv_freq`` table, an nnx.Variable on the differentiable path — it
    # must not receive optimizer updates).
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    transform = fake_quantize_linear_weights(model, qconfig)

    def loss_fn(params, input_ids, labels):
        fq_params = transform(params)
        m = nnx.merge(graphdef, fq_params, rest)
        logits, _ = m(input_ids)
        logits = logits.astype(jnp.float32)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], labels[:, 1:]
        )
        return loss.mean()

    def train_step(params, opt_state, input_ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, input_ids, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, params, opt_state, graphdef
