"""Pipeline parallelism: a GPipe-style stage rotation over a mesh axis.

The reference has no pipeline story (its only multi-device notion is
accelerate's sequential layer offload, ``mx_linear.py:45-57``).  The
TPU-native primitive here: stack the per-stage parameters on a leading axis
sharded over the ``model`` mesh axis, split the batch into microbatches, and
run the classic GPipe schedule inside ``shard_map`` — each device applies
its stage every step and hands its activation to the next stage over ICI
with ``lax.ppermute``.  Fill/drain bubbles cost ``(S-1)/(M+S-1)`` of the
steps; quantized stage weights (MXArray payloads) shard like any pytree.

This is the building block (stage function in, pipelined function out);
model-level integration composes it with the existing TP/DP sharding.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = MODEL_AXIS,
):
    """Apply ``n_stages`` sequential stages over ``axis`` with microbatching.

    Args:
        stage_fn: ``fn(params_i, x) -> y`` with ``y.shape == x.shape`` —
            one pipeline stage (e.g. a group of decoder layers).
        stacked_params: pytree whose leaves have a leading ``n_stages`` dim
            (sharded over ``axis``).
        x: (batch, ...) input, batch divisible by ``n_microbatches``.
        mesh: mesh containing ``axis`` with size ``n_stages``.

    Returns ``stage_{S-1}(... stage_0(x))`` computed on the pipeline.
    """
    n_stages = mesh.shape[axis]
    for leaf in jax.tree_util.tree_leaves(stacked_params):
        assert leaf.shape[0] == n_stages, (
            f"stacked param leading dim {leaf.shape[0]} != {n_stages} stages "
            f"(a clean multiple would silently drop stages)"
        )
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    xs = x.reshape(n_microbatches, mb, *x.shape[1:])
    n_steps = n_microbatches + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)

    def device_fn(params, xs):
        s = jax.lax.axis_index(axis)
        my_params = jax.tree.map(lambda p: p[0], params)  # local (1, ...) shard

        def body(carry, t):
            prev_out, buf = carry
            recv = jax.lax.ppermute(prev_out, axis, perm)
            m_idx = t - s
            inp = jnp.where(s == 0, xs[jnp.clip(t, 0, n_microbatches - 1)], recv)
            out = stage_fn(my_params, inp)
            valid = (m_idx >= 0) & (m_idx < n_microbatches)
            upd = jax.lax.dynamic_update_slice(
                buf,
                out[None].astype(buf.dtype),
                (jnp.clip(m_idx, 0, n_microbatches - 1),) + (0,) * out.ndim,
            )
            buf = jnp.where(valid, upd, buf)
            return (out, buf), None

        # Carries become device-varying through ppermute/axis_index; mark the
        # (replicated) initial values accordingly for shard_map's vma checks.
        zero = jax.lax.pcast(jnp.zeros_like(xs[0]), (axis,), to="varying")
        buf0 = jax.lax.pcast(jnp.zeros_like(xs), (axis,), to="varying")
        (_, buf), _ = jax.lax.scan(body, (zero, buf0), jnp.arange(n_steps))
        return buf[None]  # (1, M, mb, ...): this stage's collected outputs

    out = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(axis),
    )(stacked_params, xs)
    # Only the final stage's buffer holds the pipeline output.
    return out[-1].reshape(b, *x.shape[1:])
