"""Context parallelism: ring attention over a mesh axis.

Long-context prefill materializes O(L²) attention work and O(L) KV memory;
past a single chip's HBM the sequence itself must shard.  The reference has
no sequence/context story (its attention is single-device eager O(L²),
``mx_llama_attention.py:215-243``); SURVEY §2.3 lists SP/CP as absent.
This module is the TPU-native extension: shard the sequence over a mesh
axis and run **ring attention** — each device keeps its Q shard resident
and the K/V shards rotate around the ring over ICI ``ppermute``, merging
per-block partial softmax results in the numerically-stable flash style
(running max ``m``, normalizer ``l``, unnormalized accumulator).

The per-(Q, KV)-block math is ordinary jnp — on TPU XLA fuses it; the MX
path quantizes K/V shards like any cache (this is the op-level building
block; blockwise fused-kernel CP composes later).  Causality is computed
from GLOBAL block offsets, so fully-masked (future) blocks contribute
nothing and blocks on the diagonal mask per element.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

NEG_INF = -1e30

_ACTIVE = None


@contextmanager
def context_parallel(mesh: Mesh, axis: str = MODEL_AXIS):
    """Activate context parallelism for model forwards traced inside.

    Within this context a cache-less ``attention_mask=None`` forward (the
    standard causal prefill/scoring call) runs :func:`ring_attention`
    instead of building the dense (L, L) mask — the sequence dim shards
    over ``axis`` and no device materializes O(L²) anything.  Trace-time
    (static) dispatch: jit the forward inside the context.
    """
    global _ACTIVE
    old = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = old


def active_cp():
    """The (mesh, axis) of the active :func:`context_parallel`, or None."""
    return _ACTIVE


def _block_attn(q, k, v, q_off, kv_off, sm_scale):
    """Partial attention of a Q block against one K/V block.

    Returns (acc, m, l): unnormalized output, per-row max, per-row
    normalizer — the flash-merge state.  Causal: query global position
    ``q_off + i`` attends key positions ``<= q_off + i`` only.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    qpos = q_off + jnp.arange(lq)[:, None]
    kpos = kv_off + jnp.arange(lk)[None, :]
    s = jnp.where(kpos <= qpos, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (b, h, lq)
    p = jnp.exp(s - m[..., None])
    # Fully-masked rows: m == NEG_INF -> exp(0) == 1 garbage; zero them.
    alive = m > NEG_INF / 2
    p = jnp.where(alive[..., None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return acc, jnp.where(alive, m, NEG_INF), l


def _merge(state, part):
    """Merge a new partial (acc2, m2, l2) into the running flash state."""
    acc1, m1, l1 = state
    acc2, m2, l2 = part
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    # Dead running state (m == NEG_INF on both sides) stays dead: exp(0)=1
    # but l terms are 0, so acc stays 0.
    acc = acc1 * a1[..., None] + acc2 * a2[..., None]
    return acc, m, l1 * a1 + l2 * a2


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    sm_scale: float,
):
    """Causal attention with the SEQUENCE sharded over ``axis``.

    Args:
        q, k, v: (b, h, L, d) with the L dim sharded over ``axis`` (shard
            these with ``P(None, None, axis, None)``); GQA callers repeat or
            reshape heads outside.
        mesh: mesh containing ``axis`` (N devices → L/N tokens per device).
        sm_scale: softmax scale.

    Returns (b, h, L, d) bf16, L sharded like the inputs.  Each device
    computes its Q shard against every K/V shard as the shards rotate
    around the ring (N-1 ``ppermute`` hops, each overlapping the next
    block's attention math), merging partials in the flash style — no
    device ever holds more than 2 K/V shards.
    """
    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]
    spec = P(None, None, axis, None)

    def device_fn(q, k, v):
        idx = jax.lax.axis_index(axis)
        b, h, lq, d = q.shape
        q_off = idx * lq
        qf = q.astype(jnp.bfloat16)

        def body(carry, r):
            k_cur, v_cur, state = carry
            # K/V block r hops back from this device came from idx - r.
            src = (idx - r) % n
            part = _block_attn(qf, k_cur, v_cur, q_off, src * lq, sm_scale)
            state = _merge(state, part)
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (k_nxt, v_nxt, state), None

        # Scan carries become device-varying through ppermute/axis_index;
        # mark the replicated-constant inits accordingly (shard_map vma).
        var = lambda x: jax.lax.pcast(x, (axis,), to="varying")  # noqa: E731
        acc0 = var(jnp.zeros((b, h, lq, d), jnp.float32))
        m0 = var(jnp.full((b, h, lq), NEG_INF, jnp.float32))
        l0 = var(jnp.zeros((b, h, lq), jnp.float32))
        (_, _, (acc, m, l)), _ = jax.lax.scan(
            body, (k, v, (acc0, m0, l0)), jnp.arange(n)
        )
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(jnp.bfloat16)

    return shard_map(
        device_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names=frozenset({axis}),
    )(q, k, v)


def ring_attention_mx(
    q: jax.Array,
    k_mx,
    v_mx,
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    sm_scale: float,
):
    """Ring attention with MX-QUANTIZED K/V shards rotating over ICI.

    ``k_mx``/``v_mx`` are ``MXArray``s of shape (b, h, L, d) blocked along
    d (the cache orientation, ``block_dim=-1``), L sharded over ``axis``.
    The ring moves PACKED codes + scales — 2–4× fewer ICI bytes than bf16
    — and each device dequantizes only the shard it is currently
    contracting.  Numerics: identical elementwise dequantize as the cache
    path; the flash merge is the same as :func:`ring_attention`.
    """
    from ..mx_array import MXArray

    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]
    spec = P(None, None, axis, None)
    assert k_mx.block_dim == k_mx.ndim - 1, (
        "ring K/V must be blocked along head_dim (the cache orientation) so "
        "the L shards carry whole blocks"
    )
    kd, ks = k_mx.data, k_mx.scale_e8m0
    vd, vs = v_mx.data, v_mx.scale_e8m0
    elem, bs, od = k_mx.elem_dtype, k_mx.block_size, k_mx.orig_dtype
    fp4_pack = k_mx.fp4_pack

    def device_fn(q, kd, ks, vd, vs):
        idx = jax.lax.axis_index(axis)
        b, h, lq, d = q.shape
        q_off = idx * lq
        qf = q.astype(jnp.bfloat16)

        def deq(data, scale):
            arr = MXArray(scale, data, elem, bs, od, block_dim=-1,
                          fp4_pack=fp4_pack)
            return arr.to_dtype(jnp.bfloat16)

        def body(carry, r):
            kd_c, ks_c, vd_c, vs_c, state = carry
            src = (idx - r) % n
            part = _block_attn(
                qf, deq(kd_c, ks_c), deq(vd_c, vs_c), q_off, src * lq, sm_scale
            )
            state = _merge(state, part)
            nxt = [jax.lax.ppermute(x, axis, perm) for x in (kd_c, ks_c, vd_c, vs_c)]
            return tuple(nxt) + (state,), None

        var = lambda x: jax.lax.pcast(x, (axis,), to="varying")  # noqa: E731
        acc0 = var(jnp.zeros((b, h, lq, d), jnp.float32))
        m0 = var(jnp.full((b, h, lq), NEG_INF, jnp.float32))
        l0 = var(jnp.zeros((b, h, lq), jnp.float32))
        (_, _, _, _, (acc, m, l)), _ = jax.lax.scan(
            body, (kd, ks, vd, vs, (acc0, m0, l0)), jnp.arange(n)
        )
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(jnp.bfloat16)

    return shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=spec,
        axis_names=frozenset({axis}),
    )(q, kd, ks, vd, vs)
