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

GQA is handled INSIDE the ring: K/V rotate with their ``num_key_value_heads``
only (``group_factor``× fewer ICI bytes per hop than rotating repeated
heads) and queries are grouped against them with a 5-D einsum — repeated
K/V heads are never materialized anywhere.

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
def context_parallel(mesh: Mesh, axis: str = MODEL_AXIS, layout: str = "contig"):
    """Activate context parallelism for model forwards traced inside.

    Within this context a cache-less ``attention_mask=None`` forward (the
    standard causal prefill/scoring call) runs :func:`ring_attention`
    instead of building the dense (L, L) mask — the sequence dim shards
    over ``axis`` and no device materializes O(L²) anything.

    ``layout`` selects how tokens map to devices:

    * ``"contig"`` — device i holds tokens [i·L/N, (i+1)·L/N).  Simple, but
      causal work is imbalanced: the ring's wall-clock is set by the device
      holding the LAST shard, which attends everything (≈2× the useful
      FLOPs ring-wide).
    * ``"zigzag"`` — device i holds chunks i and 2N−1−i of 2N chunks (the
      striped layout): every device carries one early and one late chunk,
      balancing causal work.  Fully-masked chunk-pairs are skipped with
      device-local ``lax.cond``, cutting ring attention FLOPs ≈2× at large
      N.  The CALLER permutes tokens into zigzag order first (use
      :func:`zigzag_order` / :func:`zigzag_inverse`; ``evaluate``'s scoring
      does this automatically) and must pass the permuted positions as
      ``position_ids``.

    .. warning:: **Trace-time (static) dispatch.**  The switch is read when
        the forward is TRACED, not when it runs: jit the forward *inside*
        the context.  An executable jitted (and cached) outside the context
        silently keeps its dense-mask schedule if called inside it later —
        ``jax.jit`` cannot see the flag change.  Any module-level cache of
        compiled cacheless forwards must include :func:`active_cp` in its
        key (see ``models/evaluate.py``) so plain and CP executables never
        alias.
    """
    if layout not in ("contig", "zigzag"):
        raise ValueError(f"unknown CP layout {layout!r}")
    global _ACTIVE
    old = _ACTIVE
    _ACTIVE = (mesh, axis, layout)
    try:
        yield
    finally:
        _ACTIVE = old


def active_cp():
    """The (mesh, axis, layout) of the active :func:`context_parallel`,
    or None."""
    return _ACTIVE


def zigzag_order(length: int, n: int):
    """Permutation laying a length-``length`` sequence out in zigzag order
    for an ``n``-device ring: 2n chunks, device i ← chunks (i, 2n−1−i).

    ``x[zigzag_order(L, n)]`` is the zigzag layout; contiguous shard i of
    the result holds device i's tokens.  Inverse: :func:`zigzag_inverse`.
    """
    import numpy as np

    if length % (2 * n) != 0:
        raise ValueError(f"sequence length {length} not divisible by 2n={2*n}")
    c = length // (2 * n)
    idx = np.arange(length).reshape(2 * n, c)
    return np.concatenate(
        [np.concatenate([idx[i], idx[2 * n - 1 - i]]) for i in range(n)]
    )


def zigzag_inverse(length: int, n: int):
    """Inverse of :func:`zigzag_order`: ``x_zig[zigzag_inverse(L, n)]``
    restores global token order."""
    import numpy as np

    perm = zigzag_order(length, n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(length)
    return inv


def _block_attn(q, k, v, q_off, kv_off, sm_scale, window=None, softcap=None):
    """Partial attention of a grouped Q block against one K/V block.

    ``q`` is (b, h_kv, g, lq, d) — queries grouped per KV head; ``k``/``v``
    are (b, h_kv, lk, d).  Returns (acc, m, l): unnormalized output,
    per-row max, per-row normalizer — the flash-merge state, shaped
    (b, h_kv, g, lq[, d]).  Causal: query global position ``q_off + i``
    attends key positions ``<= q_off + i`` only; with a sliding ``window``
    additionally only positions ``> q_off + i - window``.  ``softcap``
    applies Gemma2's logit soft cap ``cap·tanh(s/cap)`` to the SCALED
    scores before masking (the HF order the eager path uses) — the flash
    merge is unaffected (it merges max/normalizer of the capped scores,
    which is the same monotone transform on every block).
    """
    lq = q.shape[3]
    lk = k.shape[2]
    s = jnp.einsum("bhgqd,bhkd->bhgqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    qpos = q_off + jnp.arange(lq)[:, None]
    kpos = kv_off + jnp.arange(lk)[None, :]
    allowed = kpos <= qpos
    if window is not None:
        allowed &= kpos > qpos - window
    s = jnp.where(allowed, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (b, h_kv, g, lq)
    p = jnp.exp(s - m[..., None])
    # Fully-masked rows: m == NEG_INF -> exp(0) == 1 garbage; zero them.
    alive = m > NEG_INF / 2
    p = jnp.where(alive[..., None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhgqk,bhkd->bhgqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
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


def _ring(device_step, n, axis, perm, carry_arrays, state0):
    """Shared ring schedule: N blocks of math, N-1 ``ppermute`` hops.

    ``device_step(state, carry_arrays, r) -> state`` does block ``r``'s
    math.  The hop for a block overlaps that block's math (both read the
    same arrays); the LAST block's shards are not rotated again — the
    result would land in a discarded carry, and XLA cannot DCE a collective
    inside the scan body.
    """

    def body(carry, r):
        arrs, state = carry
        state = device_step(state, arrs, r)
        arrs = tuple(jax.lax.ppermute(x, axis, perm) for x in arrs)
        return (arrs, state), None

    if n > 1:
        (carry_arrays, state0), _ = jax.lax.scan(
            body, (tuple(carry_arrays), state0), jnp.arange(n - 1)
        )
    return device_step(state0, carry_arrays, n - 1)


def _finish(state, b, h, lq, d):
    acc, m, l = state
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(jnp.bfloat16).reshape(b, h, lq, d)


def _init_state(b, h_kv, g, lq, d, axis):
    # Scan carries become device-varying through ppermute/axis_index;
    # mark the replicated-constant inits accordingly (shard_map vma).
    var = lambda x: jax.lax.pcast(x, (axis,), to="varying")  # noqa: E731
    return (
        var(jnp.zeros((b, h_kv, g, lq, d), jnp.float32)),
        var(jnp.full((b, h_kv, g, lq), NEG_INF, jnp.float32)),
        var(jnp.zeros((b, h_kv, g, lq), jnp.float32)),
    )


def _zigzag_steps(qf, idx, n, c, sm_scale, kv_chunks, window=None, softcap=None):
    """Build the zigzag per-hop step function.

    ``qf`` is the grouped (b, h_kv, g, 2c, d) query shard; ``kv_chunks(arrs,
    half)`` returns the (k, v) bf16 chunk ``half`` ∈ {0 (lo), 1 (hi)} of the
    rotating carry.  Device i's shard holds global chunks (i, 2n−1−i); the
    shard from source j holds (j, 2n−1−j).  Of the four chunk-pairs only
    three can be live — (qlo, khi) is ALWAYS fully masked — and two of the
    three are conditional, skipped with device-local ``lax.cond`` (legal
    under shard_map: no collectives inside).  Per hop every device computes
    ~2 chunk-blocks: balanced, ≈2× fewer FLOPs than the contiguous layout
    whose last device computes 4 every hop.
    """
    qlo, qhi = qf[:, :, :, :c], qf[:, :, :, c:]

    def wlive(q_off, kv_off):
        """False iff the chunk is wholly BELOW the sliding window of every
        query row (the ring's window predication: dead chunks skip their
        math — and, in the MX path, their dequantize — via lax.cond)."""
        if window is None:
            return True
        return kv_off + (c - 1) >= q_off - (window - 1)

    def step(state, arrs, r):
        idx_ = idx
        j = (idx_ - r) % n
        state_lo, state_hi = state
        # qhi × klo: causally always unmasked (qhi rows live in the top
        # half) — but a window can kill the whole chunk.
        def hi_lo(s):
            klo, vlo = kv_chunks(arrs, 0)
            return _merge(
                s,
                _block_attn(qhi, klo, vlo, (2 * n - 1 - idx_) * c, j * c,
                            sm_scale, window, softcap),
            )

        if window is None:
            state_hi = hi_lo(state_hi)
        else:
            state_hi = jax.lax.cond(
                wlive((2 * n - 1 - idx) * c, j * c), hi_lo, lambda s: s, state_hi
            )
        # qlo × klo: live only when j <= idx (diagonal at j == idx).
        def lo_lo(s):
            klo, vlo = kv_chunks(arrs, 0)
            return _merge(
                s, _block_attn(qlo, klo, vlo, idx_ * c, j * c, sm_scale,
                               window, softcap)
            )

        state_lo = jax.lax.cond(
            (j <= idx_) & wlive(idx * c, j * c), lo_lo, lambda s: s, state_lo
        )
        # qhi × khi: live only when j >= idx (diagonal at j == idx).
        def hi_hi(s):
            khi, vhi = kv_chunks(arrs, 1)
            return _merge(
                s,
                _block_attn(
                    qhi, khi, vhi, (2 * n - 1 - idx_) * c, (2 * n - 1 - j) * c,
                    sm_scale, window, softcap,
                ),
            )

        state_hi = jax.lax.cond(
            (j >= idx_) & wlive((2 * n - 1 - idx) * c, (2 * n - 1 - j) * c),
            hi_hi, lambda s: s, state_hi,
        )
        return state_lo, state_hi

    return step


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    sm_scale: float,
    layout: str = "contig",
    window: int = None,
    softcap: float = None,
):
    """Causal attention with the SEQUENCE sharded over ``axis``.

    Args:
        q: (b, h, L, d) with the L dim sharded over ``axis`` (shard with
            ``P(None, None, axis, None)``).
        k, v: (b, h_kv, L, d) with ``h % h_kv == 0`` — GQA K/V keep their
            own head count; the ring rotates the small shards and groups
            queries in-place (no ``repeat_kv`` materialization).
        mesh: mesh containing ``axis`` (N devices → L/N tokens per device).
        sm_scale: softmax scale.
        layout: ``"contig"`` or ``"zigzag"`` (see :func:`context_parallel`).
            For zigzag the seq dim of q/k/v must already be permuted by
            :func:`zigzag_order`; the output comes back in the same order.

    Returns (b, h, L, d) bf16, L sharded like the inputs.  Each device
    computes its Q shard against every K/V shard as the shards rotate
    around the ring (N-1 ``ppermute`` hops, each overlapping that block's
    attention math), merging partials in the flash style — no device ever
    holds more than 2 K/V shards.
    """
    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]
    spec = P(None, None, axis, None)
    h, h_kv = q.shape[1], k.shape[1]
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    g = h // h_kv
    if layout == "zigzag" and q.shape[2] % (2 * n) != 0:
        raise ValueError(f"zigzag needs L % 2N == 0, got L={q.shape[2]} N={n}")

    def device_fn(q, k, v):
        idx = jax.lax.axis_index(axis)
        b, h, lq, d = q.shape
        # V may carry its own head dim (MLA's expanded form: dq != dv); the
        # flash accumulator follows V.
        dv = v.shape[3]
        qf = q.astype(jnp.bfloat16).reshape(b, h_kv, g, lq, d)

        if layout == "zigzag":
            c = lq // 2

            def kv_chunks(arrs, half):
                k_cur, v_cur = arrs
                sl = slice(half * c, (half + 1) * c)
                return k_cur[:, :, sl], v_cur[:, :, sl]

            step = _zigzag_steps(qf, idx, n, c, sm_scale, kv_chunks,
                                 window, softcap)
            state0 = (
                _init_state(b, h_kv, g, c, dv, axis),
                _init_state(b, h_kv, g, c, dv, axis),
            )
            state_lo, state_hi = _ring(step, n, axis, perm, (k, v), state0)
            return jnp.concatenate(
                [_finish(state_lo, b, h, c, dv), _finish(state_hi, b, h, c, dv)],
                axis=2,
            )

        def step(state, arrs, r):
            # K/V block r hops back from this device came from idx - r.
            src = (idx - r) % n

            def live(s):
                k_cur, v_cur = arrs
                return _merge(
                    s, _block_attn(qf, k_cur, v_cur, idx * lq, src * lq,
                                   sm_scale, window, softcap)
                )

            if window is None:
                return live(state)
            # Window predication: skip blocks wholly below the window (or
            # wholly in the future) without touching their K/V bytes.
            dead = (src * lq + (lq - 1) < idx * lq - (window - 1)) | (
                src * lq > idx * lq + (lq - 1)
            )
            return jax.lax.cond(dead, lambda s: s, live, state)

        state0 = _init_state(b, h_kv, g, lq, dv, axis)
        return _finish(_ring(step, n, axis, perm, (k, v), state0), b, h, lq, dv)

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
    layout: str = "contig",
    window: int = None,
    softcap: float = None,
):
    """Ring attention with MX-QUANTIZED K/V shards rotating over ICI.

    ``k_mx``/``v_mx`` are ``MXArray``s of shape (b, h_kv, L, d) blocked
    along d (the cache orientation, ``block_dim=-1``; the two may use
    different element formats), L sharded over ``axis``.  The ring moves
    PACKED codes + scales — 2–4× fewer ICI bytes than bf16 — and each
    device dequantizes only the shard it is currently contracting.  GQA as
    in :func:`ring_attention`.  Numerics: identical elementwise dequantize
    as the cache path; the flash merge is the same as
    :func:`ring_attention`.
    """
    from ..mx_array import MXArray

    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]
    spec = P(None, None, axis, None)
    for name, arr in (("k_mx", k_mx), ("v_mx", v_mx)):
        assert arr.block_dim == arr.ndim - 1, (
            f"ring {name} must be blocked along head_dim (the cache "
            "orientation) so the L shards carry whole blocks"
        )
    kd, ks = k_mx.data, k_mx.scale_e8m0
    vd, vs = v_mx.data, v_mx.scale_e8m0
    # Each array dequantizes with ITS OWN metadata (k and v may differ).
    kmeta = (k_mx.elem_dtype, k_mx.block_size, k_mx.orig_dtype, k_mx.fp4_pack)
    vmeta = (v_mx.elem_dtype, v_mx.block_size, v_mx.orig_dtype, v_mx.fp4_pack)
    h, h_kv = q.shape[1], k_mx.shape[1]
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_kv}")
    g = h // h_kv
    if layout == "zigzag" and q.shape[2] % (2 * n) != 0:
        raise ValueError(f"zigzag needs L % 2N == 0, got L={q.shape[2]} N={n}")

    def deq(data, scale, meta):
        elem, bs, od, fp4_pack = meta
        arr = MXArray(scale, data, elem, bs, od, block_dim=-1, fp4_pack=fp4_pack)
        return arr.to_dtype(jnp.bfloat16)

    def device_fn(q, kd, ks, vd, vs):
        idx = jax.lax.axis_index(axis)
        b, h, lq, d = q.shape
        qf = q.astype(jnp.bfloat16).reshape(b, h_kv, g, lq, d)

        if layout == "zigzag":
            c = lq // 2

            def kv_chunks(arrs, half):
                kd_c, ks_c, vd_c, vs_c = arrs
                sl = slice(half * c, (half + 1) * c)
                # Dequantize only the chunk being contracted (a skipped
                # cond branch never pays the decode either).
                return (
                    deq(kd_c[:, :, sl], ks_c[:, :, sl], kmeta),
                    deq(vd_c[:, :, sl], vs_c[:, :, sl], vmeta),
                )

            step = _zigzag_steps(qf, idx, n, c, sm_scale, kv_chunks,
                                 window, softcap)
            state0 = (
                _init_state(b, h_kv, g, c, d, axis),
                _init_state(b, h_kv, g, c, d, axis),
            )
            state_lo, state_hi = _ring(
                step, n, axis, perm, (kd, ks, vd, vs), state0
            )
            return jnp.concatenate(
                [_finish(state_lo, b, h, c, d), _finish(state_hi, b, h, c, d)],
                axis=2,
            )

        def step(state, arrs, r):
            src = (idx - r) % n

            def live(s):
                kd_c, ks_c, vd_c, vs_c = arrs
                part = _block_attn(
                    qf,
                    deq(kd_c, ks_c, kmeta),
                    deq(vd_c, vs_c, vmeta),
                    idx * lq,
                    src * lq,
                    sm_scale,
                    window,
                    softcap,
                )
                return _merge(s, part)

            if window is None:
                return live(state)
            # Skipped blocks never pay the dequantize either (cond branch).
            dead = (src * lq + (lq - 1) < idx * lq - (window - 1)) | (
                src * lq > idx * lq + (lq - 1)
            )
            return jax.lax.cond(dead, lambda s: s, live, state)

        state0 = _init_state(b, h_kv, g, lq, d, axis)
        return _finish(
            _ring(step, n, axis, perm, (kd, ks, vd, vs), state0), b, h, lq, d
        )

    return shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=spec,
        axis_names=frozenset({axis}),
    )(q, kd, ks, vd, vs)
