"""Grouped (ragged) GEMM for dropless Mixture-of-Experts — Pallas TPU.

The capacity dispatch/combine MoE form either drops tokens (capacity < the
ragged group sizes) or overcomputes (capacity = worst case); the dense-exact
form computes every expert on every token (E/k× the useful FLOPs).  The
dropless scheme used here is the megablocks recipe, TPU-shaped:

1. Sort the (token, expert) assignments by expert and PAD each expert's
   group to a row-tile multiple ``tm`` (so a row tile never straddles two
   experts).  All shapes stay static: with A = T·k assignments the padded
   buffer is ``R = (ceil(A/tm) + E) · tm`` rows — the E·tm slack absorbs any
   per-group padding.
2. One Pallas kernel walks the row tiles; a **scalar-prefetched**
   ``tile_expert`` array drives the WEIGHT BlockSpec index_map, so tile
   ``t`` DMAs expert ``tile_expert[t]``'s weight tiles from the stacked
   (E, K, N) array.  Consecutive tiles of the same expert re-use the
   resident weight block (Pallas skips DMA on an unchanged block index).
3. Gather/scatter around the kernel (pure XLA): tokens in, per-assignment
   rows out, combine-weighted segment-sum back to token order.

FLOPs ∝ Σ_e ceil(count_e/tm)·tm·N·K — the useful work plus at most one row
tile of padding per expert — vs E·T·N·K for the dense form.

Weight formats: bf16 (E, K, N); MXINT8/MXFP8/MXFP6 one-byte codes
(E, K, N) + E8M0 scales (E, K/32, N), decoded in VMEM by the same
integer bit-surgery / hw-convert helpers the dense fused matmul kernels
use (``pallas_matmul.decode_*``).

No reference counterpart (the reference has no MoE); this is TPU-native
infrastructure for ``models/mixtral.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from .backend import interpret as _interpret
from .pallas_matmul import (
    BLOCK,
    _VMEM_LIMIT,
    _expand_scale,
    decode_codes_to_bf16,
    decode_int8_to_bf16,
)


def _grouped_kernel_bf16(te_ref, rows_ref, x_ref, w_ref, o_ref, acc_ref):
    t = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(rows_ref[t] > 0)
    def _():
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _grouped_kernel_tinner(
    te_ref, rows_ref, x_ref, w_ref, *rest, elem_name, tm
):
    """Row-tile-INNERMOST variant (grid (j, k, t)) for decode-sized R.

    With t outermost (the original layout) the dead-tile skip never
    engaged: the weight block index ``(te[t], k, j)`` changes every step of
    each tile's (j, k) sweep, so every tile — dead ones included —
    re-streams AND re-decodes its expert's entire weight matrix (measured
    on-chip: routed-2-of-8 cost the same as all-8, 2.57 vs 2.78 ms; the
    decode VPU work dominated).  With t innermost, consecutive tiles of the
    SAME expert keep the weight block resident (Pallas skips the DMA on an
    unchanged index) and the MX decode lands in a (bk, bn) bf16 VMEM
    scratch refreshed only when the tile's expert CHANGES — per (j, k)
    step the kernel streams and decodes exactly the routed experts' blocks
    once each (routed-2 measured 0.873 ms, 2.9x the t-outer layout).
    Costs an (R, bn) fp32 accumulator in VMEM; ``grouped_matmul`` falls
    back to the t-outer layout when that would not fit."""
    if elem_name is None:
        o_ref, acc_ref = rest
        wdec_ref = None
    else:
        s_ref, o_ref, acc_ref, wdec_ref = rest
    k = pl.program_id(1)
    t = pl.program_id(2)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[pl.ds(t * tm, tm)] = jnp.zeros_like(acc_ref[pl.ds(t * tm, tm)])

    if elem_name is None:
        w_for_dot = lambda: w_ref[0]  # noqa: E731 — bf16 blocks decode-free
    else:
        fresh = (t == 0) | (te_ref[t] != te_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            codes = w_ref[0].astype(jnp.int32)
            se = _expand_scale(s_ref[0].astype(jnp.int32), BLOCK)
            if elem_name == "int8":
                wdec_ref[:] = decode_int8_to_bf16(codes, se)
            else:
                wdec_ref[:] = decode_codes_to_bf16(
                    codes, se, dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name],
                    dot_operand=True,
                )

        w_for_dot = lambda: wdec_ref[:]  # noqa: E731

    @pl.when(rows_ref[t] > 0)
    def _():
        acc_ref[pl.ds(t * tm, tm)] += jax.lax.dot_general(
            x_ref[:], w_for_dot(), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[pl.ds(t * tm, tm)].astype(o_ref.dtype)


def _grouped_kernel_mx(te_ref, rows_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, elem_name):
    t = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Decode OUTSIDE the liveness predicate: Mosaic predicating the whole
    # decode chain explodes compile time (measured on-chip: 121 s for a
    # TINY config vs 0.7 s hoisted — the full Mixtral shape never finished).
    # Dead tiles pay the (cheap, VPU) decode of an already-resident block;
    # only the MXU dot stays conditional.
    codes = w_ref[0].astype(jnp.int32)
    se = _expand_scale(s_ref[0].astype(jnp.int32), BLOCK)
    if elem_name == "int8":
        w = decode_int8_to_bf16(codes, se)
    else:
        w = decode_codes_to_bf16(
            codes, se, dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name],
            dot_operand=True,
        )

    @pl.when(rows_ref[t] > 0)
    def _():
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "bn", "bk", "elem_name"))
def grouped_matmul(
    x_sorted: jax.Array,
    w_stacked: jax.Array,
    tile_expert: jax.Array,
    tile_rows: jax.Array,
    *,
    tm: int,
    bn: int,
    bk: int,
    w_scale: Optional[jax.Array] = None,
    elem_name: Optional[str] = None,
) -> jax.Array:
    """(R, K) expert-sorted rows × stacked (E, K, N) weights → (R, N).

    Row tile ``t`` contracts against expert ``tile_expert[t]`` (scalar-
    prefetched — the weight DMA address is computed from it before the tile
    body runs).  ``tile_rows[t]`` is the tile's live row count: dead
    trailing tiles carry the LAST live tile's expert index (their weight
    blocks are already resident, so Pallas skips the DMA) and the kernel
    skips their dots — at decode sizes the kernel therefore reads exactly
    the routed experts' weights and nothing else.  ``w_scale``/
    ``elem_name`` switch the MX-decode variant (one-byte codes (E, K, N) +
    scales (E, K/32, N))."""
    R, K = x_sorted.shape
    E, _, N = w_stacked.shape
    assert R % tm == 0 and K % bk == 0 and N % bn == 0
    # Row-tile-innermost layout whenever its (R, bn) fp32 accumulator fits
    # comfortably in VMEM: the ONLY grid order under which a row tile whose
    # expert matches the previous tile's reuses the resident weight block
    # (the dead-tile/dropless DMA skip — see _grouped_kernel_tinner).
    t_inner = R * bn * 4 <= 4 * 1024 * 1024
    if t_inner:
        grid = (N // bn, K // bk, R // tm)
        x_spec = pl.BlockSpec(
            (tm, bk), lambda j, k, t, te, rows: (t, k), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (1, bk, bn), lambda j, k, t, te, rows: (te[t], k, j),
            memory_space=pltpu.VMEM,
        )
        s_spec = pl.BlockSpec(
            (1, bk // BLOCK, bn), lambda j, k, t, te, rows: (te[t], k, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (tm, bn), lambda j, k, t, te, rows: (t, j), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _grouped_kernel_tinner,
            elem_name=None if w_scale is None else elem_name,
            tm=tm,
        )
        scratch = [pltpu.VMEM((R, bn), jnp.float32)]
        if w_scale is not None:
            scratch.append(pltpu.VMEM((bk, bn), jnp.bfloat16))
    else:
        grid = (R // tm, N // bn, K // bk)
        x_spec = pl.BlockSpec(
            (tm, bk), lambda t, j, k, te, rows: (t, k), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (1, bk, bn), lambda t, j, k, te, rows: (te[t], k, j),
            memory_space=pltpu.VMEM,
        )
        s_spec = pl.BlockSpec(
            (1, bk // BLOCK, bn),
            lambda t, j, k, te, rows: (te[t], k, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (tm, bn), lambda t, j, k, te, rows: (t, j), memory_space=pltpu.VMEM
        )
        kernel = (
            _grouped_kernel_bf16 if w_scale is None
            else functools.partial(_grouped_kernel_mx, elem_name=elem_name)
        )
        scratch = [pltpu.VMEM((tm, bn), jnp.float32)]
    if w_scale is None:
        in_specs = [x_spec, w_spec]
        args = (tile_expert, tile_rows, x_sorted, w_stacked)
        w_bytes = 2
    else:
        in_specs = [x_spec, w_spec, s_spec]
        args = (tile_expert, tile_rows, x_sorted, w_stacked, w_scale)
        w_bytes = 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * N * K,
            bytes_accessed=R * K * 2 + N * K * w_bytes + R * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


def plan_group_layout(T: int, k: int, E: int, tm: int) -> int:
    """Static padded row count: every expert group padded to a ``tm``
    multiple never exceeds ceil(A/tm)+E full tiles (A = T·k)."""
    A = T * k
    return ((A + tm - 1) // tm + E) * tm


def group_tokens(
    x_t: jax.Array,
    top_idx: jax.Array,
    tm: int,
    num_experts: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort the (token, expert) assignments by expert, pad each group to a
    ``tm`` multiple, and gather token rows into the padded layout.

    Args:
        x_t: (T, H) tokens.
        top_idx: (T, k) selected expert ids per token.
        tm: row-tile size of the grouped kernel.
        num_experts: E.

    Returns ``(x_sorted (R, H), tile_expert (R/tm,), tile_rows (R/tm,),
    dest (T*k,))``: ``dest`` maps assignment ``a = t*k + i`` to its row in
    the padded layout (for gathering the kernel output back);
    ``tile_rows`` counts each tile's live rows, with DEAD trailing tiles
    pinned to the last live tile's expert so their weight blocks are
    already resident and the kernel skips both the DMA and the dots.
    """
    T, k = top_idx.shape
    E = num_experts
    A = T * k
    R = plan_group_layout(T, k, E, tm)
    expert_of_a = top_idx.reshape(A)  # (A,)
    token_of_a = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    counts = jnp.bincount(expert_of_a, length=E)  # (E,)
    padded = ((counts + tm - 1) // tm) * tm
    group_start = jnp.concatenate(
        [jnp.zeros((1,), padded.dtype), jnp.cumsum(padded)[:-1]]
    )  # (E,)
    # Rank of each assignment within its expert group (arrival order), via
    # one stable sort: position in the expert-sorted order minus the start
    # of the expert's run.
    order = jnp.argsort(expert_of_a, stable=True)  # (A,)
    sorted_e = expert_of_a[order]
    run_start = jnp.searchsorted(sorted_e, jnp.arange(E))  # (E,)
    rank_sorted = jnp.arange(A, dtype=jnp.int32) - run_start[sorted_e].astype(jnp.int32)
    rank = jnp.zeros((A,), jnp.int32).at[order].set(rank_sorted)
    dest = group_start[expert_of_a].astype(jnp.int32) + rank  # unique rows in [0, R)
    x_sorted = jnp.zeros((R, x_t.shape[1]), x_t.dtype).at[dest].set(
        x_t[token_of_a]
    )
    # Tile t covers rows [t*tm, (t+1)*tm): its expert is the one whose
    # padded span contains the tile start.  Trailing DEAD tiles (beyond
    # every group) inherit the LAST live tile's expert — the weight block
    # index then never changes across them, so Pallas skips their DMA and
    # the kernel skips their dots via tile_rows == 0.
    tile_starts = jnp.arange(R // tm, dtype=jnp.int32) * tm
    group_end = jnp.cumsum(padded)  # (E,)
    total = group_end[-1]
    te_raw = jnp.minimum(
        jnp.searchsorted(group_end, tile_starts, side="right"), E - 1
    ).astype(jnp.int32)
    te_last = jnp.minimum(
        jnp.searchsorted(group_end, jnp.maximum(total - 1, 0), side="right"),
        E - 1,
    ).astype(jnp.int32)
    live = tile_starts < total
    tile_expert = jnp.where(live, te_raw, te_last)
    tile_rows = jnp.clip(total - tile_starts, 0, tm).astype(jnp.int32)
    return x_sorted, tile_expert, tile_rows, dest


def combine_tokens(
    y_sorted: jax.Array,
    dest: jax.Array,
    top_vals: jax.Array,
) -> jax.Array:
    """Gather per-assignment outputs back to token order and combine with
    the routing weights: (R, N) → (T, N)."""
    T, k = top_vals.shape
    y_a = y_sorted[dest]  # (A, N)
    y_a = y_a.astype(jnp.float32) * top_vals.reshape(-1)[:, None]
    return jnp.sum(y_a.reshape(T, k, -1), axis=1)
