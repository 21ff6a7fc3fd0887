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


def _manual_axes(mesh: Mesh, axis: str, data_axis, tp_axis):
    """shard_map ``axis_names`` for PP(×DP)×TP composition: the pipeline
    (and DP) axes are MANUAL (explicit ppermute schedule); with ``tp_axis``
    set, that axis is left out so GSPMD auto-shards the within-stage math
    over it (Megatron TP collectives inserted by the compiler — the same
    mechanism as the plain jit TP path).  Without ``tp_axis`` every mesh
    axis is manual (the historical behavior)."""
    if tp_axis is None:
        return frozenset()
    manual = {a for a in (axis, data_axis) if a is not None}
    assert tp_axis not in manual and tp_axis in mesh.shape, (tp_axis, mesh)
    return frozenset(manual)


def shard_staged_params(staged, mesh: Mesh, axis: str, tp_axis: str):
    """Place stage-stacked decoder params with composed PP×TP shardings.

    Leaves are ``(n_stages, layers_per_stage, *param_dims)``: dim 0 shards
    over the pipeline ``axis``; the param dims reuse the Megatron rules
    (``mesh.spec_for_path`` — K-major transpose, divisibility guard) over
    ``tp_axis`` (= the ``model`` axis the rules name).  MXArray payload and
    scale leaves are placed AS A UNIT: the divisibility guard sees both
    shapes, so a dim whose scale rows do not divide the axis replicates on
    both (the same joint rule ``shard_model`` enforces) — incongruent
    payload/scale placements would otherwise make GSPMD insert reshards.
    """
    from jax.sharding import NamedSharding

    from .mesh import MODEL_AXIS as _M, _drop_indivisible, _path_str, spec_for_path

    assert tp_axis == _M, f"TP rules name the {_M!r} axis; got {tp_axis!r}"

    def _mx_field(ps: str):
        """('parent', field) for an MXArray payload/scale leaf, else None."""
        for field in ("data", "scale_e8m0"):
            if ps.endswith("." + field):
                return ps[: -len(field) - 1], field
        return None

    # First pass: collect MXArray units (payload+scale shapes per parent).
    units = {}

    def collect(path, leaf):
        mf = _mx_field(_path_str(path))
        if mf is not None:
            units.setdefault(mf[0], {})[mf[1]] = leaf.shape

    jax.tree_util.tree_map_with_path(collect, staged)

    def place(path, leaf):
        ps = _path_str(path)
        mf = _mx_field(ps)
        base = spec_for_path(ps, leaf.ndim - 2, is_mx=mf is not None)
        full = P(axis, None, *base)
        if mf is not None and len(units.get(mf[0], {})) == 2:
            shapes = tuple(units[mf[0]].values())
        else:
            shapes = (leaf.shape,)
        full = _drop_indivisible(full, shapes, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, full))

    return jax.tree_util.tree_map_with_path(place, staged)


def _runs_kind_stacking(model, cfg, L: int):
    """Stacking for APERIODIC window mixes (``plan_layer_bodies`` ->
    ("runs", ...)): stack ALL layers into one (L, ...) state, build one
    graphdef per distinct WINDOW (a graphdef pins its layer's static
    window), and return the per-layer kind index the stage body
    ``lax.switch``es on.  Requires structurally identical layers — a
    structure mix (DeepSeek's dense-MLP prefix before MoE layers) cannot
    stack into one state and still refuses."""
    import jax.numpy as _jnp
    from flax import nnx

    from ..models.scan import stack_decoder_layers

    layers = list(model.model.layers)

    def sig(layer):
        leaves, treedef = jax.tree_util.tree_flatten(nnx.split(layer)[1])
        return (treedef, tuple((tuple(x.shape), str(x.dtype)) for x in leaves))

    s0 = sig(layers[0])
    if any(sig(l) != s0 for l in layers[1:]):
        raise NotImplementedError(
            "pipeline per-layer body selection needs structurally identical "
            "layers; this config mixes layer STRUCTURES (e.g. a dense-MLP "
            "prefix before MoE layers) — use the plain or scan model"
        )
    windows = [cfg.layer_window(i) for i in range(L)]
    kinds = list(dict.fromkeys(windows))
    kind_graphdefs = [
        nnx.split(layers[windows.index(w)])[0] for w in kinds
    ]
    kind_of = _jnp.asarray([kinds.index(w) for w in windows], _jnp.int32)
    _, parts = stack_decoder_layers(layers)
    return kind_graphdefs, parts, kind_of


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = MODEL_AXIS,
    consts=(),
    data_axis: str = None,
    tp_axis: str = None,
):
    """Apply ``n_stages`` sequential stages over ``axis`` with microbatching.

    Args:
        stage_fn: ``fn(params_i, x, *consts) -> y`` with ``y.shape ==
            x.shape`` — one pipeline stage (e.g. a group of decoder layers).
        stacked_params: pytree whose leaves have a leading ``n_stages`` dim
            (sharded over ``axis``).
        x: (batch, ...) input, batch divisible by ``n_microbatches``.
        mesh: mesh containing ``axis`` with size ``n_stages``.
        consts: extra arrays every stage reads (RoPE tables, masks, ...) —
            replicated across the mesh, passed through to ``stage_fn``.
        data_axis: optional second mesh axis for DP composition: microbatch
            rows shard over it (batch must then be divisible by
            ``n_microbatches * mesh.shape[data_axis]``).
        tp_axis: optional third mesh axis for TP composition: the pipeline
            schedule stays manual while GSPMD auto-shards the within-stage
            math over this axis (weights pre-sharded via
            :func:`shard_staged_params`).

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
    if data_axis is not None:
        assert mb % mesh.shape[data_axis] == 0, (mb, mesh.shape[data_axis])
    xs = x.reshape(n_microbatches, mb, *x.shape[1:])
    n_steps = n_microbatches + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    xs_spec = P(None, data_axis) if data_axis is not None else P()
    const_specs = jax.tree.map(lambda _: P(), tuple(consts))

    def device_fn(params, xs, *consts):
        s = jax.lax.axis_index(axis)
        my_params = jax.tree.map(lambda p: p[0], params)  # local (1, ...) shard

        def body(carry, t):
            prev_out, buf = carry
            recv = jax.lax.ppermute(prev_out, axis, perm)
            m_idx = t - s
            inp = jnp.where(s == 0, xs[jnp.clip(t, 0, n_microbatches - 1)], recv)
            out = stage_fn(my_params, inp, *consts)
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

    out_spec = P(axis, None, data_axis) if data_axis is not None else P(axis)
    out = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(param_specs, xs_spec) + const_specs,
        out_specs=out_spec,
        axis_names=_manual_axes(mesh, axis, data_axis, tp_axis),
    )(stacked_params, xs, *consts)
    # Only the final stage's buffer holds the pipeline output.
    return out[-1].reshape(b, *x.shape[1:])


def pipeline_decode_model(model, mesh: Mesh, *, n_microbatches: int,
                          axis: str = MODEL_AXIS, data_axis: str = None,
                          tp_axis: str = None):
    """Cached decode (and cached prefill) through the staged pipeline.

    Round-3 extension of :func:`pipeline_model`, which covers only
    non-cached forwards: here each stage owns the **KV caches of its own
    layers** (leaves ``(n_stages, L/S, batch, ...)`` sharded over ``axis`` —
    MX cache formats included, they are ordinary pytrees), and every token
    step runs the GPipe rotation: microbatches of batch rows hand their
    activations to the next stage over ICI ``ppermute`` while each stage
    scans its layers locally, reading and writing only its cache shard.
    Composes with DP via ``data_axis`` (batch rows shard within each
    microbatch, caches shard congruently).

    Returns ``(fwd, params, init_caches)``:

    * ``fwd(params, caches, input_ids, position_ids, cache_position) ->
      (logits, new_caches)`` — same contract as the model's ``__call__``
      with caches: pass the prompt for a cached prefill (s > 1), then one
      token per row with per-row ``cache_position`` for decode steps.  Jit
      with the mesh active and donate ``caches``.
    * ``init_caches(batch, max_len, kv_cache_config=None)`` — stage-stacked
      caches; shard leaves ``P(axis, None, data_axis)``.

    Greedy token streams are bit-equal to the sequential model's (tested on
    the 8-device CPU mesh; the per-layer math is identical, only the
    stage/microbatch schedule differs).
    """
    from flax import nnx

    from ..models.llama import plan_layer_bodies, rope_cos_sin
    from ..models.scan import stack_decoder_layer_groups

    cfg = model.config
    from ..models.llama import rope_attention_scaling as _ras

    _rope_scale = _ras(cfg)
    # Layers may mix attention kinds: a PERIODIC pattern (Gemma2
    # alternating sliding/full) unrolls P sub-bodies per scan step, body
    # j's graphdef pinned to layer_idx == j (its static window).  An
    # APERIODIC mix (Qwen2 ``max_window_layers`` run gating; round 5)
    # compiles one body per attention KIND and ``lax.switch``es per
    # scanned layer on a stage-sharded kind index — every device runs the
    # same program (all branches compiled once), so stages need not align
    # with run boundaries.
    from ..models.scan import _refine_plan_by_structure

    plan = _refine_plan_by_structure(
        plan_layer_bodies(cfg), list(model.model.layers), cfg
    )
    n_stages = mesh.shape[axis]
    M = n_microbatches
    L = cfg.num_hidden_layers
    assert L % n_stages == 0, f"{L} layers not divisible into {n_stages} stages"
    layers_per_stage = L // n_stages
    runs_mode = plan[0] == "runs"
    if runs_mode:
        kind_graphdefs, parts, kind_of = _runs_kind_stacking(model, cfg, L)
        period, n_groups = 1, layers_per_stage
        layer_graphdefs = None
        staged = (
            jax.tree.map(
                lambda a: a.reshape(n_stages, n_groups, *a.shape[1:]), parts
            ),
            kind_of.reshape(n_stages, n_groups),
        )
    else:
        period = 1 if plan[0] == "uniform" else plan[1]
        assert layers_per_stage % period == 0, (
            f"window period {period} does not tile {layers_per_stage} layers/stage"
        )
        n_groups = layers_per_stage // period
        layer_graphdefs, parts = stack_decoder_layer_groups(
            model.model.layers, period
        )
        # Part j leaves are (L/P, ...) over global groups; stage s owns groups
        # [s*n_groups, (s+1)*n_groups).
        staged = jax.tree.map(
            lambda a: a.reshape(n_stages, n_groups, *a.shape[1:]), parts
        )

    embed_gd, embed_state = nnx.split(model.model.embed_tokens)
    norm_gd, norm_state = nnx.split(model.model.norm)
    if model.lm_head is not None:
        head_gd, head_state = nnx.split(model.lm_head)
    else:
        head_gd, head_state = None, None

    params = dict(
        staged=staged,
        embed=embed_state,
        norm=norm_state,
        head=head_state,
        inv_freq=model.model.inv_freq.get_value(),
    )

    def init_caches(batch: int, max_len: int, kv_cache_config=None):
        from ..models.llama import LayerKVCache, MXLayerKVCache

        if kv_cache_config is None:
            one = LayerKVCache.create(
                batch, cfg.num_key_value_heads, max_len, cfg.head_dim
            )
        else:
            one = MXLayerKVCache.create(
                batch,
                cfg.num_key_value_heads,
                max_len,
                cfg.head_dim,
                kv_cache_config.elem_dtype_name,
                kv_cache_config.block_size,
            )
        return jax.tree.map(
            lambda a: jnp.zeros((n_stages, L // n_stages) + a.shape, a.dtype), one
        )

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    param_specs = jax.tree.map(lambda _: P(axis), staged)
    row = data_axis  # None under pure PP
    cache_specs_leaf = P(axis, None, row)

    def device_fn(staged_params, caches, xs, cosr, sinr, cpr):
        sid = jax.lax.axis_index(axis)
        my_params = jax.tree.map(lambda p: p[0], staged_params)  # (L/S, ...)
        mb_loc = xs.shape[1]

        def stage_apply(x, mcaches, cos_m, sin_m, cp_m):
            if runs_mode:
                # Aperiodic window mix: scan per LAYER, lax.switch-ing the
                # body on the layer's kind index (all kind bodies live in
                # the one compiled program; the switch picks at runtime).
                states, kind_loc = my_params

                def layer_body(x, inp2):
                    lstate, lcache, kind = inp2

                    def mk(k):
                        def br(xx):
                            layer = nnx.merge(kind_graphdefs[k], lstate)
                            return layer(
                                xx, cos=cos_m, sin=sin_m, attention_mask=None,
                                cache=lcache, cache_position=cp_m,
                            )
                        return br

                    return jax.lax.switch(
                        kind, [mk(k) for k in range(len(kind_graphdefs))], x
                    )

                return jax.lax.scan(layer_body, x, (states, mcaches, kind_loc))

            # Scan over layer GROUPS, unrolling the ``period`` sub-bodies
            # inside each step (body j's graphdef pins its static window).
            # Cache leaves keep local layer-major order: local layer
            # ``g * period + j`` is group g's sub-cache j.
            gcaches = jax.tree.map(
                lambda c: c.reshape((n_groups, period) + c.shape[1:]), mcaches
            )

            def group_body(x, inp2):
                lstates, gcache = inp2
                ncs = []
                for j in range(period):
                    lcache = jax.tree.map(lambda c, _j=j: c[_j], gcache)
                    layer = nnx.merge(layer_graphdefs[j], lstates[j])
                    x, nc = layer(
                        x, cos=cos_m, sin=sin_m, attention_mask=None,
                        cache=lcache, cache_position=cp_m,
                    )
                    ncs.append(nc)
                return x, jax.tree.map(lambda *ys: jnp.stack(ys), *ncs)

            x, new_g = jax.lax.scan(group_body, x, (my_params, gcaches))
            new_mc = jax.tree.map(
                lambda c: c.reshape((n_groups * period,) + c.shape[2:]), new_g
            )
            return x, new_mc

        n_steps = M + n_stages - 1

        def body(carry, t):
            prev_out, buf, caches = carry
            recv = jax.lax.ppermute(prev_out, axis, perm)
            m_idx = t - sid
            m = jnp.clip(m_idx, 0, M - 1)
            valid = (m_idx >= 0) & (m_idx < M)
            inp = jnp.where(sid == 0, xs[jnp.clip(t, 0, M - 1)], recv)
            mcaches = jax.tree.map(
                lambda c: jax.lax.dynamic_slice_in_dim(
                    c[0], m * mb_loc, mb_loc, axis=1
                ),
                caches,
            )
            out, new_mc = stage_apply(inp, mcaches, cosr[m], sinr[m], cpr[m])
            # Suppress invalid-step writes on the SLICE (cheap), then write
            # unconditionally — no full-cache select per substep.
            new_mc = jax.tree.map(
                lambda n, o: jnp.where(valid, n.astype(o.dtype), o), new_mc, mcaches
            )
            caches = jax.tree.map(
                lambda c, n: jax.lax.dynamic_update_slice(
                    c, n[None], (0, 0, m * mb_loc) + (0,) * (c.ndim - 3)
                ),
                caches,
                new_mc,
            )
            upd = jax.lax.dynamic_update_slice(
                buf, out[None].astype(buf.dtype),
                (m,) + (0,) * out.ndim,
            )
            buf = jnp.where(valid, upd, buf)
            return (out, buf, caches), None

        zero = jax.lax.pcast(jnp.zeros_like(xs[0]), (axis,), to="varying")
        buf0 = jax.lax.pcast(jnp.zeros_like(xs), (axis,), to="varying")
        (_, buf, caches), _ = jax.lax.scan(
            body, (zero, buf0, caches), jnp.arange(n_steps)
        )
        return buf[None], caches

    def fwd(params, caches, input_ids, position_ids, cache_position):
        b, s = input_ids.shape
        assert b % M == 0, (b, M)
        mb = b // M
        embed = nnx.merge(embed_gd, params["embed"])
        from ..models.scan import _scale_embeddings

        x = _scale_embeddings(embed(input_ids), cfg)
        cos, sin = rope_cos_sin(params["inv_freq"], position_ids, x.dtype)
        if _rope_scale != 1.0:  # LongRoPE attention factor (static)
            cos = cos * jnp.asarray(_rope_scale, cos.dtype)
            sin = sin * jnp.asarray(_rope_scale, sin.dtype)
        # position_ids may broadcast over the batch ((1, s)): expand so the
        # RoPE tables split into microbatches alongside the activations.
        cos = jnp.broadcast_to(cos, (b,) + cos.shape[1:])
        sin = jnp.broadcast_to(sin, (b,) + sin.shape[1:])
        xs = x.reshape(M, mb, s, -1)
        cosr = cos.reshape(M, mb, *cos.shape[1:])
        sinr = sin.reshape(M, mb, *sin.shape[1:])
        cpr = jnp.broadcast_to(
            jnp.asarray(cache_position, jnp.int32), (b,)
        ).reshape(M, mb)
        mb_spec = P(None, row)
        buf, new_caches = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(
                param_specs,
                jax.tree.map(lambda _: cache_specs_leaf, caches),
                P(None, row),
                mb_spec,
                mb_spec,
                mb_spec,
            ),
            out_specs=(P(axis, None, row), jax.tree.map(lambda _: cache_specs_leaf, caches)),
            axis_names=_manual_axes(mesh, axis, data_axis, tp_axis),
        )(params["staged"], caches, xs, cosr, sinr, cpr)
        hidden = nnx.merge(norm_gd, params["norm"])(buf[-1].reshape(b, s, -1))
        if head_state is None:
            logits = hidden @ embed.weight.get_value().T
        else:
            logits = nnx.merge(head_gd, params["head"])(hidden)
        from ..models.scan import _apply_final_softcap

        return _apply_final_softcap(logits, cfg), new_caches

    return fwd, params, init_caches


def pipeline_model(model, mesh: Mesh, *, n_microbatches: int, axis: str = MODEL_AXIS,
                   data_axis: str = None, tp_axis: str = None):
    """Stage a ``LlamaForCausalLM``'s decoder layers over ``axis`` (GPipe).

    The model-level integration of :func:`pipeline_apply` (the reference
    rejects TP/PP outright — ``mx_llama_attention.py:137-139``): layers are
    stacked (MXArray payloads included) and regrouped into
    ``n_stages = mesh.shape[axis]`` stages of ``L / n_stages`` layers; each
    stage scans its layers locally while microbatch activations rotate over
    ICI.  Embedding / final norm / LM head run replicated outside the
    pipeline.  Composes with DP via ``data_axis`` (batch rows sharded within
    each microbatch).

    Covers full (non-cached) forward passes — prefill and scoring.  Returns
    ``(fwd, params)`` with ``fwd(params, input_ids) -> logits``; shard
    ``params["staged"]`` leaves over ``axis`` (``fwd`` jits with the mesh
    active).
    """
    from flax import nnx

    from ..models.llama import make_causal_mask, plan_layer_bodies, rope_cos_sin
    from ..models.scan import stack_decoder_layer_groups

    cfg = model.config
    from ..models.llama import rope_attention_scaling as _ras

    _rope_scale = _ras(cfg)
    # Sliding-window models pipeline fine when every layer shares the
    # window (Mistral); PERIODIC mixes (Gemma2 alternation) unroll the
    # period's sub-bodies per stage scan step, each with its own static
    # mask.  APERIODIC mixes (Qwen2 run gating; round 5) compile one body
    # per attention KIND and lax.switch per scanned layer — same scheme as
    # the decode variant.
    from ..models.scan import _refine_plan_by_structure

    plan = _refine_plan_by_structure(
        plan_layer_bodies(cfg), list(model.model.layers), cfg
    )
    n_stages = mesh.shape[axis]
    L = cfg.num_hidden_layers
    assert L % n_stages == 0, f"{L} layers not divisible into {n_stages} stages"
    layers_per_stage = L // n_stages
    runs_mode = plan[0] == "runs"
    if runs_mode:
        kind_graphdefs, parts, kind_of = _runs_kind_stacking(model, cfg, L)
        period, n_groups = 1, layers_per_stage
        layer_graphdefs = None
        body_windows = list(dict.fromkeys(
            cfg.layer_window(i) for i in range(L)
        ))  # one mask per KIND, switch-selected
        staged = (
            jax.tree.map(
                lambda a: a.reshape(n_stages, n_groups, *a.shape[1:]), parts
            ),
            kind_of.reshape(n_stages, n_groups),
        )
    else:
        period = 1 if plan[0] == "uniform" else plan[1]
        body_windows = (
            [plan[1]] if plan[0] == "uniform"
            else [cfg.layer_window(j) for j in range(period)]
        )
        assert layers_per_stage % period == 0, (
            f"window period {period} does not tile {layers_per_stage} layers/stage"
        )
        n_groups = layers_per_stage // period
        layer_graphdefs, parts = stack_decoder_layer_groups(
            model.model.layers, period
        )
        staged = jax.tree.map(
            lambda a: a.reshape(n_stages, n_groups, *a.shape[1:]), parts
        )

    embed_gd, embed_state = nnx.split(model.model.embed_tokens)
    norm_gd, norm_state = nnx.split(model.model.norm)
    if model.lm_head is not None:
        head_gd, head_state = nnx.split(model.lm_head)
    else:
        head_gd, head_state = None, None

    params = dict(
        staged=staged,
        embed=embed_state,
        norm=norm_state,
        head=head_state,
        inv_freq=model.model.inv_freq.get_value(),
    )

    def stage_fn(stage_params, x, cos, sin, *masks):
        if runs_mode:
            # (state_tree, kind) leaves (n_groups, ...): per-layer
            # lax.switch on the kind index, one mask per KIND.
            states, kind_loc = stage_params

            def layer_body(x, inp):
                lstate, kind = inp

                def mk(k):
                    def br(xx):
                        layer = nnx.merge(kind_graphdefs[k], lstate)
                        return layer(
                            xx, cos=cos, sin=sin, attention_mask=masks[k],
                            cache=None, cache_position=None,
                        )[0]
                    return br

                x = jax.lax.switch(
                    kind, [mk(k) for k in range(len(kind_graphdefs))], x
                )
                return x, None

            x, _ = jax.lax.scan(layer_body, x, (states, kind_loc))
            return x

        # stage_params: tuple of `period` trees, each leaf (n_groups, ...);
        # one static mask per sub-body.
        def group_body(x, lstates):
            for j in range(period):
                layer = nnx.merge(layer_graphdefs[j], lstates[j])
                x, _ = layer(
                    x, cos=cos, sin=sin, attention_mask=masks[j],
                    cache=None, cache_position=None,
                )
            return x, None

        x, _ = jax.lax.scan(group_body, x, stage_params)
        return x

    def fwd(params, input_ids):
        b, s = input_ids.shape
        embed = nnx.merge(embed_gd, params["embed"])
        from ..models.scan import _scale_embeddings

        x = _scale_embeddings(embed(input_ids), cfg)
        pos = jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(params["inv_freq"], pos, x.dtype)
        if _rope_scale != 1.0:  # LongRoPE attention factor (static)
            cos = cos * jnp.asarray(_rope_scale, cos.dtype)
            sin = sin * jnp.asarray(_rope_scale, sin.dtype)
        built = {}

        def mask_for(w):
            if w not in built:
                built[w] = make_causal_mask(s, s, jnp.float32, window=w)[None, None]
            return built[w]

        masks = tuple(mask_for(w) for w in body_windows)
        x = pipeline_apply(
            stage_fn, params["staged"], x, mesh, n_microbatches,
            axis=axis, consts=(cos, sin) + masks, data_axis=data_axis,
            tp_axis=tp_axis,
        )
        hidden = nnx.merge(norm_gd, params["norm"])(x)
        if head_state is None:
            logits = hidden @ embed.weight.get_value().T
        else:
            logits = nnx.merge(head_gd, params["head"])(hidden)
        from ..models.scan import _apply_final_softcap

        return _apply_final_softcap(logits, cfg)

    return fwd, params
