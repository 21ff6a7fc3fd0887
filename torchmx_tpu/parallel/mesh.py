"""Mesh + sharding rules for the Llama/Qwen2 model families.

Megatron-style tensor parallelism expressed as GSPMD sharding annotations:

* q/k/v and gate/up projection weights ``(out, in)`` shard the **out** dim on
  the ``model`` axis (column parallel);
* o and down projection weights shard the **in** dim (row parallel — XLA
  inserts the psum);
* embedding and lm_head shard the vocab dim;
* everything else (norms, biases of row-parallel layers) is replicated.

MXArray parameters shard congruently: payload and scale carry the same
PartitionSpec (their shapes differ only by ``block_size`` along the blocked
dim, and by 2x packing for fp4 — both divide evenly for transformer dims).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    With ``shape=None`` all devices go on the model axis (pure TP).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (1, len(devices))
    assert shape[0] * shape[1] == len(devices), f"{shape} != {len(devices)} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


# (regex over the flattened state path) -> PartitionSpec for a 2-D (out, in)
# weight.  First match wins.
_WEIGHT_RULES = [
    # Column-parallel: shard out_features.
    (re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)\.weight"), P(MODEL_AXIS, None)),
    # Row-parallel: shard in_features (psum inserted by GSPMD).
    (re.compile(r"(o_proj|down_proj)\.weight"), P(None, MODEL_AXIS)),
    # Column-parallel biases follow their weight's out dim.
    (re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)\.bias"), P(MODEL_AXIS)),
    # Vocab-sharded embedding / lm head.
    (re.compile(r"embed_tokens\.weight"), P(MODEL_AXIS, None)),
    (re.compile(r"lm_head\.weight"), P(MODEL_AXIS, None)),
]

# Expert parallelism: Mixtral stacked expert weights (E, out, in) shard the
# leading EXPERT axis; GSPMD turns the MoE combine einsum's E-contraction
# into a psum over the expert axis (all-to-all-free dense form; the
# dispatch/combine capacity form gets the classic a2a pattern).  The router
# gate stays replicated (every device must route identically).
_EXPERT_RULES = [
    (re.compile(r"mlp\.(w1|w2|w3)(\.|$)"), P(EXPERT_AXIS, None, None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def spec_for_path(path_str: str, ndim: int, is_mx: bool = False) -> P:
    """PartitionSpec for a param path.

    MXArray weights are stored **K-major** (in, out) by ``MXInferenceLinear``,
    so their 2-D spec is the transpose of the plain (out, in) weight rule;
    payload and scale share it (congruent sharding).
    """
    if ndim == 3:
        for rule, spec in _EXPERT_RULES:
            if rule.search(path_str):
                return spec
    for rule, spec in _WEIGHT_RULES:
        if rule.search(path_str):
            if ndim == 1:
                return P(spec[0]) if len(spec) and spec[0] else P(None)
            if ndim == 2:
                return P(spec[1], spec[0]) if is_mx else spec
            return P(*([None] * ndim))
    return P(*([None] * ndim))


def _drop_indivisible(spec: P, shapes, mesh: Mesh) -> P:
    """Replicate any dim whose size (in every co-sharded array) does not
    divide by the mesh axis — e.g. tiny layers, or an MX blocked dim whose
    scale rows are fewer than the shard count."""
    out = []
    for dim, ax in enumerate(spec):
        if ax is None or ax not in mesh.axis_names:
            out.append(None)
            continue
        n = mesh.shape[ax]
        out.append(ax if all(s[dim] % n == 0 for s in shapes) else None)
    return P(*out)


def shard_model(model, mesh: Mesh):
    """Apply TP sharding rules to an NNX model's state in place.

    MXArray params are placed as a unit: payload and scale get the same spec
    (their shapes differ by ``block_size`` along the blocked dim and by 2x
    byte-packing for fp4 — the divisibility guard checks both), so a scale
    shard is always its payload shard's blocks.
    """
    from flax import nnx

    from ..mx_array import MXArray

    graphdef, state = nnx.split(model)

    def place(path, leaf):
        ps = _path_str(path)
        if isinstance(leaf, MXArray):
            spec = spec_for_path(ps, leaf.data.ndim, is_mx=True)
            spec = _drop_indivisible(
                spec, (leaf.scale_e8m0.shape, leaf.data.shape), mesh
            )
            sh = NamedSharding(mesh, spec)
            return MXArray(
                jax.device_put(leaf.scale_e8m0, sh),
                jax.device_put(leaf.data, sh),
                leaf.elem_dtype,
                leaf.block_size,
                leaf.orig_dtype,
                leaf.padding,
                leaf.block_dim,
                fp4_pack=leaf.fp4_pack,
            )
        if not hasattr(leaf, "shape"):
            return leaf
        spec = spec_for_path(ps, getattr(leaf, "ndim", 0))
        spec = _drop_indivisible(spec, (leaf.shape,), mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    state = jax.tree_util.tree_map_with_path(
        place, state, is_leaf=lambda x: isinstance(x, MXArray)
    )
    nnx.update(model, state)
    return model


def input_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim data-parallel sharding for (batch, ...) inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))
