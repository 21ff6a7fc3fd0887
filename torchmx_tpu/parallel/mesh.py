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


_MX_LEAF = re.compile(r"\.weight\..*\b[01]$")


def spec_for_path(path_str: str, ndim: int) -> P:
    """PartitionSpec for a param path.

    MXArray weight leaves (payload/scale, recognized by the flattened-index
    suffix) are stored **K-major** (in, out) by ``MXInferenceLinear``, so
    their 2-D spec is the transpose of the plain (out, in) weight rule;
    payload and scale share it (congruent sharding).
    """
    for rule, spec in _WEIGHT_RULES:
        if rule.search(path_str):
            if ndim == 1:
                return P(spec[0]) if len(spec) and spec[0] else P(None)
            if ndim == 2:
                if _MX_LEAF.search(path_str):
                    return P(spec[1], spec[0])
                return spec
            return P(*([None] * ndim))
    return P(*([None] * ndim))


def shard_model(model, mesh: Mesh):
    """Apply TP sharding rules to an NNX model's state in place.

    Walks every array leaf (including MXArray payload/scale leaves), derives
    the PartitionSpec from the module path, and device_puts with the
    corresponding NamedSharding.
    """
    from flax import nnx

    graphdef, state = nnx.split(model)

    def place(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        ps = _path_str(path)
        spec = spec_for_path(ps, getattr(leaf, "ndim", 0))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    state = jax.tree_util.tree_map_with_path(place, state)
    nnx.update(model, state)
    return model


def input_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim data-parallel sharding for (batch, ...) inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))
