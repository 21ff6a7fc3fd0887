"""Checkpoint / resume for MX-quantized models (orbax-backed).

The reference's checkpoint story is serialization-only: ``MXTensor`` is
registered with ``torch.serialization.add_safe_globals`` and implements
``__tensor_flatten__/__tensor_unflatten__`` so MX-weighted models round-trip
through ``state_dict`` / ``weights_only=True`` loads (reference
``mx_tensor.py:495-528``).  The TPU-native equivalent: :class:`MXArray` is a
registered JAX pytree, and this module persists any NNX model state — plain
params and MXArray params alike — with orbax, storing the quantization
metadata (elem_dtype, block_size, block_dim, padding, fp4_pack, orig_dtype)
in a JSON sidecar so payload/scale arrays are rebuilt into ``MXArray``
objects on load.

Layout on disk::

    <dir>/arrays/...      orbax PyTree checkpoint (flat {path: array})
    <dir>/mx_meta.json    MXArray metadata + framework version

Save/restore works on CPU and TPU; sharded arrays restore with the shardings
of the template state passed to :func:`load_checkpoint`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

from .mx_array import MXArray

_META_FILE = "mx_meta.json"
_ARRAYS_DIR = "arrays"


def _is_leaf(x) -> bool:
    return isinstance(x, MXArray)


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def _fp6_packable(leaf: MXArray) -> bool:
    return (
        leaf.elem_dtype.name in ("float6_e3m2", "float6_e2m3")
        and leaf.data.shape[leaf.block_dim] % 4 == 0
    )


def flatten_with_mx(
    tree, *, compress_fp6: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Flatten a pytree into ``{path: array}``, expanding each MXArray leaf
    into ``<path>.scale_e8m0`` / ``<path>.data`` entries plus a metadata
    record (the persistence analog of reference ``__tensor_flatten__``,
    ``mx_tensor.py:495-507``).

    ``compress_fp6=True`` stores fp6 payloads bit-packed (4 codes / 3 bytes,
    ``packing.pack_uint6`` — the TPU-build extension; the reference keeps fp6
    one byte per element), 25% smaller on disk; unpacked on load.
    """
    from .packing import pack_uint6

    flat: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree, is_leaf=_is_leaf)[0]
    for path, leaf in leaves:
        key = _path_str(path)
        if isinstance(leaf, MXArray):
            data = leaf.data
            fp6_packed = bool(compress_fp6 and _fp6_packable(leaf))
            if fp6_packed:
                data = pack_uint6(data, packing_dim=leaf.block_dim)
            flat[key + ".scale_e8m0"] = leaf.scale_e8m0
            flat[key + ".data"] = data
            meta[key] = {
                "elem_dtype": leaf.elem_dtype.name,
                "block_size": leaf.block_size,
                "orig_dtype": str(leaf.orig_dtype),
                "block_dim": leaf.block_dim,
                "padding": leaf.padding,
                "fp4_pack": leaf.fp4_pack,
                "fp6_packed": fp6_packed,
            }
        else:
            flat[key] = leaf
    return flat, meta


def unflatten_with_mx(template, flat: Dict[str, Any], meta: Dict[str, Any]):
    """Rebuild a pytree with the structure of ``template`` from
    :func:`flatten_with_mx` output (analog of ``__tensor_unflatten__``,
    reference ``mx_tensor.py:509-520``)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        template, is_leaf=_is_leaf
    )
    from .packing import unpack_uint6

    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = _path_str(path)
        if isinstance(leaf, MXArray):
            m = meta[key]
            data = flat[key + ".data"]
            if m.get("fp6_packed"):
                data = unpack_uint6(data, packing_dim=m["block_dim"])
            new_leaves.append(
                MXArray(
                    flat[key + ".scale_e8m0"],
                    data,
                    m["elem_dtype"],
                    m["block_size"],
                    m["orig_dtype"],
                    m["padding"],
                    m["block_dim"],
                    fp4_pack=m.get("fp4_pack", "pair"),
                )
            )
        else:
            new_leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(directory: str, state, *, compress_fp6: bool = False) -> None:
    """Persist an NNX state (or any pytree, possibly containing MXArrays)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    flat, meta = flatten_with_mx(state, compress_fp6=compress_fp6)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(directory, _ARRAYS_DIR), flat)
    from . import __version__

    with open(os.path.join(directory, _META_FILE), "w") as f:
        json.dump({"version": __version__, "mx_arrays": meta}, f, indent=1)


def load_checkpoint(directory: str, template):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` must have the same structure (e.g. the ``nnx.State`` of a
    freshly constructed model, or ``jax.eval_shape`` thereof); array leaves
    are restored onto the default device.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, _META_FILE)) as f:
        meta = json.load(f)["mx_arrays"]
    template_flat, _ = flatten_with_mx(template)
    abstract = {}
    for k, v in template_flat.items():
        shape = tuple(np.shape(v))
        base = k[: -len(".data")] if k.endswith(".data") else None
        if base is not None and meta.get(base, {}).get("fp6_packed"):
            bd = meta[base]["block_dim"]
            shape = tuple(
                3 * s // 4 if i == bd else s for i, s in enumerate(shape)
            )
        # Restore sharded arrays with the template's shardings (a TP-sharded
        # model restores distributed instead of onto one device).
        sharding = getattr(v, "sharding", None)
        if sharding is None or not isinstance(sharding, jax.sharding.Sharding):
            # orbax requires a concrete sharding whenever more than one
            # device is visible (e.g. the 8-device CPU test mesh); a plain
            # template (numpy leaves / eval_shape) restores to the default
            # device exactly as before.
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract[k] = jax.ShapeDtypeStruct(shape, v.dtype, sharding=sharding)
    ckptr = ocp.PyTreeCheckpointer()
    flat = ckptr.restore(
        os.path.join(directory, _ARRAYS_DIR),
        item=abstract,
        restore_args=ocp.checkpoint_utils.construct_restore_args(abstract),
    )
    return unflatten_with_mx(template, flat, meta)


def save_model(directory: str, model, *, compress_fp6: bool = False) -> None:
    """Save an NNX model's full state (MX weights included).

    ``compress_fp6=True`` bit-packs fp6 payloads on disk (25% smaller)."""
    from flax import nnx

    save_checkpoint(directory, nnx.state(model), compress_fp6=compress_fp6)


def load_model(directory: str, model):
    """Restore state into ``model`` in place and return it."""
    from flax import nnx

    state = load_checkpoint(directory, nnx.state(model))
    nnx.update(model, state)
    return model
