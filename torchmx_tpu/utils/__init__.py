"""Logging, seeding and tensor-size helpers.

TPU-native counterpart of the reference infra layer
(rain-neuromorphics/torchmx ``torchmx/utils.py``).
"""

from __future__ import annotations

import logging
import math
import random
from typing import Iterable, List, Sequence

import jax
import numpy as np

from .. import env_variables as env_v


def get_logger(
    logger_name: str = "TORCHMX_TPU",
    format_string: str = "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    console_output: bool = True,
) -> logging.Logger:
    """Return a configured logger (console + optional file handler).

    Level and file come from ``TORCHMX_LOG_LEVEL`` / ``TORCHMX_LOG_FILE`` env
    vars, read at import.  ``propagate`` is disabled so messages are emitted
    exactly once (reference ``utils.py:12-41``).
    """
    logger = logging.getLogger(logger_name)
    logger.setLevel(env_v.TORCHMX_LOG_LEVEL)
    if logger.handlers:
        # Already configured — avoid duplicate handlers on repeated calls.
        return logger
    formatter = logging.Formatter(format_string)
    if console_output:
        stream_handler = logging.StreamHandler()
        stream_handler.setFormatter(formatter)
        logger.addHandler(stream_handler)
    if env_v.TORCHMX_LOG_FILE:
        file_handler = logging.FileHandler(env_v.TORCHMX_LOG_FILE)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    logger.propagate = False
    return logger


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return a jax PRNG key.

    JAX randomness is functional; the returned key is the root of the stream
    (analog of reference ``utils.py:148-159`` which seeds global RNGs).
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def get_uniform_random_number(
    min_val: float, max_val: float, shape: Iterable[int], dtype, key: jax.Array
):
    """Uniform samples in [min_val, max_val) (reference ``utils.py:44-58``)."""
    import jax.numpy as jnp

    return jax.random.uniform(
        key, tuple(shape), dtype=jnp.float32, minval=min_val, maxval=max_val
    ).astype(dtype)


def tensor_size_hp_to_fp4x2(orig_size: Sequence[int], packing_dim: int) -> List[int]:
    """Shape after packing 2 fp4 elements per byte along ``packing_dim``.

    Mirrors reference ``utils.py:61-75``.
    """
    new_size = list(orig_size)
    new_size[packing_dim] = math.ceil(new_size[packing_dim] / 2)
    return new_size


def tensor_size_fp4x2_to_hp(orig_size: Sequence[int], unpacking_dim: int) -> List[int]:
    """Shape after unpacking fp4x2 bytes to one element per byte.

    Mirrors reference ``utils.py:78-93``.
    """
    new_size = list(orig_size)
    new_size[unpacking_dim] = new_size[unpacking_dim] * 2
    return new_size
