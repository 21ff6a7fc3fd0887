"""Backend selection shared by every op and kernel.

``TORCHMX_QUANTIZE_BACKEND``: ``auto`` (Pallas kernels on TPU, jnp
elsewhere) / ``pallas`` (force; interpreter mode off-TPU) / ``jnp``.
"""

from __future__ import annotations

import jax

from .. import env_variables as env


def use_pallas() -> bool:
    mode = env.TORCHMX_QUANTIZE_BACKEND
    if mode == "pallas":
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def interpret() -> bool:
    """Pallas interpreter mode: keeps the kernels testable off-TPU."""
    return jax.default_backend() != "tpu"
