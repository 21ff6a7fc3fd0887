"""Multi-chip execution: mesh creation and sharding rules.

The reference has no distributed backend (no ``torch.distributed`` anywhere;
TP explicitly rejected at ``mx_llama_attention.py:137-139``).  The TPU-native
framework scales through GSPMD: annotate parameter/activation shardings over a
``jax.sharding.Mesh`` and let XLA insert the ICI/DCN collectives.  Packed MX
payloads and their E8M0 scales shard **congruently** (a scale shard is its
payload shard divided by ``block_size`` along the blocked dim), so collectives
move packed uint8 bytes — 4-8x cheaper than bf16.
"""

from . import multihost  # noqa: F401
from .context import (  # noqa: F401
    context_parallel,
    ring_attention,
    ring_attention_mx,
)
from .pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_decode_model,
    pipeline_model,
    shard_staged_params,
)
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    input_sharding,
    shard_model,
    spec_for_path,
)
