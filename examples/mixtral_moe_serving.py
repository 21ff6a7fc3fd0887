"""Quantized Mixtral MoE: quantize, serve, and switch routing modes.

Runs on CPU or one TPU chip with a tiny random-init model; demonstrates the
full MoE serving path — MXFP6-weight expert GEMMs with an hp router, the
MXINT8 KV cache, and the three routing modes (dense-exact / capacity /
dropless grouped GEMM).  No reference counterpart: the reference has no MoE
(SURVEY §2.3).

Usage: python examples/mixtral_moe_serving.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM
from torchmx_tpu.models.serve import DecodeEngine
from torchmx_tpu.quant_api import quantize_llm_


def main():
    cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    model = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))

    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    print("quantized:", type(model.model.layers[0].mlp).__name__)

    engine = DecodeEngine(
        model, max_batch=2, max_len=128, kv_cache_config=MXConfig("int8")
    )
    rng = np.random.RandomState(0)
    s1 = engine.add(rng.randint(0, 256, (12,)).tolist())
    s2 = engine.add(rng.randint(0, 256, (7,)).tolist())
    streams = {s1: [], s2: []}
    for _ in range(16):
        for slot, tok in engine.step().items():
            streams[slot].append(tok)
    for slot, toks in streams.items():
        print(f"slot {slot}: {toks}")

    # Routing modes on the un-quantized block (grouped = dropless kernel).
    plain = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(rng.randint(0, 256, (1, 32)), jnp.int32)
    dense, _ = plain(ids)
    for layer in plain.model.layers:
        layer.mlp.grouped = True
        layer.mlp.grouped_tm = 8
    grouped, _ = plain(ids)
    print(
        "dense vs grouped max |Δlogit|:",
        float(jnp.max(jnp.abs(dense - grouped))),
    )


if __name__ == "__main__":
    main()
