"""Decode smoke test: greedy generation from an MX-quantized tiny Llama with
an MX-quantized KV cache (TPU-build extension; the reference leaves KV-cache
quantization as a TODO, ``mx_llama_attention.py:176-183``).

Run: ``python examples/tiny_llama_generate.py``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_

if __name__ == "__main__":
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)

    prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None, :] % 256)
    out_hp = generate(model, prompt, max_new_tokens=16)
    out_mx = generate(
        model, prompt, max_new_tokens=16, kv_cache_config=MXConfig("float8_e4m3")
    )
    print("hp  KV cache:", np.asarray(out_hp)[0].tolist())
    print("mx  KV cache:", np.asarray(out_mx)[0].tolist())
    print("OK")
