"""Llama-3-8B-shape decode throughput on one TPU chip (dev tool).

Builds the 8B architecture with zero-initialized weights on the **host CPU**
(a real checkpoint is 16GB bf16 — over a v5e's HBM next to its quantized
copy; MX timing is data-independent so zeros measure the same), quantizes to
MXFP4 weights / MXFP8 activations streaming layer by layer, moves the packed
arrays (~3.9GB) to the TPU, and measures steady-state decode tok/s with the
fused dequant-matmul kernels + fused MX fp8 KV-cache attention.

Run:  JAX_PLATFORMS=axon,cpu python tools/bench_8b_decode.py [prompt_len] [new_tokens]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_

LLAMA3_8B = dict(
    vocab_size=128256,
    hidden_size=4096,
    intermediate_size=14336,
    num_hidden_layers=32,
    num_attention_heads=32,
    num_key_value_heads=8,
    rope_theta=500000.0,
)


def main():
    prompt_len = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    new_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    cpu = jax.devices("cpu")[0]
    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    cfg = LlamaConfig(max_position_embeddings=prompt_len + new_tokens, **LLAMA3_8B)

    from torchmx_tpu import env_variables as env

    t0 = time.perf_counter()
    old_backend = env.TORCHMX_QUANTIZE_BACKEND
    env.TORCHMX_QUANTIZE_BACKEND = "jnp"  # host-side quantization on CPU
    try:
        with jax.default_device(cpu):
            model = LlamaForCausalLM(cfg)  # zero-init on host
            qlin = QLinearConfig(
                weights_config=MXConfig("float4_e2m1"),
                activations_config=MXConfig("float8_e4m3"),
            )
            quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    finally:
        env.TORCHMX_QUANTIZE_BACKEND = old_backend
    print(f"built + quantized 8B on host in {time.perf_counter() - t0:.1f}s")

    graphdef, state = nnx.split(model)
    nbytes = sum(
        x.nbytes for x in jax.tree_util.tree_leaves(state) if hasattr(x, "nbytes")
    )
    t0 = time.perf_counter()
    state = jax.device_put(state, tpu)
    jax.block_until_ready(state)
    model = nnx.merge(graphdef, state)
    print(f"moved {nbytes / 1e9:.2f} GB to {tpu} in {time.perf_counter() - t0:.1f}s")

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 1000, (1, prompt_len), np.int64),
        jnp.int32,
    )
    with jax.default_device(tpu):
        t0 = time.perf_counter()
        out = generate(
            model, prompt, max_new_tokens=new_tokens,
            kv_cache_config=MXConfig("float8_e4m3"),
        )
        jax.block_until_ready(out)
        t_first = time.perf_counter() - t0
        print(f"first call (compile + prefill + {new_tokens} tokens): {t_first:.1f}s")

        t0 = time.perf_counter()
        out = generate(
            model, prompt, max_new_tokens=new_tokens,
            kv_cache_config=MXConfig("float8_e4m3"),
        )
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    print(
        f"steady state: {new_tokens} tokens in {dt:.2f}s = "
        f"{new_tokens / dt:.1f} tok/s (b=1, prompt {prompt_len}, "
        f"MXFP4-w/MXFP8-a, fp8 MX KV cache, single v5e chip)"
    )


if __name__ == "__main__":
    main()
