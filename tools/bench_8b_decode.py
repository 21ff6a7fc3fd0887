"""Llama-3-8B-shape decode throughput on one TPU chip (dev tool).

A real checkpoint is 16GB bf16 — over a v5e's HBM next to its quantized
copy, and there is no network egress here — so the MX-quantized model is
built **abstractly** (``nnx.eval_shape`` through the surgery API traces the
quantization without computing it) and its packed arrays are materialized as
zeros directly on the TPU (~4GB MXFP4 + bf16 embeddings).  Kernel timing is
data-independent, so zeros measure the same as real weights.

Run:  python tools/bench_8b_decode.py [prompt_len] [new_tokens] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def build_zeros_quantized(cfg, act_name: str = "float8_e4m3") -> LlamaForCausalLM:
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig(act_name),
    )

    def build():
        model = LlamaForCausalLM(cfg)
        quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
        return model

    abstract = nnx.eval_shape(build)
    graphdef, state = nnx.split(abstract)

    @jax.jit
    def zeros_like_state():
        return jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            state,
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
        )

    return nnx.merge(graphdef, zeros_like_state())


def main():
    prompt_len = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    new_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    kv_name = sys.argv[4] if len(sys.argv) > 4 else "float8_e4m3"
    act_name = sys.argv[5] if len(sys.argv) > 5 else "float8_e4m3"
    cfg = LlamaConfig(max_position_embeddings=prompt_len + new_tokens, **LLAMA3_8B)

    t0 = time.perf_counter()
    model = build_zeros_quantized(cfg, act_name)
    _, state = nnx.split(model)
    nbytes = sum(
        x.nbytes for x in jax.tree_util.tree_leaves(state) if hasattr(x, "nbytes")
    )
    print(
        f"built abstract-quantized 8B ({nbytes / 1e9:.2f} GB on device) "
        f"in {time.perf_counter() - t0:.1f}s"
    )

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 1000, (batch, prompt_len), np.int64),
        jnp.int32,
    )
    kv = MXConfig(kv_name)
    t0 = time.perf_counter()
    out = generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
    _force = int(jnp.sum(out))  # block_until_ready lies on this platform
    print(f"first call (compile + prefill + {new_tokens} tokens): "
          f"{time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
        _force = int(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"steady state: {batch}x{new_tokens} tokens in {dt:.2f}s = "
        f"{batch * new_tokens / dt:.1f} tok/s "
        f"(prompt {prompt_len}, MXFP4-w/{act_name}-a"
        + (" int8-domain" if os.environ.get("TORCHMX_INT8_DOMAIN") == "1" else "")
        + f", {kv_name} MX KV cache, one v5e chip)"
    )


if __name__ == "__main__":
    main()
