"""Compile-time comparison: unrolled vs scan-over-layers decode executable.

Builds an abstract-initialized (zero-weight) MX-quantized model at a given
depth, jits one decode step for the unrolled and the scan model, and times
trace+compile (jit(...).lower().compile()).  Run on TPU for the real numbers
(CPU numbers are directionally similar).

    python tools/bench_compile_scan.py [layers=32] [hidden=4096]
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, ".")

from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.scan import ScanLlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_


def build(layers: int, hidden: int):
    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=hidden,
        intermediate_size=hidden * 7 // 2 // 256 * 256,
        num_hidden_layers=layers,
        num_attention_heads=hidden // 128,
        num_key_value_heads=max(1, hidden // 128 // 4),
        max_position_embeddings=2048,
    )
    model = nnx.eval_shape(lambda: LlamaForCausalLM(cfg, rngs=nnx.Rngs(0)))
    graphdef, state = nnx.split(model)
    state = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype) if hasattr(s, "shape") else s, state
    )
    model = nnx.merge(graphdef, state)
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    return model, cfg


def compile_decode(model, batch=8, max_len=1024):
    kv = MXConfig("float8_e4m3")
    caches = model.init_cache(batch, max_len, kv)
    graphdef, state = nnx.split(model)

    def step(state, tokens, pos, caches):
        m = nnx.merge(graphdef, state)
        logits, new_caches = m(
            tokens[:, None],
            attention_mask=None,
            position_ids=pos[:, None],
            caches=caches,
            cache_position=pos,
        )
        return jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32), new_caches

    tokens = jnp.zeros((batch,), jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, tokens, pos, caches)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1, compiled


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hidden = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    print(f"model: {layers} layers, hidden {hidden}, MXFP4w/FP8a, fp8 KV cache")
    model, _ = build(layers, hidden)

    tr_u, co_u, _ = compile_decode(model)
    print(f"unrolled : trace {tr_u:6.1f}s  compile {co_u:6.1f}s  total {tr_u+co_u:6.1f}s")

    scan_model = ScanLlamaForCausalLM.from_model(model)
    tr_s, co_s, _ = compile_decode(scan_model)
    print(f"scan     : trace {tr_s:6.1f}s  compile {co_s:6.1f}s  total {tr_s+co_s:6.1f}s")
    print(f"speedup  : {(tr_u+co_u)/(tr_s+co_s):.1f}x")


if __name__ == "__main__":
    main()
