"""Quantize a Llama model, verify the zero-recompile guarantee across decode
steps, and dump the decode-step HLO (analog of reference
``examples/llama_example_atenir_graph.py``, which counts torch.compile graph
breaks and dumps AtenIR).

Run: ``python examples/llama_hlo_graph.py [outdir]``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax.numpy as jnp
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM, make_decode_mask
from torchmx_tpu.quant_api import quantize_llm_
from torchmx_tpu.utils import introspect

if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/torchmx_tpu_graphs"
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    qattn = QAttentionConfig(
        projection_config=qlin,
        query_config=MXConfig("float6_e3m2"),
        key_config=MXConfig("float6_e3m2"),
        value_config=MXConfig("float6_e3m2"),
        attention_weights_config=MXConfig("float6_e3m2"),
    )
    quantize_llm_(model, qattn, qlin)

    graphdef, state = nnx.split(model)
    max_len = 64

    def decode_step(state, token, pos, caches):
        m = nnx.merge(graphdef, state)
        mask = make_decode_mask(max_len, pos + 1)[None, None, None, :]
        logits, caches = m(
            token,
            attention_mask=mask,
            position_ids=jnp.full((1, 1), pos, jnp.int32),
            caches=caches,
            cache_position=pos,
        )
        return logits, caches

    caches = model.init_cache(1, max_len)
    counter = introspect.RecompileCounter(decode_step)
    token = jnp.zeros((1, 1), jnp.int32)
    for pos in range(8):
        logits, caches = counter.fn(state, token, jnp.asarray(pos, jnp.int32), caches)
        token = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    assert counter.count == 1, f"decode recompiled: {counter.count} compiles"
    print(f"8 decode steps, {counter.count} compile "
          "(zero recompiles — the torch.compile zero-graph-breaks analog)")

    hlo = introspect.dump_lowered(
        decode_step,
        state,
        token,
        jnp.asarray(8, jnp.int32),
        caches,
        path=f"{outdir}/llama_decode_step.stablehlo",
    )
    print(f"decode-step StableHLO: {len(hlo.splitlines())} lines -> {outdir}")
    print("OK")
