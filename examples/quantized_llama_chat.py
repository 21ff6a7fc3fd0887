"""End-to-end quantized-Llama chat (analog of reference
``examples/quantized_llama_chat.py``: streaming chat with an MX-quantized
Llama under torch.compile; here the decode loop is jitted once and every
step reuses the compiled executable).

With a local HF checkpoint directory (``config.json`` + ``*.safetensors`` +
``tokenizer.json``), runs a real chat::

    python examples/quantized_llama_chat.py /path/to/Llama-3-8B "prompt..."

Without one, falls back to a tiny randomly initialized model and a byte-level
"tokenizer" so the full pipeline (surgery -> prefill -> jitted decode with an
MX KV cache) is exercised offline.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

import jax.numpy as jnp
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_

QLIN = QLinearConfig(
    weights_config=MXConfig("int8"),
    activations_config=MXConfig("int8"),
)
QATTN = QAttentionConfig(projection_config=QLIN)


def load_model(ckpt_dir):
    from torchmx_tpu.models.hf_import import load_hf_model

    model, cfg = load_hf_model(ckpt_dir, max_position_embeddings=2048)
    return model


def tiny_model():
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


if __name__ == "__main__":
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else None
    prompt_text = sys.argv[2] if len(sys.argv) > 2 else "Hello, MX world!"

    if ckpt_dir and os.path.isdir(ckpt_dir):
        model = load_model(ckpt_dir)
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(ckpt_dir)
            ids = tok(prompt_text, return_tensors="np")["input_ids"].astype(np.int32)
            decode = lambda t: tok.decode(t)
        except Exception:
            ids = np.frombuffer(prompt_text.encode(), np.uint8)[None].astype(np.int32)
            decode = lambda t: repr(t)
    else:
        print("(no checkpoint dir given — running the tiny offline model)")
        model = tiny_model()
        ids = np.frombuffer(prompt_text.encode(), np.uint8)[None].astype(np.int32)
        decode = lambda t: bytes([c % 256 for c in t]).decode("latin1")

    quantize_llm_(model, QATTN, QLIN)

    t0 = time.perf_counter()
    out = generate(
        model,
        jnp.asarray(ids),
        max_new_tokens=32,
        kv_cache_config=MXConfig("float8_e4m3"),
    )
    toks = np.asarray(out)[0].tolist()
    dt = time.perf_counter() - t0
    print(f"prompt : {prompt_text}")
    print(f"reply  : {decode(toks)}")
    print(f"32 tokens in {dt:.2f}s ({32 / dt:.1f} tok/s, first-call compile included)")
