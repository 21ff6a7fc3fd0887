"""Speculative decoding demo: prompt-lookup drafts on the committed trained
checkpoint (TPU-build extension; the reference has no serving path at all).

Generates from repo text with `generate_speculative` and with plain greedy
`generate`, printing the acceptance stats — the weight-sweep ratio vs plain
decode is exactly ``1 / (1 + mean_accepted)``.

Run: ``python examples/speculative_generate.py``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig, checkpoint as ckpt
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaForCausalLM
from torchmx_tpu.models.speculate import generate_speculative
from torchmx_tpu.quant_api import quantize_llm_

if __name__ == "__main__":
    from tools.train_tiny_lm import CONFIG, load_corpus

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    model = LlamaForCausalLM(CONFIG, rngs=nnx.Rngs(0))
    model = ckpt.load_model(_os.path.join(root, "artifacts", "tiny_lm"), model)
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)

    corpus = load_corpus()
    prompt = jnp.asarray(np.asarray(corpus[4985:5049])[None], jnp.int32)
    kv = MXConfig("int8")

    plain = generate(model, prompt, max_new_tokens=96, kv_cache_config=kv)
    spec, stats = generate_speculative(
        model, prompt, max_new_tokens=96, kv_cache_config=kv,
        draft_len=7, return_stats=True,
    )
    agree = float((np.asarray(spec) == np.asarray(plain)).mean())
    print("plain :", bytes(np.asarray(plain)[0][:48].astype(np.uint8)).decode("latin1"))
    print("spec  :", bytes(np.asarray(spec)[0][:48].astype(np.uint8)).decode("latin1"))
    print(
        f"verify steps: {stats['steps']} for {stats['tokens']} tokens "
        f"(mean accepted drafts/step {stats['mean_accepted']:.2f} -> "
        f"{1 + stats['mean_accepted']:.2f} tokens per weight sweep); "
        f"agreement with plain greedy {agree:.0%}"
    )
    assert stats["steps"] < stats["tokens"], "speculation accepted nothing"
