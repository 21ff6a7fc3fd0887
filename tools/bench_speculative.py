"""Speculative-decoding benchmark (dev tool, real TPU).

Two honest measurements, combined into a projected 8B speedup:

1. **Acceptance** on REAL text: the committed tiny (or retrained
   small/medium) checkpoint generates from held-out repo-text prompts with
   prompt-lookup speculation; reports mean accepted drafts/step and the
   measured wall-clock tok/s vs plain `generate` at the same shapes.  (The
   tiny model is fast enough that per-step host overhead dominates its
   wall clock — acceptance is the transferable number.)
2. **Verify-step cost** at the Llama-3-8B shape (zeros weights — kernel
   timing is data-independent): t(sq=K+1 step) vs t(sq=1 step) through the
   full cached model.  At batch 1 both are weight-read-bound, so the
   projected speculative throughput is

       speedup = (1 + mean_accepted) * t1 / tK

Run:  python tools/bench_speculative.py [preset] [draft_len] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig, checkpoint as ckpt
from torchmx_tpu.models.generate import generate
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.speculate import generate_speculative
from torchmx_tpu.quant_api import quantize_llm_


def acceptance_run(preset: str, draft_len: int, batch: int):
    from tools.train_tiny_lm import PRESETS, load_corpus, model_class, split_corpus

    dirname, cfg = PRESETS[preset]
    model = model_class(cfg)(cfg, rngs=nnx.Rngs(0))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = ckpt.load_model(os.path.join(root, "artifacts", dirname), model)
    qlin = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
    tokens = load_corpus(snapshot=dirname)
    _, val = split_corpus(tokens)

    new_tokens, plen = 128, 64
    prompt = jnp.asarray(
        np.stack([val[i * 997 : i * 997 + plen] for i in range(batch)]), jnp.int32
    )
    kv = MXConfig("int8")

    # Warm both paths (compiles), then time.
    generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
    generate_speculative(
        model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv,
        draft_len=draft_len,
    )
    t0 = time.perf_counter()
    plain = generate(model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv)
    int(jnp.sum(plain))
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    spec, stats = generate_speculative(
        model, prompt, max_new_tokens=new_tokens, kv_cache_config=kv,
        draft_len=draft_len, return_stats=True,
    )
    t_spec = time.perf_counter() - t0
    agree = float((np.asarray(spec) == np.asarray(plain)).mean())
    print(
        f"{preset} b={batch} K={draft_len}: mean_accepted={stats['mean_accepted']:.2f} "
        f"steps={stats['steps']} (vs {batch * new_tokens} plain) "
        f"wall {t_plain:.2f}s -> {t_spec:.2f}s, agreement {agree:.2%}"
    )
    return stats["mean_accepted"]


def verify_cost_8b(draft_len: int, batch: int):
    from tools.bench_8b_decode import LLAMA3_8B, build_zeros_quantized
    from bench import _timed_loop, _paired

    cfg = LlamaConfig(max_position_embeddings=1024, **LLAMA3_8B)
    t0 = time.perf_counter()
    model = build_zeros_quantized(cfg)
    from torchmx_tpu.models.scan import ScanLlamaForCausalLM

    model = ScanLlamaForCausalLM.from_model(model)
    print(f"built 8B in {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    graphdef, state = nnx.split(model)
    max_len = 1024
    caches = model.init_cache(batch, max_len, MXConfig("int8"))
    pos = jnp.full((batch,), 512, jnp.int32)

    def step(xf, state, caches, pos):
        # _timed_loop carries a float array; derive data-dependent token ids
        # from it so the model forward cannot be elided or hoisted.
        m = nnx.merge(graphdef, state)
        b, s = xf.shape
        tokens = (jnp.abs(xf) * 100).astype(jnp.int32) % 1000
        logits, _ = m(
            tokens,
            attention_mask=None,
            position_ids=pos[:, None] + jnp.arange(s)[None, :],
            caches=caches,
            cache_position=pos,
        )
        # Max over the vocab consumes every logit non-linearly; carry shape
        # matches the input.
        return jnp.max(logits, axis=-1).astype(jnp.bfloat16)

    K = draft_len
    tok1 = jnp.ones((batch, 1), jnp.bfloat16)
    tokK = jnp.ones((batch, K + 1), jnp.bfloat16)
    t1_trial = _timed_loop(step, tok1, state, caches, pos)
    tK_trial = _timed_loop(step, tokK, state, caches, pos)
    t1, tK = _paired(t1_trial, tK_trial, trials=5)
    print(
        f"8B b={batch}: t(sq=1)={t1 * 1e3:.2f} ms, t(sq={K + 1})={tK * 1e3:.2f} ms "
        f"(ratio {tK / t1:.2f})"
    )
    return t1, tK


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    draft_len = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    acc = acceptance_run(preset, draft_len, batch)
    t1, tK = verify_cost_8b(draft_len, batch)
    speedup = (1 + acc) * t1 / tK
    print(
        f"projected 8B b={batch} speculative speedup: (1+{acc:.2f}) * "
        f"{t1 * 1e3:.2f}/{tK * 1e3:.2f} = {speedup:.2f}x"
    )


if __name__ == "__main__":
    main()
