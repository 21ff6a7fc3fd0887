"""Distill a real language model for quantization-quality evaluation.

This environment has no model checkpoints and no network egress, so the
accuracy study (the reference's raison d'etre — its Llama-3.1 tables,
``docs/sources/results/llama31.md``) needs a locally-trained subject: a
byte-level Llama trained on this repository's own source text (a
deterministic, committed corpus) to non-trivial loss, then frozen.
``tools/eval_quality.py`` runs the bf16-vs-MX quality sweep on it.

    python tools/train_tiny_lm.py [steps=3000]   # ~2 min on one v5e chip

Writes the checkpoint to ``artifacts/tiny_lm/``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from torchmx_tpu import checkpoint as ckpt
from torchmx_tpu.models.deepseek import DeepseekV3Config, DeepseekV3ForCausalLM
from torchmx_tpu.models.gemma import Gemma2Config, Gemma2ForCausalLM
from torchmx_tpu.models.mistral import MistralConfig, MistralForCausalLM
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from torchmx_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM

ROOT = Path(__file__).resolve().parent.parent
SEQ_LEN = 256
BATCH = 32

# Byte-level models sized so every quantization seam is exercised: head_dim
# 128 (fused MX-KV-cache attention eligible), hidden/intermediate multiples
# of 128 (fused matmul kernels eligible).  Two scales let the quality sweep
# show quantization sensitivity FALLING with model size, the structure of
# the reference's 8B-vs-70B study (``llama31.md:24-41``).
CONFIG = LlamaConfig(
    vocab_size=256,
    hidden_size=256,
    intermediate_size=768,
    num_hidden_layers=4,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=128,
    max_position_embeddings=512,
    rope_theta=10000.0,
)

PRESETS = {
    # ~6M params; committed to artifacts/tiny_lm for reproducible evals.
    "tiny": ("tiny_lm", CONFIG),
    # ~18M params; too large to commit — retrain deterministically from the
    # committed command (seeds fixed, corpus snapshotted beside it).
    "small": (
        "lm_small",
        LlamaConfig(
            vocab_size=256,
            hidden_size=384,
            intermediate_size=1152,
            num_hidden_layers=6,
            num_attention_heads=3,
            num_key_value_heads=3,
            head_dim=128,
            max_position_embeddings=512,
            rope_theta=10000.0,
        ),
    ),
    # ~62M params (round-3 third scale): extends the sensitivity-vs-scale
    # study to a 10x span (6M -> 18M -> 62M).  Retrain deterministically:
    # ``python tools/train_tiny_lm.py 1200 medium`` (~10-15 min on one v5e).
    "medium": (
        "lm_medium",
        LlamaConfig(
            vocab_size=256,
            hidden_size=768,
            intermediate_size=2304,
            num_hidden_layers=8,
            num_attention_heads=6,
            num_key_value_heads=6,
            head_dim=128,
            max_position_embeddings=512,
            rope_theta=10000.0,
        ),
    ),
    # ~8M params, 4 experts top-2 (round-3 MoE family): the quality sweep's
    # MoE subject — expert GEMMs quantize per expert, the router stays hp.
    # Train: ``python tools/train_tiny_lm.py 1200 moe``.
    "moe": (
        "lm_moe",
        MixtralConfig(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=4,
            num_attention_heads=2,
            num_key_value_heads=2,
            head_dim=128,
            max_position_embeddings=512,
            rope_theta=10000.0,
            num_local_experts=4,
            num_experts_per_tok=2,
        ),
    ),
    # ~6M params, Gemma2 conventions (round-4 quality subject): sandwich
    # norms, query_pre_attn_scalar, attention + final logit soft caps, and
    # ALTERNATING sliding/full layers — the distinctive numerics the Llama
    # presets never exercise.  Train: ``python tools/train_tiny_lm.py 1200
    # gemma2``.
    "gemma2": (
        "lm_gemma2",
        Gemma2Config(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=768,
            num_hidden_layers=4,
            num_attention_heads=2,
            num_key_value_heads=2,
            head_dim=128,
            max_position_embeddings=512,
            rope_theta=10000.0,
            sliding_window=64,
            query_pre_attn_scalar=128.0,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            layer_types=[
                "sliding_attention", "full_attention",
                "sliding_attention", "full_attention",
            ],
        ),
    ),
    # ~6M params, Mistral-shaped sliding-window model (round-4 quality
    # subject): every layer windowed — the MX KV rows read a WINDOWED
    # quantized cache.  Train: ``python tools/train_tiny_lm.py 1200
    # mistral``.
    "mistral": (
        "lm_mistral",
        MistralConfig(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=768,
            num_hidden_layers=4,
            num_attention_heads=2,
            num_key_value_heads=2,
            head_dim=128,
            max_position_embeddings=512,
            rope_theta=10000.0,
            sliding_window=64,
        ),
    ),
    # ~7M params, MLA + 4-expert noaux-tc MoE (round-4 DeepSeek family): the
    # quality sweep's MLA subject — projections quantize through the MLA
    # seams and the MX LATENT cache rows measure the compressed-cache ΔPPL.
    # kv_lora_rank 128 / rope dim 64 keep the fused absorbed-MLA kernel
    # (ops/pallas_mla.py) eligible on real lane widths.
    # Train: ``python tools/train_tiny_lm.py 1200 mla``.
    "mla": (
        "lm_mla",
        DeepseekV3Config(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=768,
            num_hidden_layers=4,
            num_attention_heads=2,
            num_key_value_heads=2,
            max_position_embeddings=512,
            rope_theta=10000.0,
            q_lora_rank=None,
            kv_lora_rank=128,
            qk_rope_head_dim=64,
            qk_nope_head_dim=64,
            v_head_dim=64,
            n_routed_experts=4,
            n_shared_experts=1,
            num_experts_per_tok=2,
            moe_intermediate_size=256,
            n_group=1,
            topk_group=1,
            routed_scaling_factor=1.0,
            first_k_dense_replace=1,
        ),
    ),
}


def model_class(config):
    """The model family a preset config builds (quality tooling uses this)."""
    if isinstance(config, DeepseekV3Config):
        return DeepseekV3ForCausalLM
    if isinstance(config, Gemma2Config):
        return Gemma2ForCausalLM
    # Mixtral subclasses Mistral's config: check the subclass FIRST.
    if isinstance(config, MixtralConfig):
        return MixtralForCausalLM
    if isinstance(config, MistralConfig):
        return MistralForCausalLM
    return LlamaForCausalLM


def load_corpus(snapshot: bool = True) -> np.ndarray:
    """Repo source + docs as a byte stream (deterministic file order).

    The repo text drifts with every commit, so the byte stream the model was
    *trained* on is snapshotted next to the checkpoint
    (``artifacts/tiny_lm/corpus.bin``); evaluation reads the snapshot so the
    published quality table stays reproducible.  ``snapshot=False`` forces a
    fresh scan (used by training itself).
    """
    dirname = snapshot if isinstance(snapshot, str) else "tiny_lm"
    snap = ROOT / "artifacts" / dirname / "corpus.bin"
    if snapshot and snap.exists():
        return np.frombuffer(snap.read_bytes(), dtype=np.uint8).astype(np.int32)
    files = sorted(
        list((ROOT / "torchmx_tpu").rglob("*.py"))
        + list((ROOT / "tests").rglob("*.py"))
        + list((ROOT / "docs").glob("*.md"))
        + list((ROOT / "tools").glob("*.py"))
    )
    blob = b"\n\n".join(f.read_bytes() for f in files)
    return np.frombuffer(blob, dtype=np.uint8).astype(np.int32)


def split_corpus(tokens: np.ndarray):
    n_val = len(tokens) // 10
    return tokens[:-n_val], tokens[-n_val:]


def batches(tokens: np.ndarray, rng: np.random.Generator):
    starts = rng.integers(0, len(tokens) - SEQ_LEN - 1, size=BATCH)
    x = np.stack([tokens[s : s + SEQ_LEN] for s in starts])
    y = np.stack([tokens[s + 1 : s + SEQ_LEN + 1] for s in starts])
    return jnp.asarray(x), jnp.asarray(y)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    preset = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    dirname, config = PRESETS[preset]
    tokens = load_corpus(snapshot=False)
    train, val = split_corpus(tokens)
    print(f"corpus: {len(tokens)} bytes ({len(train)} train / {len(val)} val)")

    model = model_class(config)(config, rngs=nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adamw(
        optax.cosine_decay_schedule(3e-4, steps, alpha=0.1), weight_decay=0.01
    )
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        m = nnx.merge(graphdef, params, rest)
        logits, _ = m(x)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(lp, y[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for i in range(steps):
        x, y = batches(train, rng)
        params, opt_state, loss = step_fn(params, opt_state, x, y)
        if i % 200 == 0 or i == steps - 1:
            print(f"step {i:5d}  train loss {float(loss):.4f}")

    # Validation loss of the frozen model.
    vx, vy = batches(val, np.random.default_rng(1))
    vloss = float(loss_fn(params, vx, vy))
    print(f"val loss {vloss:.4f}  (ppl {np.exp(vloss):.2f})")

    model = nnx.merge(graphdef, params, rest)
    out = ROOT / "artifacts" / dirname
    if out.exists():
        import shutil

        shutil.rmtree(out)
    ckpt.save_model(str(out), model)
    (out / "corpus.bin").write_bytes(tokens.astype(np.uint8).tobytes())
    print(f"saved {out}")


if __name__ == "__main__":
    main()
