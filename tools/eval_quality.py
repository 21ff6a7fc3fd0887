"""bf16-vs-MX quality sweep on the distilled model.

The TPU-native analog of the reference's Llama-3.1 accuracy study
(``docs/sources/results/llama31.md:24-41``): for each MX configuration,
quantize the frozen ``artifacts/tiny_lm`` model and measure

* **val PPL** — non-overlapping chunked perplexity on the held-out split of
  the training corpus (``models/evaluate.perplexity``), and
* **choice acc** — 4-way continuation scoring (true 16-byte continuation vs
  3 distractors sampled elsewhere in the validation stream; the local
  stand-in for HellaSwag-style choice tasks), via
  ``models/evaluate.score_choices``.

MX-KV-cache rows score the same PPL through a cache-writing forward, so the
attention actually reads the quantized cache (fused kernel path on TPU).

    python tools/train_tiny_lm.py          # once
    python tools/eval_quality.py           # prints the markdown table
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from flax import nnx

from torchmx_tpu import checkpoint as ckpt
from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models import evaluate
from torchmx_tpu.models.llama import LlamaForCausalLM
from torchmx_tpu.quant_api import quantize_llm_
from tools.train_tiny_lm import PRESETS, load_corpus, model_class, split_corpus

ROOT = Path(__file__).resolve().parent.parent
SEQ = 256
N_CHOICE = 200
CTX, CONT = 64, 16
#: selected by argv[1]; "small" shows sensitivity falling with model size
#: (train it first: ``python tools/train_tiny_lm.py 3000 small``).
PRESET = sys.argv[1] if len(sys.argv) > 1 else "tiny"
DIRNAME, CONFIG = PRESETS[PRESET]


def fresh_model():
    model = model_class(CONFIG)(CONFIG, rngs=nnx.Rngs(0))
    return ckpt.load_model(str(ROOT / "artifacts" / DIRNAME), model)


def qlin(w, a, rotate=False):
    return QLinearConfig(
        weights_config=MXConfig(w),
        activations_config=MXConfig(a),
        rotate_blocks=rotate,
    )


def build_choice_task(val: np.ndarray, rng: np.random.Generator):
    ctxs, choices = [], []
    for _ in range(N_CHOICE):
        s = int(rng.integers(0, len(val) - CTX - CONT - 1))
        ctx = val[s : s + CTX].tolist()
        true = val[s + CTX : s + CTX + CONT].tolist()
        alts = [true]
        for _ in range(3):
            d = int(rng.integers(0, len(val) - CONT - 1))
            alts.append(val[d : d + CONT].tolist())
        ctxs.append(ctx)
        choices.append(alts)
    return ctxs, choices


def main():
    tokens = load_corpus(snapshot=DIRNAME)
    _, val = split_corpus(tokens)
    rng = np.random.default_rng(42)
    ctxs, choices = build_choice_task(val, rng)

    def evaluate_model(model, kv_cfg=None):
        # kv_cfg routes the SAME chunk set through an MX-quantized cache
        # (fused kernel path), keeping the rows apples-to-apples.
        ppl = evaluate.perplexity(
            model, val, seq_len=SEQ, batch_size=8, kv_cache_config=kv_cfg
        )
        picks = evaluate.score_choices(model, ctxs, choices)
        correct = np.asarray(picks) == 0
        acc = float(np.mean(correct))
        # Bootstrap 95% CI over the N_CHOICE items: quantifies how much of a
        # config-to-config accuracy delta is item-sampling noise (~+-3.5pp
        # half-width at 200 items and acc ~0.5) — the resolution limit of
        # this column.
        bs = np.random.default_rng(7).choice(
            correct, size=(2000, correct.size), replace=True
        ).mean(axis=1)
        ci = float((np.percentile(bs, 97.5) - np.percentile(bs, 2.5)) / 2)
        return ppl, acc, ci

    fp8 = qlin("float8_e4m3", "float8_e4m3")
    fp6w_fp8a = qlin("float6_e3m2", "float8_e4m3")
    fp6 = qlin("float6_e3m2", "float6_e3m2")
    fp4w_fp8a = qlin("float4_e2m1", "float8_e4m3")
    fp4w_fp8a_rot = qlin("float4_e2m1", "float8_e4m3", rotate=True)
    fp6_rot = qlin("float6_e3m2", "float6_e3m2", rotate=True)
    attn_fp6_full = QAttentionConfig(
        projection_config=fp6w_fp8a,
        query_config=MXConfig("float6_e3m2"),
        key_config=MXConfig("float6_e3m2"),
        value_config=MXConfig("float6_e3m2"),
        attention_weights_config=MXConfig("float6_e3m2"),
    )

    int8wa = qlin("int8", "int8")
    int8w_fp8a = qlin("int8", "float8_e4m3")

    # (name, qattention, qmlp, kv_cache_config)
    CONFIGS = [
        ("bf16 baseline", None, None, None),
        ("MXFP8 W+A (proj+MLP)", QAttentionConfig(projection_config=fp8), fp8, None),
        # MXINT8: same bytes as fp8, ~2x better roundtrip SQNR (38 vs 19 dB)
        # AND the fastest decode kernels (hw int->bf16 convert / native int8
        # MXU dot) — if quality matches fp8 here, int8 dominates it for
        # serving on every axis.
        ("MXINT8 W+A (proj+MLP)", QAttentionConfig(projection_config=int8wa), int8wa, None),
        ("MXINT8 W / FP8 A (proj+MLP)", QAttentionConfig(projection_config=int8w_fp8a), int8w_fp8a, None),
        ("MXFP6 W / FP8 A (proj+MLP)", QAttentionConfig(projection_config=fp6w_fp8a), fp6w_fp8a, None),
        ("MXFP6 W+A (proj+MLP)", QAttentionConfig(projection_config=fp6), fp6, None),
        ("MXFP4 W / FP8 A (proj+MLP)", QAttentionConfig(projection_config=fp4w_fp8a), fp4w_fp8a, None),
        ("MXFP4 W / FP8 A + block rotation", QAttentionConfig(projection_config=fp4w_fp8a_rot), fp4w_fp8a_rot, None),
        ("MXFP6 W+A + block rotation", QAttentionConfig(projection_config=fp6_rot), fp6_rot, None),
        ("MXFP6/FP8 + Q/K/V/attn-W FP6", attn_fp6_full, fp6w_fp8a, None),
        ("MXFP6 full stack", QAttentionConfig(
            projection_config=fp6,
            query_config=MXConfig("float6_e3m2"),
            key_config=MXConfig("float6_e3m2"),
            value_config=MXConfig("float6_e3m2"),
            attention_weights_config=MXConfig("float6_e3m2"),
        ), fp6, None),
        ("MXFP6/FP8 + fp8 MX KV cache", QAttentionConfig(projection_config=fp6w_fp8a), fp6w_fp8a, MXConfig("float8_e4m3")),
        ("MXFP6/FP8 + int8 MX KV cache", QAttentionConfig(projection_config=fp6w_fp8a), fp6w_fp8a, MXConfig("int8")),
        ("MXFP6/FP8 + fp4 MX KV cache", QAttentionConfig(projection_config=fp6w_fp8a), fp6w_fp8a, MXConfig("float4_e2m1")),
    ]

    # Optional substring filter (argv[2]): run the baseline plus matching
    # rows only — new rows can be measured without re-running the full sweep.
    filt = sys.argv[2] if len(sys.argv) > 2 else None

    # MLA contracts attention in latent space: Q/K/V/attn-W quantization
    # configs don't map onto it (quantize_llm_ rejects them with guidance),
    # so the QKV rows drop from the DeepSeek preset's sweep.  The MX
    # KV-cache rows quantize the compressed LATENT stream there — the
    # framework's headline cache-bandwidth claim for this family.
    from torchmx_tpu.models.deepseek import DeepseekV3Config

    if isinstance(CONFIG, DeepseekV3Config):
        CONFIGS[:] = [
            row for row in CONFIGS
            if row[1] is None or row[1].query_config is None
        ]

    base_ppl = base_acc = None
    print(f"| config | val PPL | Δ PPL | choice acc | Δ acc |")
    print(f"|---|---|---|---|---|")
    for name, qattn, qmlp, kv in CONFIGS:
        if filt and name != "bf16 baseline" and filt.lower() not in name.lower():
            continue
        model = fresh_model()
        if qattn is not None:
            quantize_llm_(model, qattn, qmlp)
        if kv is not None and name == "bf16 baseline":
            raise AssertionError
        ppl, acc, ci = evaluate_model(model, kv_cfg=kv)
        if base_ppl is None:
            base_ppl, base_acc = ppl, acc
            print(f"| {name} | {ppl:.3f} | — | {acc*100:.1f} ± {ci*100:.1f} % | — |")
        else:
            print(
                f"| {name} | {ppl:.3f} | {ppl-base_ppl:+.3f} | "
                f"{acc*100:.1f} ± {ci*100:.1f} % | {(acc-base_acc)*100:+.1f} |"
            )

    # Decode-path rows: the SAME chunk set scored teacher-forced one token at
    # a time (sq=1 scan), so the decode-specialized kernels (chunk-dot /
    # int8-dot) actually run.  Isolates decode-kernel numerics at a fixed
    # quantization config (MXFP6/FP8 + int8 KV).
    if filt and "decode" not in filt.lower():
        return
    from torchmx_tpu import env_variables as envmod
    from torchmx_tpu.models import evaluate as ev

    print()
    print("| decode-path config (MXFP6/FP8 + int8 KV) | val PPL | Δ vs exact decode |")
    print("|---|---|---|")
    if isinstance(CONFIG, DeepseekV3Config):
        # MLA latent-cache decode tiers (round 5): the seq layout is the
        # per-32-block exact-decode baseline; dmajor quantizes the latent
        # PER POSITION (block = kv_lora_rank) and, with the flag, serves
        # the all-int8 MXU-dot kernel — this row gates the per-position +
        # q-per-row + fixed-point-P numerics of the latency-first tier.
        rows = [
            ("seq latent layout (exact decode)", "seq", "0"),
            ("dmajor latent (per-position scales)", "dmajor", "0"),
            ("dmajor latent + all-int8 MXU dot", "dmajor", "1"),
        ]
    else:
        rows = [
            ("seq layout (exact decode)", "seq", "0"),
            ("dmajor layout (exact decode)", "dmajor", "0"),
            ("dmajor + all-int8 MXU dot", "dmajor", "1"),
        ]
    base_dec = None
    for name, layout, int8dot in rows:
        envmod.TORCHMX_KV_LAYOUT = layout
        envmod.TORCHMX_ATTN_INT8_DOT = int8dot
        try:
            model = fresh_model()
            quantize_llm_(model, QAttentionConfig(projection_config=fp6w_fp8a), fp6w_fp8a)
            ppl = ev.perplexity(
                model, val, seq_len=SEQ, batch_size=8,
                kv_cache_config=MXConfig("int8"), decode=True,
            )
        finally:
            envmod.TORCHMX_KV_LAYOUT = "seq"
            envmod.TORCHMX_ATTN_INT8_DOT = "0"
        if base_dec is None:
            base_dec = ppl
            print(f"| {name} | {ppl:.3f} | — |")
        else:
            print(f"| {name} | {ppl:.3f} | {ppl-base_dec:+.3f} |")


if __name__ == "__main__":
    main()
