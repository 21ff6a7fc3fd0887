"""HF checkpoint import: load Llama/Qwen2/Mistral/Mixtral/Gemma weights into the NNX models.

Two entry points:

* :func:`load_hf_model` — from a local HF checkpoint directory
  (``config.json`` + ``*.safetensors``), no torch involved.
* :func:`from_hf_torch` — from an in-memory HF transformers torch model
  (used by parity tests against the HF reference implementation).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..utils import get_logger
from .gemma import Gemma2Config, Gemma2ForCausalLM, GemmaConfig, GemmaForCausalLM
from .llama import LlamaConfig, LlamaForCausalLM
from .mistral import MistralConfig, MistralForCausalLM
from .mixtral import MixtralConfig, MixtralForCausalLM
from .qwen2 import Qwen2Config, Qwen2ForCausalLM
from .phi3 import Phi3Config, Phi3ForCausalLM
from .qwen3 import Qwen3Config, Qwen3ForCausalLM
from .deepseek import DeepseekV3Config, DeepseekV3ForCausalLM

logger = get_logger(__name__)

_ARCH_MAP = {
    "LlamaForCausalLM": (LlamaConfig, LlamaForCausalLM),
    "DeepseekV3ForCausalLM": (DeepseekV3Config, DeepseekV3ForCausalLM),
    "Qwen2ForCausalLM": (Qwen2Config, Qwen2ForCausalLM),
    "Qwen3ForCausalLM": (Qwen3Config, Qwen3ForCausalLM),
    "MistralForCausalLM": (MistralConfig, MistralForCausalLM),
    "MixtralForCausalLM": (MixtralConfig, MixtralForCausalLM),
    "GemmaForCausalLM": (GemmaConfig, GemmaForCausalLM),
    "Gemma2ForCausalLM": (Gemma2Config, Gemma2ForCausalLM),
    "Phi3ForCausalLM": (Phi3Config, Phi3ForCausalLM),
}


def _to_bf16_jnp(arr: np.ndarray) -> jnp.ndarray:
    # ml_dtypes bfloat16 numpy arrays convert directly.
    return jnp.asarray(arr).astype(jnp.bfloat16)


# Per-expert projection names -> the stacked attribute the MoE blocks store.
# Mixtral checkpoints use w1 (gate) / w3 (up) / w2 (down); DeepSeek-V3 (and
# Qwen3-MoE) name them like dense MLPs.
_EXPERT_PROJ_MAP = {
    "w1": "w1",
    "w2": "w2",
    "w3": "w3",
    "gate_proj": "w1",
    "up_proj": "w3",
    "down_proj": "w2",
}


def _stack_expert_weights(named_arrays, num_experts: int):
    """Rewrite per-expert MoE weights (``...block_sparse_moe.experts.N.w1.
    weight`` / ``...mlp.experts.N.gate_proj.weight``) into stacked (E, ...)
    tensors at ``...<moe>.w1`` — the layout ``MixtralSparseMoeBlock`` stores
    (one array per projection, expert-parallel-shardable on the leading
    axis).  Streams: buffers at most one layer's expert set at a time; all
    other names pass through."""
    pending: dict = {}
    for name, arr in named_arrays:
        parts = name.split(".")
        if (
            len(parts) >= 5
            and parts[-1] == "weight"
            and parts[-4] == "experts"
            and parts[-2] in _EXPERT_PROJ_MAP
        ):
            prefix = ".".join(parts[:-4])  # ...block_sparse_moe / ...mlp
            proj = _EXPERT_PROJ_MAP[parts[-2]]
            eid = int(parts[-3])
            bucket = pending.setdefault((prefix, proj), {})
            bucket[eid] = np.asarray(arr)
            if len(bucket) == num_experts:
                stacked = np.stack([bucket[i] for i in range(num_experts)])
                del pending[(prefix, proj)]
                yield f"{prefix}.{proj}", stacked
            continue
        yield name, arr
    if pending:
        raise ValueError(
            f"incomplete expert weight sets for {sorted(pending)[:4]}..."
        )


def _split_fused_projections(named_arrays, config):
    """Split Phi-3-style fused checkpoint projections into the per-projection
    weights the shared Llama modules hold: ``self_attn.qkv_proj`` rows are
    ``[q | k | v]`` (``num_heads*head_dim`` then 2x ``num_kv_heads*head_dim``),
    ``mlp.gate_up_proj`` rows are ``[gate | up]`` (``intermediate_size``
    each).  Biases (absent in shipped Phi-3 checkpoints) split identically
    on their leading axis; all other names pass through."""
    q_rows = config.num_attention_heads * config.head_dim
    kv_rows = config.num_key_value_heads * config.head_dim
    inter = config.intermediate_size
    for name, arr in named_arrays:
        parts = name.rsplit(".", 2)
        if len(parts) == 3 and parts[1] == "qkv_proj":
            base, _, leaf = parts
            yield f"{base}.q_proj.{leaf}", arr[:q_rows]
            yield f"{base}.k_proj.{leaf}", arr[q_rows : q_rows + kv_rows]
            yield f"{base}.v_proj.{leaf}", arr[q_rows + kv_rows :]
        elif len(parts) == 3 and parts[1] == "gate_up_proj":
            base, _, leaf = parts
            yield f"{base}.gate_proj.{leaf}", arr[:inter]
            yield f"{base}.up_proj.{leaf}", arr[inter:]
        else:
            yield name, arr


def _assign_params(model, named_arrays, strict: bool = True):
    """Assign HF-named weights (model.layers.N.self_attn.q_proj.weight, ...)
    onto the NNX module tree.

    If the resolved parent module is an ``MXInferenceLinear`` (i.e. the model
    was surgically quantized *before* loading), the incoming high-precision
    weight is quantized on the fly and only the packed MXArray is kept —
    the streaming analog of the reference's accelerate/meta-device flow
    (``mx_linear.py:45-57,68-92``), bounding peak memory at (quantized model
    + one hp tensor) instead of the full bf16 model.
    """
    from ..layers.linear import MXInferenceLinear

    num_experts = getattr(getattr(model, "config", None), "num_local_experts", None)
    if num_experts:
        named_arrays = _stack_expert_weights(named_arrays, num_experts)
    if getattr(model, "fused_hf_projections", False):
        named_arrays = _split_fused_projections(named_arrays, model.config)

    assigned, skipped = 0, []
    for name, arr in named_arrays:
        obj = model
        parts = name.split(".")
        ok = True
        for p in parts[:-1]:
            if p.isdigit():
                obj = obj[int(p)]
            elif hasattr(obj, p):
                obj = getattr(obj, p)
            else:
                ok = False
                break
        leaf = parts[-1]
        # Module-level hook: the module owns the layout transform (MoE
        # blocks transpose stacked expert weights to K-major; quantized MoE
        # blocks quantize them per expert on the fly).  A False return
        # falls through to the generic assignment.
        if ok and hasattr(obj, "import_weight"):
            if obj.import_weight(leaf, _to_bf16_jnp(arr)):
                assigned += 1
                continue
        if not ok or not hasattr(obj, leaf):
            skipped.append(name)
            continue
        param = getattr(obj, leaf)
        value = _to_bf16_jnp(arr)
        if isinstance(obj, MXInferenceLinear) and leaf == "weight":
            expected = (obj.out_features, obj.in_features)
            if tuple(value.shape) != expected:
                raise ValueError(
                    f"shape mismatch for {name}: expected {expected}, got "
                    f"{tuple(value.shape)}"
                )
            quantized = MXInferenceLinear.from_weights(value, None, obj.qconfig)
            param.set_value(quantized.weight.get_value())
            assigned += 1
        elif isinstance(param, nnx.Variable):
            if param.get_value().shape != value.shape:
                raise ValueError(
                    f"shape mismatch for {name}: {param.get_value().shape} vs {value.shape}"
                )
            param.set_value(value)
            assigned += 1
        else:
            skipped.append(name)
    if skipped:
        msg = f"skipped {len(skipped)} weights: {skipped[:8]}..."
        if strict:
            # rotary inv_freq buffers are fine to skip, as is the (tied)
            # lm_head copy some checkpoints carry (Gemma).
            tied = getattr(model, "lm_head", object()) is None
            real = [
                s
                for s in skipped
                if "inv_freq" not in s
                and not (tied and s == "lm_head.weight")
            ]
            if real:
                raise ValueError(msg)
        logger.info(msg)
    logger.info("assigned %d weight tensors", assigned)
    return model


def load_hf_model(checkpoint_dir: str, max_position_embeddings: Optional[int] = None):
    """Load a local HF checkpoint directory into the matching NNX model.

    Reads ``config.json`` for the architecture and ``*.safetensors`` shards
    for the weights (pure numpy; no torch).
    """
    from safetensors import safe_open

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    arch = hf_cfg.get("architectures", ["LlamaForCausalLM"])[0]
    if arch not in _ARCH_MAP:
        raise ValueError(f"Unsupported architecture {arch}; supported: {list(_ARCH_MAP)}")
    cfg_cls, model_cls = _ARCH_MAP[arch]
    config = cfg_cls.from_hf(hf_cfg)
    if max_position_embeddings is not None:
        config.max_position_embeddings = max_position_embeddings
    model = model_cls(config)  # zero-init params, then overwritten

    def arrays():
        files = sorted(
            f for f in os.listdir(checkpoint_dir) if f.endswith(".safetensors")
        )
        for fname in files:
            with safe_open(os.path.join(checkpoint_dir, fname), framework="np") as st:
                for key in st.keys():
                    yield key, st.get_tensor(key)

    _assign_params(model, arrays())
    return model, config


def load_hf_model_quantized(
    checkpoint_dir: str,
    qattention_config,
    qmlp_config,
    max_position_embeddings: Optional[int] = None,
):
    """Load + MX-quantize a local HF checkpoint with streaming quantization.

    Surgery runs first (on the zero-initialized model), then each weight
    tensor is quantized as it streams off disk — the full high-precision
    model is never materialized (peak memory: packed model + one hp tensor).
    An MXFP4-weight Llama-3-8B fits a single 16GB chip this way.

    Returns ``(model, config)`` with MX-quantized projections/MLPs.
    """
    from safetensors import safe_open

    from ..quant_api import quantize_llm_

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    arch = hf_cfg.get("architectures", ["LlamaForCausalLM"])[0]
    if arch not in _ARCH_MAP:
        raise ValueError(f"Unsupported architecture {arch}; supported: {list(_ARCH_MAP)}")
    cfg_cls, model_cls = _ARCH_MAP[arch]
    config = cfg_cls.from_hf(hf_cfg)
    if max_position_embeddings is not None:
        config.max_position_embeddings = max_position_embeddings
    model = model_cls(config)  # zero-init
    quantize_llm_(model, qattention_config, qmlp_config)

    def arrays():
        files = sorted(
            f for f in os.listdir(checkpoint_dir) if f.endswith(".safetensors")
        )
        for fname in files:
            with safe_open(os.path.join(checkpoint_dir, fname), framework="np") as st:
                for key in st.keys():
                    yield key, st.get_tensor(key)

    _assign_params(model, arrays())
    return model, config


def from_hf_torch(hf_model, config_cls=None):
    """Convert an in-memory HF transformers (torch) model to NNX.

    Used in tests to validate numerics against the HF reference forward.
    """
    hf_cfg = hf_model.config
    arch = (hf_cfg.architectures or [type(hf_model).__name__])[0]
    cfg_cls, model_cls = _ARCH_MAP.get(arch, (LlamaConfig, LlamaForCausalLM))
    if config_cls is not None:
        cfg_cls = config_cls
    config = cfg_cls.from_hf(hf_cfg)
    model = model_cls(config)

    def arrays():
        for name, tensor in hf_model.state_dict().items():
            yield name, tensor.detach().to("cpu").float().numpy()

    _assign_params(model, arrays())
    return model, config
