"""Model-surgery quantization API.

Recursive module-graph rewrites over NNX models, mirroring the reference's
module-swap API (rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-271``):

* :func:`quantize_linear_` — swap every ``Linear`` for ``MXInferenceLinear``;
* :func:`quantize_llm_` — swap Llama/Qwen2 attention + MLP modules for their
  MX inference versions, then sweep remaining linears.

Also provides the functional counterpart of the reference's torchao
tensor-subclass path (``quant_api.py:56-147``):
:func:`mx_dynamic_activation_mx_weights` returns a transform that wraps a
weight pytree's linear weights as MXArrays.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Type

from flax import nnx

from .config import QAttentionConfig, QLinearConfig
from .layers.linear import Linear, MXInferenceLinear
from .layers.mx_llama_attention import MXInferenceLlamaAttention, MXInferenceLlamaMLP
from .layers.mx_gemma_attention import (
    MXInferenceGemma2Attention,
    MXInferenceGemma2MLP,
    MXInferenceGemmaAttention,
    MXInferenceGemmaMLP,
)
from .layers.mx_deepseek_attention import (
    MXInferenceDeepseekV3MoE,
    MXInferenceMLAAttention,
)
from .layers.mx_mistral_attention import MXInferenceMistralAttention, MXInferenceMistralMLP
from .layers.mx_mixtral_moe import MXInferenceMixtralMoeBlock
from .layers.mx_qwen2_attention import MXInferenceQwen2Attention, MXInferenceQwen2MLP
from .layers.mx_phi3_attention import MXInferencePhi3Attention, MXInferencePhi3MLP
from .layers.mx_qwen3_attention import MXInferenceQwen3Attention, MXInferenceQwen3MLP
from .models.deepseek import DeepseekV3MoE, MLAAttention
from .models.gemma import Gemma2Attention, Gemma2MLP, GemmaAttention, GemmaMLP
from .models.llama import LlamaAttention, LlamaMLP
from .models.mistral import MistralAttention, MistralMLP
from .models.mixtral import MixtralSparseMoeBlock
from .models.qwen2 import Qwen2Attention, Qwen2MLP
from .models.phi3 import Phi3Attention, Phi3MLP
from .models.qwen3 import Qwen3Attention, Qwen3MLP
from .mx_array import MXArray
from .utils import get_logger

logger = get_logger(__name__)

# Registries (reference ``quant_api.py:150-158``).  Order matters: subclasses
# (Qwen2, Mistral) must match before their Llama bases.
ATTENTION_LAYERS: Dict[Type, Type] = {
    Qwen2Attention: MXInferenceQwen2Attention,
    Qwen3Attention: MXInferenceQwen3Attention,
    Phi3Attention: MXInferencePhi3Attention,
    MistralAttention: MXInferenceMistralAttention,
    Gemma2Attention: MXInferenceGemma2Attention,
    GemmaAttention: MXInferenceGemmaAttention,
    MLAAttention: MXInferenceMLAAttention,
    LlamaAttention: MXInferenceLlamaAttention,
}

MLP_LAYERS: Dict[Type, Type] = {
    Qwen2MLP: MXInferenceQwen2MLP,
    Qwen3MLP: MXInferenceQwen3MLP,
    Phi3MLP: MXInferencePhi3MLP,
    MistralMLP: MXInferenceMistralMLP,
    Gemma2MLP: MXInferenceGemma2MLP,
    GemmaMLP: MXInferenceGemmaMLP,
    MixtralSparseMoeBlock: MXInferenceMixtralMoeBlock,
    DeepseekV3MoE: MXInferenceDeepseekV3MoE,
    LlamaMLP: MXInferenceLlamaMLP,
}


def _iter_children(module):
    """Yield (key, parent_module, child_module); children inside list/tuple
    attributes use a composite ``(attr_name, index)`` key."""
    for name, value in vars(module).items():
        if isinstance(name, str) and name.startswith("_"):
            continue
        if isinstance(value, nnx.Module):
            yield name, module, value
        elif isinstance(value, (list, tuple)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield (name, i), module, item


def _set_child(parent, key, new_child):
    if isinstance(key, tuple):
        name, i = key
        container = getattr(parent, name)
        if isinstance(container, tuple):
            # Tuples are immutable: rebuild and rebind.  Write through
            # __dict__ — the attribute's nnx data status was established by
            # the original assignment and the structure is unchanged, while
            # plain setattr rejects module-bearing tuple rebinds.
            vars(parent)[name] = container[:i] + (new_child,) + container[i + 1 :]
        else:
            container[i] = new_child
    elif isinstance(key, int):
        parent[key] = new_child  # nnx.List stores children under int keys
    else:
        setattr(parent, key, new_child)


def replace_with_custom_fn_if_matches_filter(
    model: nnx.Module,
    replacement_fn: Callable[[nnx.Module], nnx.Module],
    filter_fn: Callable[[nnx.Module, str], bool],
    cur_fqn: str = "",
) -> nnx.Module:
    """DFS over the module graph; replace nodes matching ``filter_fn``.

    Matched subtrees are replaced wholesale and not recursed into (reference
    ``quant_api.py:160-185``).  Returns the (mutated) model.
    """
    if filter_fn(model, cur_fqn):
        return replacement_fn(model)
    for key, parent, child in _iter_children(model):
        name = f"{key[0]}.{key[1]}" if isinstance(key, tuple) else str(key)
        fqn = f"{cur_fqn}{name}."
        if filter_fn(child, fqn):
            _set_child(parent, key, replacement_fn(child))
        else:
            replace_with_custom_fn_if_matches_filter(
                child, replacement_fn, filter_fn, fqn
            )
    return model


def _with_progress(replacement_fn, label: str):
    """Wrap a replacement fn with progress reporting (the reference wraps its
    module sweep in tqdm, ``quant_api.py:212,264`` — surgery on a 32-layer
    streaming load takes long enough to need a signal)."""
    bar = None
    try:  # tqdm if available; plain periodic logs otherwise
        import sys

        from tqdm import tqdm

        if sys.stderr.isatty():
            bar = tqdm(desc=label, unit="module")
    except Exception:
        bar = None
    state = {"n": 0}

    def wrapped(mod):
        out = replacement_fn(mod)
        state["n"] += 1
        if bar is not None:
            bar.update(1)
        elif state["n"] % 8 == 0:
            logger.info("%s: %d modules quantized", label, state["n"])
        return out

    def finish():
        if bar is not None:
            bar.close()
        logger.info("%s: done, %d modules quantized", label, state["n"])

    return wrapped, finish


def quantize_linear_(
    model: nnx.Module,
    qconfig: QLinearConfig,
    filter_fn: Optional[Callable[[nnx.Module, str], bool]] = None,
) -> nnx.Module:
    """Swap every ``Linear`` for an ``MXInferenceLinear`` in place
    (reference ``quant_api.py:188-215``)."""
    logger.info("Quantizing linear layers with %s", qconfig)
    if filter_fn is None:
        filter_fn = lambda mod, fqn: isinstance(mod, Linear) and not isinstance(
            mod, MXInferenceLinear
        )
    replacement, finish = _with_progress(
        lambda mod: MXInferenceLinear.from_float(mod, qconfig), "quantize_linear_"
    )
    out = replace_with_custom_fn_if_matches_filter(model, replacement, filter_fn)
    finish()
    return out


def quantize_llm_(
    model: nnx.Module,
    qattention_config: QAttentionConfig,
    qmlp_config: QLinearConfig,
) -> nnx.Module:
    """Swap attention / MLP blocks for MX inference versions, then quantize
    any remaining plain linears with ``qmlp_config``
    (reference ``quant_api.py:218-271``)."""
    logger.info(
        "Quantizing LLM: attention=%s mlp=%s", qattention_config, qmlp_config
    )

    def filter_fn(mod, fqn):
        mx_types = tuple(ATTENTION_LAYERS.values()) + tuple(MLP_LAYERS.values())
        if isinstance(mod, mx_types):
            return False
        return type(mod) in ATTENTION_LAYERS or type(mod) in MLP_LAYERS

    def replacement_fn(mod):
        if type(mod) in ATTENTION_LAYERS:
            return ATTENTION_LAYERS[type(mod)].from_float(mod, qattention_config)
        return MLP_LAYERS[type(mod)].from_float(mod, qmlp_config)

    replacement, finish = _with_progress(replacement_fn, "quantize_llm_")
    replace_with_custom_fn_if_matches_filter(model, replacement, filter_fn)
    finish()
    # Second pass: leftover plain linears (e.g. lm_head is excluded upstream
    # by not being a match target in the reference; here we match its
    # behavior by only quantizing linears outside MX modules).
    quantize_linear_(model, qmlp_config)
    return model


def mx_dynamic_activation_mx_weights(qconfig: QLinearConfig):
    """Functional analog of the reference's torchao tensor-subclass path
    (``quant_api.py:56-147``): returns ``transform(weight) -> MXArray`` for
    use on raw weight pytrees (dynamic activation quantization happens inside
    ``mx_linear`` when it receives an ``MXArray`` weight and a config)."""

    def transform(weight) -> MXArray:
        w = weight if weight.dtype.name == "bfloat16" else weight.astype("bfloat16")
        return MXArray.to_mx(
            w, qconfig.weights_config.elem_dtype, qconfig.weights_config.block_size
        )

    return transform
