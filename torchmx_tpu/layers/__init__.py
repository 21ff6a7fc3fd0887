"""Quantized NNX layers.

The MX attention modules import the model family (which itself builds on
``layers.linear``), so they are exposed lazily to avoid a circular import.
"""

from .linear import Linear, MXInferenceLinear  # noqa: F401

_LAZY = {
    "MXInferenceLlamaAttention": ".mx_llama_attention",
    "MXInferenceLlamaMLP": ".mx_llama_attention",
    "MXInferenceGemma2Attention": ".mx_gemma_attention",
    "MXInferenceGemma2MLP": ".mx_gemma_attention",
    "MXInferenceGemmaAttention": ".mx_gemma_attention",
    "MXInferenceGemmaMLP": ".mx_gemma_attention",
    "MXInferenceMistralAttention": ".mx_mistral_attention",
    "MXInferenceMistralMLP": ".mx_mistral_attention",
    "MXInferenceMixtralMoeBlock": ".mx_mixtral_moe",
    "MXInferenceMixtralMoeBlockGrouped": ".mx_mixtral_moe",
    "MXInferenceQwen2Attention": ".mx_qwen2_attention",
    "MXInferenceQwen2MLP": ".mx_qwen2_attention",
    "MXInferenceQwen3Attention": ".mx_qwen3_attention",
    "MXInferenceQwen3MLP": ".mx_qwen3_attention",
    "MXInferencePhi3Attention": ".mx_phi3_attention",
    "MXInferencePhi3MLP": ".mx_phi3_attention",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
