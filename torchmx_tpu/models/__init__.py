"""Model families (JAX/NNX): Llama, Qwen2/3, Mistral, Mixtral (MoE), Gemma,
Phi-3 and DeepSeek-V3 (MLA + MoE), with HF checkpoint import."""

from .llama import (  # noqa: F401
    LayerKVCache,
    LlamaAttention,
    LlamaConfig,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    MXLayerKVCache,
    make_causal_mask,
    make_decode_mask,
)
from . import evaluate, serve  # noqa: F401
from .generate import generate  # noqa: F401
from .serve import DecodeEngine  # noqa: F401
from .speculate import generate_speculative  # noqa: F401
from .gemma import (  # noqa: F401
    Gemma2Config,
    Gemma2ForCausalLM,
    GemmaAttention,
    GemmaConfig,
    GemmaForCausalLM,
    GemmaMLP,
    GemmaModel,
)
from .mistral import (  # noqa: F401
    MistralAttention,
    MistralConfig,
    MistralDecoderLayer,
    MistralForCausalLM,
    MistralMLP,
    MistralModel,
)
from .mixtral import (  # noqa: F401
    MixtralConfig,
    MixtralForCausalLM,
    MixtralSparseMoeBlock,
)
from .qwen2 import (  # noqa: F401
    Qwen2Attention,
    Qwen2Config,
    Qwen2DecoderLayer,
    Qwen2ForCausalLM,
    Qwen2MLP,
    Qwen2Model,
)
from .phi3 import (  # noqa: F401
    Phi3Attention,
    Phi3Config,
    Phi3DecoderLayer,
    Phi3ForCausalLM,
    Phi3MLP,
    Phi3Model,
)
from .deepseek import (  # noqa: F401
    DeepseekV3Config,
    DeepseekV3ForCausalLM,
    DeepseekV3MoE,
    MLAAttention,
    MLACache,
    MXMLACache,
)
from .qwen3 import (  # noqa: F401
    Qwen3Attention,
    Qwen3Config,
    Qwen3DecoderLayer,
    Qwen3ForCausalLM,
    Qwen3MLP,
    Qwen3Model,
)
