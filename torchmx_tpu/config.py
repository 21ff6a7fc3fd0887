"""User-facing quantization configuration dataclasses.

Typed frozen configs with validation, dict round-trip and structural equality,
matching the reference semantics (rain-neuromorphics/torchmx
``torchmx/config.py:8-262``):

* :class:`MXConfig`          — one MX format: element dtype + block size.
* :class:`QLinearConfig`     — weights + activations configs for a linear.
* :class:`QAttentionConfig`  — projections + optional Q/K/V/attention-weights
  configs (all-or-none validation, ``config.py:186-198``), extended with an
  optional ``kv_cache_config`` for the TPU-native MX-quantized KV cache
  (absent in the reference: ``mx_llama_attention.py:180`` "KV cache
  quantization is NOT implemented yet").
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Optional

from . import dtypes


class _BaseConfig(ABC):
    @classmethod
    @abstractmethod
    def load_from_dict(cls, config_dict: dict) -> Any: ...

    @abstractmethod
    def to_dict(self) -> dict: ...

    @abstractmethod
    def __eq__(self, other: Any) -> bool: ...


@dataclass(frozen=True)
class MXConfig(_BaseConfig):
    """Configuration for one MX quantization format.

    Args:
        elem_dtype_name: name of the element dtype (see ``dtypes.py``
            ``STR_TO_SUPPORTED_ELEM_DTYPE`` for supported strings).
        block_size: elements sharing one E8M0 scale.  Default 32 (OCP MX v1.0).
    """

    elem_dtype_name: str
    block_size: int = 32

    def __post_init__(self):
        if self.elem_dtype_name not in dtypes.STR_TO_SUPPORTED_ELEM_DTYPE:
            raise ValueError(
                f"Unsupported element dtype name: {self.elem_dtype_name}. "
                f"Supported names are: {tuple(dtypes.STR_TO_SUPPORTED_ELEM_DTYPE.keys())}"
            )
        if self.block_size < 1:
            raise ValueError(f"Block size must be at least 1, got {self.block_size}")

    @property
    def elem_dtype(self) -> dtypes.DType:
        """The :class:`dtypes.DType` object for ``elem_dtype_name``."""
        return dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[self.elem_dtype_name]

    @classmethod
    def load_from_dict(cls, config_dict: dict) -> "MXConfig":
        return cls(**config_dict)

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, MXConfig):
            return False
        return (
            self.elem_dtype_name == other.elem_dtype_name
            and self.block_size == other.block_size
        )

    def __hash__(self) -> int:
        return hash((self.elem_dtype_name, self.block_size))

    def to_dict(self) -> dict:
        return {
            "elem_dtype_name": self.elem_dtype_name,
            "block_size": self.block_size,
        }


@dataclass(frozen=True)
class QLinearConfig(_BaseConfig):
    """Linear layer quantization configuration.

    Args:
        weights_config: MX format for the weights.
        activations_config: MX format for the (dynamically quantized) activations.
        rotate_blocks: block-Hadamard-rotate weight and activation before
            quantization (outlier spreading; numerically transparent at the
            matmul level — see ``rotation.py``).  A TPU-build extension: the
            reference quantizes raw tensors only.  Default False.
    """

    weights_config: MXConfig
    activations_config: MXConfig
    rotate_blocks: bool = False

    @classmethod
    def load_from_dict(cls, config_dict: dict) -> "QLinearConfig":
        return cls(
            weights_config=MXConfig.load_from_dict(config_dict["weights_config"]),
            activations_config=MXConfig.load_from_dict(
                config_dict["activations_config"]
            ),
            rotate_blocks=config_dict.get("rotate_blocks", False),
        )

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, QLinearConfig):
            return False
        return (
            self.weights_config == other.weights_config
            and self.activations_config == other.activations_config
            and self.rotate_blocks == other.rotate_blocks
        )

    def __hash__(self) -> int:
        return hash(
            (self.weights_config, self.activations_config, self.rotate_blocks)
        )

    def to_dict(self) -> dict:
        return {
            "weights_config": self.weights_config.to_dict(),
            "activations_config": self.activations_config.to_dict(),
            "rotate_blocks": self.rotate_blocks,
        }


@dataclass(frozen=True)
class QAttentionConfig(_BaseConfig):
    """Attention layer quantization configuration.

    Args:
        projection_config: config for the q/k/v/o projection linears.
        query_config: MX format for the Q tensor inside attention.  Default None.
        key_config: MX format for the K tensor.  Default None.
        value_config: MX format for the V tensor.  Default None.
        attention_weights_config: MX format for the post-softmax attention
            weights (the output of Q @ K^T -> softmax).  Default None.
        kv_cache_config: MX format for the quantized KV cache (TPU-build
            extension; the reference keeps the KV cache in high precision).
            Default None = high-precision cache.

    Q/K/V/attention-weights configs must be provided all-or-none
    (reference ``config.py:186-198``).
    """

    projection_config: QLinearConfig
    query_config: Optional[MXConfig] = None
    key_config: Optional[MXConfig] = None
    value_config: Optional[MXConfig] = None
    attention_weights_config: Optional[MXConfig] = None
    kv_cache_config: Optional[MXConfig] = None

    @property
    def is_qkv_quantization_enabled(self) -> bool:
        """True iff q, k, v and attention_weights quantization are all enabled."""
        return all(
            (
                self.query_config,
                self.key_config,
                self.value_config,
                self.attention_weights_config,
            )
        )

    @property
    def is_kv_cache_quantization_enabled(self) -> bool:
        """True iff the MX-quantized KV cache is enabled (TPU extension)."""
        return self.kv_cache_config is not None

    def __post_init__(self):
        qkv_configs = (
            self.query_config,
            self.key_config,
            self.value_config,
            self.attention_weights_config,
        )
        if any(qkv_configs):
            assert all(
                qkv_configs
            ), "Either all or none of the q,k,v and attention_weights config must be provided"

    @classmethod
    def load_from_dict(cls, config_dict: dict) -> "QAttentionConfig":
        kwargs: dict = {
            "projection_config": QLinearConfig.load_from_dict(
                config_dict["projection_config"]
            )
        }
        if config_dict.get("query_config", None):
            kwargs.update(
                query_config=MXConfig.load_from_dict(config_dict["query_config"]),
                key_config=MXConfig.load_from_dict(config_dict["key_config"]),
                value_config=MXConfig.load_from_dict(config_dict["value_config"]),
                attention_weights_config=MXConfig.load_from_dict(
                    config_dict["attention_weights_config"]
                ),
            )
        if config_dict.get("kv_cache_config", None):
            kwargs["kv_cache_config"] = MXConfig.load_from_dict(
                config_dict["kv_cache_config"]
            )
        return cls(**kwargs)

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, QAttentionConfig):
            return False
        return all(
            (
                self.projection_config == other.projection_config,
                self.query_config == other.query_config,
                self.key_config == other.key_config,
                self.value_config == other.value_config,
                self.attention_weights_config == other.attention_weights_config,
                self.kv_cache_config == other.kv_cache_config,
            )
        )

    def __hash__(self) -> int:
        return hash(
            (
                self.projection_config,
                self.query_config,
                self.key_config,
                self.value_config,
                self.attention_weights_config,
                self.kv_cache_config,
            )
        )

    def to_dict(self) -> dict:
        result: dict = {"projection_config": self.projection_config.to_dict()}
        if (
            self.query_config
            or self.key_config
            or self.value_config
            or self.attention_weights_config
        ):
            result["query_config"] = self.query_config.to_dict()
            result["key_config"] = self.key_config.to_dict()
            result["value_config"] = self.value_config.to_dict()
            result["attention_weights_config"] = self.attention_weights_config.to_dict()
        if self.kv_cache_config:
            result["kv_cache_config"] = self.kv_cache_config.to_dict()
        return result
