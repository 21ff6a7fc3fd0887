"""Llama model family in JAX/NNX (bf16), with MX-quantizable seams.

A from-scratch TPU-native reimplementation of the HF Llama architecture used
by the reference's quantized-attention layers
(rain-neuromorphics/torchmx ``torchmx/layers/mx_llama_attention.py``), built
for XLA: static shapes, functional KV cache (plain ``lax.dynamic_update_slice``
ring), fp32 softmax, GQA via ``repeat_kv``, rotary embeddings with optional
Llama-3 scaling.  Decode steps jit with zero recompiles (the analog of the
reference's zero-graph-breaks guarantee, ``tests/test_mx_tensor.py:432-456``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.linear import Linear

Array = jax.Array


@dataclasses.dataclass
class LlamaConfig:
    """Architecture hyperparameters (subset of HF ``LlamaConfig``)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    # Bias on q/k/v projections only (Qwen2-style; o_proj stays bias-free).
    attention_qkv_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    attention_dropout: float = 0.0
    # MLP activation ("silu" Llama-family; "gelu_pytorch_tanh" Gemma).
    hidden_act: str = "silu"
    # Attention score scale = 1/sqrt(query_pre_attn_scalar or head_dim)
    # (Gemma2 decouples the scalar from head_dim).
    query_pre_attn_scalar: Optional[float] = None
    # Gemma2 soft caps: s -> cap * tanh(s / cap) on attention logits
    # (before masking) and on the final LM logits.
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    # Gemma conventions: RMSNorm multiplies by (1 + weight) (checkpoint
    # weights are deltas around 1), and embeddings scale by sqrt(hidden).
    rms_norm_offset: float = 0.0
    scale_embeddings: bool = False
    # Sliding-window attention (Mistral semantics): query at position p sees
    # keys in (p - sliding_window, p].  None = full causal.
    sliding_window: Optional[int] = None
    # Per-layer attention kinds ("full_attention" / "sliding_attention"),
    # HF layer_types semantics — Qwen2 gates the window per layer via
    # max_window_layers (layers >= it slide).  None = every layer windowed
    # when sliding_window is set (Mistral).
    layer_types: Optional[tuple] = None

    def layer_window(self, layer_idx: int) -> Optional[int]:
        """The effective sliding window for one layer (None = full causal)."""
        if self.sliding_window is None:
            return None
        if self.layer_types is not None and self.layer_types[layer_idx] != "sliding_attention":
            return None
        return self.sliding_window

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf_config: Any) -> "LlamaConfig":
        """Build from an HF ``LlamaConfig``/``Qwen2Config``-like object or dict."""
        get = (lambda k, d=None: hf_config.get(k, d)) if isinstance(hf_config, dict) else (
            lambda k, d=None: getattr(hf_config, k, d)
        )
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            num_key_value_heads=get("num_key_value_heads") or get("num_attention_heads"),
            head_dim=get("head_dim"),
            max_position_embeddings=get("max_position_embeddings", 2048),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=get("rope_scaling"),
            attention_bias=bool(get("attention_bias", False)),
            mlp_bias=bool(get("mlp_bias", False)),
            tie_word_embeddings=bool(get("tie_word_embeddings", False)),
            # Qwen2-style checkpoints carry sliding_window but gate it off
            # with use_sliding_window=False; Mistral v0.2+ sets it null.
            sliding_window=(
                get("sliding_window")
                if get("use_sliding_window", True) is not False
                else None
            ),
            layer_types=(
                tuple(get("layer_types")) if get("layer_types") else None
            ),
            # Gemma checkpoints carry hidden_activation (preferred) or
            # hidden_act; Llama-family carries hidden_act="silu".
            hidden_act=(
                get("hidden_activation") or get("hidden_act") or "silu"
            ),
            query_pre_attn_scalar=get("query_pre_attn_scalar"),
            attn_logit_softcapping=get("attn_logit_softcapping"),
            final_logit_softcapping=get("final_logit_softcapping"),
        )


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------


def compute_rope_inv_freq(config: LlamaConfig) -> jnp.ndarray:
    """Base inverse frequencies, with optional Llama-3 rope scaling."""
    d = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    rs = config.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "longrope":
        # Phi-3 LongRoPE: per-dim rescale factors.  HF switches short/long
        # by the runtime sequence length; under static shapes the choice is
        # made once from the configured capacity (serving allocates caches
        # to max_position_embeddings) — identical whenever the capacity
        # exceeds original_max_position_embeddings, the deployed case.
        orig = (
            getattr(config, "original_max_position_embeddings", None)
            or rs.get("original_max_position_embeddings")
            or config.max_position_embeddings
        )
        key = "long_factor" if config.max_position_embeddings > orig else "short_factor"
        ext = jnp.asarray(rs[key], jnp.float32)
        return inv_freq / ext
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        # YaRN (HF ``_compute_yarn_parameters``): NTK-by-parts — low
        # frequencies interpolate (divide by factor), high frequencies
        # extrapolate (unchanged), a linear ramp blends between the
        # beta_fast/beta_slow correction dims.  DeepSeek-V2/V3 long-context
        # checkpoints ship this.
        factor = rs["factor"]
        beta_fast = rs.get("beta_fast") or 32
        beta_slow = rs.get("beta_slow") or 1
        orig = rs.get("original_max_position_embeddings") or config.max_position_embeddings
        base = config.rope_theta

        def correction_dim(num_rotations):
            return (d * math.log(orig / (num_rotations * 2 * math.pi))) / (
                2 * math.log(base)
            )

        low = correction_dim(beta_fast)
        high = correction_dim(beta_slow)
        if rs.get("truncate", True):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, d - 1)
        if low == high:
            high += 0.001  # HF's singularity guard
        ramp = jnp.clip(
            (jnp.arange(d // 2, dtype=jnp.float32) - low) / (high - low), 0, 1
        )
        extrapolation_factor = 1.0 - ramp
        return inv_freq / factor * (1 - extrapolation_factor) + inv_freq * (
            extrapolation_factor
        )
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        low_factor = rs["low_freq_factor"]
        high_factor = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * math.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < high_wavelen,
            inv_freq,
            jnp.where(wavelen > low_wavelen, scaled, smoothed),
        )
    return inv_freq


def rope_attention_scaling(config: LlamaConfig) -> float:
    """LongRoPE post-scaling on cos/sin (HF ``_compute_longrope_parameters``):
    ``sqrt(1 + ln(factor)/ln(original_max))`` when extending past the
    pretraining context; 1.0 otherwise (and for every other rope type)."""
    rs = config.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        # YaRN attention factor (HF): explicit, or 0.1*mscale*ln(f)+1 —
        # with mscale/mscale_all_dim given, the ratio of the two mscales
        # (DeepSeek convention; its checkpoints set both equal, giving 1.0,
        # and fold the mscale into the attention ``scaling`` instead).
        af = rs.get("attention_factor")
        if af is not None:
            return float(af)
        factor = rs["factor"]

        def get_mscale(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        ms, msad = rs.get("mscale"), rs.get("mscale_all_dim")
        if ms and msad:
            return float(get_mscale(factor, ms) / get_mscale(factor, msad))
        return float(get_mscale(factor))
    if not rs or rs.get("rope_type", rs.get("type")) != "longrope":
        return 1.0
    af = rs.get("attention_factor")
    if af is not None:
        return float(af)
    orig = (
        getattr(config, "original_max_position_embeddings", None)
        or rs.get("original_max_position_embeddings")
        or config.max_position_embeddings
    )
    factor = rs.get("factor")
    if orig:
        factor = config.max_position_embeddings / orig
    if not factor or factor <= 1.0:
        return 1.0
    return math.sqrt(1 + math.log(factor) / math.log(orig))


def rope_cos_sin(
    inv_freq: Array, position_ids: Array, dtype=jnp.bfloat16
) -> Tuple[Array, Array]:
    """cos/sin tables for given positions: shapes ``(*pos.shape, head_dim)``."""
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(q: Array, k: Array, cos: Array, sin: Array) -> Tuple[Array, Array]:
    """HF-convention RoPE on (b, h, s, d) tensors with (b, s, d) cos/sin."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)


def repeat_kv(x: Array, n_rep: int) -> Array:
    """(b, kv_heads, s, d) -> (b, kv_heads * n_rep, s, d) (GQA expand)."""
    if n_rep == 1:
        return x
    b, kv, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, :], (b, kv, n_rep, s, d))
    return x.reshape(b, kv * n_rep, s, d)


# ---------------------------------------------------------------------------
# KV cache (functional, static-size)
# ---------------------------------------------------------------------------


def _seq_scatter(buf: Array, new: Array, pos) -> Array:
    """Write ``new`` (b, h, s, x) into ``buf`` (b, h, L, x) at sequence
    position ``pos`` — a scalar, or (b,) per-row positions."""
    if jnp.ndim(pos) == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, pos, 0))
    return jax.vmap(
        lambda b, n, p: jax.lax.dynamic_update_slice(b, n, (0, p, 0))
    )(buf, new, pos)


def _seq_scatter_last(buf: Array, new: Array, pos) -> Array:
    """Write ``new`` (b, h, x, s) into ``buf`` (b, h, x, L) at sequence
    position ``pos`` along the LAST dim (d-major cache layout)."""
    if jnp.ndim(pos) == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, pos))
    return jax.vmap(
        lambda b, n, p: jax.lax.dynamic_update_slice(b, n, (0, 0, p))
    )(buf, new, pos)


def _ring_scatter(buf: Array, new: Array, pos, seq_axis: int) -> Array:
    """Write ``new`` into ``buf`` at WRAPPED sequence positions
    ``(pos + i) mod R`` along ``seq_axis`` (2 for seq-major shapes
    (b, h, L, x), 3 for d-major (b, h, x, L)).  When ``new`` is longer than
    the ring capacity only the last R tokens land (the earlier ones would
    be overwritten anyway)."""
    R = buf.shape[seq_axis]
    s = new.shape[seq_axis]
    if s > R:
        sl = [slice(None)] * new.ndim
        sl[seq_axis] = slice(s - R, None)
        new = new[tuple(sl)]
        pos = pos + (s - R)
        s = R

    def one(buf1, new1, p):
        idx = jnp.mod(p + jnp.arange(s), R)
        return buf1.at[:, idx, :].set(new1) if seq_axis == 2 else buf1.at[:, :, idx].set(new1)

    if jnp.ndim(pos) == 0:
        pos = jnp.broadcast_to(pos, (buf.shape[0],))
    return jax.vmap(one)(buf, new, jnp.asarray(pos, jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKVCache:
    """High-precision per-layer KV cache: (b, kv_heads, max_len, head_dim)."""

    k: Array
    v: Array

    @staticmethod
    def create(batch: int, kv_heads: int, max_len: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (batch, kv_heads, max_len, head_dim)
        return LayerKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    def update(self, k_new: Array, v_new: Array, pos: Array) -> Tuple[Array, Array, "LayerKVCache"]:
        """Write ``k_new/v_new`` (b, kv, s, d) at ``pos`` and return full
        buffers.  ``pos`` may be a scalar or per-row (b,) positions
        (continuous batching)."""
        k = _seq_scatter(self.k, k_new.astype(self.k.dtype), pos)
        v = _seq_scatter(self.v, v_new.astype(self.v.dtype), pos)
        return k, v, LayerKVCache(k=k, v=v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MXLayerKVCache:
    """MX-quantized per-layer KV cache (TPU-build extension; the reference
    keeps its cache in high precision — ``mx_llama_attention.py:180`` TODO).

    K and V are stored quantized along ``head_dim`` (per-token blocks), 4-8x
    smaller than bf16 in HBM; dequantized on read (or decoded in-kernel by
    the fused attention).  fp4 payloads pack two codes per byte in the
    "halves" layout along head_dim — byte ``l`` holds elements
    ``(l, l + d/2)`` — so the fused kernel reads each nibble plane as a
    contiguous half (no strided lane access).

    Two storage layouts (``layout``; env default ``TORCHMX_KV_LAYOUT``):

    * ``"seq"`` — (b, kv, L, d): the reference orientation.  MX blocks land
      on the LANE dim, so the fused kernel broadcasts scales via an MXU dot
      and transposes K/V tiles in-kernel.
    * ``"dmajor"`` — (b, kv, d, L), scales (b, kv, d//block, L): head_dim on
      SUBLANES.  The per-32-block scale broadcast becomes a free sublane
      ``_expand_scale`` and the attention dots consume tiles untransposed —
      the same blocks-on-sublanes rule the matmul kernels follow.  Same HBM
      bytes; the write path transposes only the incoming slice.
    """

    k_data: Array  # uint8/int8; seq (b, kv, max_len, d) / dmajor (b, kv, d, max_len)
    k_scale: Array  # uint8; seq (b, kv, max_len, d//block) / dmajor (b, kv, d//block, max_len)
    v_data: Array
    v_scale: Array
    elem_dtype_name: str = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(metadata=dict(static=True))
    layout: str = dataclasses.field(default="seq", metadata=dict(static=True))
    # Ring (rolling-buffer) mode for sliding-window models: position p lives
    # at slot p mod max_len, so HBM is bounded by the window instead of the
    # generation length.  Readers reconstruct absolute positions from slot
    # indices (fused kernel in-kernel; eager via _ring_cache_mask).
    ring: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @staticmethod
    def create(
        batch: int,
        kv_heads: int,
        max_len: int,
        head_dim: int,
        elem_dtype_name: str = "float8_e4m3",
        block_size: int = 32,
        layout: Optional[str] = None,
        ring: bool = False,
    ):
        from .. import dtypes as _dt
        from .. import env_variables as _env

        if layout is None:
            layout = _env.TORCHMX_KV_LAYOUT
        if layout not in ("seq", "dmajor"):
            raise ValueError(f"unknown KV cache layout {layout!r}")
        elem = _dt.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
        payload_d = head_dim // 2 if elem == _dt.float4_e2m1 else head_dim
        payload_dtype = jnp.int8 if elem == _dt.int8 else jnp.uint8
        if layout == "dmajor":
            data_shape = (batch, kv_heads, payload_d, max_len)
            scale_shape = (batch, kv_heads, head_dim // block_size, max_len)
        else:
            data_shape = (batch, kv_heads, max_len, payload_d)
            scale_shape = (batch, kv_heads, max_len, head_dim // block_size)
        return MXLayerKVCache(
            k_data=jnp.zeros(data_shape, payload_dtype),
            k_scale=jnp.zeros(scale_shape, jnp.uint8),
            v_data=jnp.zeros(data_shape, payload_dtype),
            v_scale=jnp.zeros(scale_shape, jnp.uint8),
            elem_dtype_name=elem_dtype_name,
            block_size=block_size,
            layout=layout,
            ring=ring,
        )

    def _pack(self, codes: Array) -> Array:
        """fp4: adjacent-pair packed (quantize_mx output) -> d-halves bytes."""
        if self.elem_dtype_name != "float4_e2m1":
            return codes
        from ..packing import unpack_uint4

        u = unpack_uint4(codes, packing_dim=-1)  # (..., d) one code per byte
        half = u.shape[-1] // 2
        return ((u[..., :half] << 4) | (u[..., half:] & 0xF)).astype(jnp.uint8)

    def _unpack(self, data: Array) -> Array:
        """Inverse of :meth:`_pack`: d-halves bytes -> adjacent-pair packed."""
        if self.elem_dtype_name != "float4_e2m1":
            return data
        from ..packing import pack_uint4

        codes = jnp.concatenate([data >> 4, data & 0xF], axis=-1)
        return pack_uint4(codes.astype(jnp.uint8), packing_dim=-1)

    def write(self, k_new: Array, v_new: Array, pos: Array) -> "MXLayerKVCache":
        """Quantize incoming K/V along head_dim and write codes at ``pos``."""
        from ..mx_array import quantize_mx

        ks, kd = quantize_mx(k_new.astype(jnp.bfloat16), self.elem_dtype_name, self.block_size)
        vs, vd = quantize_mx(v_new.astype(jnp.bfloat16), self.elem_dtype_name, self.block_size)
        kd, vd = self._pack(kd), self._pack(vd)
        if self.layout == "dmajor":
            # Transpose only the incoming (b, h, s, x) slice, scatter on the
            # sequence (last) dim of the d-major buffers.
            sw = lambda a: a.swapaxes(2, 3)
            scat = (
                functools.partial(_ring_scatter, seq_axis=3)
                if self.ring
                else _seq_scatter_last
            )
            return dataclasses.replace(
                self,
                k_data=scat(self.k_data, sw(kd), pos),
                k_scale=scat(self.k_scale, sw(ks), pos),
                v_data=scat(self.v_data, sw(vd), pos),
                v_scale=scat(self.v_scale, sw(vs), pos),
            )
        scat = (
            functools.partial(_ring_scatter, seq_axis=2) if self.ring else _seq_scatter
        )
        return dataclasses.replace(
            self,
            k_data=scat(self.k_data, kd, pos),
            k_scale=scat(self.k_scale, ks, pos),
            v_data=scat(self.v_data, vd, pos),
            v_scale=scat(self.v_scale, vs, pos),
        )

    def dequantize(self) -> Tuple[Array, Array]:
        """Full dequantized (k, v) buffers (b, kv, L, d) in either layout."""
        from ..mx_array import dequantize_mx

        if self.layout == "dmajor":
            kd, ks = self.k_data.swapaxes(2, 3), self.k_scale.swapaxes(2, 3)
            vd, vs = self.v_data.swapaxes(2, 3), self.v_scale.swapaxes(2, 3)
        else:
            kd, ks, vd, vs = self.k_data, self.k_scale, self.v_data, self.v_scale
        k = dequantize_mx(
            self._unpack(kd), ks, self.elem_dtype_name,
            self.block_size, jnp.bfloat16, 3,
        )
        v = dequantize_mx(
            self._unpack(vd), vs, self.elem_dtype_name,
            self.block_size, jnp.bfloat16, 3,
        )
        return k, v

    @property
    def max_len(self) -> int:
        """Sequence capacity, layout-independent."""
        return self.k_data.shape[3] if self.layout == "dmajor" else self.k_data.shape[2]

    def update(self, k_new: Array, v_new: Array, pos: Array):
        """Quantize incoming K/V along head_dim, write at ``pos``, and return
        the **dequantized** full buffers (so attention math sees the exact
        values later reads will see)."""
        new = self.write(k_new, v_new, pos)
        k_full, v_full = new.dequantize()
        return k_full, v_full, new


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class RMSNorm(nnx.Module):
    """RMS norm; ``offset`` implements Gemma's (offset + weight) convention
    (checkpoint weights are deltas around 1, so init goes to zeros)."""

    def __init__(self, dim: int, eps: float, dtype=jnp.bfloat16, offset: float = 0.0):
        init = jnp.zeros if offset else jnp.ones
        self.weight = nnx.Param(init((dim,), dtype))
        self.eps = eps
        self.offset = offset

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = self.weight.get_value().astype(jnp.float32) + self.offset
        return (xf * w).astype(x.dtype)


def resolve_act(name: str):
    """MLP activation by HF name."""
    if name == "silu":
        return jax.nn.silu
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return functools.partial(jax.nn.gelu, approximate=True)
    if name == "gelu":
        return functools.partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unsupported hidden_act {name!r}")


class LlamaMLP(nnx.Module):
    def __init__(self, config: LlamaConfig, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        h, i = config.hidden_size, config.intermediate_size
        self.gate_proj = Linear(h, i, use_bias=config.mlp_bias, rngs=rngs)
        self.up_proj = Linear(h, i, use_bias=config.mlp_bias, rngs=rngs)
        self.down_proj = Linear(i, h, use_bias=config.mlp_bias, rngs=rngs)
        self.act = resolve_act(config.hidden_act)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(self.act(self.gate_proj(x)) * self.up_proj(x))


class LlamaAttention(nnx.Module):
    """Eager GQA attention with RoPE and fp32 softmax (HF semantics)."""

    def __init__(self, config: LlamaConfig, layer_idx: int = 0, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        self.layer_idx = layer_idx
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.num_key_value_heads = config.num_key_value_heads
        self.num_key_value_groups = self.num_heads // self.num_key_value_heads
        self.head_dim = config.head_dim
        # Fused kernels multiply by sm_scale; the eager path DIVIDES by
        # sm_divisor — the historical expression, preserved because the
        # engine/generate bit-exact serving gates compare separately
        # compiled programs and an ulp-level change reshuffles near-ties.
        self.sm_divisor = math.sqrt(config.query_pre_attn_scalar or config.head_dim)
        self.sm_scale = 1.0 / self.sm_divisor
        self.attn_softcap = config.attn_logit_softcapping
        qkv_bias = config.attention_bias or config.attention_qkv_bias
        self.q_proj = Linear(h, self.num_heads * self.head_dim, use_bias=qkv_bias, rngs=rngs)
        self.k_proj = Linear(h, self.num_key_value_heads * self.head_dim, use_bias=qkv_bias, rngs=rngs)
        self.v_proj = Linear(h, self.num_key_value_heads * self.head_dim, use_bias=qkv_bias, rngs=rngs)
        self.o_proj = Linear(self.num_heads * self.head_dim, h, use_bias=config.attention_bias, rngs=rngs)

    # -- seams the MX subclass overrides ------------------------------------
    def _project_qkv(self, hidden_states: Array):
        return (
            self.q_proj(hidden_states),
            self.k_proj(hidden_states),
            self.v_proj(hidden_states),
        )

    def _quantize_qkv(self, q: Array, k: Array, v: Array):
        return q, k, v

    def _norm_qk(self, q: Array, k: Array):
        """Per-head Q/K normalization seam on (b, h, s, d), applied before
        RoPE (identity for Llama; Qwen3's QK-RMSNorm hooks in here)."""
        return q, k

    def _quantize_attn_weights(self, attn_weights):
        return attn_weights

    def _fused_cache_attention_ok(self, cache=None) -> bool:
        """May this layer take the fused MX-KV-cache attention kernel?  The
        MX subclass gates this on its Q/K/V quantization config vs the
        cache format (see ``MXInferenceLlamaAttention``)."""
        return True

    def _fused_q(self, q):
        """Query preprocessing for the fused-kernel path (the MX subclass
        fake-quantizes q per its query config here)."""
        return q

    def _matmul(self, a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def __call__(
        self,
        hidden_states: Array,
        *,
        cos: Array,
        sin: Array,
        attention_mask: Optional[Array] = None,
        cache=None,
        cache_position: Optional[Array] = None,
    ):
        bsz, q_len, _ = hidden_states.shape
        window = self.config.layer_window(self.layer_idx)
        q, k, v = self._project_qkv(hidden_states)

        # (b, heads, s, d)
        q = q.reshape(bsz, q_len, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, q_len, self.num_key_value_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, q_len, self.num_key_value_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k = self._norm_qk(q, k)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)

        if cache is None and attention_mask is None:
            from ..parallel import context as _cpmod

            cp = _cpmod.active_cp()
            if cp is not None:
                # Context-parallel prefill/scoring: the sequence is sharded
                # over cp's mesh axis and ring attention masks causally from
                # global offsets — no dense (L, L) mask anywhere.
                mesh, axis_name, cp_layout = cp
                if (
                    getattr(self, "qconfig", None) is not None
                    and self.qconfig.is_qkv_quantization_enabled
                ):
                    # Q/K/V quantization composes with the ring (round 5):
                    # Q and K fake-quantize along head_dim and V along the
                    # kv length — the SAME `_quantize_qkv` seam as the dense
                    # eager path, applied before sharding GQA-folded (fq is
                    # per-head, so it commutes with repeat_kv bit-exactly).
                    # V's blocks lie along the SHARDED seq dim: each
                    # device-local chunk must hold whole blocks, or a block
                    # would group tokens across devices (zigzag chunks are
                    # non-adjacent in global order, so such a block would
                    # also differ numerically from the dense grid).
                    vc = self.qconfig.value_config
                    n_cp = mesh.shape[axis_name]
                    chunk = q_len // (n_cp * (2 if cp_layout == "zigzag" else 1))
                    if chunk % vc.block_size != 0:
                        raise ValueError(
                            f"context-parallel V quantization needs the "
                            f"per-device chunk ({chunk}) to be a multiple "
                            f"of value_config.block_size "
                            f"({vc.block_size}); pad the sequence or "
                            f"reduce the CP degree"
                        )
                    q, k, v = self._quantize_qkv(q, k, v)
                    # Post-softmax attention-weights quantization does not
                    # apply inside the ring's online softmax — the same
                    # accuracy-FAVORING deviation as the fused cache kernel
                    # (see MXInferenceLlamaAttention._fused_cache_attention_ok).
                # GQA stays folded: K/V rotate the ring with their own
                # (smaller) head count — group_factor x fewer ICI bytes/hop.
                # Under the zigzag layout the caller already permuted the
                # tokens (and passed matching position_ids); the ring gets
                # told so it can skip fully-masked chunk-pairs.
                # Sliding windows ride the ring as per-chunk predication
                # (wholly-below-window chunks skip their math); Gemma2 logit
                # softcaps apply to the scaled scores inside each block —
                # the flash merge is unaffected (monotone transform).
                out = _cpmod.ring_attention(
                    q.astype(jnp.bfloat16), k, v, mesh, axis=axis_name,
                    sm_scale=self.sm_scale,
                    layout=cp_layout,
                    window=window,
                    softcap=self.attn_softcap,
                )
                out = out.transpose(0, 2, 1, 3).reshape(bsz, q_len, -1)
                return self.o_proj(out), None

        new_cache = None
        ring = getattr(cache, "ring", False)
        if ring:
            if window is None:
                raise ValueError(
                    "ring KV caches require a sliding-window config "
                    "(config.sliding_window); a full-causal query would "
                    "need evicted positions"
                )
            cap = cache.max_len
            if cap < window + q_len - 1:
                raise ValueError(
                    f"ring cache capacity {cap} < window {window} + "
                    f"chunk {q_len} - 1: the oldest query in this chunk "
                    "would need already-evicted positions; enlarge the "
                    "ring or shrink the prefill chunk"
                )
        if cache is not None:
            if (
                isinstance(cache, MXLayerKVCache)
                and cache_position is not None
                and attention_mask is None
                and self._fused_cache_attention_ok(cache)
            ):
                # ``attention_mask=None`` + a cache means standard causal
                # attention over the written prefix: the fused kernel masks
                # from (cache_position, cache_position + q_len) in-kernel.
                # An explicit mask always takes the eager path (honored
                # verbatim).
                from ..ops import pallas_attention

                new_cache = cache.write(k, v, cache_position)
                fused = pallas_attention.cached_attention_any(
                    self._fused_q(q),
                    new_cache,
                    cache_position,
                    cache_position + q_len,
                    self.sm_scale,
                    window=window,
                    ring=ring,
                    softcap=self.attn_softcap,
                )
                if fused is not None:
                    out = fused.transpose(0, 2, 1, 3).reshape(bsz, q_len, -1)
                    return self.o_proj(out), new_cache
                # Ineligible shape: fall back through the dequantized-cache
                # path against the just-written cache.
                if pallas_attention._use_fused():
                    from ..ops.fallbacks import note_fallback

                    note_fallback(
                        "cached_attention",
                        f"q{tuple(q.shape)} cache{tuple(cache.k_data.shape)} "
                        f"{cache.elem_dtype_name}",
                    )
                k, v = new_cache.dequantize()
            else:
                k, v, new_cache = cache.update(k, v, cache_position)
            if attention_mask is None and cache_position is not None:
                # Standard causal mask over the written prefix (same
                # semantics the fused kernel applies in-kernel).
                if ring:
                    attention_mask = _ring_cache_mask(
                        cache_position, q_len, k.shape[2], window
                    )
                else:
                    attention_mask = _standard_cache_mask(
                        cache_position, q_len, k.shape[2], window=window
                    )

        k = repeat_kv(k, self.num_key_value_groups)
        v = repeat_kv(v, self.num_key_value_groups)

        orig_dtype = hidden_states.dtype
        q, k, v = self._quantize_qkv(q, k, v)

        # (b, h, q_len, kv_len)
        attn_weights = self._matmul(q, _swap_last2(k)) / self.sm_divisor
        if self.attn_softcap is not None:
            # Gemma2: soft cap BEFORE masking (HF order).
            cap = self.attn_softcap
            attn_weights = (cap * jnp.tanh(attn_weights.astype(jnp.float32) / cap)).astype(attn_weights.dtype)
        if attention_mask is not None:
            attn_weights = attn_weights + attention_mask

        attn_weights = jax.nn.softmax(attn_weights.astype(jnp.float32), axis=-1).astype(
            orig_dtype
        )
        attn_weights = self._quantize_attn_weights(attn_weights)

        attn_output = self._matmul(attn_weights, v)
        attn_output = attn_output.transpose(0, 2, 1, 3).reshape(bsz, q_len, -1)
        return self.o_proj(attn_output), new_cache


def _swap_last2(x):
    """Transpose the last two dims of an Array or MXArray."""
    return x.swapaxes(-2, -1)


def _standard_cache_mask(cache_position, q_len: int, max_len: int, window=None):
    """Additive causal mask over a static cache: query t (at position
    ``cache_position + t``) sees cache positions ``<= cache_position + t``
    (and, with a sliding ``window``, ``> cache_position + t - window``).
    ``cache_position`` may be a scalar or (b,) per-row positions; returns
    (1 or b, 1, q_len, max_len) fp32."""
    pos = jnp.asarray(cache_position, jnp.int32)
    if pos.ndim == 0:
        pos = pos[None]  # (1,)
    q_pos = pos[:, None] + jnp.arange(q_len)[None, :]  # (b, q_len)
    j = jnp.arange(max_len)
    valid = j[None, None, :] <= q_pos[:, :, None]  # (b, q_len, L)
    if window is not None:
        valid &= j[None, None, :] > q_pos[:, :, None] - window
    return jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]


def _ring_cache_mask(cache_position, q_len: int, capacity: int, window: int):
    """Additive mask over a RING cache of ``capacity`` slots: slot ``j``
    holds absolute position ``T - ((T - j) mod capacity)`` where ``T`` is
    the newest written position (``cache_position + q_len - 1``); a query at
    position ``t`` sees slots whose position ``p`` satisfies ``0 <= p <= t``
    and ``p > t - window``.  ``cache_position`` scalar or (b,); returns
    (1 or b, 1, q_len, capacity) fp32."""
    pos = jnp.asarray(cache_position, jnp.int32)
    if pos.ndim == 0:
        pos = pos[None]
    T = pos + q_len - 1  # (b,)
    q_pos = pos[:, None] + jnp.arange(q_len)[None, :]  # (b, q)
    j = jnp.arange(capacity)[None, :]
    p = T[:, None] - jnp.mod(T[:, None] - j, capacity)  # (b, R)
    p = p[:, None, :]
    qp = q_pos[:, :, None]
    valid = (p >= 0) & (p <= qp) & (p > qp - window)
    return jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]


class LlamaDecoderLayer(nnx.Module):
    # Extension points for sibling model families (e.g. Qwen2).
    attention_cls = None  # resolved below (class not yet defined here)
    mlp_cls = None

    def __init__(self, config: LlamaConfig, layer_idx: int, rngs: Optional[nnx.Rngs] = None):
        attention_cls = type(self).attention_cls or LlamaAttention
        mlp_cls = type(self).mlp_cls or LlamaMLP
        self.self_attn = attention_cls(config, layer_idx, rngs=rngs)
        self.mlp = mlp_cls(config, rngs=rngs)
        off = config.rms_norm_offset
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, offset=off)
        self.post_attention_layernorm = RMSNorm(
            config.hidden_size, config.rms_norm_eps, offset=off
        )

    def __call__(self, x, *, cos, sin, attention_mask, cache=None, cache_position=None):
        attn_out, new_cache = self.self_attn(
            self.input_layernorm(x),
            cos=cos,
            sin=sin,
            attention_mask=attention_mask,
            cache=cache,
            cache_position=cache_position,
        )
        x = x + attn_out
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Embedding(nnx.Module):
    def __init__(self, num_embeddings: int, dim: int, dtype=jnp.bfloat16, rngs=None):
        if rngs is None:
            w = jnp.zeros((num_embeddings, dim), dtype)
        else:
            w = nnx.initializers.normal(0.02)(rngs.params(), (num_embeddings, dim), dtype)
        self.weight = nnx.Param(w)

    def __call__(self, ids: Array) -> Array:
        return jnp.take(self.weight.get_value(), ids, axis=0)


class LlamaModel(nnx.Module):
    layer_cls = None  # extension point (e.g. Qwen2DecoderLayer)

    def __init__(self, config: LlamaConfig, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        layer_cls = type(self).layer_cls or LlamaDecoderLayer
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size, rngs=rngs)
        self.layers = nnx.List(
            [layer_cls(config, i, rngs=rngs) for i in range(config.num_hidden_layers)]
        )
        self.norm = RMSNorm(
            config.hidden_size, config.rms_norm_eps, offset=config.rms_norm_offset
        )
        self.inv_freq = nnx.Variable(compute_rope_inv_freq(config))
        self.rope_scale = rope_attention_scaling(config)  # static float

    def __call__(
        self,
        input_ids: Array,
        *,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        caches=None,
        cache_position: Optional[Array] = None,
    ):
        b, s = input_ids.shape
        x = self.embed_tokens(input_ids)
        if self.config.scale_embeddings:
            # Gemma: embeddings scale by sqrt(hidden); HF casts the scalar
            # to the activation dtype BEFORE multiplying (bf16 rounding is
            # part of the checkpoint contract).
            x = x * jnp.asarray(math.sqrt(self.config.hidden_size), x.dtype)
        if position_ids is None:
            position_ids = jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(self.inv_freq.get_value(), position_ids, x.dtype)
        if self.rope_scale != 1.0:
            # LongRoPE attention factor (applied to cos/sin, HF convention).
            cos = cos * jnp.asarray(self.rope_scale, cos.dtype)
            sin = sin * jnp.asarray(self.rope_scale, sin.dtype)
        # Per-layer cacheless masks: layers can mix full and sliding
        # attention (Qwen2's max_window_layers gating via layer_types), so
        # each kind gets its own dense mask; a single window value builds
        # the windowed mask once and every sliding layer shares it.
        layer_masks = None
        if attention_mask is None and caches is None:
            from ..parallel import context as _cpmod

            if _cpmod.active_cp() is None:
                built = {}

                def mask_for(w):
                    if w not in built:
                        built[w] = make_causal_mask(
                            s, s, dtype=jnp.float32, window=w
                        )[None, None]
                    return built[w]

                layer_masks = [
                    mask_for(self.config.layer_window(i))
                    for i in range(len(self.layers))
                ]
            # else: context-parallel forward — ring attention masks causally
            # in-device from global offsets; a dense (L, L) mask would defeat
            # the sharding.

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache_i = caches[i] if caches is not None else None
            x, nc = layer(
                x,
                cos=cos,
                sin=sin,
                attention_mask=(
                    layer_masks[i] if layer_masks is not None else attention_mask
                ),
                cache=cache_i,
                cache_position=cache_position,
            )
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(x), new_caches


class LlamaForCausalLM(nnx.Module):
    model_cls = None  # extension point (e.g. Qwen2Model)

    def __init__(self, config: LlamaConfig, rngs: Optional[nnx.Rngs] = None):
        self.config = config
        model_cls = type(self).model_cls or LlamaModel
        self.model = model_cls(config, rngs=rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, use_bias=False, rngs=rngs)

    def __call__(self, input_ids: Array, **kwargs):
        hidden, new_caches = self.model(input_ids, **kwargs)
        if self.lm_head is None:
            logits = hidden @ self.model.embed_tokens.weight.get_value().T
        else:
            logits = self.lm_head(hidden)
        return logits, new_caches

    def init_cache(
        self, batch: int, max_len: int, kv_cache_config=None, ring: bool = False
    ):
        """Allocate per-layer KV caches (hp, or MX-quantized if a config is
        given).  ``ring=True`` allocates rolling buffers of ``max_len`` slots
        (sliding-window models only: HBM bounded by the window, not the
        generation length); requires an MX cache config."""
        c = self.config
        if ring and kv_cache_config is None:
            raise ValueError(
                "ring caches are implemented for MX KV caches; pass a "
                "kv_cache_config (int8 is quality-free — docs/results.md)"
            )
        if kv_cache_config is None:
            return [
                LayerKVCache.create(batch, c.num_key_value_heads, max_len, c.head_dim)
                for _ in range(c.num_hidden_layers)
            ]
        return [
            MXLayerKVCache.create(
                batch,
                c.num_key_value_heads,
                max_len,
                c.head_dim,
                kv_cache_config.elem_dtype_name,
                kv_cache_config.block_size,
                ring=ring,
            )
            for _ in range(c.num_hidden_layers)
        ]


def uniform_layer_window(config) -> Optional[int]:
    """The single sliding window shared by EVERY layer, or None (full
    causal everywhere).  Raises when layers mix attention kinds (Qwen2
    ``layer_types`` gating) — callers that share one mask/graphdef across
    ALL layers cannot represent a mix (the scan and pipeline paths handle
    mixes via :func:`plan_layer_bodies` instead)."""
    windows = {
        config.layer_window(i) for i in range(config.num_hidden_layers)
    }
    if len(windows) > 1:
        raise NotImplementedError(
            f"layers mix attention kinds (windows {sorted(windows, key=str)}); "
            "this path shares one compiled layer body across all layers — "
            "run the plain per-layer model for mixed layer_types"
        )
    return windows.pop()


def plan_layer_bodies(config, max_period: int = 8):
    """Compiled-body plan for shared-body execution of models whose layers
    mix attention kinds (Gemma2 alternates sliding/full; Qwen2 gates the
    window per layer via ``max_window_layers``).

    The scan-over-layers and pipeline paths compile ONE layer body and
    sweep it over stacked per-layer params; a body's window is static
    (``layer_window(layer_idx)`` via its graphdef), so a mix needs one body
    per attention KIND, grouped so each body still sweeps many layers:

    * ``("uniform", window)`` — every layer agrees; one body.
    * ``("period", P)`` — windows repeat with period P (Gemma2: P=2): scan
      groups of P consecutive layers, body j pinned to ``layer_idx == j``.
    * ``("runs", [(start, stop), ...])`` — maximal runs of equal window
      (Qwen2 gating: a windowed prefix + full-causal suffix): one scan per
      run, body pinned to the run's first layer.
    """
    n = config.num_hidden_layers
    windows = [config.layer_window(i) for i in range(n)]
    if len(set(windows)) == 1:
        return ("uniform", windows[0])
    runs = []
    s0 = 0
    for i in range(1, n + 1):
        if i == n or windows[i] != windows[s0]:
            runs.append((s0, i))
            s0 = i
    # P == n would be a degenerate "period" (one scan step unrolling every
    # layer — no compile win); require a real sweep and prefer whichever
    # scheme compiles fewer bodies (tie -> period: one scan, no cache
    # concatenation).
    for P in range(2, min(max_period, n - 1) + 1):
        if n % P == 0 and all(w == windows[i % P] for i, w in enumerate(windows)):
            if P <= len(runs):
                return ("period", P)
            break
    return ("runs", runs)


def make_causal_mask(q_len: int, kv_len: int, dtype=jnp.float32, window=None) -> Array:
    """Additive causal mask (0 on allowed, large-negative on masked); with a
    sliding ``window``, keys more than ``window - 1`` positions behind a
    query are masked too (Mistral semantics)."""
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(kv_len)[None, :]
    q_pos = i + (kv_len - q_len)
    valid = j <= q_pos
    if window is not None:
        valid &= j > q_pos - window
    return jnp.where(valid, 0.0, jnp.finfo(dtype).min).astype(dtype)


def make_prefill_mask(q_len: int, kv_len: int, dtype=jnp.float32) -> Array:
    """Causal mask for queries at positions 0..q_len-1 over a kv_len cache."""
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(kv_len)[None, :]
    return jnp.where(j <= i, 0.0, jnp.finfo(dtype).min).astype(dtype)


def make_decode_mask(kv_len: int, valid_len: Array, dtype=jnp.float32) -> Array:
    """Additive mask over a static cache: positions >= valid_len are masked."""
    j = jnp.arange(kv_len)
    return jnp.where(j < valid_len, 0.0, jnp.finfo(dtype).min).astype(dtype)
