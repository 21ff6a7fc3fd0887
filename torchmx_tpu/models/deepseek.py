"""DeepSeek-V3 model family: Multi-head Latent Attention (MLA) + noaux-tc
sigmoid-routed MoE with shared experts.

A TPU-build extension — the reference ships Llama/Qwen2 only
(rain-neuromorphics/torchmx ``torchmx/quant_api.py:150-158``), and its
KV-cache TODO (``mx_llama_attention.py:180``) is exactly where MLA shines:
the cache holds one **compressed latent** per token (``kv_lora_rank`` +
``qk_rope_head_dim`` values ≈ 576 vs 128·2·n_heads for MHA), and this
implementation MX-quantizes that latent on top (:class:`MXMLACache`) for a
further 2-4× — the serving-bandwidth story the whole framework exists for.

TPU-first design decisions:

* **Two attention forms, one module.** Cacheless forwards (prefill/scoring
  parity with the HF reference) run the *expanded* form: ``kv_b_proj``
  reconstructs per-head K/V and eager attention proceeds exactly like HF
  ``DeepseekV3Attention.forward``.  Cached decode runs the **absorbed**
  form: ``kv_b_proj``'s K-half folds into the query (one einsum) and its
  V-half folds into the output, so attention contracts directly against the
  latent cache — MQA over ``kv_lora_rank + qk_rope_head_dim`` dims, no
  per-head K/V ever materialized, cache reads stay at the compressed width.
  The two forms are algebraically identical (tested).
* **Latent cache as a registered pytree** (like ``MXLayerKVCache``): static
  shapes, ``lax.dynamic_update_slice`` writes at scalar or per-row (b,)
  positions, jit/shard/checkpoint natively.
* **MoE through the Mixtral seams.** Routing differs (sigmoid scores,
  group-limited top-k with a choice-only correction bias, weights NOT
  renormalized over groups, times ``routed_scaling_factor``) but the expert
  compute is the same stacked-(E, ...) SwiGLU — so :class:`DeepseekV3MoE`
  overrides only the ``_route_raw`` seam of ``MixtralSparseMoeBlock`` and
  inherits the dense-exact / capacity / dropless-grouped paths plus
  expert-parallel sharding.  Shared experts are a plain dense MLP added to
  the routed output (HF ``DeepseekV3MoE.forward``).

HF reference: transformers ``modeling_deepseek_v3.py`` (DeepseekV3Attention,
DeepseekV3TopkRouter, DeepseekV3MoE); parity-tested in
``tests/test_deepseek.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..layers.linear import Linear
from .llama import (
    LlamaConfig,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    RMSNorm,
    _standard_cache_mask,
    apply_rotary_pos_emb,
    make_causal_mask,
)
from .mixtral import MixtralSparseMoeBlock

Array = jax.Array


@dataclasses.dataclass
class DeepseekV3Config(LlamaConfig):
    """DeepSeek-V3 hyperparameters (subset of HF ``DeepseekV3Config``).

    ``head_dim`` is forced to ``qk_rope_head_dim`` so the shared rotary
    tables (``LlamaModel.inv_freq``) come out at the rotary width — MLA
    applies RoPE only to the decoupled rope slice.
    """

    # MLA geometry.
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    rope_interleave: bool = True
    # MoE.
    n_routed_experts: int = 8
    n_shared_experts: int = 1
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 256
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    first_k_dense_replace: int = 0
    # Alias for the shared MoE machinery (``MixtralSparseMoeBlock`` and the
    # expert-stacking checkpoint importer key off this name); set in
    # ``__post_init__``.
    num_local_experts: int = 0

    def __post_init__(self):
        self.head_dim = self.qk_rope_head_dim
        self.num_local_experts = self.n_routed_experts

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @classmethod
    def from_hf(cls, hf_config: Any) -> "DeepseekV3Config":
        get = (lambda k, d=None: hf_config.get(k, d)) if isinstance(hf_config, dict) else (
            lambda k, d=None: getattr(hf_config, k, d)
        )
        base = LlamaConfig.from_hf(hf_config)
        kw = dataclasses.asdict(base)
        kw.pop("head_dim", None)  # forced to qk_rope_head_dim
        kw.pop("attention_qkv_bias", None)
        return cls(
            q_lora_rank=get("q_lora_rank"),
            kv_lora_rank=get("kv_lora_rank", 512),
            qk_rope_head_dim=get("qk_rope_head_dim", 64),
            qk_nope_head_dim=get("qk_nope_head_dim", 128),
            v_head_dim=get("v_head_dim", 128),
            rope_interleave=bool(get("rope_interleave", True)),
            n_routed_experts=get("n_routed_experts", 8),
            n_shared_experts=get("n_shared_experts", 1),
            num_experts_per_tok=get("num_experts_per_tok", 2),
            moe_intermediate_size=get("moe_intermediate_size", 256),
            n_group=get("n_group", 1) or 1,
            topk_group=get("topk_group", 1) or 1,
            norm_topk_prob=bool(get("norm_topk_prob", True)),
            routed_scaling_factor=float(get("routed_scaling_factor", 1.0)),
            first_k_dense_replace=get("first_k_dense_replace", 0),
            **{k: v for k, v in kw.items() if k != "head_dim"},
        )


# ---------------------------------------------------------------------------
# Latent KV caches
# ---------------------------------------------------------------------------


def _lat_scatter(buf: Array, new: Array, pos) -> Array:
    """Write ``new`` (b, s, x) into ``buf`` (b, L, x) at sequence position
    ``pos`` (scalar or per-row (b,))."""
    new = new.astype(buf.dtype)
    if jnp.ndim(pos) == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, pos, 0))
    return jax.vmap(
        lambda b, n, p: jax.lax.dynamic_update_slice(b, n, (p, 0))
    )(buf, new, jnp.asarray(pos, jnp.int32))


def _lat_scatter_last(buf: Array, new: Array, pos) -> Array:
    """Write ``new`` (b, x, s) into ``buf`` (b, x, L) at sequence position
    ``pos`` on the LAST dim (the d-major orientation)."""
    new = new.astype(buf.dtype)
    if jnp.ndim(pos) == 0:
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, pos))
    return jax.vmap(
        lambda b, n, p: jax.lax.dynamic_update_slice(b, n, (0, p))
    )(buf, new, jnp.asarray(pos, jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLACache:
    """High-precision per-layer MLA cache: the compressed latent
    (b, max_len, kv_lora_rank) + the shared rope key (b, max_len,
    qk_rope_head_dim) — already ~8× smaller than an MHA bf16 KV cache at
    DeepSeek-V3 geometry."""

    latent: Array
    k_rot: Array

    @staticmethod
    def create(batch: int, max_len: int, kv_lora_rank: int, qk_rope_head_dim: int,
               dtype=jnp.bfloat16) -> "MLACache":
        return MLACache(
            latent=jnp.zeros((batch, max_len, kv_lora_rank), dtype),
            k_rot=jnp.zeros((batch, max_len, qk_rope_head_dim), dtype),
        )

    @property
    def max_len(self) -> int:
        return self.latent.shape[1]

    def write(self, latent_new: Array, k_rot_new: Array, pos) -> "MLACache":
        return MLACache(
            latent=_lat_scatter(self.latent, latent_new, pos),
            k_rot=_lat_scatter(self.k_rot, k_rot_new, pos),
        )

    def read(self) -> Tuple[Array, Array]:
        return self.latent, self.k_rot


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MXMLACache:
    """MX-quantized MLA latent cache: codes + E8M0 scales for the latent
    (blocked along ``kv_lora_rank``) and the rope key (blocked along
    ``qk_rope_head_dim``).  int8/fp8 halve the already-compressed latent;
    fp4 (two codes/byte, **halves-packed** along each width — byte ``j``
    holds elements ``(j, j + d/2)``, the fused kernel's layout) quarters it.
    Quantize-on-write, dequantize-on-read — attention math sees exactly the
    values any later read sees (the ``MXLayerKVCache.update`` contract).

    Two storage layouts (``layout``; default follows ``TORCHMX_KV_LAYOUT``
    like the Llama cache):

    * ``"seq"`` — (b, L, x): the natural orientation; the fused MLA kernel
      broadcasts scales over lane blocks via an MXU dot.
    * ``"dmajor"`` — (b, x, L), scales (b, 1, L): feature dims on sublanes,
      positions on lanes — the layout the all-int8 MXU-dot MLA decode
      kernel consumes (raw int8 codes into the MXU, zero per-element
      decode; see ``ops/pallas_mla.py``).  d-major quantizes **per
      position** (one shared E8M0 exponent over the whole latent vector /
      rope key — block = r and dr respectively, not ``block_size``): scales
      constant along each contraction let both kernel dots run as single
      unchunked int8 MXU contractions with rank-1 rescales, which is what
      makes the quantized latent WIN on latency (~34 dB vs per-32's
      ~38 dB; both far above the 19 dB fp8 the reference's QKV configs
      apply)."""

    lat_data: Array   # seq (b, L, r) u8/i8 (fp4: r/2 halves-packed) / dmajor (b, r, L)
    lat_scale: Array  # seq (b, L, r/block) u8 / dmajor (b, 1, L) per-position
    rot_data: Array
    rot_scale: Array
    elem_dtype_name: str = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(metadata=dict(static=True))
    layout: str = dataclasses.field(default="seq", metadata=dict(static=True))

    @staticmethod
    def create(batch: int, max_len: int, kv_lora_rank: int, qk_rope_head_dim: int,
               elem_dtype_name: str = "int8", block_size: int = 32,
               layout: Optional[str] = None) -> "MXMLACache":
        from .. import dtypes as _dt
        from .. import env_variables as _env

        if layout is None:
            layout = _env.TORCHMX_KV_LAYOUT
            if elem_dtype_name == "float4_e2m1":
                # The env default must not crash fp4 latents (the int8-dot
                # dmajor kernel has no fp4 tier); explicit layout= still
                # raises below.
                layout = "seq"
        if layout not in ("seq", "dmajor"):
            raise ValueError(f"unknown MLA cache layout {layout!r}")
        elem = _dt.STR_TO_SUPPORTED_ELEM_DTYPE[elem_dtype_name]
        if kv_lora_rank % block_size or qk_rope_head_dim % block_size:
            raise ValueError(
                f"MX MLA cache needs kv_lora_rank ({kv_lora_rank}) and "
                f"qk_rope_head_dim ({qk_rope_head_dim}) divisible by "
                f"block_size ({block_size})"
            )
        pack = 2 if elem == _dt.float4_e2m1 else 1
        if pack == 2 and layout == "dmajor":
            raise ValueError(
                "fp4 MLA caches use the seq layout (the int8-dot dmajor "
                "kernel consumes raw int8 codes)"
            )
        if pack == 2 and (kv_lora_rank % 64 or qk_rope_head_dim % 64):
            raise ValueError(
                "fp4 halves packing needs widths divisible by 64, got "
                f"kv_lora_rank={kv_lora_rank} qk_rope_head_dim={qk_rope_head_dim}"
            )
        pdt = jnp.int8 if elem == _dt.int8 else jnp.uint8
        if layout == "dmajor":
            mk = lambda d: (
                jnp.zeros((batch, d, max_len), pdt),
                jnp.zeros((batch, 1, max_len), jnp.uint8),
            )
        else:
            mk = lambda d: (
                jnp.zeros((batch, max_len, d // pack), pdt),
                jnp.zeros((batch, max_len, d // block_size), jnp.uint8),
            )
        ld, ls = mk(kv_lora_rank)
        rd, rs = mk(qk_rope_head_dim)
        return MXMLACache(
            lat_data=ld, lat_scale=ls, rot_data=rd, rot_scale=rs,
            elem_dtype_name=elem_dtype_name, block_size=block_size,
            layout=layout,
        )

    @property
    def max_len(self) -> int:
        return self.lat_data.shape[2] if self.layout == "dmajor" else self.lat_data.shape[1]

    def _pack(self, codes: Array) -> Array:
        """fp4: adjacent-pair packed (quantize_mx output) -> d-halves bytes
        (byte j = elements (j, j + d/2)) — the fused kernel's layout."""
        if self.elem_dtype_name != "float4_e2m1":
            return codes
        from ..packing import unpack_uint4

        u = unpack_uint4(codes, packing_dim=-1)
        half = u.shape[-1] // 2
        return ((u[..., :half] << 4) | (u[..., half:] & 0xF)).astype(jnp.uint8)

    def _unpack(self, data: Array) -> Array:
        """Inverse of :meth:`_pack`: d-halves bytes -> adjacent-pair packed."""
        if self.elem_dtype_name != "float4_e2m1":
            return data
        from ..packing import pack_uint4

        codes = jnp.concatenate([data >> 4, data & 0xF], axis=-1)
        return pack_uint4(codes.astype(jnp.uint8), packing_dim=-1)

    def write(self, latent_new: Array, k_rot_new: Array, pos) -> "MXMLACache":
        from ..mx_array import quantize_mx

        r = latent_new.shape[-1]
        if self.layout == "dmajor":
            # Per-POSITION shared exponents (block = full width): scales
            # constant along each kernel contraction — see the class
            # docstring.  Quantize each stream over its whole width.
            ls, ld = quantize_mx(
                latent_new.astype(jnp.bfloat16), self.elem_dtype_name, r
            )
            rs, rd = quantize_mx(
                k_rot_new.astype(jnp.bfloat16), self.elem_dtype_name,
                k_rot_new.shape[-1],
            )
            sw = lambda a: a.swapaxes(1, 2)
            return dataclasses.replace(
                self,
                lat_data=_lat_scatter_last(self.lat_data, sw(ld), pos),
                lat_scale=_lat_scatter_last(self.lat_scale, sw(ls), pos),
                rot_data=_lat_scatter_last(self.rot_data, sw(rd), pos),
                rot_scale=_lat_scatter_last(self.rot_scale, sw(rs), pos),
            )
        # One fused quantize over [latent | rope-key]: block_size divides
        # both widths, so block boundaries align and the split is exact —
        # halves the quantize dispatches per written token.
        cat = jnp.concatenate(
            [latent_new.astype(jnp.bfloat16), k_rot_new.astype(jnp.bfloat16)],
            axis=-1,
        )
        s_all, d_all = quantize_mx(cat, self.elem_dtype_name, self.block_size)
        if self.elem_dtype_name == "float4_e2m1":
            # Split the PAIR-packed payload on pair boundaries (r even),
            # then halves-repack each stream against its own width.
            ld = self._pack(d_all[..., : r // 2])
            rd = self._pack(d_all[..., r // 2 :])
        else:
            ld, rd = d_all[..., :r], d_all[..., r:]
        nb = r // self.block_size
        ls, rs = s_all[..., :nb], s_all[..., nb:]
        return dataclasses.replace(
            self,
            lat_data=_lat_scatter(self.lat_data, ld, pos),
            lat_scale=_lat_scatter(self.lat_scale, ls, pos),
            rot_data=_lat_scatter(self.rot_data, rd, pos),
            rot_scale=_lat_scatter(self.rot_scale, rs, pos),
        )

    def read(self) -> Tuple[Array, Array]:
        from ..mx_array import dequantize_mx

        if self.layout == "dmajor":
            # Per-position scales: dequantize with block = full width.
            ld, ls = self.lat_data.swapaxes(1, 2), self.lat_scale.swapaxes(1, 2)
            rd, rs = self.rot_data.swapaxes(1, 2), self.rot_scale.swapaxes(1, 2)
            latent = dequantize_mx(
                ld, ls, self.elem_dtype_name, ld.shape[-1], jnp.bfloat16, 2
            )
            k_rot = dequantize_mx(
                rd, rs, self.elem_dtype_name, rd.shape[-1], jnp.bfloat16, 2
            )
            return latent, k_rot
        latent = dequantize_mx(
            self._unpack(self.lat_data), self.lat_scale, self.elem_dtype_name,
            self.block_size, jnp.bfloat16, 2,
        )
        k_rot = dequantize_mx(
            self._unpack(self.rot_data), self.rot_scale, self.elem_dtype_name,
            self.block_size, jnp.bfloat16, 2,
        )
        return latent, k_rot


# ---------------------------------------------------------------------------
# Multi-head Latent Attention
# ---------------------------------------------------------------------------


def _deinterleave(x: Array) -> Array:
    """Interleaved rope layout (x0 y0 x1 y1 ...) -> half-split (x... y...),
    matching HF ``apply_rotary_pos_emb_interleave``'s input permutation."""
    b, h, s, d = x.shape
    return x.reshape(b, h, s, d // 2, 2).swapaxes(-1, -2).reshape(b, h, s, d)


class MLAAttention(nnx.Module):
    """Multi-head Latent Attention (HF ``DeepseekV3Attention`` semantics).

    Seams the MX subclass overrides: the projection modules (swapped for
    ``MXInferenceLinear`` by ``from_float``) and :meth:`_kv_b_weight` (the
    absorbed path's einsum operand — dequantized from the MX weight there).
    """

    def __init__(self, config: DeepseekV3Config, layer_idx: int = 0,
                 rngs: Optional[nnx.Rngs] = None):
        self.config = config
        self.layer_idx = layer_idx
        h = config.hidden_size
        n = self.num_heads = config.num_attention_heads
        self.qk_nope_head_dim = config.qk_nope_head_dim
        self.qk_rope_head_dim = config.qk_rope_head_dim
        self.v_head_dim = config.v_head_dim
        self.kv_lora_rank = config.kv_lora_rank
        self.qk_head_dim = config.qk_head_dim
        bias = config.attention_bias
        if config.q_lora_rank:
            self.q_a_proj = Linear(h, config.q_lora_rank, use_bias=bias, rngs=rngs)
            self.q_a_layernorm = RMSNorm(config.q_lora_rank, config.rms_norm_eps)
            self.q_b_proj = Linear(
                config.q_lora_rank, n * self.qk_head_dim, use_bias=False, rngs=rngs
            )
        else:
            self.q_proj = Linear(h, n * self.qk_head_dim, use_bias=False, rngs=rngs)
        self.kv_a_proj_with_mqa = Linear(
            h, self.kv_lora_rank + self.qk_rope_head_dim, use_bias=bias, rngs=rngs
        )
        self.kv_a_layernorm = RMSNorm(self.kv_lora_rank, config.rms_norm_eps)
        self.kv_b_proj = Linear(
            self.kv_lora_rank,
            n * (self.qk_nope_head_dim + self.v_head_dim),
            use_bias=False,
            rngs=rngs,
        )
        self.o_proj = Linear(n * self.v_head_dim, h, use_bias=bias, rngs=rngs)
        # HF: 1/sqrt(qk_head_dim), times yarn mscale^2 when mscale_all_dim
        # is set (DeepSeek long-context convention).
        self.scaling = self.qk_head_dim ** -0.5
        rs = config.rope_scaling
        if rs and rs.get("rope_type", rs.get("type")) == "yarn":
            msad = rs.get("mscale_all_dim", 0)
            if msad:
                f = rs["factor"]
                mscale = 1.0 if f <= 1 else 0.1 * msad * math.log(f) + 1.0
                self.scaling = self.scaling * mscale * mscale

    # -- seams -----------------------------------------------------------
    def _project_q(self, x: Array) -> Array:
        if self.config.q_lora_rank:
            return self.q_b_proj(self.q_a_layernorm(self.q_a_proj(x)))
        return self.q_proj(x)

    def _kv_b_weight(self) -> Array:
        """``kv_b_proj`` weight, torch layout (n*(dn+dv), r) bf16 — the
        absorbed path contracts it directly."""
        return self.kv_b_proj.weight.get_value()

    def _einsum(self, spec, a, b):
        if jax.default_backend() == "cpu":
            # The CPU dot thunk rejects some bf16xbf16->f32 contractions
            # ("Unsupported element type for DotThunk"); upcast there.  TPU
            # takes the mixed-precision MXU form.
            return jnp.einsum(
                spec, a.astype(jnp.float32), b.astype(jnp.float32)
            )
        return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)

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
        b, s, _ = hidden_states.shape
        n, dn, dr = self.num_heads, self.qk_nope_head_dim, self.qk_rope_head_dim

        q = self._project_q(hidden_states)
        q = q.reshape(b, s, n, self.qk_head_dim).transpose(0, 2, 1, 3)
        q_pass, q_rot = q[..., :dn], q[..., dn:]

        ckv = self.kv_a_proj_with_mqa(hidden_states)
        latent = self.kv_a_layernorm(ckv[..., : self.kv_lora_rank])  # (b, s, r)
        k_rot = ckv[..., self.kv_lora_rank :].reshape(b, 1, s, dr)

        if self.config.rope_interleave:
            # Trained checkpoints store rope weights interleaved; permute to
            # the half-split layout the shared rotate_half rope expects
            # (HF ``apply_rotary_pos_emb_interleave``).
            q_rot, k_rot = _deinterleave(q_rot), _deinterleave(k_rot)
        q_rot, k_rot = apply_rotary_pos_emb(q_rot, k_rot, cos, sin)

        if cache is not None:
            new_cache = cache.write(latent, k_rot[:, 0], cache_position)
            # Absorbed MQA over the latent: W_kb's K-half folds into the
            # query, its V-half folds into the output — per-head K/V never
            # materialize and the cache is contracted at compressed width.
            wkb = self._kv_b_weight().reshape(n, dn + self.v_head_dim, self.kv_lora_rank)
            wk, wv = wkb[:, :dn, :], wkb[:, dn:, :]  # (n, dn, r) / (n, dv, r)
            q_lat = self._einsum("bhsd,hdr->bhsr", q_pass, wk).astype(q_pass.dtype)
            out_lat = None
            if attention_mask is None and cache_position is not None:
                # Fused blockwise kernel: decodes packed latent tiles in
                # VMEM and reuses each decoded tile for BOTH dots (it is K
                # and V) — no full-cache dequantize, no (b, n, s, L) scores
                # in HBM (``ops/pallas_mla.py``).
                from ..ops.pallas_mla import mla_cached_attention

                q_off = jnp.asarray(cache_position, jnp.int32)
                fused = mla_cached_attention(
                    q_lat, q_rot, new_cache, q_off, q_off + s, self.scaling
                )
                if fused is not None:
                    out_lat = fused.astype(hidden_states.dtype)
            if out_lat is None:
                lat_full, rot_full = new_cache.read()  # (b, L, r) / (b, L, dr)
                L = lat_full.shape[1]
                if attention_mask is None and cache_position is not None:
                    attention_mask = _standard_cache_mask(cache_position, s, L)
                scores = self._einsum("bhsr,blr->bhsl", q_lat, lat_full)
                scores = scores + self._einsum("bhsd,bld->bhsl", q_rot, rot_full)
                scores = scores * self.scaling
                if attention_mask is not None:
                    scores = scores + attention_mask
                p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
                    hidden_states.dtype
                )
                out_lat = self._einsum("bhsl,blr->bhsr", p, lat_full).astype(p.dtype)
            out = self._einsum("bhsr,hdr->bhsd", out_lat, wv).astype(out_lat.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, n * self.v_head_dim)
            return self.o_proj(out), new_cache

        if attention_mask is None:
            from ..parallel import context as _cpmod

            cp = _cpmod.active_cp()
            if cp is None:
                attention_mask = make_causal_mask(s, s, jnp.float32)[None, None]

        # Expanded form (HF parity): reconstruct per-head K/V from the
        # latent and run eager attention.
        kv = self.kv_b_proj(latent).reshape(
            b, s, n, dn + self.v_head_dim
        ).transpose(0, 2, 1, 3)
        k_pass, v = kv[..., :dn], kv[..., dn:]
        qq = jnp.concatenate([q_pass, q_rot], axis=-1)
        kk = jnp.concatenate(
            [k_pass, jnp.broadcast_to(k_rot, (b, n, s, dr))], axis=-1
        )
        if attention_mask is None and cp is not None:
            # Context-parallel prefill/scoring (round 4): per-head K/V are
            # reconstructed from each device's LOCAL latent shard anyway in
            # the expanded form, so the standard ring rotates them like any
            # MHA — the sequence stays sharded and no (L, L) mask exists.
            # (The absorbed/compressed-latent ring — rotating the r+dr
            # latent instead — is a bandwidth optimization left open; this
            # path is numerics-identical to the dense expanded form.)
            mesh, axis_name, cp_layout = cp
            out = _cpmod.ring_attention(
                qq.astype(jnp.bfloat16), kk.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), mesh, axis=axis_name,
                sm_scale=self.scaling, layout=cp_layout,
            )
            out = out[..., : self.v_head_dim]
            out = out.transpose(0, 2, 1, 3).reshape(b, s, n * self.v_head_dim)
            return self.o_proj(out), None
        scores = self._einsum("bhsd,bhld->bhsl", qq, kk) * self.scaling
        scores = scores + attention_mask
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            hidden_states.dtype
        )
        out = self._einsum("bhsl,bhld->bhsd", p, v).astype(p.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, n * self.v_head_dim)
        return self.o_proj(out), None


# ---------------------------------------------------------------------------
# MoE with the DeepSeek-V3 router
# ---------------------------------------------------------------------------


class DeepseekV3MoE(MixtralSparseMoeBlock):
    """Routed experts through the Mixtral stacked-weight machinery (dense
    exact / capacity / dropless-grouped paths, EP sharding) with the
    DeepSeek-V3 **noaux-tc router** (HF ``DeepseekV3TopkRouter``): sigmoid
    scores; a per-expert *correction bias* added for expert CHOICE only
    (weights come from the raw scores); group-limited top-k; optional
    renormalization; times ``routed_scaling_factor``.  Shared experts (a
    dense SwiGLU of ``n_shared_experts * moe_intermediate_size``) add to the
    routed output."""

    def __init__(self, config: DeepseekV3Config, rngs: Optional[nnx.Rngs] = None):
        moe_view = dataclasses.replace(
            config, intermediate_size=config.moe_intermediate_size
        )
        super().__init__(moe_view, rngs=rngs)
        # Router correction bias (HF buffer ``gate.e_score_correction_bias``)
        # lives on the gate module so checkpoint names resolve; fp32 like the
        # routing math.
        self.gate.e_score_correction_bias = nnx.Variable(
            jnp.zeros((config.n_routed_experts,), jnp.float32)
        )
        self.shared_experts = LlamaMLP(
            dataclasses.replace(
                config,
                intermediate_size=config.moe_intermediate_size
                * config.n_shared_experts,
            ),
            rngs=rngs,
        )

    def _route_raw(self, x_t: Array):
        cfg = self.config
        w = self.gate.weight.get_value().astype(jnp.float32)  # (E, H)
        scores = jax.nn.sigmoid(x_t.astype(jnp.float32) @ w.T)  # (T, E)
        bias = self.gate.e_score_correction_bias.get_value().astype(jnp.float32)
        choice = scores + bias[None, :]
        T, E = choice.shape
        G = cfg.n_group
        if G > 1:
            # Group-limited routing: rank groups by the sum of their top-2
            # choice scores, keep topk_group groups, mask the rest to 0.
            sub = E // G
            g_scores = jax.lax.top_k(choice.reshape(T, G, sub), min(2, sub))[0].sum(-1)
            _, g_idx = jax.lax.top_k(g_scores, cfg.topk_group)  # (T, topk_group)
            g_mask = jnp.zeros((T, G), bool).at[
                jnp.arange(T)[:, None], g_idx
            ].set(True)
            choice = jnp.where(jnp.repeat(g_mask, sub, axis=1), choice, 0.0)
        _, top_idx = jax.lax.top_k(choice, cfg.num_experts_per_tok)
        top_w = jnp.take_along_axis(scores, top_idx, axis=1)
        if cfg.norm_topk_prob:
            top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
        top_w = top_w * cfg.routed_scaling_factor
        return top_w, top_idx.astype(jnp.int32)

    def __call__(self, x: Array) -> Array:
        routed = super().__call__(x)
        return routed + self.shared_experts(x)


# ---------------------------------------------------------------------------
# Decoder / model / LM head
# ---------------------------------------------------------------------------


class DeepseekV3DecoderLayer(LlamaDecoderLayer):
    """Dense MLP for the first ``first_k_dense_replace`` layers, MoE after
    (HF ``DeepseekV3DecoderLayer.__init__``)."""

    attention_cls = MLAAttention

    def __init__(self, config: DeepseekV3Config, layer_idx: int,
                 rngs: Optional[nnx.Rngs] = None):
        self.self_attn = MLAAttention(config, layer_idx, rngs=rngs)
        if layer_idx >= config.first_k_dense_replace:
            self.mlp = DeepseekV3MoE(config, rngs=rngs)
        else:
            self.mlp = LlamaMLP(config, rngs=rngs)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(
            config.hidden_size, config.rms_norm_eps
        )


class DeepseekV3Model(LlamaModel):
    layer_cls = DeepseekV3DecoderLayer


class DeepseekV3ForCausalLM(LlamaForCausalLM):
    model_cls = DeepseekV3Model

    def init_cache(self, batch: int, max_len: int, kv_cache_config=None,
                   ring: bool = False):
        """Per-layer **latent** caches (see :class:`MLACache`); an
        ``MXConfig`` quantizes the latent+rope-key streams."""
        if ring:
            raise NotImplementedError(
                "ring caches apply to sliding-window models; DeepSeek-V3 "
                "attends full-causal"
            )
        c = self.config
        if kv_cache_config is None:
            return [
                MLACache.create(batch, max_len, c.kv_lora_rank, c.qk_rope_head_dim)
                for _ in range(c.num_hidden_layers)
            ]
        return [
            MXMLACache.create(
                batch, max_len, c.kv_lora_rank, c.qk_rope_head_dim,
                kv_cache_config.elem_dtype_name, kv_cache_config.block_size,
            )
            for _ in range(c.num_hidden_layers)
        ]
