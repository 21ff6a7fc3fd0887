"""MX-quantized Mixtral sparse-MoE block.

Per-expert gate/up/down projections become ``MXInferenceLinear``s (every
expert GEMM runs the fused dequant-matmul kernels with dynamic activation
quantization); the ROUTER stays high-precision — it is (H, E)-tiny and its
top-k decisions are the one place a quantization bin-flip changes *which*
weights run, so hp routing is the standard practice this block follows.

Routing semantics and the dispatch/combine math are inherited from the
plain block (``models/mixtral.MixtralSparseMoeBlock``); this class only
overrides the router and expert-FFN seams, mirroring how the MX attention
families override their projection seams.  A TPU-build extension — the
reference has no MoE code (SURVEY §2.3: EP "n/a").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import QLinearConfig
from ..models.mixtral import MixtralSparseMoeBlock
from .linear import MXInferenceLinear


class _RouterAlias:
    """Bare name adapter (not a module): exposes the router param as
    ``.weight`` for the HF-named import walker."""

    def __init__(self, weight):
        self.weight = weight


class MXInferenceMixtralMoeBlock(MixtralSparseMoeBlock):
    def __init__(
        self,
        config,
        gate_weight,
        experts_w1,
        experts_w3,
        experts_w2,
        qconfig: QLinearConfig,
        capacity_factor=None,
    ):
        # No super().__init__: the stacked hp params are replaced wholesale
        # by the per-expert quantized linears.
        self.config = config
        self.qconfig = qconfig
        self.capacity_factor = capacity_factor
        # The dropless grouped GEMM path needs stacked weights; this block
        # holds per-expert quantized linears, so it serves the dense-exact
        # and capacity routing modes (grouped MX kernels exist at the op
        # level — ops/pallas_moe.grouped_matmul with w_scale — and stacked
        # MX expert storage is the integration point when needed).
        self.grouped = False
        self.grouped_tm = 128
        # Router stays hp: raw weight param (torch layout (E, H)), applied
        # manually — not a Linear child, so the leftover quantize_linear_
        # pass cannot touch it.
        self.gate_weight = nnx.Param(gate_weight)
        self.experts_w1 = nnx.List(experts_w1)
        self.experts_w3 = nnx.List(experts_w3)
        self.experts_w2 = nnx.List(experts_w2)

    @classmethod
    def from_float(
        cls, mod: MixtralSparseMoeBlock, qconfig: QLinearConfig
    ) -> "MXInferenceMixtralMoeBlock":
        assert isinstance(mod, MixtralSparseMoeBlock), (
            f"mod must be a MixtralSparseMoeBlock, got {type(mod)}"
        )
        if getattr(mod, "grouped", False):
            # Grouped routing quantizes to STACKED MX codes so the dropless
            # kernel decodes them in VMEM (and, at decode sizes, reads only
            # the routed experts' weights).
            return MXInferenceMixtralMoeBlockGrouped.from_float(mod, qconfig)
        e = mod.config.num_local_experts
        # The plain block stores K-major (E, in, out); from_weights wants
        # torch layout (out, in).
        w1 = mod.w1.get_value()
        w3 = mod.w3.get_value()
        w2 = mod.w2.get_value()
        mk = lambda w: [
            MXInferenceLinear.from_weights(w[i].T, None, qconfig) for i in range(e)
        ]
        return cls(
            mod.config,
            mod.gate.weight.get_value(),
            mk(w1),
            mk(w3),
            mk(w2),
            qconfig,
            capacity_factor=mod.capacity_factor,
        )

    @property
    def gate(self):
        """Checkpoint-name alias: import resolves ``...block_sparse_moe.
        gate.weight`` onto the hp router param."""
        return _RouterAlias(self.gate_weight)

    def import_weight(self, leaf: str, value) -> bool:
        """Streaming-load hook: quantize incoming stacked hp expert weights
        per expert on the fly (the hp stack is never kept)."""
        lists = {
            "w1": self.experts_w1,
            "w3": self.experts_w3,
            "w2": self.experts_w2,
        }
        if leaf not in lists:
            return False
        target = lists[leaf]
        for i in range(self.config.num_local_experts):
            q = MXInferenceLinear.from_weights(
                jnp.asarray(value[i], jnp.bfloat16), None, self.qconfig
            )
            target[i].weight.set_value(q.weight.get_value())
        return True

    # -- overridden seams ----------------------------------------------------
    def _router_logits(self, x_t):
        return x_t @ self.gate_weight.get_value().T

    def _expert_ffn_grouped(self, x_sorted, tile_expert, tile_rows, tm):
        raise NotImplementedError(
            "this block serves the dense-exact / capacity modes; grouped "
            "routing quantizes into MXInferenceMixtralMoeBlockGrouped "
            "(set mlp.grouped = True BEFORE quantize_llm_)"
        )

    def _expert_ffn_all(self, x_t):
        outs = []
        for i in range(self.config.num_local_experts):
            h1 = self.experts_w1[i](x_t).astype(jnp.float32)
            h3 = self.experts_w3[i](x_t).astype(jnp.float32)
            act = (jax.nn.silu(h1) * h3).astype(x_t.dtype)
            outs.append(self.experts_w2[i](act))
        return jnp.stack(outs, axis=0)  # (E, T, H)

    def _expert_ffn_batched(self, xe):
        outs = []
        for i in range(self.config.num_local_experts):
            h1 = self.experts_w1[i](xe[i]).astype(jnp.float32)
            h3 = self.experts_w3[i](xe[i]).astype(jnp.float32)
            act = (jax.nn.silu(h1) * h3).astype(xe.dtype)
            outs.append(self.experts_w2[i](act))
        return jnp.stack(outs, axis=0)  # (E, C, H)


class MXInferenceMixtralMoeBlockGrouped(MixtralSparseMoeBlock):
    """Grouped-routing quantized MoE block: STACKED MX expert weights.

    Expert weights live as stacked one-byte MX codes ``(E, K, N)`` + E8M0
    scales ``(E, K/32, N)`` — exactly the layout the dropless grouped GEMM
    kernel consumes (``ops/pallas_moe.grouped_matmul``), which decodes them
    in VMEM with the same integer bit-surgery the dense fused matmul uses.
    Because dead trailing tiles skip their weight DMA, a decode step reads
    ONLY the routed experts' packed weights (k/E of the MoE bytes — the MoE
    bandwidth win quantization exists to multiply).

    Dynamic activation quantization applies the standard per-token MX
    fake-quantize on the kernel inputs (bit-identical to the in-prologue
    quantization of the fused linear kernels — exhaustively tested); the
    router stays high-precision like the per-expert block.  fp8/fp6/int8
    codes store natively; fp4 and fp6_e2m3 quantize on THEIR grid then
    re-code EXACTLY into the int8 domain (bit-equal dequantization, one
    byte per code — the dense turbo path's trick), so every weight format
    serves through the grouped kernel.
    """

    def __init__(self, config, gate_weight, codes, scales, qconfig: QLinearConfig,
                 kernel_elem: str):
        self.config = config
        self.qconfig = qconfig
        self.capacity_factor = None
        self.grouped = True
        self.grouped_tm = 128
        # The element format the KERNEL decodes: equals the qconfig weight
        # format for one-byte formats; fp4/fp6_e2m3 re-code EXACTLY into the
        # int8 domain (same values, 1 byte/code — the dense turbo path's
        # trick, ``MXArray.to_int8_domain``).
        self.kernel_elem = kernel_elem
        self.gate_weight = nnx.Param(gate_weight)
        # codes/scales: dicts proj -> stacked arrays.
        self.w1_codes = nnx.Param(codes["w1"])
        self.w1_scale = nnx.Param(scales["w1"])
        self.w3_codes = nnx.Param(codes["w3"])
        self.w3_scale = nnx.Param(scales["w3"])
        self.w2_codes = nnx.Param(codes["w2"])
        self.w2_scale = nnx.Param(scales["w2"])

    _SUPPORTED = ("float8_e4m3", "float6_e3m2", "float6_e2m3", "float4_e2m1", "int8")
    _INT8_DOMAIN = ("float4_e2m1", "float6_e2m3")

    @classmethod
    def _quantize_stacked(cls, w_km, elem_name):
        """(E, K, N) bf16 -> codes (E, K, N), scales (E, K/32, N), blocked
        along K (the contraction dim, the linear kernels' grid).  fp4 /
        fp6_e2m3 quantize on THEIR grid then re-code exactly into int8
        (bit-equal dequantization; quality = the requested format)."""
        from ..mx_array import MXArray, quantize_mx

        if elem_name in cls._INT8_DOMAIN:
            arr = MXArray.to_mx(
                jnp.asarray(w_km, jnp.bfloat16).swapaxes(1, 2), elem_name, 32
            ).to_int8_domain()
            return arr.data.swapaxes(1, 2), arr.scale_e8m0.swapaxes(1, 2)
        s, q = quantize_mx(w_km.swapaxes(1, 2), elem_name, 32)
        return q.swapaxes(1, 2), s.swapaxes(1, 2)

    @classmethod
    def from_float(
        cls, mod: MixtralSparseMoeBlock, qconfig: QLinearConfig
    ) -> "MXInferenceMixtralMoeBlockGrouped":
        elem = qconfig.weights_config.elem_dtype_name
        if elem not in cls._SUPPORTED:
            raise NotImplementedError(
                f"grouped MX MoE supports weight formats {cls._SUPPORTED}; "
                f"got {elem}"
            )
        assert qconfig.weights_config.block_size == 32
        kernel_elem = "int8" if elem in cls._INT8_DOMAIN else elem
        codes, scales = {}, {}
        for name in ("w1", "w3", "w2"):
            q, s = cls._quantize_stacked(getattr(mod, name).get_value(), elem)
            codes[name], scales[name] = q, s
        return cls(
            mod.config, mod.gate.weight.get_value(), codes, scales, qconfig,
            kernel_elem,
        )

    @property
    def gate(self):
        return _RouterAlias(self.gate_weight)

    def import_weight(self, leaf: str, value) -> bool:
        """Streaming-load hook: stacked hp (E, out, in) checkpoint weights
        quantize straight into the stacked codes (never kept hp)."""
        if leaf not in ("w1", "w2", "w3"):
            return False
        elem = self.qconfig.weights_config.elem_dtype_name
        km = jnp.asarray(value, jnp.bfloat16).swapaxes(1, 2)  # (E, K, N)
        q, s = self._quantize_stacked(km, elem)
        getattr(self, f"{leaf}_codes").set_value(q)
        getattr(self, f"{leaf}_scale").set_value(s)
        return True

    def _router_logits(self, x_t):
        return x_t @ self.gate_weight.get_value().T

    def _act_fq(self, x):
        a_cfg = self.qconfig.activations_config
        if a_cfg is None:
            return x
        from ..ops import mx_fake_quantize

        return mx_fake_quantize(x, a_cfg.elem_dtype, a_cfg.block_size)

    def _expert_ffn_grouped(self, x_sorted, tile_expert, tile_rows, tm):
        from ..models.mixtral import _gemm_tile
        from ..ops.pallas_moe import grouped_matmul

        elem = self.kernel_elem
        w1c = self.w1_codes.get_value()
        h, i = w1c.shape[1], w1c.shape[2]
        bn1, bk1 = _gemm_tile(i), _gemm_tile(h)
        xq = self._act_fq(x_sorted)
        h1 = grouped_matmul(
            xq, w1c, tile_expert, tile_rows, tm=tm, bn=bn1, bk=bk1,
            w_scale=self.w1_scale.get_value(), elem_name=elem,
        )
        h3 = grouped_matmul(
            xq, self.w3_codes.get_value(), tile_expert, tile_rows,
            tm=tm, bn=bn1, bk=bk1,
            w_scale=self.w3_scale.get_value(), elem_name=elem,
        )
        act = (jax.nn.silu(h1.astype(jnp.float32)) * h3.astype(jnp.float32)).astype(
            x_sorted.dtype
        )
        return grouped_matmul(
            self._act_fq(act), self.w2_codes.get_value(), tile_expert, tile_rows,
            tm=tm, bn=bk1, bk=bn1,
            w_scale=self.w2_scale.get_value(), elem_name=elem,
        )

    def _expert_ffn_all(self, x_t):
        raise NotImplementedError(
            "this block is grouped-only (stacked MX codes); use the "
            "per-expert MXInferenceMixtralMoeBlock for dense/capacity modes"
        )

    _expert_ffn_batched = _expert_ffn_all
