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
            raise NotImplementedError(
                "grouped routing on the quantized MoE block needs stacked "
                "MX expert weights; set mlp.grouped = False before "
                "quantize_llm_ (the quantized block serves dense-exact / "
                "capacity modes)"
            )
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

    def _expert_ffn_grouped(self, x_sorted, tile_expert, tm):
        raise NotImplementedError(
            "grouped routing on the quantized MoE block needs stacked MX "
            "expert weights; use the dense-exact or capacity modes, or the "
            "op-level ops/pallas_moe.grouped_matmul with w_scale"
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
