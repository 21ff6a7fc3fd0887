"""Quantize a small MLP both ways and dump its XLA graphs (analog of
reference ``examples/linear_model_atenir_graph.py``: the AtenIR dump becomes
a StableHLO + optimized-HLO dump).

Two quantization paths, mirroring the reference:

1. module surgery — ``quantize_linear_`` swaps every ``Linear`` for
   ``MXInferenceLinear`` (reference ``quant_api.py:188``);
2. functional weight transform — ``mx_dynamic_activation_mx_weights``
   wraps raw weights as ``MXArray`` (reference's torchao tensor-subclass
   path, ``quant_api.py:96``).

Run: ``python examples/linear_model_hlo_graph.py [outdir]``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
from flax import nnx

from torchmx_tpu import MXConfig, QLinearConfig, mx_linear
from torchmx_tpu.layers import Linear
from torchmx_tpu.quant_api import mx_dynamic_activation_mx_weights, quantize_linear_
from torchmx_tpu.utils import introspect


class MLP(nnx.Module):
    def __init__(self, rngs):
        self.fc1 = Linear(256, 512, rngs=rngs)
        self.fc2 = Linear(512, 256, rngs=rngs)

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x)))


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/torchmx_tpu_graphs"
    qcfg = QLinearConfig(
        weights_config=MXConfig("float6_e3m2"),
        activations_config=MXConfig("float8_e4m3"),
    )
    x = jnp.zeros((16, 256), jnp.bfloat16)

    # Path 1: module surgery.
    model = MLP(nnx.Rngs(0))
    quantize_linear_(model, qcfg)
    graphdef, state = nnx.split(model)
    fwd = lambda state, x: nnx.merge(graphdef, state)(x)
    hlo = introspect.dump_lowered(fwd, state, x, path=f"{outdir}/mlp_surgery.stablehlo")
    opt = introspect.dump_lowered(
        fwd, state, x, path=f"{outdir}/mlp_surgery_optimized.hlo", optimized=True
    )
    print(f"surgery path: {len(hlo.splitlines())} StableHLO lines, "
          f"{len(opt.splitlines())} optimized-HLO lines -> {outdir}")

    # Path 2: functional weight transform on a raw-weight pytree.
    plain = MLP(nnx.Rngs(0))
    transform = mx_dynamic_activation_mx_weights(qcfg)
    w1 = transform(plain.fc1.weight.get_value())
    w2 = transform(plain.fc2.weight.get_value())

    def fwd_fn(w1, w2, b1, b2, x):
        h = jax.nn.gelu(mx_linear(x, w1, b1))
        return mx_linear(h, w2, b2)

    hlo2 = introspect.dump_lowered(
        fwd_fn,
        w1,
        w2,
        plain.fc1.bias.get_value(),
        plain.fc2.bias.get_value(),
        x,
        path=f"{outdir}/mlp_functional.stablehlo",
    )
    print(f"functional path: {len(hlo2.splitlines())} StableHLO lines")
    print("OK")
