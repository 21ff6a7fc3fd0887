"""Generate frozen golden vectors from the torch reference implementation.

Runs the reference's numerics core (rain-neuromorphics/torchmx
``mx_quantization_utils.py``) directly from ``/root/reference`` and freezes
its outputs into ``tests/goldens/reference_goldens.npz`` so the JAX
implementation is cross-checked against *actually executed* reference code,
not just reimplemented constants:

* per-format quantizer goldens — E8M0 scale bytes, element code bytes and
  dequantized bf16 bit patterns for a fixed seeded input, through the
  hardware-exact quantizer (the simulated path needs torchao's casts, which
  are not installed; the two are proven bit-identical by the reference's own
  tests and by ours);
* an attention-stack golden — a miniature eager attention computed in torch
  with MX quantization at exactly the reference's seam points
  (``mx_llama_attention.py:195-243``): Q/K (head_dim-blocked), V
  (kv-len-blocked via the transpose trick), post-softmax attention weights,
  all through the reference quantizer.

The reference package itself cannot be imported wholesale (its tensor
subclass needs torchao at the pinned version); the numerics module only
needs torchao for the simulated element casts, so a stub module satisfies
the import and the hardware-exact path runs genuine reference code.

Run manually when regenerating goldens (requires /root/reference):

    python tools/gen_reference_goldens.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/torchmx")
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def _load_reference_numerics():
    """Import the reference numerics module without executing the package
    __init__ (which needs torchao's tensor base class)."""

    def _missing(*a, **k):
        raise RuntimeError("simulated-path cast stub called — goldens use hw-exact")

    custom_cast = types.ModuleType("torchao.prototype.mx_formats.custom_cast")
    custom_cast.f32_to_f4_unpacked = _missing
    custom_cast.f32_to_f6_e2m3_unpacked = _missing
    custom_cast.f32_to_f6_e3m2_unpacked = _missing
    torchao = types.ModuleType("torchao")
    prototype = types.ModuleType("torchao.prototype")
    mx_formats = types.ModuleType("torchao.prototype.mx_formats")
    sys.modules.setdefault("torchao", torchao)
    sys.modules.setdefault("torchao.prototype", prototype)
    sys.modules.setdefault("torchao.prototype.mx_formats", mx_formats)
    sys.modules["torchao.prototype.mx_formats.custom_cast"] = custom_cast

    pkg = types.ModuleType("torchmx")
    pkg.__path__ = [str(REF)]
    sys.modules["torchmx"] = pkg
    mods = {}
    for sub in ("env_variables", "dtypes", "utils", "mx_quantization_utils"):
        spec = importlib.util.spec_from_file_location(
            f"torchmx.{sub}", REF / f"{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"torchmx.{sub}"] = mod
        spec.loader.exec_module(mod)
        mods[sub] = mod
    return mods["dtypes"], mods["mx_quantization_utils"]


def ref_quantize(mxq, rdt, x_bf16: torch.Tensor, elem_name: str, block: int = 32):
    """Reference quantize + dequantize, mirroring the custom ops verbatim
    (``mx_tensor.py:60-96`` quantize path, ``:123-164`` dequantize path,
    hw-exact branch, block_dim = last)."""
    elem = {
        "float8_e4m3": rdt.float8_e4m3,
        "float6_e3m2": rdt.float6_e3m2,
        "float6_e2m3": rdt.float6_e2m3,
        "float4_e2m1": rdt.float4_e2m1,
    }[elem_name]
    orig_shape = x_bf16.shape
    blocks = x_bf16.contiguous().reshape(-1, block)
    shared = mxq.get_e8m0_shared_exponent(blocks, elem)
    codes = mxq.quantize_mx_with_e8m0_shared_exponent_hw_exact(
        blocks, elem, shared.unsqueeze(1), orig_shape
    )
    scale = shared.reshape(orig_shape[:-1] + (-1,))
    data_hp = mxq.dequantize_to_dtype(codes, elem, torch.bfloat16, -1)
    s_fp = (
        mxq.get_fp_scale(scale).to(torch.bfloat16).repeat_interleave(block, dim=-1)
    )
    return scale, codes, data_hp * s_fp


def main():
    rdt, mxq = _load_reference_numerics()
    OUT.mkdir(exist_ok=True)
    out = {}

    torch.manual_seed(7)
    x = (torch.randn(8, 64) * 3).to(torch.bfloat16)
    # Exercise specials: zeros, a huge value, tiny values.  Inf/NaN blocks
    # are INTENTIONALLY excluded: there the repo deliberately diverges from
    # the reference's self-contradictory hw-exact behavior (NaN-block
    # payloads are all-zero with scale 255 here; see
    # torchmx_tpu/mx_quantization.py module docstring).  The repo-side
    # contract for that region is pinned by
    # tests/test_reference_goldens.py::test_nan_inf_block_repo_contract.
    x[0, :4] = 0.0
    x[1, 0] = 300.0
    x[2, :8] = torch.tensor([2.0**-120] * 8).to(torch.bfloat16)
    out["x_bits"] = x.view(torch.uint16).numpy()

    for ename in ("float8_e4m3", "float6_e3m2", "float6_e2m3", "float4_e2m1"):
        scale, codes, deq = ref_quantize(mxq, rdt, x, ename)
        out[f"{ename}_scale"] = scale.numpy()
        out[f"{ename}_codes"] = codes.numpy()
        out[f"{ename}_deq_bits"] = deq.view(torch.uint16).numpy()

    # --- attention-stack golden (reference seams, hw-exact numerics) -------
    torch.manual_seed(11)
    B, S, H, D, HID = 1, 32, 2, 64, 128
    hidden = (torch.randn(B, S, HID) * 0.5).to(torch.bfloat16)
    wq = (torch.randn(H * D, HID) * 0.08).to(torch.bfloat16)
    wk = (torch.randn(H * D, HID) * 0.08).to(torch.bfloat16)
    wv = (torch.randn(H * D, HID) * 0.08).to(torch.bfloat16)
    wo = (torch.randn(HID, H * D) * 0.08).to(torch.bfloat16)

    def fq(t, ename, block=32):
        """quantize -> dequantize on the last dim (what each MXTensor op
        sees after ``to_dtype``, ``ops.py:60-68``)."""
        shape = t.shape
        _, _, deq = ref_quantize(
            mxq, rdt, t.contiguous().reshape(-1, shape[-1]), ename, block
        )
        return deq.reshape(shape)

    # Projections: weight pre-quantized, activation dynamically quantized
    # (mx_linear.py:61-95), both fp6_e3m2 weights / fp8 activations.
    def mx_linear(xt, w):
        xq = fq(xt, "float8_e4m3")
        wq_ = fq(w, "float6_e3m2")
        return (xq.to(torch.float32) @ wq_.t().to(torch.float32)).to(torch.bfloat16)

    q = mx_linear(hidden, wq).reshape(B, S, H, D).transpose(1, 2)
    k = mx_linear(hidden, wk).reshape(B, S, H, D).transpose(1, 2)
    v = mx_linear(hidden, wv).reshape(B, S, H, D).transpose(1, 2)

    # Q/K quantized along head_dim; V along kv-len via the transpose trick
    # (mx_llama_attention.py:195-213).  RoPE omitted (identity rotation) so
    # the golden isolates the quantization seams.
    q = fq(q, "float6_e3m2")
    k = fq(k, "float6_e3m2")
    v = fq(v.transpose(2, 3), "float6_e3m2").transpose(2, 3)

    scores = (q.to(torch.float32) @ k.transpose(2, 3).to(torch.float32)) / (D**0.5)
    mask = torch.triu(torch.full((S, S), float("-inf")), diagonal=1)
    probs = torch.softmax(scores + mask, dim=-1, dtype=torch.float32).to(torch.bfloat16)
    probs = fq(probs, "float6_e3m2")  # post-softmax attn-weights quantization
    ctx = (probs.to(torch.float32) @ v.to(torch.float32)).to(torch.bfloat16)
    ctx = ctx.transpose(1, 2).reshape(B, S, H * D)
    attn_out = mx_linear(ctx, wo)

    out["attn_hidden_bits"] = hidden.view(torch.uint16).numpy()
    for name, w in (("wq", wq), ("wk", wk), ("wv", wv), ("wo", wo)):
        out[f"attn_{name}_bits"] = w.view(torch.uint16).numpy()
    out["attn_out_f32"] = attn_out.to(torch.float32).numpy()

    np.savez(OUT / "reference_goldens.npz", **out)
    print(f"wrote {OUT / 'reference_goldens.npz'}:", sorted(out))


if __name__ == "__main__":
    main()
