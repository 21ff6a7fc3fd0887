"""Process-level environment flags, read once at import time.

Mirrors the reference two-tier config system (rain-neuromorphics/torchmx
``torchmx/env_variables.py:1-16``): typed dataclass configs are the user-facing
quantization config (see ``config.py``); these env flags toggle implementation
details at the op level.

Flags (all compared as strings, as in the reference):

* ``TORCHMX_LOG_LEVEL``   – logging level, default ``"INFO"``.
* ``TORCHMX_LOG_FILE``    – optional log file path.
* ``MX_HARDWARE_EXACT_QUANTIZATION`` – ``"True"`` selects the hardware-exact
  integer bit-manipulation quantizer; default ``"False"`` selects the
  simulated fp32-divide quantizer.  Both are bit-identical by contract
  (cross-checked in tests) — the toggle exists to continuously verify that.
* ``TORCHMX_QUANTIZE_BACKEND`` – ``"auto"`` (default: fused Pallas kernels on
  TPU, pure-jnp elsewhere), ``"pallas"`` (force kernels; interpreter mode
  off-TPU), or ``"jnp"`` (force the bit-parity simulation path).  TPU-build
  extension of the reference's exact/simulated toggle (generalised to a
  backend selector).
"""

import os

TORCHMX_LOG_LEVEL = os.environ.get("TORCHMX_LOG_LEVEL", "INFO")

TORCHMX_LOG_FILE = os.environ.get("TORCHMX_LOG_FILE", "")

MX_EXACT_QUANTIZATION = os.environ.get("MX_HARDWARE_EXACT_QUANTIZATION", "False")

TORCHMX_QUANTIZE_BACKEND = os.environ.get("TORCHMX_QUANTIZE_BACKEND", "auto")

# "auto" (default: the fused MX-KV-cache decode-attention kernel on TPU when
# shapes are eligible), "pallas" (force; interpreter mode off-TPU), or "off"
# (dequantize-the-cache reference path).  TPU-build extension.
TORCHMX_FUSED_ATTENTION = os.environ.get("TORCHMX_FUSED_ATTENTION", "auto")

# "1" (default): MXInferenceLinear packs eligible fp6 weights into the
# 4-codes-per-3-bytes "quarters" HBM layout — 25% less weight storage and
# traffic, best for capacity-bound serving and bandwidth-bound large-batch
# shapes.  "0": keep fp6 at 1 byte/code — ~25% lower batch-1 decode latency
# (the sub-byte unpack is VPU-bound there; see docs/results.md).
TORCHMX_FP6_PACK = os.environ.get("TORCHMX_FP6_PACK", "1")

# "1" (default): 2-D K-major fp8_e4m3 weights with every scale >= 10 repack
# into the u16 "halves" kernel layout at quantize time
# (``MXArray.to_fp8_halves``): same HBM bytes, but the fused matmul
# SWAR-decodes two codes per i32 lane — the decode-M latency win that makes
# MXFP8 weights competitive with bf16 at batch-1 serving.  "0" keeps the
# flat 1-byte layout (generic per-element decode).
TORCHMX_FP8_HALVES = os.environ.get("TORCHMX_FP8_HALVES", "1")

# "1": decode attention over an int8 d-major cache runs the ALL-int8
# MXU-dot kernel — q MXINT8-quantized per 32-block (38 dB) and the softmax
# weights requantized to 8-bit fixed point per (chunk, row) (~42 dB), so
# K/V codes feed the MXU raw with zero per-element decode work.  Changes
# numerics slightly (less than the reference's own fp8/fp6 QKV-quant
# configs); default "0".
TORCHMX_ATTN_INT8_DOT = os.environ.get("TORCHMX_ATTN_INT8_DOT", "0")

# "1": fp8_e4m3 activations x fp8_e4m3 weights at decode sizes feed the MXU
# RAW e4m3 codes (this TPU generation's MXU consumes f8e4m3fn natively —
# probed: the HLO keeps f8 operands into the convolution) with the same
# per-32-block factored rescale as the int8-dot kernel.  Zero per-element
# decode work — the latency answer for MXFP8 weights (the SWAR-halves
# decode chain still lost to bf16 at M=8).  Each e4m3xe4m3 product is
# exact in f32; only the per-block accumulation grouping differs from the
# dequantize reference (f32-reordering tolerance, like int8-dot).  Keeps
# the FLAT 1-byte weight layout (overrides TORCHMX_FP8_HALVES for
# eligible weights).  Default "0".
TORCHMX_FP8_DOT = os.environ.get("TORCHMX_FP8_DOT", "0")

# MX KV cache storage layout: "seq" (reference orientation — (b, h, L, d)
# with MX blocks on the LANE dim, decoded via the MXU-dot scale broadcast)
# or "dmajor" ((b, h, d, L): head_dim on SUBLANES, so the per-32-block scale
# broadcast is a free sublane ``_expand_scale`` and the attention dots need
# no in-kernel transposes — the same layout lesson the matmul kernels
# embody).  Applies to caches built by ``MXLayerKVCache.create`` without an
# explicit ``layout=``.
TORCHMX_KV_LAYOUT = os.environ.get("TORCHMX_KV_LAYOUT", "seq")

# "1" (default): in the x-cache matmul kernels with fused activation
# quantization, software-pipeline the j==0 sweep — fake-quantize x tile k+1
# into the VMEM cache while the MXU dots cached tile k, removing the
# same-step fq->dot dependence so Mosaic can overlap the fq VPU work with
# the dots (the serial form pays the full fq time on top of the matmul).
# Bit-identical results (same fq, same accumulation order); "0" keeps the
# serial j==0 schedule.
TORCHMX_FQ_PIPELINE = os.environ.get("TORCHMX_FQ_PIPELINE", "1")

# "1": MXInferenceLinear re-codes eligible fp4 / fp6_e2m3 weights into the
# EXACT int8 domain (``MXArray.to_int8_domain``: same values, one int8 code
# per element) so decode-size matmuls ride the native int8-MXU-dot kernel
# and larger shapes the hw-convert int8 decode — the fastest serving path
# measured on v5e (0.107 ms at the M=8 8B shape vs fp4 0.191 / fp6 0.293 /
# bf16 0.156).  Costs fp4 2x weight HBM (0.5 -> 1 byte/element); fp6 stays
# 1 byte.  Default "0": keep the reference packed layouts.
TORCHMX_INT8_DOMAIN = os.environ.get("TORCHMX_INT8_DOMAIN", "0")
