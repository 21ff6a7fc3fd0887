"""Decode-step cost breakdown at the Llama-3-8B shape (dev tool).

Where does the batch-1 token latency go?  ``bench_8b_decode.py`` gives the
end-to-end ms/token; this tool times the pieces with the same differential
scan method (`bench._timed_loop`) and reports the additive model

    32 * t(layer) + t(lm_head)  vs  measured E2E

so the residual (dispatch / scan overhead / embed+norm) is explicit, and
within a layer: attention kernel, attention projections, MLP matmuls, and
the remainder (RMSNorm / RoPE / residual adds / cache writes).

The model is abstract-init (zeros) like bench_8b_decode — kernel timing is
data-independent.  One decoder LAYER is built instead of 32 (fits easily
and compiles fast); the full-step number to compare against comes from
``python tools/bench_8b_decode.py <ctx> 64 <batch> <kv> <act>``.

Run:  python tools/bench_decode_breakdown.py [batch] [ctx_len] [kv] [act]
      (env: TORCHMX_INT8_DOMAIN / TORCHMX_KV_LAYOUT / TORCHMX_ATTN_INT8_DOT
       select the serving tier, exactly as for bench_8b_decode)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bench import _timed_loop
from torchmx_tpu import MXConfig, QAttentionConfig, QLinearConfig
from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM, MXLayerKVCache
from torchmx_tpu.quant_api import quantize_llm_


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    kv_name = sys.argv[3] if len(sys.argv) > 3 else "int8"
    act_name = sys.argv[4] if len(sys.argv) > 4 else "float8_e4m3"

    from bench_8b_decode import LLAMA3_8B

    cfg_d = dict(LLAMA3_8B, num_hidden_layers=1)
    cfg = LlamaConfig(max_position_embeddings=ctx + 8, **cfg_d)
    qlin = QLinearConfig(
        weights_config=MXConfig("float4_e2m1"),
        activations_config=MXConfig(act_name),
    )

    def build():
        model = LlamaForCausalLM(cfg)
        quantize_llm_(model, QAttentionConfig(projection_config=qlin), qlin)
        return model

    abstract = nnx.eval_shape(build)
    graphdef, state = nnx.split(abstract)

    @jax.jit
    def zeros_like_state():
        return jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            state,
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
        )

    t0 = time.perf_counter()
    model = nnx.merge(graphdef, zeros_like_state())
    layer = model.model.layers[0]
    H, D, HKV = cfg.hidden_size, cfg.head_dim, cfg.num_key_value_heads
    print(f"built 1-layer 8B-shape model in {time.perf_counter() - t0:.0f}s; "
          f"b={batch} ctx={ctx} kv={kv_name} act={act_name} "
          f"int8_domain={os.environ.get('TORCHMX_INT8_DOMAIN', '0')} "
          f"layout={os.environ.get('TORCHMX_KV_LAYOUT', 'seq')} "
          f"int8dot={os.environ.get('TORCHMX_ATTN_INT8_DOT', '0')}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((batch, 1, H)) * 0.1, jnp.bfloat16)
    cache = MXLayerKVCache.create(batch, HKV, ctx, D, kv_name, 32)
    kf = jnp.asarray(rng.standard_normal((batch, HKV, ctx, D)) * 0.3, jnp.bfloat16)
    cache = cache.write(kf, kf, 0)
    pos = jnp.full((batch, 1), ctx - 1, jnp.int32)
    from torchmx_tpu.models.llama import rope_cos_sin

    cos, sin = rope_cos_sin(model.model.inv_freq.get_value(), pos, jnp.bfloat16)
    cpos = jnp.full((batch,), ctx - 1, jnp.int32)

    lgd, lstate = nnx.split(layer)

    # Rebuild the cache inside each step from its arrays (pytree leaves must
    # be explicit _timed_loop consts).
    cache_leaves, cache_def = jax.tree_util.tree_flatten(cache)

    def cache0_struct(*leaves):
        return jax.tree_util.tree_unflatten(cache_def, leaves)

    def layer_step(h, lstate, cos, sin, *cl):
        lay = nnx.merge(lgd, lstate)
        out, _ = lay(h, cos=cos, sin=sin, attention_mask=None,
                     cache=cache0_struct(*cl), cache_position=cpos)
        return out

    trials = {}
    trials["layer"] = _timed_loop(
        layer_step, h, lstate, cos, sin, *cache_leaves,
    )

    # Attention kernel only.
    from torchmx_tpu.ops.pallas_attention import cached_attention_any

    q = jnp.asarray(rng.standard_normal((batch, cfg.num_attention_heads, 1, D)) * 0.3,
                    jnp.bfloat16)
    sm = 1.0 / math.sqrt(D)

    # _timed_loop folds a (.., N)-max into the carry; use matching shapes.
    probe = cached_attention_any(q, cache, ctx - 1, ctx, sm)
    if probe is None:
        print("attention kernel ineligible (fallback path) — skipping its row",
              file=sys.stderr)
    else:
        qh = q.reshape(batch, 1, -1)
        trials["attention kernel"] = _timed_loop(
            lambda qh, *cl: cached_attention_any(
                qh.reshape(batch, cfg.num_attention_heads, 1, D), cache0_struct(*cl),
                ctx - 1, ctx, sm,
            ).reshape(batch, 1, -1),
            qh, *cache_leaves,
        )

    # MLP (gate/up/down) and attention projections (q/k/v/o).
    mlp_gd, mlp_state = nnx.split(layer.mlp)
    trials["mlp (gate/up/down)"] = _timed_loop(
        lambda h, st: nnx.merge(mlp_gd, st)(h), h, mlp_state
    )

    attn = layer.self_attn
    pr_gd, pr_state = nnx.split(attn)

    def proj_step(h, st):
        a = nnx.merge(pr_gd, st)
        qp = a.q_proj(h)
        kp = a.k_proj(h)
        vp = a.v_proj(h)
        # o_proj consumes an H-sized vector; reuse qp (same width).  k/v
        # outputs are consumed NON-linearly (max) so XLA cannot elide or
        # strength-reduce those matmuls.
        kv_probe = jnp.max(kp, axis=-1, keepdims=True) + jnp.max(
            vp, axis=-1, keepdims=True
        )
        return a.o_proj(qp) + kv_probe.astype(jnp.bfloat16) * 1e-6

    trials["attn projections (q/k/v/o)"] = _timed_loop(proj_step, h, pr_state)

    # LM head (vocab matmul) — the per-token cost outside the layers.
    hm_gd, hm_state = nnx.split(model.lm_head) if model.lm_head is not None else (None, None)
    if hm_gd is not None:
        def head_step(h, st):
            y = nnx.merge(hm_gd, st)(h)
            # Max over the vocab consumes every output column (slicing would
            # let XLA narrow the matmul to the kept columns).
            return jnp.broadcast_to(
                jnp.max(y, axis=-1, keepdims=True).astype(jnp.bfloat16), h.shape
            ) + h * 1e-6

        trials["lm_head"] = _timed_loop(head_step, h, hm_state)

    results = {}
    for name, tr in trials.items():
        vals = [tr() for _ in range(5)]
        results[name] = float(np.median(vals)) * 1e3
        print(f"{name:32s} {results[name]:7.3f} ms", flush=True)

    lay = results["layer"]
    parts = (results.get("attention kernel", 0.0) + results["mlp (gate/up/down)"]
             + results["attn projections (q/k/v/o)"])
    print(f"\nlayer - (attn + mlp + proj) residual: {lay - parts:7.3f} ms "
          f"(RMSNorms, RoPE, residuals, KV quantize+write, dispatch)")
    full = 32 * lay + results.get("lm_head", 0.0)
    print(f"additive model 32*layer + lm_head:    {full:7.3f} ms/token "
          f"(compare to bench_8b_decode E2E)")


if __name__ == "__main__":
    main()
