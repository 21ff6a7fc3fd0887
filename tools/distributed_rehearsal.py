"""2-process distributed rehearsal of the multi-host (DCN x ICI) path.

The real 2-host target (>=85% tokens/s scaling) needs hardware this
environment lacks (one chip); this rehearsal de-risks everything software:
it launches TWO local processes, each with 4 virtual CPU devices,
initializes ``jax.distributed``, builds the hybrid (data=2-proc x model=4)
mesh through the REAL multi-process branch of ``create_hybrid_mesh``
(``parallel/multihost.py``), runs the sharded QAT train step and the
MX-quantized TP inference forward across processes, and asserts from the
compiled HLO that NO tensor collective spans the process (DCN) boundary —
TP collectives must ride ICI; only data-parallel gradient aggregation may
cross processes.

    python tools/distributed_rehearsal.py          # launcher
    python tools/distributed_rehearsal.py --worker I  # internal
"""

import os
import re
import subprocess
import sys

import numpy as np

N_PROC = 2
LOCAL_DEVICES = 4
PORT = 49731


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from torchmx_tpu.parallel import multihost

    n = multihost.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert n == N_PROC, n
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == N_PROC * LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torchmx_tpu.config import MXConfig, QAttentionConfig, QLinearConfig
    from torchmx_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from torchmx_tpu.parallel import DATA_AXIS, shard_model
    from torchmx_tpu.quant_api import quantize_llm_
    from torchmx_tpu.train import make_qat_train_step
    from torchmx_tpu.utils.introspect import compiled_text

    # The multi-process branch: data axis spans the 2 processes (DCN),
    # model axis stays inside each process's 4 devices (ICI).
    mesh = multihost.create_hybrid_mesh(model_parallelism=LOCAL_DEVICES)
    assert mesh.devices.shape == (N_PROC, LOCAL_DEVICES)
    # Every model-axis row must be single-process.
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "model axis spans processes — TP collectives would ride DCN"
        )

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
    )
    qlin = QLinearConfig(
        weights_config=MXConfig("float8_e4m3"),
        activations_config=MXConfig("float8_e4m3"),
    )

    with mesh:
        # 1) Sharded QAT train step across both processes.
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        shard_model(model, mesh)
        train_step, state, opt_state, _ = make_qat_train_step(model, qlin)
        step = jax.jit(train_step)
        batch = jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P(DATA_AXIS, None))
        )
        state, opt_state, loss = step(state, opt_state, batch, batch)
        assert np.isfinite(float(loss)), float(loss)

        # 2) MX-quantized TP inference forward.
        qmodel = LlamaForCausalLM(cfg, rngs=nnx.Rngs(1))
        quantize_llm_(qmodel, QAttentionConfig(projection_config=qlin), qlin)
        shard_model(qmodel, mesh)
        graphdef, qstate = nnx.split(qmodel)

        def fwd(state, ids):
            logits, _ = nnx.merge(graphdef, state)(ids)
            return logits

        logits = jax.jit(fwd)(qstate, batch)
        assert logits.shape == (4, 16, 256)

        # 3) HLO check: inference collectives must not span processes.
        hlo = compiled_text(fwd, qstate, batch)
        bad = _cross_process_collectives(hlo)
        assert not bad, f"tensor collectives span the DCN axis: {bad}"

    if pid == 0:
        print(
            f"rehearsal ok: {N_PROC} processes x {LOCAL_DEVICES} devices, "
            f"mesh {mesh.devices.shape}, loss {float(loss):.4f}, "
            f"forward collectives ICI-only"
        )


def _iota_groups(spec: str):
    """Expand an iota replica-group spec ``[G,S]<=[d0,d1,...]T(p0,p1,...)``
    (the transpose suffix is optional) into explicit device-id groups, or
    None if the spec doesn't parse."""
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?$", spec)
    if not m:
        return None
    ngroups, gsize = int(m.group(1)), int(m.group(2))
    dims = [int(t) for t in m.group(3).split(",")]
    total = 1
    for d in dims:
        total *= d
    ids = np.arange(total).reshape(dims)
    if m.group(4):
        ids = ids.transpose([int(t) for t in m.group(4).split(",")])
    flat = ids.reshape(-1)
    if ngroups * gsize != total:
        return None
    return [list(map(int, flat[g * gsize : (g + 1) * gsize])) for g in range(ngroups)]


def _cross_process_collectives(hlo: str):
    """Collective ops whose replica group mixes devices of both processes.

    Devices 0..LOCAL_DEVICES-1 belong to process 0, the rest to process 1.
    Handles explicit ``replica_groups={{0,1},{2,3}}`` and iota forms
    (``[2,4]<=[8]``, including transposed ``[4,2]<=[2,4]T(1,0)`` — the shape
    strided groups print as).  FAIL-CLOSED: a replica_groups spec this
    parser does not recognize is reported as crossing, so a new HLO printing
    format can never silently pass the ICI-only assertion.
    """
    bad = []
    for m in re.finditer(r"(\S*(?:all-reduce|all-gather|reduce-scatter|"
                         r"collective-permute|all-to-all)\S*).*?replica_groups=(\S+)",
                         hlo):
        op, groups = m.group(1), m.group(2)
        explicit = re.findall(r"\{([\d,\s]+)\}", groups)
        if explicit:
            parsed = [
                [int(t) for t in g.replace(" ", "").split(",") if t]
                for g in explicit
            ]
        else:
            parsed = (
                _iota_groups(groups.rstrip(",}")) if groups.startswith("[") else None
            )
        if parsed is None:
            if groups in ("{}", "{{}}"):  # empty groups: all devices together
                parsed = [list(range(N_PROC * LOCAL_DEVICES))]
            else:
                bad.append((op, f"unrecognized replica_groups {groups!r}"))
                continue
        for ids in parsed:
            procs = {i // LOCAL_DEVICES for i in ids}
            if len(procs) > 1:
                bad.append((op, ids))
    return bad


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(N_PROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
                env=env,
            )
        )
    rc = [p.wait(timeout=600) for p in procs]
    assert rc == [0] * N_PROC, rc
    print("distributed rehearsal passed")


if __name__ == "__main__":
    main()
