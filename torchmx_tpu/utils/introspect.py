"""Graph introspection and profiling hooks.

TPU-native analog of the reference's tooling (SURVEY §5): the reference dumps
AOTAutograd AtenIR graphs via a custom compile backend and counts graph
breaks with ``torch._dynamo.explain`` (reference
``examples/llama_example_atenir_graph.py:23-38``,
``tests/test_mx_tensor.py:432-456``).  Here the compiler IR is XLA HLO
(:func:`dump_lowered` / :func:`dump_compiled`), the profiler is
``jax.profiler`` (:func:`trace`), and the zero-graph-breaks guarantee maps to
zero *recompiles* across calls (:class:`RecompileCounter`).
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional

import jax


def lowered_text(fn: Callable, *args, static_argnames=None, **kwargs) -> str:
    """StableHLO text of ``fn`` jitted on ``args`` (pre-optimization IR)."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    return jitted.lower(*args, **kwargs).as_text()


def compiled_text(fn: Callable, *args, static_argnames=None, **kwargs) -> str:
    """Post-XLA-optimization HLO of ``fn`` (what actually runs: fusions,
    layout assignments, the custom-call boundaries of the Pallas kernels)."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    compiled = jitted.lower(*args, **kwargs).compile()
    return "\n".join(m.to_string() for m in compiled.runtime_executable().hlo_modules())


def dump_lowered(fn: Callable, *args, path: str, optimized: bool = False, **kw) -> str:
    """Write the (optionally optimized) HLO of ``fn(*args)`` to ``path`` and
    return it — the analog of the reference's AtenIR graph dump to file."""
    text = (compiled_text if optimized else lowered_text)(fn, *args, **kw)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    return text


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Profile a region with ``jax.profiler`` (view in TensorBoard/Perfetto).

    Usage::

        with introspect.trace("/tmp/trace"):
            model(x).block_until_ready()
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RecompileCounter:
    """Count distinct compilations of a jitted function.

    The TPU analog of the reference's zero-graph-breaks assertion
    (``torch._dynamo.explain``, ``tests/test_mx_tensor.py:432-456``): a decode
    loop must hit the compile cache after the first step.

    Usage::

        counter = RecompileCounter(step_fn)
        for ... : counter.fn(args)
        assert counter.count == 1
    """

    def __init__(self, fn: Callable, static_argnames=None):
        self.count = 0

        def counting(*args, **kwargs):
            self.count += 1
            return fn(*args, **kwargs)

        self.fn = jax.jit(counting, static_argnames=static_argnames)

    def reset(self) -> None:
        self.count = 0


def annotate(name: str):
    """Named profiler span (``jax.profiler.TraceAnnotation``) for marking
    quantize/matmul phases inside a traced region."""
    return jax.profiler.TraceAnnotation(name)
