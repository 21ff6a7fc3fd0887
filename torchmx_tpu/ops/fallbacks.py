"""Kernel-path observability.

Every MX op that *wants* the Pallas kernel path but cannot take it (shape
ineligible for the tiling rules, unsupported layout, ...) falls back to the
XLA dequantize-to-HBM simulation — correct, but ~10x the HBM traffic on
weight-bound shapes.  That fallback must never be silent: each one is counted
here and logged once per (op, reason) so a production shape regressing off
the kernel path shows up in logs and is assertable in tests.

Counting happens at *trace* time (eligibility is shape-static), so inside
``jit`` each fallback is recorded once per compiled shape — exactly the
granularity that matters.
"""

from __future__ import annotations

import threading
from typing import Dict

from ..utils import get_logger

logger = get_logger(__name__)

_lock = threading.Lock()
_counts: Dict[str, int] = {}
_logged = set()


def note_fallback(op: str, reason: str) -> None:
    """Record (and log, once per key) a Pallas->XLA fallback."""
    key = f"{op}: {reason}"
    with _lock:
        _counts[key] = _counts.get(key, 0) + 1
        if key not in _logged:
            _logged.add(key)
            logger.warning(
                "Pallas kernel fallback (%s) — running the XLA dequantize path "
                "(~10x HBM traffic on weight-bound shapes)",
                key,
            )


def fallback_counts() -> Dict[str, int]:
    """Snapshot of fallback counts since the last reset (key: 'op: reason')."""
    with _lock:
        return dict(_counts)


def reset_fallback_counts() -> None:
    with _lock:
        _counts.clear()
        _logged.clear()
