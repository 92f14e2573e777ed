"""Project-default XLA compile options for the hot jitted programs.

Measured round 5 (PERF.md r5; debug/hlo_bytes.py, debug/probe_ab.py):
XLA's space-to-batch converter rewrites the thin-batch (b2) native-res
convs into batch-rich chunked convs, but the layout round-trips it
inserts around the GroupNorms BETWEEN the convs materialize gigabytes of
copies and f32 broadcast chains — the while-body's operand+output bytes
drop from 22.2 to 9.54 GB/step with the pass disabled, the end-to-end
serving rate IMPROVES (0.273 -> 0.284 f/s at 448x1024 b2 DDIM-50), and
the headline/b8 shapes are exactly neutral (the pass does not fire
there: 138.9 steps/s and 0.474 f/s both ways).  Compilation is also ~3x
faster without the pass.  Hence the project default disables it;
``OFD_SAB=1`` restores XLA's stock pipeline.

Use :func:`compiler_options` as ``jax.jit(fn, compiler_options=...)`` —
per-program options, no global XLA_FLAGS mutation, works through the
axon-tunnel backend (verified) and is a no-op name filter on CPU.
"""

from __future__ import annotations

import os
from typing import Optional


def compiler_options() -> Optional[dict]:
    """Project-default per-jit XLA compile options (None = stock)."""
    if os.environ.get("OFD_SAB", "0") == "1":
        return None
    return {"xla_disable_hlo_passes": "space-to-batch-converter"}


__all__ = ["compiler_options"]
