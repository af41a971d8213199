"""Phase-level profiling with the reference's phase taxonomy.

The reference accumulates wall-clock per phase into ThreadBuffer::time_map —
15 named phases (data, f_b, forward, backward, read_emb, dot, norm, loss,
aggr_f, read_his, his_mm, grad, reg, write_emb, aggr_b) stamped inside the
kernel (thread_buffer.hpp:32-46) and reported as a percentage tree by
Engine::performance_breakdown (engine.cpp:22-65).

Inside one fused XLA program those phases don't exist as separate host-
timable regions (XLA fuses them — that's the point), so this module provides
two complementary tools:

* PhaseTimer — host-side accumulation for the phases that ARE host-visible
  (data prep, epoch scan, eval, checkpoint), with the reference's
  percentage-tree report format;
* jax.profiler integration — ``trace(dir)`` wraps a region in a profiler
  trace whose on-device timeline gives the intra-step breakdown the
  reference got from manual stamps. The train step's ops ARE wrapped in
  jax.named_scope with the reference phase names (train_step.py and the
  scatter update functions; asserted by tests/test_ops.py's
  named-scope test), so trace-viewer op names map onto the reference
  taxonomy. Mapping notes: "grad" covers the whole autodiff backward
  (the reference's backward/grad stamps); "norm" is fused into "dot"
  (cosine normalization happens inside the similarity kernel); "reg"
  only exists under l2_enabled and lives inside "write_emb"; "f_b" and
  "forward" are structural parents in the reference tree and appear
  host-side via PhaseTimer instead.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax

# The reference phase names (thread_buffer.hpp:32-46), for named_scope use.
REFERENCE_PHASES = (
    "data", "f_b", "forward", "backward", "read_emb", "dot", "norm",
    "loss", "aggr_f", "read_his", "his_mm", "grad", "reg", "write_emb",
    "aggr_b",
)


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-visible phases)."""

    def __init__(self) -> None:
        self.time_map: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.time_map[name] += time.perf_counter() - t0

    def reset(self) -> None:
        self.time_map.clear()


def performance_breakdown(timer: PhaseTimer) -> str:
    """Percentage tree over accumulated phases (engine.cpp:22-65 format)."""
    total = sum(timer.time_map.values())
    if total <= 0:
        return "no phases recorded"
    lines = [f"total: {total:.3f}s"]
    for name, t in sorted(
        timer.time_map.items(), key=lambda kv: -kv[1]
    ):
        lines.append(f"  {name}: {t:.3f}s ({t / total * 100.0:.1f}%)")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """On-device profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
