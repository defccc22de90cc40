"""Phase timing / throughput observability.

The reference's only profiling is gtest wall time per test
(unit_tests/test.cc:10-14) and dead gprof CMake options
(CMakeLists.txt:61-79).  Here: explicit phase timers with GB/s, an
optional jax.profiler trace context, and a report the CLI/bench can print.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Phase:
    name: str
    seconds: float
    bytes_processed: int = 0

    @property
    def gbps(self) -> float:
        return self.bytes_processed / max(self.seconds, 1e-12) / 1e9


@dataclass
class Profiler:
    phases: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        yield
        self.phases.append(Phase(name, time.perf_counter() - t0, nbytes))

    def report(self) -> str:
        lines = []
        for p in self.phases:
            rate = f"  {p.gbps:7.3f} GB/s" if p.bytes_processed else ""
            lines.append(f"{p.name:<28s} {p.seconds*1e3:9.2f} ms{rate}")
        total = sum(p.seconds for p in self.phases)
        lines.append(f"{'total':<28s} {total*1e3:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(path: str | None):
    """jax.profiler trace wrapper (no-op when path is None)."""
    if not path:
        yield
        return
    import jax

    with jax.profiler.trace(path):
        yield
