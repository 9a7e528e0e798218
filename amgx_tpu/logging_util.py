"""Output routing and profiling annotations.

Replaces the reference's registerable print callback
(AMGX_register_print_callback, base/include/misc.h amgx_output) and its
profiling hooks (AMGX_CPU_PROFILER ranges, marker kernels in
base/src/profile.cu). On TPU the GPU-profiler marker kernels become
jax.profiler annotations: traced code inherits the named scopes, so phases
show up in xprof exactly like the reference's phase markers segment nsight
timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax

_print_callback: Callable[[str], None] = lambda msg: print(msg, end="")


def register_print_callback(fn: Callable[[str], None]) -> None:
    global _print_callback
    _print_callback = fn


def amgx_output(msg: str) -> None:
    """All framework output funnels through the registered callback
    (reference: amgx_output/amgx_distributed_output)."""
    _print_callback(msg)


def amgx_printf(fmt: str, *args) -> None:
    amgx_output((fmt % args) if args else fmt)


# ---------------------------------------------------------------------------
# profiling (reference: amgx_timer.h Profiler_tree + profile.cu markers)
# ---------------------------------------------------------------------------

class ProfileTree:
    """Hierarchical wall-clock profile (reference: Profiler_tree)."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._stack: List[tuple] = []

    @contextlib.contextmanager
    def range(self, name: str):
        path = "/".join([p for p, _ in self._stack] + [name])
        self._stack.append((name, time.perf_counter()))
        # named_scope threads the phase name into the XLA metadata so device
        # profiles segment per phase (the marker-kernel analog)
        with jax.named_scope(name):
            try:
                yield
            finally:
                _, t0 = self._stack.pop()
                self.times[path] = self.times.get(path, 0.0) + \
                    time.perf_counter() - t0

    def report(self) -> str:
        lines = []
        for path in sorted(self.times):
            depth = path.count("/")
            lines.append(f"{'  ' * depth}{path.rsplit('/', 1)[-1]:<30s} "
                        f"{self.times[path]*1e3:10.2f} ms")
        return "\n".join(lines)


profiler = ProfileTree()


def profile_phase(name: str):
    """Scoped phase marker (reference: profilePhaseSetup/Solve,
    profile.h:28-45)."""
    return profiler.range(name)
