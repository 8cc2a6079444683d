"""Lightweight phase timing -- a first-class observability primitive.

The reference only had ad-hoc wall-clock prints (SURVEY.md section 5.1);
here every pipeline phase reports through one structured interface, and JAX
profiler traces can be toggled around any phase.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class Timer:
    """Accumulates named phase durations; one Timer per pipeline run."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, with_counts: bool = False) -> str:
        """Total seconds per phase; ``with_counts`` appends 'name_n' call
        counts (so per-call averages are derivable from one report)."""
        out = {name: round(self.phases[name], 4) for name in sorted(self.phases)}
        if with_counts:
            out.update({f"{name}_n": self.counts[name] for name in sorted(self.counts)})
        return json.dumps(out)


@contextlib.contextmanager
def timed(name: str, verbose: bool = True) -> Iterator[None]:
    start = time.perf_counter()
    try:
        yield
    finally:
        if verbose:
            print(f"[timing] {name}: {time.perf_counter() - start:.3f}s")


@contextlib.contextmanager
def jax_profile(out_dir: Optional[str]) -> Iterator[None]:
    """Capture a JAX profiler trace around a block when ``out_dir`` is set."""
    if out_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
