"""Tracing / profiling hooks.

Capability parity with the reference's per-frame/per-stage wall-clock metrics
(recode_writer.py:432-555, aggregated at :417-427, printed by
print_run_metrics :610-618) — the writer already maintains that metrics dict —
plus what the reference lacks (SURVEY.md §5): real profiler integration.

* :func:`trace` — context manager around ``jax.profiler.trace``; produces a
  TensorBoard/XProf trace of device execution for any code region.
* :class:`StageTimer` — named wall-clock stages accumulated into a
  reference-shaped metrics dict (timedelta values).
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so writer
  stages show up named inside device traces.
"""

from __future__ import annotations

import contextlib
from datetime import datetime, timedelta
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device/host profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Name the enclosed region inside profiler traces (no-op overheadwise)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulate named wall-clock stages, reference-metrics shaped."""

    def __init__(self, metrics: Optional[Dict[str, timedelta]] = None):
        self.metrics: Dict[str, timedelta] = metrics if metrics is not None else {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = datetime.now()
        try:
            yield
        finally:
            elapsed = datetime.now() - start
            self.metrics[name] = self.metrics.get(name, timedelta(0)) + elapsed

    def as_seconds(self) -> Dict[str, float]:
        return {k: v.total_seconds() for k, v in self.metrics.items()
                if isinstance(v, timedelta)}


def enable_compile_cache(path: str = "/root/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache (remote TPU compiles through
    the axon relay take minutes; the cache makes them one-time per kernel)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without these options
