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


def delta_scan_time(body_fn, xs, *args, short: Optional[int] = None,
                    outer: int = 3):
    """Steady-state per-iteration device time of ``body_fn``, relay-honest.

    Through a network-attached TPU every jit dispatch pays a fixed
    latency (tens of ms on the axon relay) that a single ``lax.scan``
    timing silently spreads over its iterations.  This helper times the
    scan at two lengths — the full pool ``xs`` and its first ``short``
    batches — and reports ``(t_long - t_short) / (len - short)``: the fixed
    dispatch cost cancels exactly, leaving pure per-iteration time.

    ``body_fn(batch, *args)`` must return a scalar-reducible pytree;
    ``xs`` is a pytree of device arrays whose leading axis is the scan.
    Takes the *median* of ``outer`` paired runs (min would bias low under
    relay jitter).  Two scan lengths mean two compiles; both hit the
    persistent cache on re-runs.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    n = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if short is None:
        short = max(1, n // 4)
    assert 0 < short < n, (short, n)

    def make():
        @jax.jit
        def run(xs, *args):
            def body(carry, x):
                out = body_fn(x, *args)
                leaves = jax.tree_util.tree_leaves(out)
                chk = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)
                return carry + chk, None

            total, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return total
        return run

    run = make()
    xs_short = jax.tree_util.tree_map(lambda a: a[:short], xs)
    # float() forces a scalar readback, the only reliable completion fence
    # on the axon platform (block_until_ready returns early there)
    float(run(xs, *args))        # compile long
    float(run(xs_short, *args))  # compile short
    deltas = []
    for _ in range(outer):
        t0 = _time.perf_counter()
        float(run(xs_short, *args))
        t_s = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        float(run(xs, *args))
        t_l = _time.perf_counter() - t0
        deltas.append((t_l - t_s) / (n - short))
    deltas.sort()
    return deltas[len(deltas) // 2]
