"""Tracing / profiling harness (SURVEY §5: replaces ti.kernel_profiler).

Three instruments:
- `trace(path)`: jax.profiler context — Perfetto/XProf traces of the
  compiled step (the Taichi-kernel-profiler counterpart).
- `StepTimer`: wall-clock per-phase timing with forced completion via
  host readback (`block_until_ready` is unreliable through tunneled
  device transports, so completion is forced by pulling one scalar).
- `named_scope`: re-export of jax.named_scope for annotating phases
  inside jitted steps so traces show solver stages.
"""

import contextlib
import time

import numpy as np
import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir):
    """Profile a region into `log_dir` (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])


class StepTimer:
    """Accumulates wall-clock per named phase.

    >>> t = StepTimer()
    >>> with t.phase("step"):
    ...     state, m = solver.step(state)
    >>> t.report()
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name, result_ref=None):
        t0 = time.time()
        box = {}
        try:
            yield box
        finally:
            _sync(box.get("result"))
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: total {tot*1e3:.1f} ms, "
                         f"n={n}, avg {tot/n*1e3:.2f} ms")
        return "\n".join(lines)


# Capacity flags whose firing means pair contributions were dropped or
# sums were clamped — i.e. silently wrong physics, not just slow physics.
# (window_overflow / row_overflow are perf signals since window sheets /
# the group-level center transpose and are intentionally absent here.)
FATAL_OVERFLOW_KEYS = ("span_overflow", "group_overflow",
                       "neighbor_overflow", "spill_overflow",
                       "migration_overflow", "halo_overflow",
                       "slot_overflow", "group_compact_overflow")


def check_overflow(metrics, where="step", strict=False):
    """Surface capacity overflow loudly at runtime (VERDICT r2 item 8).

    Scans a (possibly scan-stacked) metrics pytree for the fatal capacity
    flags and warns — or raises when ``strict`` — if any fired.  Returns
    the list of fired keys so callers (driver, bench) can annotate output.
    """
    import warnings

    import jax

    present = {}
    for k in FATAL_OVERFLOW_KEYS:
        v = metrics.get(k) if hasattr(metrics, "get") else None
        if v is not None:
            present[k] = v
    # one batched device_get (transfers issue together) instead of a
    # per-key np.asarray roundtrip — each costs ~20-30 ms through the
    # axon tunnel and this runs every frame on the driver path
    host = jax.device_get(present) if present else {}
    fired = []
    for k in FATAL_OVERFLOW_KEYS:
        if k not in host:
            continue
        a = np.asarray(host[k])
        if a.size and bool(a.any()):
            fired.append(k)
    if fired:
        msg = (f"capacity overflow during {where}: {fired} — pair "
               f"contributions were dropped or clamped; physics is "
               f"silently wrong. Raise the corresponding capacity "
               f"(SimParams caps / sharding caps).")
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return fired


def summarize_metrics(metrics):
    """Host-side reduction of a (possibly scan-stacked) metrics pytree to
    plain floats for logging — the structured counterpart of the
    reference's print() diagnostics (DFSPH.py:258,338; legacy:702-729)."""
    out = {}
    for k, v in metrics.items():
        if isinstance(v, dict):
            continue
        a = np.asarray(v)
        out[k] = float(a.ravel()[-1]) if a.size else float("nan")
    return out
