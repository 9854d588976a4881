"""Profiling and observability: first-class on TPU (SURVEY §5 mandate).

The reference's only timing is `time.time()` deltas + tqdm
(`DS_NeRF/run_nerf.py:1361`); here:
- `trace()` wraps a block in a jax.profiler trace (view in TensorBoard /
  xprof) — covers device compute, HBM transfers, and compile events;
- `StepTimer` maintains EMA step time / rays-per-second and emits structured
  JSONL metrics (the TensorBoard-writer replacement that the reference left
  commented out, `run_nerf.py:14,1356-1357`);
- `device_memory_stats()` snapshots live HBM usage per device.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir, *, host_tracer_level: int = 2):
    """Profile a block: `with trace("/tmp/trace"): step(...)`."""
    jax.profiler.start_trace(str(log_dir),
                             create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device live/peak HBM bytes (None entries when unsupported)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        out[str(d)] = None if s is None else {
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        }
    return out


class StepTimer:
    """EMA step timing + JSONL metric logging."""

    def __init__(self, jsonl_path=None, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._last = None
        self._file = open(jsonl_path, "a") if jsonl_path else None

    def tick(self):
        self._last = time.perf_counter()

    def tock(self, step: int, metrics: dict | None = None,
             rays_per_step: int | None = None):
        dt = time.perf_counter() - self._last
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        row = {"step": step, "step_time_s": dt, "step_time_ema_s": self.avg}
        if rays_per_step:
            row["rays_per_sec"] = rays_per_step / max(self.avg, 1e-9)
        if metrics:
            row.update({k: float(v) for k, v in metrics.items()})
        if self._file:
            self._file.write(json.dumps(row) + "\n")
            self._file.flush()
        return row

    def close(self):
        if self._file:
            self._file.close()
