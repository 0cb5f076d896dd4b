"""Structured per-step metrics (new capability; the reference only surfaces
losses through a tqdm postfix — reference train.py:66-67, SURVEY.md §5)."""
from __future__ import annotations

import json
import pathlib
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock timing."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        if path:
            pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self.t0 = time.perf_counter()

    def log(self, step: int, data: Dict[str, Any]) -> None:
        if self._fh is None:
            return
        rec = {"step": step, "t": round(time.perf_counter() - self.t0, 4)}
        for k, v in data.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def device_memory_stats() -> Dict[str, float]:
    """Peak/current HBM use of the default device in MiB (observability for
    production sizing; empty on backends without memory_stats, e.g. CPU)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for key, name in (("bytes_in_use", "hbm_in_use_mib"),
                      ("peak_bytes_in_use", "hbm_peak_mib"),
                      ("bytes_limit", "hbm_limit_mib")):
        if key in stats:
            out[name] = round(stats[key] / (1024 * 1024), 1)
    return out


class StepTimer:
    """Steps/sec over a sliding window, host-side."""

    def __init__(self):
        self.last = time.perf_counter()
        self.count = 0
        self.elapsed = 0.0

    def tick(self, n: int = 1) -> None:
        now = time.perf_counter()
        self.elapsed += now - self.last
        self.last = now
        self.count += n

    def rate(self) -> float:
        return self.count / self.elapsed if self.elapsed > 0 else 0.0

    def reset(self) -> None:
        self.count = 0
        self.elapsed = 0.0
        self.last = time.perf_counter()
