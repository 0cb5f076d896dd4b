"""Structured per-step metrics (new capability; the reference only surfaces
losses through a tqdm postfix — reference train.py:66-67, SURVEY.md §5)."""
from __future__ import annotations

import json
import pathlib
import queue
import threading
import time
from typing import Any, Dict, Optional


def fetch_stacked(device_data: Dict[str, Any]):
    """ONE stacked device-to-host transfer for a dict of device scalars
    (or equal-shape vectors): through a remote-TPU tunnel every blocking
    fetch is a network roundtrip, so per-key fetches cost len(dict) of
    them. Returns (keys, float32 ndarray stacked along axis 0)."""
    import jax.numpy as jnp
    import numpy as np
    keys = list(device_data)
    vals = np.asarray(jnp.stack([jnp.asarray(device_data[k], jnp.float32)
                                 for k in keys]))
    return keys, vals


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock timing.

    `log` converts values synchronously; `log_async` hands DEVICE arrays
    to a worker thread, which performs the device-to-host scalar fetches
    there — through a remote-TPU tunnel every blocking fetch on the train
    thread is a network roundtrip, and at video-mode cadence (several log
    boundaries per ~2s frame) those roundtrips were a measurable slice of
    the frame wall time.

    Concurrency model (tests/test_concurrency.py exercises it): any
    number of threads may call log_async concurrently (the worker thread
    is the single file writer, so JSONL records never interleave);
    records are dropped rather than blocking when the queue is full.
    Mixing synchronous log() with concurrent log_async is NOT supported
    (two writers would share the fh) — the training loops only use
    log_async. close() drains the queue, stops the worker, closes the
    file, and is idempotent; log_async after close is a silent no-op."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        self._q: Optional["queue.Queue"] = None
        self._thread = None
        self._lock = threading.Lock()   # guards worker spawn vs close
        self._closed = False
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

    def log_async(self, step: int, device_data: Dict[str, Any],
                  host_data: Optional[Dict[str, Any]] = None,
                  with_memory: bool = False) -> None:
        """Queue a record whose device-array values are fetched in the
        worker thread (ordering with other log_async calls preserved)."""
        if self._fh is None or self._closed:
            return
        if self._thread is None:
            with self._lock:
                # re-check under the lock: a concurrent close() may have
                # won the race (a respawned worker would write to a
                # closing fh), and a concurrent log_async may have
                # already spawned the worker.
                if self._closed:
                    return
                if self._thread is None:
                    self._q = queue.Queue(maxsize=64)
                    self._thread = threading.Thread(target=self._run,
                                                    daemon=True)
                    self._thread.start()
        host = {"t": round(time.perf_counter() - self.t0, 4),
                **(host_data or {})}
        try:
            self._q.put_nowait((step, device_data, host, with_memory))
        except queue.Full:
            pass    # drop a metrics record rather than stall the loop

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            step, device_data, host_data, with_memory = item
            try:
                keys, vals = fetch_stacked(device_data)
                fetched = dict(zip(keys, vals))
                mem = device_memory_stats() if with_memory else {}
                self.log(step, {**fetched, **host_data, **mem})
            except Exception:
                pass
            finally:
                self._q.task_done()

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
        if self._thread is not None:
            self._q.join()
            self._q.put(None)
            self._thread.join(timeout=10)
            self._thread = None
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
