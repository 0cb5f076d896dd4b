"""Unit tests for the metrics logger (async path), the video frame
prefetcher, and the video-mode data loader contract.

The async logger and prefetcher exist purely for the remote-TPU-tunnel
host loop (every blocking fetch is a network roundtrip); these tests pin
their ordering/drain semantics on CPU."""
import json
import pathlib
import shutil
import time

import jax.numpy as jnp
import numpy as np
import pytest

from splice_tpu.utils.metrics import MetricsLogger, StepTimer


class TestMetricsLoggerAsync:
    def test_log_async_fetches_device_values_in_order(self, tmp_path):
        path = tmp_path / "m.jsonl"
        lg = MetricsLogger(str(path))
        for i in range(5):
            lg.log_async(i, {"loss": jnp.float32(i * 1.5),
                             "aux": np.float32(i)},
                         {"lr": 0.1 * i})
        lg.close()
        recs = [json.loads(l) for l in path.read_text().splitlines()]
        assert [r["step"] for r in recs] == list(range(5))
        for i, r in enumerate(recs):
            assert r["loss"] == pytest.approx(i * 1.5)
            assert r["aux"] == pytest.approx(float(i))
            assert r["lr"] == pytest.approx(0.1 * i)
            assert "t" in r

    def test_close_drains_pending_records(self, tmp_path):
        path = tmp_path / "m.jsonl"
        lg = MetricsLogger(str(path))
        n = 50
        for i in range(n):
            lg.log_async(i, {"v": jnp.float32(i)})
        lg.close()   # must block until every queued record is written
        recs = [json.loads(l) for l in path.read_text().splitlines()]
        assert len(recs) == n
        assert recs[-1]["v"] == pytest.approx(n - 1)

    def test_log_async_noop_without_path(self):
        lg = MetricsLogger(None)
        lg.log_async(0, {"v": jnp.float32(1)})  # must not raise
        lg.close()

    def test_sync_log_still_works_alongside_async(self, tmp_path):
        path = tmp_path / "m.jsonl"
        lg = MetricsLogger(str(path))
        lg.log(0, {"a": 1.0})
        lg.log_async(1, {"b": jnp.float32(2.0)})
        lg.close()
        recs = [json.loads(l) for l in path.read_text().splitlines()]
        assert recs[0] == {**recs[0], "a": 1.0}
        assert recs[1]["b"] == pytest.approx(2.0)

    def test_reusable_across_runs(self, tmp_path):
        # video mode shares one logger across frames: close() then further
        # log_async must be a no-op, and a second logger appends.
        path = tmp_path / "m.jsonl"
        lg = MetricsLogger(str(path))
        lg.log_async(0, {"v": jnp.float32(1)})
        lg.close()
        lg.log_async(1, {"v": jnp.float32(2)})   # closed: dropped, no error
        lg2 = MetricsLogger(str(path))
        lg2.log_async(2, {"v": jnp.float32(3)})
        lg2.close()
        steps = [json.loads(l)["step"] for l in path.read_text().splitlines()]
        assert steps == [0, 2]


class TestStepTimer:
    def test_rate_counts_ticks(self):
        t = StepTimer()
        time.sleep(0.01)
        t.tick(10)
        assert t.rate() > 0
        t.reset()
        assert t.rate() == 0.0


class TestPrefetch:
    def test_yields_all_in_order(self):
        from splice_tpu.video import _prefetch
        assert list(_prefetch(iter(range(7)))) == list(range(7))

    def test_propagates_loader_exception(self):
        from splice_tpu.video import _prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = _prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_overlaps_producer_with_consumer(self):
        from splice_tpu.video import _prefetch
        order = []

        def gen():
            for i in range(3):
                order.append(f"load{i}")
                yield i

        it = _prefetch(gen())
        first = next(it)
        time.sleep(0.05)   # give the worker time to run ahead
        # With depth=1 the loader must already have produced item 1 while
        # item 0 is being "consumed".
        assert first == 0
        assert "load1" in order
        assert list(it) == [1, 2]


class TestLoadVideoFrames:
    def test_shared_b_upload_and_unified_canvas(self, tmp_path):
        from splice_tpu.config import load_config
        from splice_tpu.data import load_video_frames
        src = pathlib.Path("datasets/splicing/cows")
        root = tmp_path / "vid"
        (root / "A").mkdir(parents=True)
        (root / "B").mkdir()
        a_img = sorted((src / "A").iterdir())[0]
        b_img = sorted((src / "B").iterdir())[0]
        shutil.copy(a_img, root / "A" / "frame_000.jpg")
        shutil.copy(a_img, root / "A" / "frame_001.jpg")
        shutil.copy(b_img, root / "B" / b_img.name)
        cfg = load_config(None, dict(dataroot=str(root),
                                     A_resize=64, B_resize=48))
        frames = list(load_video_frames(cfg))
        assert [n for n, _ in frames] == ["frame_000.jpg", "frame_001.jpg"]
        p0, p1 = frames[0][1], frames[1][1]
        # ONE device buffer for B across all frames (no re-upload per frame)
        assert p0.B is p1.B
        # canvas unified like load_pair so the vmapped A/B-batch step applies
        assert p0.canvas_A == p0.canvas_B == p1.canvas_A == p1.canvas_B
