"""Aggregate a jax.profiler perfetto trace by device-op name / source line.

Usage: python scripts/trace_agg.py /tmp/trace_dir [n_steps]

Finds the newest *.trace.json.gz under the directory, keeps events on the
device "XLA Ops" threads, computes EXCLUSIVE (self) durations — container
ops like while/call/fusion parents have their nested children's time
subtracted — and prints the top lines aggregated by HLO op-name prefix and
by source file:line (when present in event args). n_steps divides totals
into per-step ms.

Reading the op names: they derive from JAX trace scopes, not HLO
semantics — custom-vjp Pallas kernels invoked in the backward pass show
up as `transpose_jvp_vmap____*` (transpose-of-jvp = VJP). Check the
event's hlo_category (custom-call vs transpose) before reading such a
line as a layout transpose; round 5 burned time on exactly this.
"""
import collections
import gzip
import json
import pathlib
import re
import sys


def load_trace(root: str) -> dict:
    paths = sorted(pathlib.Path(root).rglob("*.trace.json.gz"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def thread_names(events):
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    return names


_FUSION_RE = re.compile(r"\.\d+$")


def base_name(name: str) -> str:
    """Strip trailing .N numbering so fusion.123 groups as fusion."""
    return _FUSION_RE.sub("", name)


def exclusive_times(events):
    """Per-event self time: duration minus nested same-thread children."""
    by_tid = collections.defaultdict(list)
    for e in events:
        by_tid[(e["pid"], e["tid"])].append(e)
    for group in by_tid.values():
        group.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event)
        for e in group:
            ts, dur = e["ts"], e.get("dur", 0)
            e["self"] = dur
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                stack[-1][1]["self"] -= dur
            stack.append((ts + dur, e))


def main():
    root = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    data = load_trace(root)
    tnames = thread_names(data["traceEvents"])
    dev = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and "dur" in e
           and "XLA Ops" in tnames.get((e.get("pid"), e.get("tid")), "")]
    exclusive_times(dev)

    by_name = collections.Counter()
    by_src = collections.Counter()
    count = collections.Counter()
    total = 0.0
    for e in dev:
        self_us = e["self"]
        total += self_us
        name = base_name(e.get("name", "?"))
        by_name[name] += self_us
        count[name] += 1
        args = e.get("args", {})
        src = (args.get("source") or args.get("tf_op")
               or args.get("long_name") or "")
        if isinstance(src, str) and src:
            by_src[src[:160]] += self_us

    scale = 1e3 * n_steps  # us -> ms/step
    print(f"total device-op self time: {total / scale:.2f} ms/step "
          f"({n_steps} steps)")
    print("\n== by HLO op name (self ms/step, count/step) ==")
    for name, dur in by_name.most_common(44):
        print(f"{dur / scale:8.3f}  {count[name] / n_steps:6.1f}x  {name}")
    if by_src:
        print("\n== by source (self ms/step) ==")
        for src, dur in by_src.most_common(44):
            print(f"{dur / scale:8.3f}  {src}")


if __name__ == "__main__":
    main()
