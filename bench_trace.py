"""Roofline analysis of a jax.profiler device trace.

Aggregates device-op self time by HLO category from the newest
``*.trace.json.gz`` under a profile directory (as written by
``jax.profiler.trace`` — e.g. ``IVID_TPU_BENCH_PROFILE=/tmp/prof python
bench.py``), and prints per-category totals with achieved TFLOP/s and GB/s
so the gap between measured MFU and 100% is attributable op-by-op.

The relayed TPU runtime propagates per-op ``hlo_category`` / ``model_flops``
/ ``bytes_accessed`` args into the trace events, which is what makes this
host-side analysis possible (no XProf install needed).

Run: python bench_trace.py /tmp/prof [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(root: str) -> str:
    paths = glob.glob(
        os.path.join(root, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def load_device_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device-side complete events live on TPU/accelerator pids; host threads
    # carry python/runtime scopes we don't want. Identify device pids from
    # process_name metadata.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        p
        for p, n in pid_names.items()
        if re.search(r"TPU|/device|Device|XLA", n or "")
    }
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        # Fallback when pid metadata is absent: device ops are the ones
        # annotated with an hlo_category.
        if not device_pids and "hlo_category" not in args:
            continue
        out.append(e)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--steps", type=int, default=1,
        help="traced region contains N identical steps; per-step numbers divide by N",
    )
    args = ap.parse_args()

    path = find_trace(args.profile_dir)
    events = load_device_events(path)
    if not events:
        raise SystemExit(f"no device events in {path}")

    def fnum(a, key):
        v = a.get(key)
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    # Enclosing events (the jit wrapper, `while`/`conditional` control-flow
    # parents) span their children's durations — summing them would double-
    # (or triple-) count every op, so they are excluded from totals.
    _PARENT_CATS = {"(uncategorized)", "while", "conditional", "call"}

    by_cat = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # us, flops, bytes, n
    by_op = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    total_us = 0.0
    for e in events:
        a = e.get("args") or {}
        cat = a.get("hlo_category", "(uncategorized)")
        if cat in _PARENT_CATS:
            continue
        dur = float(e.get("dur", 0.0))
        fl = fnum(a, "model_flops") or fnum(a, "flops")
        by_ = fnum(a, "bytes_accessed")
        # Aggregate repeated scan iterations under one name.
        name = re.sub(r"\.\d+$", "", e.get("name", "?"))
        name = re.sub(r"__\d+", "__N", name)
        for d, k in ((by_cat, cat), (by_op, f"[{cat}] {name}")):
            d[k][0] += dur
            d[k][1] += fl
            d[k][2] += by_
            d[k][3] += 1
        total_us += dur

    n = args.steps
    print(f"trace: {path}")
    print(f"device total: {total_us / 1e3 / n:.3f} ms/step  ({len(events)} events)\n")
    print(f"{'category':<28}{'ms/step':>10}{'%':>7}{'TFLOP/s':>10}{'GB/s':>9}{'#ops':>7}")
    for cat, (us, fl, by_, cnt) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        sec = us / 1e6
        print(
            f"{cat:<28}{us / 1e3 / n:>10.3f}{100 * us / total_us:>6.1f}%"
            f"{fl / sec / 1e12 if sec else 0:>10.1f}{by_ / sec / 1e9 if sec else 0:>9.0f}{cnt:>7}"
        )

    print(f"\ntop {args.top} ops by self time:")
    print(f"{'ms/step':>9}{'%':>7}{'TFLOP/s':>9}{'GB/s':>8}{'#':>6}  op")
    for op, (us, fl, by_, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[
        : args.top
    ]:
        sec = us / 1e6
        print(
            f"{us / 1e3 / n:>9.3f}{100 * us / total_us:>6.1f}%"
            f"{fl / sec / 1e12 if sec else 0:>9.1f}{by_ / sec / 1e9 if sec else 0:>8.0f}{cnt:>6}  {op[:110]}"
        )


if __name__ == "__main__":
    main()
