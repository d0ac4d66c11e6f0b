"""Per-kernel roofline analysis of an XProf trace.

XLA:TPU attaches `model_flops` and `bytes_accessed` to every device event,
so each kernel's roofline time bound is directly computable:

    bound = max(model_flops / PEAK_FLOPS, bytes_accessed / PEAK_HBM_BW)

The gap (actual - bound) ranks where time is actually recoverable: a kernel
at its memory bound cannot be made faster without moving fewer bytes, no
matter how idle the MXU is. Scatter/gather kernels report bytes for the
whole operand even though they touch it sparsely; their "bound" is
therefore an UNDER-estimate of achievable time only when the operand is
resident — treat the serial-issue floor (~7-9 ns/element, NOTES.md) as the
real scatter bound instead (the `per_elem_ns` column).

Usage:
    python bench.py --profile /tmp/prof [...]
    python tools/roofline.py /tmp/prof [--frames N] [--top 30]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

# v5e: 197 TFLOP/s bf16 (f32 convs decompose into bf16 MXU passes);
# HBM ~819 GB/s
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def load_events(profile_dir: str):
    paths = glob.glob(
        os.path.join(profile_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", []), path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--frames", type=int, default=None,
                    help="divide totals by N for per-frame columns")
    ap.add_argument("--min_ms", type=float, default=0.0,
                    help="hide op groups below this total time")
    args = ap.parse_args()

    events, path = load_events(args.profile_dir)
    print(f"# {path}")

    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    keep = {p for p, n in pid_names.items() if "TPU" in n}

    class Agg:
        __slots__ = ("dur", "flops", "bytes", "count", "src", "cat")

        def __init__(self):
            self.dur = self.flops = self.bytes = self.count = 0
            self.src = ""
            self.cat = ""

    groups = collections.defaultdict(Agg)
    total_dur = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in keep:
            continue
        a = e.get("args", {})
        if "bytes_accessed" not in a:
            continue  # parent frames (jit_*) double-count
        if a.get("hlo_category") in ("while", "conditional"):
            continue  # control-flow parents contain their children's time
        name = e.get("name", "?")
        # merge replayed/deduplicated kernels by their dedup name
        key = a.get("deduplicated_name", name)
        g = groups[key]
        g.dur += e.get("dur", 0)  # us
        g.flops += int(a.get("model_flops", 0) or 0)
        g.bytes += int(a.get("bytes_accessed", 0) or 0)
        g.count += 1
        total_dur += e.get("dur", 0)
        if not g.src and a.get("source"):
            g.src = a["source"].replace("/root/repo/", "")
        if not g.cat:
            g.cat = a.get("hlo_category", "")

    rows = []
    for name, g in groups.items():
        t = g.dur / 1e6  # s
        bound = max(g.flops / PEAK_FLOPS, g.bytes / PEAK_BW)
        rows.append((t - bound, t, bound, g, name))
    rows.sort(key=lambda r: r[0], reverse=True)

    tot_t = total_dur / 1e6
    tot_bound = sum(r[2] for r in rows)
    print(
        f"# device kernel time {tot_t * 1e3:.1f} ms; roofline bound "
        f"{tot_bound * 1e3:.1f} ms; headroom {100 * (1 - tot_bound / max(tot_t, 1e-12)):.0f}%"
    )
    per = f" {'ms/frame':>9}" if args.frames else ""
    print(
        f"{'total ms':>9} {'bound ms':>9} {'gap ms':>8} {'bw%':>5} {'mxu%':>5}"
        f"{per}  {'count':>6}  name [category] [source]"
    )
    for gap, t, bound, g, name in rows[: args.top]:
        if t * 1e3 < args.min_ms:
            continue
        bw = 100 * (g.bytes / PEAK_BW) / max(t, 1e-12)
        mxu = 100 * (g.flops / PEAK_FLOPS) / max(t, 1e-12)
        per_col = f" {t * 1e3 / args.frames:9.3f}" if args.frames else ""
        print(
            f"{t * 1e3:9.2f} {bound * 1e3:9.2f} {gap * 1e3:8.2f} "
            f"{bw:5.1f} {mxu:5.1f}{per_col}  {g.count:6d}  "
            f"{name} [{g.cat}] [{g.src}]"
        )


if __name__ == "__main__":
    main()
