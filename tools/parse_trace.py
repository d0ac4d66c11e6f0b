"""Summarize an XProf trace: top device ops by total time.

tensorboard_plugin_profile's converters are version-broken against the
TF build in this environment (NOTES.md), so this parses the trace-viewer
JSON events directly. Usage:

    python bench.py --config integration --profile /tmp/prof
    python tools/parse_trace.py /tmp/prof [--top 30] [--frames N]

With --frames N, also prints per-frame cost (total / N) for each op group.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


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
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--pid_filter", default="TPU",
                    help="substring of the process label to keep (device pid)")
    args = ap.parse_args()

    events, path = load_events(args.profile_dir)
    print(f"# {path}")

    # map pid -> label from metadata events
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    keep_pids = {
        pid for pid, name in pid_names.items() if args.pid_filter in name
    }
    if not keep_pids:
        print(f"# no pids matching {args.pid_filter!r}; labels: {sorted(set(pid_names.values()))}")
        keep_pids = set(pid_names)

    total_by_name = collections.Counter()
    count_by_name = collections.Counter()
    source_by_name = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in keep_pids:
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "?")
        total_by_name[name] += dur
        count_by_name[name] += 1
        # XLA attaches the originating python source line to device events
        # (args.source) — the only practical way to attribute fusion.NNNN
        src = e.get("args", {}).get("source")
        if src and name not in source_by_name:
            source_by_name[name] = src.replace("/root/repo/", "")

    grand = sum(total_by_name.values())
    print(f"# device total: {grand / 1e3:.2f} ms over {sum(count_by_name.values())} events")
    hdr = f"{'total ms':>10} {'%':>6} {'count':>7} {'avg us':>9}"
    if args.frames:
        hdr += f" {'ms/frame':>9}"
    print(hdr + "  name")
    for name, dur in total_by_name.most_common(args.top):
        row = (
            f"{dur / 1e3:10.2f} {100.0 * dur / max(grand, 1):6.1f} "
            f"{count_by_name[name]:7d} {dur / max(count_by_name[name], 1):9.1f}"
        )
        if args.frames:
            row += f" {dur / 1e3 / args.frames:9.3f}"
        src = source_by_name.get(name, "")
        print(row + f"  {name}" + (f"  [{src}]" if src else ""))


if __name__ == "__main__":
    main()
