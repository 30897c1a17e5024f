"""Aggregate device-op durations from a jax.profiler perfetto trace.

Usage: python scripts/parse_trace.py /tmp/trace_sdw8 [top_n]

Reads the newest perfetto_trace.json.gz under the trace dir, keeps
complete events ("ph": "X") on TPU device tracks, and prints total
duration by (fused-)op name family so the sweep's time can be
attributed to kernels (Ozaki limb matmuls, QR lanes, trinv, wraps,
update kernel, ...).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    cands = glob.glob(os.path.join(root, "**", "*.json.gz"),
                      recursive=True)
    if not cands:
        raise SystemExit(f"no .json.gz under {root}")
    return max(cands, key=os.path.getmtime)


def family(name: str) -> str:
    """Collapse fusion instances to a readable family."""
    n = name.split("/")[-1] if "/" in name else name
    n = re.sub(r"\.\d+$", "", n)
    n = re.sub(r"\d+$", "", n)
    return n


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_sdw8"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # map pid/tid -> track name to keep device (TPU) tracks only
    track = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track[e["pid"]] = e["args"].get("name", "")
    dur_by = collections.Counter()
    cnt_by = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = track.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and \
                "/device" not in pname.lower():
            continue
        d = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        dur_by[family(name)] += d
        cnt_by[family(name)] += 1
        total += d
    if not dur_by:
        print("no device events found; track names were:",
              sorted(set(track.values())))
        return
    print(f"{path}\ntotal device time {total / 1e3:.1f} ms")
    for name, d in dur_by.most_common(top_n):
        print(f"{d / 1e3:9.2f} ms  {100 * d / total:5.1f}%  "
              f"x{cnt_by[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
