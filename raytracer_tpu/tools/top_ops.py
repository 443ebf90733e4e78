"""Summarize a JAX profiler trace: top device ops by total time.

Companion to ``tools.render --profile DIR`` (SURVEY §5 observability).
Reads the Perfetto/Chrome trace JSON the profiler writes under
``DIR/plugins/profile/<run>/*.trace.json.gz`` and aggregates slice
durations by event name per track, so a render's device time can be
apportioned (BVH traversal kernel vs coherence sort vs shading fusions)
without spinning up TensorBoard:

    python -m raytracer_tpu.tools.render scenes/flying_unicorn.toml \
        --spp 16 --profile /tmp/prof
    python -m raytracer_tpu.tools.top_ops /tmp/prof --top 15
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace_events(profile_dir: str) -> list[dict]:
    """All complete-slice events from every trace.json(.gz) under the dir."""
    pats = [
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json"),
    ]
    files = sorted({f for p in pats for f in glob.glob(p, recursive=True)})
    events: list[dict] = []
    for f in files:
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            data = json.load(fh)
        events += [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    return events


def summarize(
    events: list[dict],
    top: int = 20,
    like: str | None = None,
    include_host_frames: bool = False,
):
    """-> (rows, total_us): rows = [(name, total_us, count, mean_us)].

    Python source-line slices (``$file.py:123 fn`` — the host CPU stack
    sampler) are excluded unless ``include_host_frames``: they nest, so
    their durations double-count, and device-time attribution is what this
    tool is for.
    """
    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        name = e.get("name", "?")
        if not include_host_frames and name.startswith("$"):
            continue
        if like and like not in name:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        total[name] += dur
        count[name] += 1
    rows = [
        (name, us, count[name], us / max(count[name], 1))
        for name, us in total.most_common(top)
    ]
    return rows, sum(total.values())


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raytracer-tpu-top-ops")
    p.add_argument("profile_dir", help="dir passed to tools.render --profile")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--like", default=None, help="substring filter on op names")
    p.add_argument(
        "--all", action="store_true",
        help="include host Python stack-sampler slices ($file.py:line)",
    )
    args = p.parse_args(argv)

    events = load_trace_events(args.profile_dir)
    if not events:
        print(f"no trace events under {args.profile_dir}", file=sys.stderr)
        return 1
    rows, total_us = summarize(events, args.top, args.like, args.all)
    print(f"{'total_ms':>10} {'count':>7} {'mean_us':>9}  name")
    for name, us, n, mean in rows:
        print(f"{us / 1e3:>10.2f} {n:>7} {mean:>9.1f}  {name[:90]}")
    print(f"{total_us / 1e3:>10.2f} {'':>7} {'':>9}  TOTAL (all matching slices)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
