"""Render the round-3 scaling-suite logs into markdown tables for
BENCH.md.

Reads the JSON lines the suite (tools/bench_scaling_r03.sh) leaves
under /tmp and prints:
  - pair table (kernel + engine, all pairs, samples inline)
  - kernel thread curve with per-thread throughput
  - STREAM-triad memory-bandwidth curve with scaling vs threads

Usage: python tools/render_scaling.py [logdir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def _jsonlines(path: Path):
    if not path.exists():
        return
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def _fmt(n: float) -> str:
    return f"{n:,.0f}"


def main():
    logdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp")

    pairs: dict[str, dict] = {}
    for name in ("scaling_r03_A.log", "scaling_r03_B.log", "scaling_r03_E.log"):
        for obj in _jsonlines(logdir / name) or []:
            for key, val in obj.items():
                if "_samples" in json.dumps(val):
                    pairs.setdefault(key, val)

    print("| job | pair | N URLs/s (JVM samples) | 4N URLs/s (JVM samples) "
          "| speedup | efficiency |")
    print("|---|---|---|---|---|---|")
    for key in sorted(pairs):
        val = pairs[key]
        kind, pair = key.rsplit("_", 1)
        n, wide = pair.replace("to", " ").split()
        ns = val[f"local{n}_samples"]
        ws = val[f"local{wide}_samples"]
        print(
            f"| {kind} | {n}→{wide} "
            f"| {_fmt(val[f'local{n}_urls_per_sec'])} "
            f"({', '.join(_fmt(x) for x in ns)}) "
            f"| {_fmt(val[f'local{wide}_urls_per_sec'])} "
            f"({', '.join(_fmt(x) for x in ws)}) "
            f"| {val['speedup']}× | **{val['scaling_efficiency']}** |"
        )

    curve = []
    for obj in _jsonlines(logdir / "scaling_r03_C.log") or []:
        if "threads" in obj:
            curve.append((obj["threads"], obj["result"]["urls_per_sec"]))
    if curve:
        print("\n**Kernel thread curve** (20M URLs, one fresh JVM per point):\n")
        print("| threads | URLs/s | URLs/s/thread | vs 1-thread efficiency |")
        print("|---|---|---|---|")
        base = None
        for t, ups in sorted(curve):
            if base is None:
                base = ups / t
            print(f"| {t} | {_fmt(ups)} | {_fmt(ups / t)} "
                  f"| {ups / t / base:.2f} |")

    mem = []
    for obj in _jsonlines(logdir / "scaling_r03_D.log") or []:
        if "procs" in obj:
            mem.append((obj["procs"], obj["aggregate_gb_per_sec"]))
    if mem:
        print("\n**Raw host memory bandwidth** (numpy STREAM-triad, no Spark):\n")
        print("| processes | GB/s | GB/s/process | vs 1-proc efficiency |")
        print("|---|---|---|---|")
        base = None
        for t, g in sorted(mem):
            if base is None:
                base = g / t
            print(f"| {t} | {g:.1f} | {g / t:.1f} | {g / t / base:.2f} |")


if __name__ == "__main__":
    main()
