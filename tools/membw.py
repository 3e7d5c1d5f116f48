"""Host memory-bandwidth saturation probe (STREAM-triad-like).

Why this exists: BASELINE.json's scaling gate asks for >=0.8 efficiency
from N to 4N *executors*. In this sandbox the only available analogue is
local[N] -> local[4N] threads on ONE 32-core box — which multiplies
threads but NOT memory bandwidth (a real 4N-executor cluster brings 4N
sockets' worth). The frontier kernel is URL-string churn, i.e.
bandwidth-bound; if raw achievable memory bandwidth itself stops scaling
past ~8 processes on this host, then the kernel's 8->32 rolloff is a
host ceiling, not a plan defect. This probe measures exactly that, with
zero Spark/JVM anywhere in the loop.

Each worker process allocates private numpy arrays and runs a scaled
triad a = b + s*c over ARR_MB of data per pass; aggregate GB/s is
summed over workers (bytes moved: 3 arrays per pass, read b,c + write
a). Run: python tools/membw.py [proc_counts...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARR_MB = 256
PASSES = 8


def _worker(q: mp.Queue) -> None:
    import numpy as np

    n = ARR_MB * 1024 * 1024 // 8
    b = np.ones(n, dtype=np.float64)
    c = np.full(n, 2.0, dtype=np.float64)
    a = np.empty(n, dtype=np.float64)
    # warm-up pass: page-fault the arrays in before timing
    np.add(b, 3.0 * c, out=a)
    t0 = time.time()
    for _ in range(PASSES):
        np.add(b, 3.0 * c, out=a)
    dt = time.time() - t0
    gb = PASSES * 3 * n * 8 / 1e9
    q.put(gb / dt)


def measure(procs: int) -> dict:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    agg = sum(rates)
    return {
        "procs": procs,
        "aggregate_gb_per_sec": round(agg, 2),
        "per_proc_gb_per_sec": round(agg / procs, 2),
    }


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 24, 32]
    out = []
    for procs in counts:
        r = measure(procs)
        out.append(r)
        print(json.dumps(r), flush=True)
    base = out[0]["aggregate_gb_per_sec"] / out[0]["procs"]
    for r in out:
        r["scaling_efficiency_vs_1proc"] = round(
            r["aggregate_gb_per_sec"] / (base * r["procs"]), 3
        )
    print(json.dumps({"membw_curve": out}))


if __name__ == "__main__":
    main()
