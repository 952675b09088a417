"""Hardware memory-bandwidth scaling probe (Spark-independent).

Pins the scaling-efficiency residual to the box, not the engine: if the
MACHINE's aggregate memory bandwidth at 8 pinned cores is less than 4x its
2-core bandwidth, then ANY workload with a memory-traffic component is
hardware-capped below perfect 4x thread scaling -- independent of Spark,
the JVM, or the query plan. A real 4x-executor cluster adds 4 memory
subsystems; this single-socket VM does not.

Method: N worker processes, each taskset-pinned to its own core, each
streaming over a private 256 MB numpy buffer (read+write: x *= a is one
load + one store per 8 bytes) for a fixed number of sweeps. Aggregate
GB/s = total bytes moved / max worker wall. Workers synchronize on a
barrier so ramp-up is excluded.

A COMPUTE-BOUND control with the same harness (mode=compute: a 64 KB
buffer that lives in L1/L2, so no shared-resource contention) isolates
the decomposition: if compute scales ~1.0 and streaming scales ~0.8, the
harness/pinning loses nothing and the residual is the memory subsystem.

Usage: python tools/membw_probe.py [mode] [cores ...]
  mode = stream (default) | compute;  default cores: 1 2 4 8 16 32
Prints one JSON line: {cores: GB/s or Gop/s, ...} + derived 2->8 ratio.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = 256
COMPUTE_KB = 64
MEASURE_SEC = 4.0


def _worker(core: int, mode: str, barrier, out_q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    size_bytes = (
        COMPUTE_KB * 1024 if mode == "compute" else BUF_MB * 1024 * 1024
    )
    x = np.ones(size_bytes // 8, dtype=np.float64)
    x *= 1.0  # touch/fault all pages before the timed window
    barrier.wait()
    # time-based window (a fixed-sweep run finishes in ~0.1s and ambient
    # noise swamps it): sweep until MEASURE_SEC elapsed, count sweeps
    batch = 500 if mode == "compute" else 1  # keep clock checks off the
    t0 = time.monotonic()                    # hot path for tiny buffers
    sweeps = 0
    while True:
        for _ in range(batch):
            x *= 1.0000001  # stream: 1 load + 1 store per element
        sweeps += batch
        dt = time.monotonic() - t0
        if dt >= MEASURE_SEC:
            break
    # bytes = sweeps * (read + write) * buffer size
    out_q.put((core, sweeps * 2 * x.nbytes / dt))


def measure(n_cores: int, mode: str = "stream") -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_cores)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(c, mode, barrier, q))
        for c in range(n_cores)
    ]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    # aggregate sustained rate: sum of per-worker rates (each worker's
    # rate is its own bytes over its own wall; workers run concurrently)
    return sum(rates) / 1e9


def main() -> None:
    args = sys.argv[1:]
    mode = "stream"
    if args and args[0] in ("stream", "compute"):
        mode = args.pop(0)
    levels = [int(a) for a in args] or [1, 2, 4, 8, 16, 32]
    out = {}
    for n in levels:
        out[str(n)] = round(measure(n, mode), 2)
    res = {"mode": mode, "gbps_by_cores": out,
           "buf": f"{COMPUTE_KB}KB" if mode == "compute" else f"{BUF_MB}MB"}
    if "2" in out and "8" in out:
        res["scaling_2_to_8"] = round(out["8"] / out["2"] / 4.0, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
