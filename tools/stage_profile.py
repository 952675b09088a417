"""Per-stage utilization profile of the bench pipeline at one core count.

Answers VERDICT r2's open question precisely: WHICH critical-path segments
run with fewer tasks than cores (the 0.74-utilization term of the scaling
decomposition), and how much wall they cost. Pulls the Spark UI REST API
(/api/v1/.../stages) after the run for per-stage task counts, wall spans,
and executor CPU, then prints:

- total wall, sum(executorRunTime), implied core-occupancy;
- every stage whose numTasks < cores, with its exclusive wall span
  (overlap-merged: concurrent narrow stages are not double-counted);
- the narrow-stage share of the critical path.

Usage:  taskset -c 0-7 python tools/stage_profile.py 8 [sf_dir]
(pin externally like scaling_bench does; this script measures, not pins).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def _merged_span(intervals: list[tuple[float, float]]) -> float:
    """Total length of the union of [start, end) intervals."""
    total, cur_s, cur_e = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.3"

    import bench

    t0 = time.monotonic()
    out = bench.run_profiled(sf_dir, cores)
    wall = out["queries"]["dedup_e2e"]
    stages = out.pop("_stages")

    def ms(s):
        return time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")

    rows = []
    for st in stages:
        if st.get("status") not in ("COMPLETE", "SKIPPED"):
            continue
        if not st.get("submissionTime") or not st.get("completionTime"):
            continue
        sub = time.mktime(ms(st["submissionTime"])) + float(
            st["submissionTime"][20:23] or 0) / 1000.0
        com = time.mktime(ms(st["completionTime"])) + float(
            st["completionTime"][20:23] or 0) / 1000.0
        rows.append(
            {
                "stage": st["stageId"],
                "tasks": st["numCompleteTasks"] + st["numFailedTasks"],
                "span": round(com - sub, 2),
                "start": sub,
                "end": com,
                "cpu_s": round(st.get("executorRunTime", 0) / 1000.0, 1),
                "name": st.get("name", "")[:60],
            }
        )
    rows.sort(key=lambda r: r["start"])
    if not rows:
        print(json.dumps({"error": "no stages captured", "wall": wall}))
        return

    t_begin = min(r["start"] for r in rows)
    narrow = [r for r in rows if 0 < r["tasks"] < cores]
    wide = [r for r in rows if r["tasks"] >= cores]
    narrow_iv = [(r["start"], r["end"]) for r in narrow]
    wide_iv = [(r["start"], r["end"]) for r in wide]
    narrow_span = _merged_span(narrow_iv)
    # narrow-only span: narrow intervals minus time where a wide stage
    # also ran (a narrow stage beside a wide one doesn't idle cores)
    cut = []
    for ns, ne in narrow_iv:
        segs = [(ns, ne)]
        for ws, we in wide_iv:
            segs = [
                p
                for s, e in segs
                for p in (((s, min(e, ws)),) if s < ws else ())
                + (((max(s, we), e),) if e > we else ())
                if p[0] < p[1]
            ] or []
            segs = [(s, e) for s, e in segs if s < e]
        cut.extend(segs)
    narrow_only = _merged_span(cut)
    total_cpu = sum(r["cpu_s"] for r in rows)

    print(json.dumps({
        "cores": cores,
        "e2e_wall": wall,
        "files_per_sec": out["value"],
        "sum_executor_cpu_s": round(total_cpu, 1),
        "occupancy": round(total_cpu / (wall * cores), 3),
        "n_stages": len(rows),
        "narrow_stages": len(narrow),
        "narrow_union_span_s": round(narrow_span, 2),
        "narrow_only_span_s": round(narrow_only, 2),
        "narrow_only_share": round(narrow_only / wall, 3),
    }))
    dump = os.environ.get("SPARK_GRAFT_STAGE_DUMP")
    if dump:
        with open(dump, "w") as f:
            json.dump({"cores": cores, "wall": wall, "rows": rows}, f)

    print("\nNarrow stages (tasks < cores), by span:", file=sys.stderr)
    for r in sorted(narrow, key=lambda r: -r["span"])[:25]:
        print(
            f"  stage {r['stage']:>4} tasks={r['tasks']:>3} "
            f"span={r['span']:>6.2f}s t+{r['start']-t_begin:>6.1f}s "
            f"cpu={r['cpu_s']:>6.1f}s {r['name']}",
            file=sys.stderr,
        )
    print(f"\ntotal wall {time.monotonic()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
