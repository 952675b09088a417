"""Attribute the snm_window_pairs cold-vs-warm gap (VERDICT r4 ask #3).

Reproduces the bench context (session already warmed by a different query,
so JVM/session startup is NOT in the number), then runs the standalone
query cold + warm twice with job-group labels and pulls the Spark UI REST
API for per-job/per-stage wall, task counts, executorRunTime and CPU time.

Prints an attribution table splitting the cold run into:
  - driver think-time (gaps between jobs: planning, whole-stage codegen
    source generation, Janino compile of NEW plan shapes);
  - the repartitionByRange boundary-sampling job (an extra input pass the
    warm run repeats but whose codegen is then cached);
  - the checkpoint+counts job and the pairs/count jobs, each with its
    first-touch inflation (executorRunTime - executorCpuTime: tasks
    blocked on the shared Janino compile lock / first-touch of generated
    classes, not doing work);
and the same decomposition warm. The claim under test: the cold residue is
range-boundary sampling + codegen first-touch, not a plan defect.

Usage: python tools/snm_cold_trace.py [sf_dir] [cores]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def _get(spark, path):
    app = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _ts(s: str) -> float:
    from datetime import datetime, timezone

    return (
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def run(sf_dir: str = "/root/testdata/sf0.1", cores: int = 32) -> None:
    from microdeduplication_spark.session import build_session

    import __spark_entry__ as em

    spark = build_session(
        app_name="snm-cold-trace", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    qs = em.queries()

    # warm the SESSION the way the bench does (earlier queries ran first):
    # parquet footers cached, session/AQE infrastructure JIT'd -- but NOT
    # this query's plan shapes, so its codegen is still cold
    sc.setJobGroup("warmup", "warmup: exact_dedup_clusters")
    qs["exact_dedup_clusters"](spark, sf_dir).count()

    runs = {}
    for label in ("cold", "warm", "warm2"):
        sc.setJobGroup(label, f"snm_window_pairs {label}")
        t0 = time.monotonic()
        n = qs["snm_window_pairs"](spark, sf_dir).count()
        runs[label] = time.monotonic() - t0
    print(
        f"standalone snm_window_pairs @ {sf_dir}, local[{cores}] "
        f"(session pre-warmed): rows={n}"
    )
    for label, sec in runs.items():
        print(f"  {label}: {sec:.2f}s")

    jobs = _get(spark, "jobs?status=succeeded")
    stages = {s["stageId"]: s for s in _get(spark, "stages?status=complete")}
    by_group: dict[str, list[dict]] = {}
    for j in jobs:
        by_group.setdefault(j.get("jobGroup", "?"), []).append(j)

    for label in ("cold", "warm"):
        group = sorted(by_group.get(label, []), key=lambda j: j["jobId"])
        if not group:
            continue
        span_start = _ts(group[0]["submissionTime"])
        span_end = _ts(group[-1]["completionTime"])
        busy = 0.0
        print(f"\n[{label}] jobs ({span_end - span_start:.2f}s job-span; "
              f"wall {runs[label]:.2f}s incl. pre-job planning):")
        prev_end = None
        for j in group:
            js, je = _ts(j["submissionTime"]), _ts(j["completionTime"])
            gap = js - prev_end if prev_end is not None else 0.0
            prev_end = je
            busy += je - js
            srun = scpu = ntask = 0.0
            names = []
            for sid in j["stageIds"]:
                s = stages.get(sid)
                if not s:
                    continue
                srun += s.get("executorRunTime", 0) / 1e3
                scpu += s.get("executorCpuTime", 0) / 1e9
                ntask += s.get("numCompleteTasks", 0)
                names.append(s["name"].split(".scala")[0])
            print(
                f"  job {j['jobId']:>3} wall {je - js:5.2f}s"
                f"  (driver gap before: {gap:4.2f}s)"
                f"  tasks {int(ntask):>3}  execRun {srun:6.2f}s"
                f"  cpu {scpu:5.2f}s  inflation {srun - scpu:6.2f}s"
                f"  [{names[0] if names else '?'}]"
            )
        first_job_gap = _ts(group[0]["submissionTime"])
        print(
            f"  driver think-time total (incl. pre-first-job planning): "
            f"{runs[label] - busy:.2f}s of {runs[label]:.2f}s wall"
        )
    spark.stop()


if __name__ == "__main__":
    run(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
