"""Per-query profiling harness for the optimization round (guide §1).

NOT the official bench (bench.py is frozen): this one isolates each
registry query with the noop sink, records wall time over N reps,
counts the Spark jobs each run launches (fixed per-job costs dominate
at small SF — a query that launches 40 jobs cannot go fast no matter
what its plan says), and dumps .explain("formatted") to plans/r08/.

Usage:
  python bench_extra.py                  # all bench queries, 2 reps
  python bench_extra.py q01 s02 ...      # subset
  REPS=4 python bench_extra.py d10       # more reps
  PLANS=0 python bench_extra.py          # skip plan dumps
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "2"))
DUMP_PLANS = os.environ.get("PLANS", "1") == "1"
PLAN_DIR = os.path.join(REPO, "plans", os.environ.get("PLAN_TAG", "r08"))
PLAN_SUFFIX = os.environ.get("PLAN_SUFFIX", "_before")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _next_job_id(sc) -> int:
    # DAGScheduler.nextJobId is an AtomicInteger (py4j renders it as
    # int). Counts every job including ones submitted from streaming /
    # foreachBatch threads (job groups are thread-local, would miss
    # those).
    v = sc._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else v.get()


def main():
    from bench import BENCH_QUERIES, _burn_host

    from kblock_spark.queries import REGISTRY
    from kblock_spark.session import get_spark

    # same steady-state discipline as bench.py: drain the host's burst
    # credits so the profile runs in the regime the driver measures in
    if os.environ.get("BURN", "1") == "1":
        _burn_host(45)

    wanted = sys.argv[1:]
    if wanted:
        names = [n for n in BENCH_QUERIES if any(n.startswith(w) for w in wanted)]
    else:
        names = list(BENCH_QUERIES)

    spark = get_spark("kblock-bench-extra")
    sc = spark.sparkContext
    os.makedirs(PLAN_DIR, exist_ok=True)

    # same warm-up as bench.py
    for t in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    import pandas as _pd

    spark.range(0, CPUS * 4, 1, CPUS * 4).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [1]}) for _ in it), "x long"
    ).count()

    rows = []
    for name in names:
        fn, _sql = REGISTRY[name]
        sc.setJobDescription(f"profile:{name}")
        samples, jobs = [], []
        err = None
        try:
            for _ in range(REPS):
                j0 = _next_job_id(sc)
                t0 = time.time()
                df = fn(spark, SF_DIR)
                _force(df)
                samples.append(round(time.time() - t0, 3))
                jobs.append(_next_job_id(sc) - j0)
            if DUMP_PLANS:
                with open(
                    os.path.join(PLAN_DIR, f"{name}{PLAN_SUFFIX}.txt"), "w"
                ) as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    ))
        except Exception as ex:  # noqa: BLE001
            err = f"{type(ex).__name__}: {ex}"
        finally:
            sc.setJobDescription(None)
        rec = {
            "q": name,
            "best": min(samples) if samples else -1.0,
            "samples": samples,
            "jobs": jobs,
            "err": err,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -r["best"])
    print("\n== slowest ==")
    for r in rows[:25]:
        print(f"{r['q']:34s} best={r['best']:7.3f}s jobs={r['jobs']}")
    out = os.path.join(REPO, "bench_runs", "r8_profile.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
