"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink isolation, best-of-N timing, and .explain("formatted") capture.

NOT part of the frozen driver contract (bench.py is the measured artifact);
this harness exists so individual queries can be timed/planned without
paying a full bench run.

Usage:
  python bench_extra.py time q1 q2 ...      # best-of-N .count() like bench.py
  python bench_extra.py noop q1 q2 ...      # noop-sink timing (full columns)
  python bench_extra.py plan TAG q1 q2 ...  # writes plans/r06/<q>_TAG.txt
  python bench_extra.py time all            # every declared query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPS (default 2).
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
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def _spark():
    from zipline_chronon_spark.session import get_spark

    return get_spark(master=f"local[{CPUS}]", app_name="bench-extra",
                     shuffle_partitions=max(8, CPUS * 2))


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]

    import __spark_entry__ as entry

    qs = entry.queries()
    if names == ["all"]:
        names = list(qs)

    spark = _spark()
    # warm python workers + JVM I/O (same rationale as bench._warm)
    import pandas as _pd
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.count()
    df.repartition("user_id").mapInPandas(
        lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it), schema="n long"
    ).count()

    if mode == "plan":
        outdir = os.path.join(REPO, "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            dfq = qs[name](spark, SF_DIR)
            plan = dfq._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote plans/r06/{name}_{tag}.txt")
        spark.stop()
        return

    timings = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")

        def run_once():
            out = fn(spark, SF_DIR)
            if mode == "noop":
                out.write.format("noop").mode("overwrite").save()
            else:
                out.count()

        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            run_once()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", flush=True)
    spark.stop()
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, "timings": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
