"""One-shot sf1 headline: the flagship PIT backfill at ~4M turns.

Demonstrates the memory/cap margins the 100-TB story rests on (group-boundary
rechunk in the Arrow engine, time-slice salting for the hot conversation)
at 10x the per-round bench scale. Writes scripts/../BENCH_sf1_last.json.

Run AFTER any other bench: this is a full-machine measurement.
    python scripts/bench_sf1.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses transcripts_path / flagship / session)


def main() -> None:
    sf = float(os.environ.get("SPARK_GRAFT_SF1", "1.0"))
    tpath = bench.transcripts_path(sf)

    import pyarrow.dataset as ds

    n_turns = ds.dataset(tpath).count_rows()
    spark = bench._new_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    bench._warm(spark, tpath)

    rows = bench.flagship_backfill(spark, tpath)  # warm pass (plan + workers)
    assert rows == n_turns, (rows, n_turns)
    best = float("inf")
    reps = []
    # clamp: reps=0 would leave best=inf and json.dump would emit
    # non-standard Infinity (round-5 advice)
    for _ in range(max(1, int(os.environ.get("SPARK_GRAFT_SF1_REPS", "2")))):
        t0 = time.time()
        bench.flagship_backfill(spark, tpath)
        reps.append(round(time.time() - t0, 3))
        best = min(best, reps[-1])
    spark.stop()

    out = {
        "metric": "flagship_pit_backfill_sf1_sec",
        "value": best,
        "unit": "sec",
        "sf": sf,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / best),
        "reps": reps,
    }
    with open(os.path.join(REPO, "BENCH_sf1_last.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
