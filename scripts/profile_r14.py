"""r14 optimization-round profiler: isolated best-of-N timing + plan capture.

Usage:
    python scripts/profile_r14.py q_id1 q_id2 ...        # time only
    python scripts/profile_r14.py --plans q_id1 ...      # also write plans/r14/<id>_<tag>.txt
    PROFILE_TAG=before|after selects the plan filename suffix.
    PROFILE_RUNS=0 --plans captures plans without timing.

Same methodology as bench.py (noop sink, GC barrier between runs), but
isolated per-id so the numbers are comparable to BENCH_MINIMA floors.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breweries_case_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))
TAG = os.environ.get("PROFILE_TAG", "before")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plans = "--plans" in sys.argv
    from __spark_entry__ import queries

    qs = queries()
    spark = get_session(
        app_name="profile_r14",
        extra_configs={"spark.ui.showConsoleProgress": "false"},
    )
    # neutral warmup, same as bench.py
    for fname in sorted(os.listdir(SF_DIR)):
        if fname.endswith(".parquet"):
            spark.read.parquet(os.path.join(SF_DIR, fname)).count()

    out: dict[str, list[float]] = {}
    for name in args:
        if name not in qs:
            print(f"!! unknown id {name}", file=sys.stderr)
            continue
        if want_plans:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as fh:
                fh.write(plan)
        runs = []
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name] = sorted(runs)
        print(json.dumps({name: out[name]}), flush=True)
    print("FINAL " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
