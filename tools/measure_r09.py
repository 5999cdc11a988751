"""Round-8 measurement harness (guide §1): time individual entries with
the noop sink (so the computation is measured, not the collect/sink) and
dump .explain("formatted") for each to plans/r09/<name>_<tag>.txt.

Usage:
  python tools/measure_r09.py <tag> [entry ...]        # default: all
  SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).

Per entry prints one line:  <name>  plan_s=<s> noop_s=<s> [noop_s2=<s>]
(plan_s = queries()[name] call, i.e. DataFrame construction incl. any
eager driver work; noop_s = first noop-sink execution; second run shows
steady state). Builders (bench_phases) run untimed first, as in bench.py.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    want = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from rassengine_spark.session import get_spark, load_tables

    spark = get_spark("measure_r09")
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    (spark.range(0, 64, 1, 32).toDF("id")
          .mapInPandas(lambda it: it, "id long").count())

    qs = entrymod.queries()
    names = want or list(qs)
    phases = entrymod.bench_phases()
    for name in names:
        if name in phases:
            phases[name](spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)

    tracker = spark.sparkContext.statusTracker()
    for name in names:
        spark.sparkContext.setJobGroup(f"m_{name}", f"r09 measure: {name}")
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
        except Exception as e:
            print(f"{name}  PLAN ERROR: {e}")
            continue
        t1 = time.perf_counter()
        plan_jobs = len(tracker.getJobIdsForGroup(f"m_{name}"))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        try:
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            jobs1 = len(tracker.getJobIdsForGroup(f"m_{name}")) - plan_jobs
            df.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            print(f"{name}  plan_s={t1 - t0:.3f} noop_s={t3 - t2:.3f} "
                  f"noop_s2={t4 - t3:.3f} plan_jobs={plan_jobs} "
                  f"noop_jobs={jobs1}", flush=True)
        except Exception as e:
            print(f"{name}  plan_s={t1 - t0:.3f} EXEC ERROR: {e}",
                  flush=True)
        spark.sparkContext.setJobGroup("idle", "idle")


if __name__ == "__main__":
    main()
