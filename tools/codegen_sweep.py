"""Codegen-failure sweep: EXECUTE every driver-contract entry at the
given SF and fail if any plan silently fell back to interpreted mode.

Janino compile failures are invisible to correctness — Spark logs
"Failed to compile" at ERROR and runs the interpreted path, ~3-6x
slower per call (NOTES: the ner_corpus case was 6x). This sweep makes
the manual `2>err; grep -c 'Failed to compile' err` check a CI gate:
run it as a SUBPROCESS with stderr captured (the JVM writes log4j
output to the process stderr) and count matches.

Run:  python tools/codegen_sweep.py [sf_dir]   (default sf0.001)
      -> prints SWEEP_DONE <n_entries> <n_exec_errors>, exit 1 on any
         execution error (codegen fallback is counted by the CALLER
         grepping this process's stderr — see tests/test_codegen_sweep.py)

Execution uses the noop sink (`df.write.format("noop")`): the full
physical plan runs — every WholeStageCodegen span compiles — with no
driver-side result materialization.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from rassengine_spark.session import get_spark

    spark = get_spark("codegen-sweep")
    # Positive proof the JVM's ERROR log stream reaches THIS process's
    # stderr (ADVICE r07): emit one ERROR through the same log4j2 sink
    # Spark's "Failed to compile" codegen fallback uses. The caller
    # (tests/test_codegen_sweep.py) requires this sentinel in captured
    # stderr — without it, an empty grep could mean "no fallbacks" OR
    # "logs routed elsewhere / level raised", a silently vacuous gate.
    (spark._jvm.org.apache.logging.log4j.LogManager
     .getLogger("codegen-sweep")
     .error("CODEGEN_SWEEP_STDERR_SENTINEL"))
    qs = entrymod.queries()

    # The 223 noop executions are independent, and at sf0.001 each is a
    # string of small driver-bound jobs — run a few concurrently so one
    # entry's stage tail back-fills another's scheduling gaps (guide
    # §2.6). Measured on a 32-core host: 651 s sequential -> ~3x faster
    # with 4 workers. Same process, same stderr, so the caller's
    # "Failed to compile" grep is unaffected; lifecycle builders are
    # per-entry-keyed (_prepared_store) and every store write is
    # per-writer-scoped, so entries share no mutable session state.
    def run_one(item: tuple) -> tuple | None:
        name, fn = item
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return None
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            return (name, str(e).splitlines()[0][:200])

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as pool:
        errors = [r for r in pool.map(run_one, list(qs.items()))
                  if r is not None]
    for name, msg in errors:
        print(f"ENTRY_ERROR {name}: {msg}")
    print(f"SWEEP_DONE {len(qs)} {len(errors)}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
