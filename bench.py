"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {name: sec}, "sf"}.

Per-query time = plan construction + execution + collect of the (small)
result, measured after a session warm-up query so JVM startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "q1_keyword_phrase",
    "q2_semantic_knn",
    "q3_hybrid_search",
    "q6_terms_agg",
    "q8_temporal",
    "q12_collapse_best_per_key",
    "w2_last_n_per_key",
    "q13_name_resolution",
    "s6_chunker",
]

# Same-run sentinel normalization (VERDICT r06 #1): a fixed 10-query set
# whose CODE has been untouched since round 1, with their round-1
# driver-recorded times at sf0.1 (BENCH_r01.json tail). host_factor =
# median(t_now / t_r01) over these — a pure measure of the machine, since
# the plans are identical. Per-query regression judgment divides the raw
# seconds by this factor, so host CPU contention (measured 1.8x uniform
# on unchanged entries in round 6) can never masquerade as a plan
# regression again. Spans plan classes: scan-agg, join, as-of join,
# window, sessionize, text expr, regex, Arrow pandas path.
SENTINELS_R01_SF01 = {
    "s3_markdown_strip": 0.383,
    "events_funnel": 0.324,
    "tpch_q12_priority_mix": 0.506,
    "tpch_q5_region_revenue": 0.746,
    "j2_content_join": 0.135,
    "events_asof_join": 0.670,
    "orders_running_total": 0.182,
    "events_sessionize": 1.349,
    "text_pii_redact": 0.490,
    "mm_resize_meta": 0.311,
}

# The slowest entries of the last committed bench snapshot, warmed once
# untimed before the measured loop (first-call plan+codegen amortization)
WARM_FIRST = [
    # refreshed round 8: r07 top-18 minus the 12 consolidated twins
    # (FOLD_TWINS; re-registered later in r08)
    "sim_hnsw_recall",
    "basket_part_pagerank",
    "prep_training_corpus",
    "m_quality_classifier_eval",
    "mm_ahash_incremental",
    "sim_ivfpq_residual_topk",
    "bm25_store_append_ranked",
    "basket_part_communities",
    "decontam_neardup_leakage",
    "basket_part_communities_frac",
    "decontam_report",
    "decontam_ngram_overlap",
    "text_kn_lm_score",
    "dedup_cc_clusters",
    "split_dsir_weights",
    "pipeline_health_rollup",
]


def main():
    # Bulletproof stdout: the contract is ONE JSON line on fd 1 and nothing
    # else, but the JVM (and any library) can write to the process-level
    # stdout directly, bypassing sys.stdout. Save the real fd 1, point fd 1
    # at stderr for the whole run (the JVM inherits that at launch), and
    # write the JSON to the saved fd at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from rassengine_spark.session import get_spark, load_tables

    spark = get_spark("bench")
    # warm up: JVM + parquet footers, not billed to any query
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    # spawn + warm the Arrow Python workers (daemon fork pool, reused by
    # every pandas-path query); one tiny batch per core
    import pandas as _pd

    def _noop(it):
        for pdf in it:
            yield pdf

    (spark.range(0, 64, 1, 32).toDF("id")
          .mapInPandas(_noop, "id long").count())
    # warm MLlib (class loading + BLAS init): a 4-row LR fit, so the
    # learned-quality entry isn't billed the one-time framework cost
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors
    _lr_df = spark.createDataFrame(
        [(Vectors.dense([float(i % 2)]), float(i % 2)) for i in range(4)],
        ["features", "label"])
    LogisticRegression(maxIter=1).fit(_lr_df)

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE]
    # BUILD phase (VERDICT r07 #1): lifecycle entries expose a prepare()
    # seam — time index construction here, once, so the per-query number
    # below measures SERVING only (the cost paid per query at scale;
    # builds amortize over every future query). build_s is reported
    # per-entry alongside serve_s.
    builds = {}
    phases = getattr(entrymod, "bench_phases", dict)()

    # r09 (guide §2.6): the 25 builders are independent lifecycles on
    # disjoint store paths, so they run from a 4-thread pool — one
    # builder's stage tail back-fills another's scheduling gaps (the
    # codegen sweep runs all 223 entries 4-way concurrent the same way).
    # Accounting: per-builder build_s is now the builder's SPAN under
    # concurrency (inflated by contention — spans are attribution hints,
    # not solo costs), and build_tot_s is the build PHASE WALL. Under
    # the old sequential loop span-sum == wall, so the r08 build_tot_s
    # numbers remain directly comparable; build_span_sum_s keeps the raw
    # sum alongside.
    def build_one(item):
        name, prepare = item
        t0 = time.perf_counter()
        try:
            prepare(spark, sf_dir)
            return name, round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench build error in {name}: {e}", file=sys.stderr)
            return name, None

    from concurrent.futures import ThreadPoolExecutor
    t_build0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as build_pool:
        for name, b in build_pool.map(
                build_one,
                [(n, p) for n, p in phases.items() if n in qs]):
            builds[name] = b
    build_wall = round(time.perf_counter() - t_build0, 3)
    # warm-up pass (VERDICT r4 #5): the historically slowest entries pay
    # 0.7-1.5 s of first-call plan+codegen that is session cost, not plan
    # cost (pagerank warm 3.7 s vs cold 4.5) — run them once untimed so
    # the per-query numbers reflect steady state. Lifecycle entries serve
    # from the store just built (per-process cache), so warming them
    # exercises the serve path only.
    for name in WARM_FIRST:
        if name in qs:
            if name in phases and builds.get(name) is None:
                continue   # build failed: warming would rebuild UNTIMED
                #            and the timed-loop retry would then record a
                #            near-zero (cache-hit) build_s for it
            try:
                qs[name](spark, sf_dir).collect()
            except Exception:
                pass                       # the timed run reports it
    timings = {}
    build_retry_s = 0.0
    for name in names:
        if name in phases and builds.get(name) is None:
            # the build phase failed earlier: retry it HERE (still timed
            # as build) so the query call below never silently pays a
            # rebuild inside its serve number — the exact conflation the
            # phase split exists to prevent. A second failure marks the
            # entry failed rather than mismeasured.
            t0 = time.perf_counter()
            try:
                phases[name](spark, sf_dir)
                builds[name] = round(time.perf_counter() - t0, 3)
                build_retry_s += builds[name]   # extends the phase wall
            except Exception as e:
                print(f"bench build retry failed for {name}: {e}",
                      file=sys.stderr)
                timings[name] = None
                continue
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = None
    ok = {k: v for k, v in timings.items() if v is not None}
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(ok.values()), 3)
    # same-run sentinel host factor (only meaningful at the sf the
    # round-1 baselines were recorded at)
    host_factor = None
    sentinels = {}
    if sf_val == 0.1:
        ratios = []
        for s_name, r01 in SENTINELS_R01_SF01.items():
            now = ok.get(s_name)
            if now is not None:
                sentinels[s_name] = {"r01": r01, "now": now,
                                     "ratio": round(now / r01, 3)}
                ratios.append(now / r01)
        if len(ratios) >= 5:
            ratios.sort()
            mid = len(ratios) // 2
            med = (ratios[mid] if len(ratios) % 2
                   else (ratios[mid - 1] + ratios[mid]) / 2)
            host_factor = round(med, 3)
    ok_builds = {k: v for k, v in builds.items() if v is not None}
    # build PHASE WALL (== the old sequential span-sum when builders ran
    # one at a time; see the build-pool comment above). Retried builds
    # (timed-loop fallback) extend the phase cost, so their spans add on.
    build_span_sum = round(sum(ok_builds.values()), 3)
    build_tot = round(build_wall + build_retry_s, 3)
    full = json.dumps({
        "metric": "total wall-clock sec across engine queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "host_factor": host_factor,
        "sentinels": sentinels,
        "norm_value": (round(total / host_factor, 3)
                       if host_factor else None),
        # lifecycle entries: queries[name] above is the SERVE phase;
        # index construction (build+append+compact) is timed here once.
        # These entries' serve_s are NOT comparable to pre-r08
        # full-lifecycle numbers (they were re-seamed in r08) — compare
        # serve+build_s to old numbers (ADVICE r08 #4).
        "build_s": builds,
        "build_tot_s": build_tot,
        "build_span_sum_s": build_span_sum,
        "lifecycle_entries": sorted(builds),
    })
    # Full per-query detail is written to a PER-RUN file keyed by core
    # count and sf (VERDICT r08 #2: the driver re-runs the bench at a
    # lower core count, and a single BENCH_local.json got overwritten —
    # the 32-core detail was lost and PERF could compare only 5 queries).
    # BENCH_local.json additionally keeps the LATEST run for tools that
    # read the old name; "full" on the stdout line names the per-run file
    # this run actually produced.
    cpus_tag = os.environ.get("SPARK_GRAFT_CPUS", "all")
    detail_name = f"BENCH_local_c{cpus_tag}_sf{sf}.json"
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in (detail_name, "BENCH_local.json"):
        try:
            with open(os.path.join(here, fname), "w") as f:
                f.write(full + "\n")
        except OSError:
            pass
    qmap: dict[str, float] = {}
    # failed queries (timings[name] is None) are reported separately from
    # budget-truncated ones — a run with bench errors must not read as
    # mere truncation on the driver-visible line (ADVICE r4)
    payload = {
        "metric": "tot_s",
        "value": round(total, 1),
        "unit": "sec",
        "queries": qmap,
        "sf": sf_val,
        # build/serve split (VERDICT r07 #1): queries[...] times are
        # SERVE-only for lifecycle entries; their one-time index builds
        # sum to build_tot_s. Per-entry [build_s, serve_s] detail lives
        # in the per-run full file named by "full" — it was moved off
        # this line in r09 so ~40 per-query serve times fit the driver's
        # 2000-byte tail window instead of ~7 (VERDICT r08 #2; the
        # round-over-round PERF set had shrunk to 5 comparable entries).
        "build_tot_s": round(build_tot, 1),
        # median same-run ratio of 10 untouched-since-round-1 sentinel
        # queries to their BENCH_r01 times: divide raw seconds by this
        # to remove host speed from round-over-round comparison
        "host_factor": host_factor,
        "norm_tot_s": (round(total / host_factor, 1)
                       if host_factor else None),
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
        "queries_omitted": len(ok),
        "full": detail_name,
    }
    # the driver's tail window is exactly 2000 bytes (BENCH_r02's 3.5 KB
    # line lost its start and parsed as null; every kept tail since is
    # len 2000) — budget the WHOLE line comfortably under it
    line_budget = 1850
    for name, t in sorted(ok.items(), key=lambda kv: -kv[1]):
        qmap[name] = round(t, 2)
        payload["queries_omitted"] = len(ok) - len(qmap)
        if len(json.dumps(payload, separators=(",", ":"))) > line_budget:
            del qmap[name]
            payload["queries_omitted"] = len(ok) - len(qmap)
            break
    os.write(real_stdout,
             (json.dumps(payload, separators=(",", ":")) + "\n").encode())


if __name__ == "__main__":
    main()
