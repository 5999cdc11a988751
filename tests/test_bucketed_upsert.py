"""S9 at scale: the bucketed copy-on-write upsert (pipeline/ingest.py
bucketed_upsert) — MERGE semantics on plain parquet. Reference semantics
under test: idempotent ``_id=doc_id`` upsert (app/main.py:1211-1282).

The load-bearing assertion is write amplification: an upsert batch must
leave every untouched bucket directory byte-identical (mtime+size+name),
because at 100 TB "rewrite the table per batch" is the difference between
a usable sink and a broken one.
"""

import os

from pyspark.sql import functions as F

from rassengine_spark.operators.index_store import term_bucket_py
from rassengine_spark.pipeline.ingest import bucketed_lookup, bucketed_upsert

N_BUCKETS = 8


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, val int")


def _snapshot(path):
    out = {}
    for dirpath, _, names in os.walk(path):
        for n in names:
            p = os.path.join(dirpath, n)
            st = os.stat(p)
            out[p] = (st.st_mtime_ns, st.st_size)
    return out


def _read(spark, path):
    return spark.read.parquet(os.path.join(path, "data"))


def test_update_append_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _mkdf(spark, [(f"d{i}", i) for i in range(20)])
    bucketed_upsert(base, path, n_buckets=N_BUCKETS)
    assert _read(spark, path).count() == 20

    # update 2 keys, append 1
    batch = _mkdf(spark, [("d3", 103), ("d7", 107), ("d99", 199)])
    bucketed_upsert(batch, path)
    got = {r.doc_id: r.val for r in _read(spark, path).collect()}
    assert len(got) == 21
    assert got["d3"] == 103 and got["d7"] == 107 and got["d99"] == 199
    assert got["d0"] == 0

    # idempotence: same batch again -> identical table
    bucketed_upsert(batch, path)
    again = {r.doc_id: r.val for r in _read(spark, path).collect()}
    assert again == got


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _mkdf(spark, [(f"d{i}", i) for i in range(64)])
    bucketed_upsert(base, path, n_buckets=N_BUCKETS)
    data = os.path.join(path, "data")
    kb_dirs = [d for d in os.listdir(data) if d.startswith("kb=")]
    assert len(kb_dirs) > 1   # enough spread for the assertion to bite

    before = _snapshot(data)
    batch = _mkdf(spark, [("d5", 105)])
    touched_kb = term_bucket_py("d5", N_BUCKETS)
    bucketed_upsert(batch, path)
    after = _snapshot(data)

    touched_prefix = os.path.join(data, f"kb={touched_kb}")
    for p, sig in before.items():
        if p.startswith(touched_prefix) or os.path.basename(p) == "_SUCCESS":
            continue
        assert after.get(p) == sig, f"untouched bucket file rewritten: {p}"
    # and the touched bucket DID change
    assert any(p.startswith(touched_prefix) and after.get(p) != sig
               for p, sig in before.items())


def test_lookup_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _mkdf(spark, [(f"d{i}", i) for i in range(40)])
    bucketed_upsert(base, path, n_buckets=N_BUCKETS)

    out = bucketed_lookup(spark, path, ["d3", "d11"])
    got = {r.doc_id: r.val for r in out.collect()}
    assert got == {"d3": 3, "d11": 11}
    assert "kb" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "kb" in plan


def test_legacy_underscore_meta_still_reads(spark, tmp_path):
    """Stores written before the meta-dir rename (leading underscore)
    must keep resolving through _meta_dir's fallback."""
    path = str(tmp_path / "tbl")
    bucketed_upsert(_mkdf(spark, [("a", 1)]), path, n_buckets=N_BUCKETS)
    os.rename(os.path.join(path, "upsert_meta"),
              os.path.join(path, "_upsert_meta"))
    bucketed_upsert(_mkdf(spark, [("b", 2)]), path, n_buckets=999)
    got = _read(spark, path)
    assert got.count() == 2


def test_first_write_creates_meta(spark, tmp_path):
    path = str(tmp_path / "tbl")
    bucketed_upsert(_mkdf(spark, [("a", 1)]), path, n_buckets=N_BUCKETS)
    meta = spark.read.parquet(os.path.join(path, "upsert_meta")).collect()
    assert meta[0]["n_buckets"] == N_BUCKETS
    # later upserts must reuse the persisted bucket count even if the
    # caller passes a different one
    bucketed_upsert(_mkdf(spark, [("b", 2)]), path, n_buckets=999)
    got = _read(spark, path)
    assert got.count() == 2
    kbs = {r.kb for r in got.select("kb").collect()}
    assert all(0 <= kb < N_BUCKETS for kb in kbs)


def test_bucketed_delete_removes_keys_only_touched_buckets(spark, tmp_path):
    import glob
    import os

    from rassengine_spark.pipeline.ingest import (bucketed_delete,
                                                  bucketed_lookup,
                                                  bucketed_upsert)

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(i, f"text {i}") for i in range(50)],
                               "doc_id long, text string")
    bucketed_upsert(df, path, "doc_id", n_buckets=8)
    before = {p: os.path.getmtime(p)
              for p in glob.glob(os.path.join(path, "data", "kb=*",
                                              "*.parquet"))}
    from rassengine_spark.operators.index_store import term_bucket_py
    victims = [3, 17]
    victim_kbs = {term_bucket_py(str(k), 8) for k in victims}
    bucketed_delete(spark, path, victims, "doc_id")

    remaining = spark.read.parquet(os.path.join(path, "data"))
    ids = {r.doc_id for r in remaining.collect()}
    assert ids == set(range(50)) - set(victims)
    # untouched bucket files stay byte-identical (same path, same mtime)
    for p, mt in before.items():
        kb = int(p.split("kb=")[1].split("/")[0])
        if kb not in victim_kbs:
            assert os.path.getmtime(p) == mt
    # lookup of a deleted key returns nothing; idempotent re-delete
    assert bucketed_lookup(spark, path, victims, "doc_id").count() == 0
    bucketed_delete(spark, path, victims, "doc_id")
    assert spark.read.parquet(os.path.join(path, "data")).count() == 48


def test_bucketed_delete_empties_whole_bucket(spark, tmp_path):
    import os

    from rassengine_spark.operators.index_store import term_bucket_py
    from rassengine_spark.pipeline.ingest import (bucketed_delete,
                                                  bucketed_upsert)

    path = str(tmp_path / "t")
    rows = [(i, f"v{i}") for i in range(30)]
    bucketed_upsert(spark.createDataFrame(rows, "doc_id long, text string"),
                    path, "doc_id", n_buckets=4)
    # delete EVERY key of one bucket: its directory must disappear (a
    # dynamic overwrite alone would silently leave it)
    kb0 = [i for i in range(30) if term_bucket_py(str(i), 4) == 0]
    bucketed_delete(spark, path, kb0, "doc_id")
    assert not os.path.exists(os.path.join(path, "data", "kb=0"))
    got = {r.doc_id for r in
           spark.read.parquet(os.path.join(path, "data")).collect()}
    assert got == set(range(30)) - set(kb0)
