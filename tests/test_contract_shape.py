"""Driver-contract shape guards: the priority rotation and oracle maps
must stay consistent (a renamed entry would otherwise only fail in the
driver's environment)."""

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 118
    assert len(set(q)) == len(q)
    # every oracle refers to a real query
    assert set(o) <= set(q)
    # round 4 retired the last rows-only entries: EVERY query has a twin
    assert set(q) - set(o) == set()


def test_driver_cap_window_is_fully_oracle_checked():
    """The driver hash-compares the FIRST 50 entries; every one of them
    must have a SQL twin (round 4 converted the last two rows-only
    entries, so the whole contract is hash-checkable)."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    missing = [n for n in q[:50] if n not in o]
    assert not missing, missing


def test_priority_names_exist():
    base = set(entrymod.queries())
    assert set(entrymod._DRIVER_CHECK_PRIORITY) <= base


def test_no_oracle_outputs_hugeint_or_decimal():
    """DuckDB types a bare integer SUM as HUGEINT (int128); the driver's
    pandas canonicalizer renders that float64 ("99111.0") while Spark's
    bigint renders "99111" — hash mismatch with rows/schema green (the
    four round-2 driver FAILs). DECIMAL diverges on stringification the
    same way. Plan-level typing only, no execution."""
    import os
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for c, ty in zip(rel.columns, rel.types):
            ts = str(ty)
            if ts == "HUGEINT" or ts.startswith("DECIMAL"):
                bad.append((name, c, ts))
    assert not bad, bad


def test_no_entry_outputs_non_scalar_columns(spark):
    """The driver's canonicalizer sorts pandas columns — array/map/struct
    cells are unhashable there and crash the comparison (round-1
    d2_capped_item_set failure mode). Schema analysis only, no
    execution."""
    bad = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            # decimal is also forbidden: per-engine stringification
            # ('1.20' vs '1.2') breaks the hash compare — round the
            # DECIMAL, then cast to double, before emitting
            if t.startswith(("array", "map", "struct", "decimal")):
                bad.append((name, f.name, t))
    assert not bad, bad
