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
    # rows-only remainder is the documented pair, nothing else
    assert set(q) - set(o) == {"s7_embed_hash_ngram", "sketch_daily_rollup"}


def test_driver_cap_window_is_fully_oracle_checked():
    """The driver hash-compares the FIRST 50 entries; every one of them
    must have a SQL twin (a rows-only entry in the window wastes a
    stamp)."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    missing = [n for n in q[:50] if n not in o]
    assert not missing, missing


def test_priority_names_exist():
    base = set(entrymod.queries())
    assert set(entrymod._DRIVER_CHECK_PRIORITY) <= base


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
