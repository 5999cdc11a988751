"""End-to-end training-corpus prep pipeline (llmops/prep.py): each stage
removes exactly the rows it should, and the stage report tracks them."""

from pyspark.sql import functions as F

from rassengine_spark.llmops.prep import prepare_training_corpus

GOOD = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby")
NEAR = ("a quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby")
EVAL = ("evaluation benchmark question about spark shuffle partitions "
        "and adaptive execution behavior under skew")


def corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),                                   # exact dup of 1
        (3, NEAR),                                   # near dup of 1
        (4, EVAL),                                   # contaminated vs eval
        (5, "x" * 400),                              # unsplittable junk -> low quality
        (6, "contact me at alice@example.com for the quick brown "
            "results of the fox study we discussed earlier today"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_prep_pipeline_stages(spark):
    eval_df = spark.createDataFrame([(100, EVAL)], "doc_id int, text string")
    out, report = prepare_training_corpus(
        corpus(spark), eval_df, near_dup_threshold=0.5,
        decontam_threshold=0.8, min_quality=0.66)
    stages = dict(report)
    assert stages["input"] == 6
    assert stages["exact_dedup"] == 5        # doc 2 dropped
    assert stages["near_dedup"] == 4         # doc 3 clustered under 1
    assert stages["decontam"] == 3           # doc 4 overlaps the eval set
    assert stages["quality"] == 2            # doc 5 fails the composite
    assert stages["split"] == 2
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 6}
    # PII redacted in place; split column assigned
    assert "[EMAIL]" in rows[6]["text"]
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


def test_prep_no_eval_no_counts(spark):
    out, report = prepare_training_corpus(
        corpus(spark), None, count_stages=False)
    assert report == []
    # no eval set -> no decontam stage, doc 4 survives
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 4, 6}


def test_prep_unicode_stage_enables_exact_dedup(spark):
    """NFC before dedup: decomposed and composed spellings of the same
    text hash identically, so exact dedup collapses them."""
    from rassengine_spark.llmops.prep import prepare_training_corpus
    body = " au lait unique sentence with enough words to pass"
    docs = spark.createDataFrame(
        [(1, "Cafe\u0301" + body),      # decomposed
         (2, "Caf\u00e9" + body),       # composed == 1 after NFC
         (3, "different doc entirely with plenty of words")],
        "doc_id long, text string")
    out, report = prepare_training_corpus(
        docs, None, text_col="text", id_col="doc_id",
        unicode_normalize=True, min_quality=0.0, redact=False)
    stages = dict(report)
    assert stages["unicode_clean"] == 3
    assert stages["exact_dedup"] == 2
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 3}


def test_prep_line_dedup_stage_strips_boilerplate(spark):
    """The C4 line pass drops corpus-wide boilerplate from every doc but
    the first occurrence BEFORE near-dup clustering sees it."""
    from rassengine_spark.llmops.prep import prepare_training_corpus
    hdr = "(c) SAME BOILERPLATE HEADER\n"
    docs = spark.createDataFrame(
        [(1, hdr + "first doc body with plenty of distinct words one"),
         (2, hdr + "second doc body also with its own words two"),
         (3, hdr + "third doc body more unique words again three")],
        "doc_id long, text string")
    out, report = prepare_training_corpus(
        docs, None, text_col="text", id_col="doc_id",
        drop_boilerplate_lines=True, min_quality=0.0, redact=False)
    stages = dict(report)
    assert stages["line_dedup"] == 3
    texts = {r.doc_id: r.text for r in out.collect()}
    assert set(texts) == {1, 2, 3}
    assert texts[1].startswith("(c) SAME BOILERPLATE HEADER")
    assert not texts[2].startswith("(c)")
    assert not texts[3].startswith("(c)")


def test_prep_substring_stage_drops_verbatim_copies(spark):
    from pyspark.sql import functions as F

    from rassengine_spark.llmops.prep import prepare_training_corpus

    passage = ("a long verbatim passage that appears word for word inside "
               "two otherwise very different documents " * 3)
    filler = " ".join(f"unique{i} filler words around here" for i in range(12))
    rows = [
        (1, "first doc intro " + passage + " first doc tail " + filler),
        (2, "second doc " + " ".join(f"other{i}" for i in range(40))
            + " " + passage),
        (3, "completely unrelated " + " ".join(f"w{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, report = prepare_training_corpus(
        df, None, text_col="text", id_col="doc_id",
        substring_min_shared=5, min_quality=0.0, redact=False)
    ids = {r.doc_id for r in out.collect()}
    assert 2 not in ids            # copy loses to the lower id
    assert {1, 3} <= ids
    assert dict(report)["substring_dedup"] == 2


def test_prep_dsir_stage_keeps_target_like_docs(spark):
    from rassengine_spark.llmops.prep import prepare_training_corpus

    target = spark.createDataFrame(
        [(100, "patient has severe hypertension and treatment")],
        "doc_id long, text string")
    rows = [
        (1, "patient has severe hypertension and treatment"),
        # target-like topic but NOT a near-dup of doc 1 (near-dedup runs
        # before the DSIR stage and would otherwise eat the copy)
        (2, "clinic notes say severe hypertension needs treatment plans"),
        (3, "stock market news " + " ".join(f"w{i}" for i in range(20))),
        (4, "weather report " + " ".join(f"v{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, report = prepare_training_corpus(
        df, None, text_col="text", id_col="doc_id",
        dsir_target=target, dsir_keep_pct=25,
        min_quality=0.0, redact=False)
    ids = {r.doc_id for r in out.collect()}
    # the two target-like docs survive; the unrelated pair drops
    assert {1, 2} <= ids and 3 not in ids and 4 not in ids
    assert dict(report)["dsir_select"] == len(ids)


def test_prep_longest_keeper_policy(spark):
    """keeper='longest' keeps the longest member of each near-dup
    cluster (min-id would keep doc 1); unclustered docs untouched."""
    from rassengine_spark.llmops.prep import prepare_training_corpus
    longer = GOOD + " plus an extra closing sentence with more words"
    docs = spark.createDataFrame(
        [(1, GOOD), (2, longer), (3, EVAL)], "doc_id int, text string")
    out, _ = prepare_training_corpus(
        docs, None, text_col="text", id_col="doc_id", keeper="longest",
        min_quality=0.0, redact=False)
    assert {r.doc_id for r in out.collect()} == {2, 3}
    out2, _ = prepare_training_corpus(
        docs, None, text_col="text", id_col="doc_id",
        min_quality=0.0, redact=False)
    assert {r.doc_id for r in out2.collect()} == {1, 3}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        prepare_training_corpus(docs, None, keeper="best")
