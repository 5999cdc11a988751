"""Property tests for the S6 chunker (semantics: app/main.py:2160-2170):
- every chunk has <= chunk_size words
- concatenating chunks reproduces the word sequence
- empty text yields no chunks
"""

from pyspark.sql import functions as F

from rassengine_spark.sources.chunker import chunk_table


def test_chunker_properties(spark):
    texts = [
        (1, " ".join(f"w{i}" for i in range(25))),
        (2, "one"),
        (3, ""),
        (4, "  spaced   out\ttokens\nnewline  "),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = chunk_table(df, "text", ["doc_id"], chunk_size=10)
    rows = out.orderBy("doc_id", "chunk_idx").collect()

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(r["chunk_text"].split(" ")) <= 10

    assert [len(c["chunk_text"].split(" ")) for c in by_doc[1]] == [10, 10, 5]
    # round trip: chunks rejoin into the exact word sequence
    joined = " ".join(c["chunk_text"] for c in by_doc[1])
    assert joined.split(" ") == [f"w{i}" for i in range(25)]
    assert len(by_doc[2]) == 1
    assert 3 not in by_doc  # empty text -> no chunks
    assert by_doc[4][0]["chunk_text"] == "spaced out tokens newline"
    # chunk indexes are consecutive from 0
    assert [c["chunk_idx"] for c in by_doc[1]] == [0, 1, 2]


def test_chunker_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    assert chunk_table(df, "text", ["doc_id"], chunk_size=4).count() == 0


def test_overlap_chunks_share_boundary_words(spark):
    from rassengine_spark.sources.chunker import chunk_expr_overlap
    df = spark.createDataFrame([(" ".join(f"w{i}" for i in range(10)),)],
                               "text string")
    out = df.select(chunk_expr_overlap(F.col("text"), 4, 2).alias("c")) \
            .first()["c"]
    # stride 2: windows start at 0,2,4,6 -> last covers w6..w9
    assert out[0] == "w0 w1 w2 w3"
    assert out[1] == "w2 w3 w4 w5"
    assert out[-1] == "w6 w7 w8 w9"
    # every consecutive pair shares exactly `overlap` words
    for a, b in zip(out, out[1:]):
        assert a.split()[-2:] == b.split()[:2]
    # coverage: concatenating de-overlapped windows reproduces the text
    merged = out[0].split()
    for c in out[1:]:
        merged += c.split()[2:]
    assert merged == [f"w{i}" for i in range(10)]


def test_overlap_zero_equals_plain_chunker(spark):
    from rassengine_spark.sources.chunker import (chunk_expr,
                                                  chunk_expr_overlap)
    df = spark.createDataFrame([(" ".join(f"w{i}" for i in range(23)),)],
                               "text string")
    plain = df.select(chunk_expr(F.col("text"), 5).alias("c")).first()["c"]
    zero = df.select(chunk_expr_overlap(F.col("text"), 5, 0).alias("c")) \
             .first()["c"]
    assert plain == zero


def test_overlap_short_text_single_window(spark):
    from rassengine_spark.sources.chunker import chunk_expr_overlap
    df = spark.createDataFrame([("a b",), ("",)], "text string")
    rows = [r["c"] for r in
            df.select(chunk_expr_overlap(F.col("text"), 4, 2)
                      .alias("c")).collect()]
    assert rows[0] == ["a b"]
    assert rows[1] == []
