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
