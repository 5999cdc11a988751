"""Distributed BPE trainer: merges must equal a reference driver-side BPE
over the same word frequencies, and segmentation must apply them exactly."""

from collections import Counter

from pyspark.sql import functions as F

from rassengine_spark.llmops.tokenizer import (bpe_merges_df, bpe_segment_expr,
                                               bpe_train, word_freqs)


def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats eat the fat rats"),
        (3, "that hat is the best hat that that cat had"),
        (4, "low lower lowest newer newest"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def _ref_bpe(freqs: dict, n_merges: int):
    """Reference implementation: list-of-symbols + greedy left-to-right
    merge, (count desc, lhs asc, rhs asc) selection."""
    seqs = {tuple(w): n for w, n in freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for syms, n in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (a, b), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, cnt))
        new = {}
        for syms, n in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        seqs = new
    return merges


def test_bpe_merges_match_reference(spark):
    df = corpus(spark)
    freqs = {r.w: r.n for r in word_freqs(df, "text").collect()}
    expect = _ref_bpe(freqs, 8)
    got, _ = bpe_train(df, "text", n_merges=8)
    assert got == expect, (got, expect)


def test_bpe_batched_rounds_match_sequential(spark):
    """The guarded two-merges-per-aggregate batching (bpe_train's
    (A)(B)(C)(E) guards) must be invisible in the output: batch_probe=1
    reproduces the old one-merge-per-round loop exactly (head of length
    1 can never batch), and the default batched run must equal it AND
    the reference BPE merge-for-merge, count-for-count, at a depth where
    batching actually fires on this corpus."""
    df = corpus(spark)
    freqs = {r.w: r.n for r in word_freqs(df, "text").collect()}
    expect = _ref_bpe(freqs, 16)
    sequential, seq_seqs = bpe_train(df, "text", n_merges=16,
                                     batch_probe=1)
    batched, bat_seqs = bpe_train(df, "text", n_merges=16)
    assert batched == sequential == expect
    # final segmentations identical row-for-row as well
    key = lambda rows: sorted((r.w, r.seq, r.n) for r in rows)
    assert key(bat_seqs.collect()) == key(seq_seqs.collect())


def test_bpe_segmentation_applies_merges(spark):
    df = corpus(spark)
    merges, _ = bpe_train(df, "text", n_merges=6)
    words = spark.createDataFrame(
        [("that",), ("lowest",), ("cat",), ("x",)], "w string")
    segs = {r.w: r.segs for r in words.select(
        "w", bpe_segment_expr(F.col("w"), merges).alias("segs")).collect()}
    # every segmentation concatenates back to the word
    for w, segs_w in segs.items():
        assert "".join(segs_w) == w, (w, segs_w)
    assert segs["x"] == ["x"]
    # the most frequent pairs actually merged somewhere
    assert any(len(s) > 1 for s in segs["that"] + segs["cat"])


def test_bpe_merges_df_shape(spark):
    out = bpe_merges_df(spark, corpus(spark), "text", n_merges=4).collect()
    assert [r.step for r in out] == [1, 2, 3, 4]
    assert all(r.pair_count >= 1 for r in out)


def test_bpe_store_roundtrip(spark, tmp_path):
    """Persisted merges must reproduce the live segmentation exactly, and
    the saved vocab must carry the post-merge forms."""
    from rassengine_spark.llmops.tokenizer import (bpe_segment_from_store,
                                                   load_bpe_merges,
                                                   save_bpe)
    df = corpus(spark)
    path = str(tmp_path / "bpe")
    save_bpe(spark, df, "text", path, n_merges=5)
    live, _ = bpe_train(df, "text", n_merges=5)
    assert load_bpe_merges(spark, path) == live
    words = spark.createDataFrame([("that",), ("lowest",)], "w string")
    a = words.select(
        bpe_segment_expr(F.col("w"), live).alias("s")).collect()
    b = words.select(
        bpe_segment_from_store(spark, path, F.col("w")).alias("s")).collect()
    assert [r.s for r in a] == [r.s for r in b]
    vocab = {r.w: r.seq for r in
             spark.read.parquet(f"{path}/vocab").collect()}
    assert "the" in vocab and vocab["the"].startswith("_")


def test_bpe_oracle_matches_when_merges_exhaust(spark):
    """A pair-poor corpus stops merging before _BPE_MERGES on both
    engines: Spark's early break and the oracle's LEFT JOIN stages must
    agree on merges AND token counts (a CROSS JOIN oracle would zero
    every count here)."""
    import duckdb

    import __spark_entry__ as entrymod
    from rassengine_spark.llmops.tokenizer import bpe_token_counts

    rows = [(1, "ab cd"), (2, "ab cd"), (3, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = bpe_train(df, "text", n_merges=entrymod._BPE_MERGES)
    assert len(merges) < entrymod._BPE_MERGES          # really exhausts
    counts = {r.id: r.bpe_tokens for r in
              bpe_token_counts(df, "text", "doc_id",
                               n_merges=entrymod._BPE_MERGES).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    assert dict(con.sql(entrymod._sql_tokenizer_bpe_counts()).fetchall()) \
        == counts
    assert [tuple(r) for r in
            con.sql(entrymod._sql_tokenizer_bpe()).fetchall()] == merges


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
                min_size=3, max_size=25))
def test_bpe_matches_reference_on_adversarial_words(spark, words):
    """Property: the delimited-string merge trick equals the reference
    list-walk BPE on corpora built from a 2-letter alphabet — the worst
    case for overlapping merges ('aaaa' under (a,a), then (aa,aa), ...)
    and for merged symbols that are prefixes of each other."""
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    freqs = {r.w: r.n for r in word_freqs(df, "text").collect()}
    expect = _ref_bpe(freqs, 5)
    got, seqs = bpe_train(df, "text", n_merges=5)
    assert got == expect, (words, got, expect)
    # final segmentation concatenates back to each word
    for r in seqs.collect():
        assert r.seq.startswith("_") and r.seq.endswith("_")
        assert "".join(r.seq.strip("_").split("__")) == r.w, r
