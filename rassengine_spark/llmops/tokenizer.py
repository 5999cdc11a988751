"""Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units" — the public BPE algorithm):
learn the top-N merge rules from corpus word frequencies.

Spark-first shape: the corpus is touched ONCE (word-frequency aggregate —
the standard trick: merges operate on the distinct-word table, which is
orders of magnitude smaller than the corpus). Each merge iteration is one
pair-count aggregate over the vocab table + a 1-row argmax collect + a
per-row rewrite projection; lineage is cut with localCheckpoint so N
iterations stay N cheap jobs (the connected-components pattern).

Engine-exactness: a word's symbol sequence is encoded as a delimited
STRING — ``_s1__s2__s3_`` (symbols are [a-z0-9]+ so ``_`` never collides)
— and applying merge (a, b) is one global ``replace('_a__b_', '_ab_')``.
Global string replace scans left-to-right over non-overlapping matches in
Spark, DuckDB, and Python alike, which is exactly BPE's greedy merge
order; the trailing delimiter consumed by a match is re-exposed by the
double-``_`` separator, so adjacent occurrences ('a a a' under merge
(a,a) -> 'aa a') behave identically everywhere. Pair selection is
(count desc, lhs asc, rhs asc) over exact integer counts — fully
deterministic, reproducible in the SQL oracle as N unrolled stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize


def _encode(col) -> "F.Column":
    """'abc' -> '_a__b__c_' (one '_' at the ends, '__' between symbols)."""
    return F.concat(
        F.substring(F.regexp_replace(col, "(.)", "__$1"), 2, 1 << 30),
        F.lit("_"))


def _syms(seq) -> "F.Column":
    return F.split(F.expr(f"trim(BOTH '_' FROM {seq})"), "__")


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(w, n) distinct-word frequencies — the only corpus-wide pass."""
    return (df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("n")))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 8,
              checkpoint_every: int = 2, batch_probe: int = 16
              ) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merge rules; returns (merges, final_seqs)
    where merges = [(step, lhs, rhs, pair_count)] (step 1-based) and
    final_seqs = (w, seq, n) the vocab in its post-merge segmentation.

    Merge rounds are inherently sequential (each argmax depends on the
    previous replace), but one pair-count aggregate can SAFELY yield TWO
    merges — halving the dominant per-round cost (one aggregate + one
    TakeOrdered collect job each) — when the head of the collected
    ranking proves the second pick is what a fresh round-2 aggregate
    would have chosen. With top1 = (a, b), count c1 and top2 = (c, d),
    count c2, the batch is taken only when ALL of:

      (A) {c, d} ∩ {a, b} = ∅ — then merging (a,b) cannot change
          count(c,d): old pairs never gain occurrences from a merge
          (neighbors become adjacent to the merged token, never to each
          other), and (c,d) loses none (its symbols are untouched);
      (B) every OTHER collected pair sharing a symbol with (a,b) has
          count strictly < c2, and the collected head is provably
          complete down to counts < c2 (fewer than `batch_probe` rows
          came back, or the last row's count < c2) — then every pair the
          merge creates is strictly beaten: count(x,ab) <= count(x,a) <
          c2 and count(ab,y) <= count(b,y) < c2, while decreased old
          pairs either drop below c2 or keep the count AND the round-1
          tie-break that already ranked them after (c,d);
      (C) a != b — a self-merge can chain ("a a a a"), making
          count(ab,ab) bound via (b,a) = (a,b) itself, which (B) cannot
          cover;
      (E) the merged token string a+b equals no EXISTING symbol — else
          new ab-adjacencies would INCREMENT that symbol's old pair
          counts past what (B) bounds. Checkable driver-side with no
          extra job: the symbol alphabet is exactly {single chars} ∪
          {previously merged token strings}, and len(a+b) >= 2 rules
          out the former.

    Under (A)(B)(C)(E) the round-2 argmax equals (c,d) with count c2,
    and applying the two replaces in order is literally what two
    sequential rounds do — merges, counts, and final segmentation are
    value-identical to the one-merge-per-round loop (pinned by
    tests/test_tokenizer.py::test_bpe_batched_rounds_match_sequential);
    when any guard fails the round falls back to a single merge."""
    seqs = (word_freqs(df, text_col)
            .select("w", _encode(F.col("w")).alias("seq"), "n"))
    merges: list[tuple[int, str, str, int]] = []
    step = 1
    while step <= n_merges:
        if checkpoint_every and (step - 1) % checkpoint_every == 0:
            seqs = seqs.localCheckpoint(eager=False)
        syms = _syms("seq")
        pairs = (seqs.select(
                     F.explode(F.zip_with(
                         F.slice(syms, 1, F.size(syms) - 1),
                         F.slice(syms, 2, F.size(syms) - 1),
                         lambda a, b: F.struct(a.alias("lhs"),
                                               b.alias("rhs"))))
                     .alias("p"), "n")
                 .groupBy("p.lhs", "p.rhs")
                 .agg(F.sum("n").alias("cnt")))
        head = (pairs.orderBy(F.col("cnt").desc(), F.col("lhs").asc(),
                              F.col("rhs").asc())
                .limit(batch_probe).collect())
        if not head:
            break
        a, b, cnt = head[0]["lhs"], head[0]["rhs"], int(head[0]["cnt"])
        merges.append((step, a, b, cnt))
        seqs = seqs.select(
            "w",
            F.replace(F.col("seq"), F.lit(f"_{a}__{b}_"),
                      F.lit(f"_{a}{b}_")).alias("seq"), "n")
        step += 1
        if step > n_merges or len(head) < 2:
            continue
        c, d, c2 = head[1]["lhs"], head[1]["rhs"], int(head[1]["cnt"])
        complete = (len(head) < batch_probe
                    or int(head[-1]["cnt"]) < c2)
        disjoint = not ({c, d} & {a, b})
        no_strong_shared = not any(
            (r["lhs"] in (a, b) or r["rhs"] in (a, b))
            and int(r["cnt"]) >= c2
            for r in head[1:])
        # guard (E): symbols existing BEFORE this round's first merge are
        # exactly {single chars} ∪ {tokens made by merges before it};
        # len(a+b) >= 2 rules out single chars
        fresh_token = (a + b) not in {m[1] + m[2] for m in merges[:-1]}
        if (disjoint and a != b and complete and no_strong_shared
                and fresh_token):
            merges.append((step, c, d, c2))
            seqs = seqs.select(
                "w",
                F.replace(F.col("seq"), F.lit(f"_{c}__{d}_"),
                          F.lit(f"_{c}{d}_")).alias("seq"), "n")
            step += 1
    return merges, seqs


def bpe_token_counts(df: DataFrame, text_col: str, id_col: str,
                     n_merges: int = 8) -> DataFrame:
    """(id, bpe_tokens): per-doc token counts under the LEARNED tokenizer
    — the real pretraining-budget number (text_analysis.token_counts'
    BPE-ish regex is the train-free estimate). One corpus re-scan joins
    doc words against the segmented vocab (broadcast-sized next to the
    corpus); docs with no tokenizable words count 0."""
    _, seqs = bpe_train(df, text_col, n_merges)
    vocab = seqs.select("w", F.size(_syms("seq")).alias("_nsub"))
    # explode_outer keeps zero-token docs as one null-word row, so ONE
    # (shuffle) join + ONE aggregate covers every doc — the w-keyed
    # sort-merge join is the right plan when the vocab outgrows broadcast
    # (100M+ distinct words at web scale)
    return (df.select(F.col(id_col).alias("id"),
                      F.explode_outer(tokenize(F.col(text_col)))
                      .alias("w"))
            .join(vocab, "w", "left")
            .groupBy("id")
            .agg(F.coalesce(F.sum("_nsub"), F.lit(0))
                 .alias("bpe_tokens")))


def bpe_merges_df(spark: SparkSession, df: DataFrame, text_col: str,
                  n_merges: int = 8) -> DataFrame:
    """The learned merge table as a DataFrame:
    (step, lhs, rhs, pair_count)."""
    merges, _ = bpe_train(df, text_col, n_merges)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long")


def save_bpe(spark: SparkSession, df: DataFrame, text_col: str, path: str,
             n_merges: int = 8) -> None:
    """Train and persist the tokenizer artifact: `merges` (the ordered
    rule list — the whole model) and `vocab` (word -> segmented form, the
    apply-side lookup table; regenerable from merges but saved so serving
    never re-trains)."""
    merges, seqs = bpe_train(df, text_col, n_merges)
    (spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long")
     .repartition(1).write.mode("overwrite").parquet(f"{path}/merges"))
    seqs.write.mode("overwrite").parquet(f"{path}/vocab")


def load_bpe_merges(spark: SparkSession, path: str
                    ) -> list[tuple[int, str, str, int]]:
    rows = (spark.read.parquet(f"{path}/merges").orderBy("step").collect())
    return [(r.step, r.lhs, r.rhs, int(r.pair_count)) for r in rows]


def bpe_segment_from_store(spark: SparkSession, path: str,
                           word_col) -> "F.Column":
    """Segmentation expression under the PERSISTED merges — serving never
    touches the training corpus (merges are a tiny ordered list; the
    chain of replaces is a pure projection)."""
    return bpe_segment_expr(word_col, load_bpe_merges(spark, path))


def bpe_segment_expr(word_col, merges: list[tuple[int, str, str, int]]
                     ) -> "F.Column":
    """array<string> segmentation of a word column under the learned
    merges, applied in training order — the tokenizer's APPLY side, a pure
    projection (chain of replaces + one split)."""
    seq = _encode(word_col)
    for _, a, b, _ in merges:
        seq = F.replace(seq, F.lit(f"_{a}__{b}_"), F.lit(f"_{a}{b}_"))
    return F.split(
        F.regexp_replace(F.regexp_replace(seq, "^_", ""), "_$", ""), "__")
