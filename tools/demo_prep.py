"""End-to-end training-data prep demo: run the composed pipeline
(llmops/prep.py) over the sf0.01 documents table with an eval holdout,
print the per-stage accounting, and show the corpus data-card before and
after cleaning.

Run:  python tools/demo_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from rassengine_spark.llmops.datacard import datacard
    from rassengine_spark.llmops.prep import prepare_training_corpus
    from rassengine_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-prep")
    docs = load_tables(spark, sf_dir)["documents"]
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)

    print(f"== corpus: {sf_dir} ({docs.count()} docs, "
          f"{ev.count()} held out as eval) ==\n")

    print("-- data-card BEFORE cleaning (lang grain) --")
    (datacard(train, "text", ["lang", "source"])
     .filter(F.col("gid") == 1).orderBy("lang")
     .show(20, truncate=False))

    out, report = prepare_training_corpus(
        train, ev, materialize=True,
        split_weights={"train": 0.75, "val": 0.125, "test": 0.125})
    out = out.localCheckpoint()

    print("-- stage accounting --")
    prev = None
    for stage, n in report:
        delta = "" if prev is None else f"  (-{prev - n})"
        print(f"  {stage:12s} {n:6d}{delta}")
        prev = n

    print("\n-- data-card AFTER cleaning (lang grain) --")
    (datacard(out, "text", ["lang", "source"])
     .filter(F.col("gid") == 1).orderBy("lang")
     .show(20, truncate=False))

    print("-- split sizes --")
    out.groupBy("split").count().orderBy("split").show()


if __name__ == "__main__":
    main()
