"""Skewed-corpus micro-bench for the dedup stopwording caps.

Injects boilerplate skew into the documents table (a fraction of docs get
the same appended paragraph — the web-corpus footer/license-header
pattern), then measures MinHash-LSH with and without `max_bucket_size`
and n-gram Jaccard with and without `max_postings`:

- wall-clock seconds
- emitted near-dup pairs (the caps should shed only boilerplate-driven
  pairs; genuine near-dups collide in several bands / share private
  shingles and survive)

Run:  python tools/bench_skew.py [sf_dir] [boiler_frac]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = ("all rights reserved this document is provided as is without "
          "warranty of any kind either express or implied see the license "
          "for the specific language governing permissions")


def main() -> None:
    from pyspark.sql import functions as F

    from rassengine_spark.llmops.dedup import (minhash_lsh_pairs,
                                               ngram_jaccard_pairs)
    from rassengine_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    spark = get_spark("bench-skew")
    docs = load_tables(spark, sf_dir)["documents"]
    # every doc_id < frac*N gets the boilerplate appended -> their shingle
    # sets share a hot block and their LSH bands often collide
    n = docs.count()
    cut = int(n * frac)
    skewed = docs.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") < cut,
               F.concat_ws(" ", F.col("text"), F.lit(BOILER)))
         .otherwise(F.col("text")).alias("text")).cache()
    skewed.count()

    def run(tag, fn):
        t0 = time.perf_counter()
        pairs = fn().count()
        return tag, {"sec": round(time.perf_counter() - t0, 2),
                     "pairs": pairs}

    results = dict([
        run("minhash_uncapped",
            lambda: minhash_lsh_pairs(skewed, "text", "doc_id",
                                      threshold=0.5)),
        run("minhash_capped",
            lambda: minhash_lsh_pairs(skewed, "text", "doc_id",
                                      threshold=0.5, max_bucket_size=64)),
        run("ngram_uncapped",
            lambda: ngram_jaccard_pairs(skewed, "text", "doc_id", "lang",
                                        n=2, threshold=0.5)),
        run("ngram_capped",
            lambda: ngram_jaccard_pairs(skewed, "text", "doc_id", "lang",
                                        n=2, threshold=0.5,
                                        max_postings=64)),
    ])
    print(json.dumps({"sf_dir": sf_dir, "docs": n, "boiler_docs": cut,
                      **results}))


if __name__ == "__main__":
    main()
