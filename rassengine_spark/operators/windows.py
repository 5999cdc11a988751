"""Window / dedup operators — W1 collapse lives in search.py; here: W2 chat
history, D1 context dedup, D2 per-key file sets (SURVEY.md §2.5, §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_n_per_key(df: DataFrame, key_col: str, time_col: str, id_col: str,
                   n: int = 10) -> DataFrame:
    """W2: last-N rows per key by time desc, returned in chronological order
    (reference chat history: fetch 10 desc then reverse, app/main.py:2786-2794).

    Spark >=3.5 rewrites rank<=N into WindowGroupLimit: each partition keeps
    an N-heap per key before the shuffle, so state is O(keys x N), not O(rows).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).desc(), F.col(id_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= n).drop("_rn")
              .orderBy(F.col(key_col).asc(), F.col(time_col).asc(),
                       F.col(id_col).asc()))


def dedup_concat_by_key(df: DataFrame, key_col: str, text_col: str,
                        order_col: str, sep: str = "\n") -> DataFrame:
    """D1: context snippets deduped by doc_id, concatenated on collision
    (reference app/main.py:2894-2915). collect_list order is made
    deterministic by sorting the collected structs on `order_col`."""
    pairs = F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(text_col).alias("t")))
    return (df.groupBy(key_col)
              .agg(F.array_join(
                  F.transform(F.array_sort(pairs), lambda s: s["t"]),
                  sep).alias("context")))


def capped_set_per_key(df: DataFrame, key_col: str, item_col: str,
                       cap: int = 5) -> DataFrame:
    """D2: per-key distinct item set, capped (reference per-patient file sets
    capped at MAX_FILES_PER_PATIENT=5, app/main.py:2811-2844)."""
    return (df.groupBy(key_col)
              .agg(F.slice(F.array_sort(F.collect_set(F.col(item_col))),
                           1, cap).alias("items")))
