"""S3/S4/S5: text & markdown file ingestion.

Reference behavior:
- ``parse_text_file`` (app/main.py:1167-1208): whole .txt/.md file -> chunk
  docs; ``patientId`` inferred from the filename via regex ``patient_(\\d+)``
  (app/main.py:1158-1164); doc_id ``{stem}-{i}-unstructured``.
- ``parse_markdown_file`` (app/embedding_gen.py:98-115): markdown -> HTML ->
  plaintext. Here: declarative regexp strip of markdown syntax (code fences,
  inline code, links/images keeping the label, emphasis, headings, rules) —
  no Python UDF, so the whole parse stays in WholeStageCodegen.
- ``ingest_fhir_directory`` (app/main.py:1285-1321): os.walk over
  .json/.md/.txt -> here a glob read with ``input_file_name()``.

Scale: `spark.read.text(wholetext=True)` gives one row per file; chunking is
a per-row generator (no shuffle). Millions of small files at 100 TB would be
driven through a manifest table + binaryFile source instead; the parse logic
below is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .chunker import chunk_expr

PATIENT_ID_RE = r"patient[_-](\d+)"   # app/main.py:1158-1164


def patient_id_from_path(path_col: Column) -> Column:
    """Filename regex patientId inference (app/main.py:1158-1164)."""
    pid = F.regexp_extract(path_col, PATIENT_ID_RE, 1)
    return F.nullif(pid, F.lit(""))


def markdown_to_text(col: Column) -> Column:
    """S4: markdown -> plaintext, declaratively (app/embedding_gen.py:98-115).

    Order matters: fenced code blocks drop first (their content is code, the
    reference's HTML round-trip keeps it — we keep the inner text too but
    strip the fence markers), then links/images reduce to their labels,
    then emphasis/heading/blockquote/list markers strip.

    Every pattern is in the RE2/Java common subset (no backreferences, no
    lookaround) so a SQL engine can run the identical chain — the emphasis
    rules are split per marker instead of back-referencing the opener.
    """
    c = F.regexp_replace(col, r"(?m)^```[^\n]*$", " ")          # fence lines
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", "$1")    # images
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", "$1")     # links
    c = F.regexp_replace(c, r"(?m)^#{1,6}\s+", "")              # headings
    c = F.regexp_replace(c, r"(?m)^\s*([-*+]|\d+\.)\s+", "")    # list items
    c = F.regexp_replace(c, r"(?m)^>\s?", "")                   # blockquote
    c = F.regexp_replace(c, r"(?m)^([-*_]\s*){3,}$", " ")       # hrule
    c = F.regexp_replace(c, r"`([^`]*)`", "$1")                 # inline code
    c = F.regexp_replace(c, r"\*\*(.*?)\*\*", "$1")             # bold **
    c = F.regexp_replace(c, r"__(.*?)__", "$1")                 # bold __
    c = F.regexp_replace(c, r"\*([^*]*)\*", "$1")               # italics *
    c = F.regexp_replace(c, r"_([^_]*)_", "$1")                 # italics _
    return F.nullif(F.trim(F.regexp_replace(c, r"\s+", " ")), F.lit(""))


def read_text_files(spark: SparkSession, paths: list[str] | str,
                    user_id: str) -> DataFrame:
    """Whole-file rows: (user_id, file_path, file_type, content)."""
    df = spark.read.text(paths, wholetext=True)
    path = F.input_file_name()
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    return df.select(
        F.lit(user_id).alias("user_id"),
        path.alias("file_path"),
        F.when(ext == "md", "markdown").otherwise(ext).alias("file_type"),
        F.col("value").alias("content"))


def text_chunk_documents(files: DataFrame, chunk_size: int = 512) -> DataFrame:
    """S3: whole-file rows -> unstructured chunk docs in the chunks schema
    (doc_id '{stem}-{i}-unstructured', app/main.py:1194-1206)."""
    is_md = F.col("file_type") == "markdown"
    text = F.when(is_md, markdown_to_text(F.col("content"))) \
            .otherwise(F.nullif(F.trim(F.col("content")), F.lit("")))
    stem = F.regexp_extract(F.col("file_path"), r"([^/\\]+)\.[A-Za-z0-9]+$", 1)
    base = (files
            .withColumn("text", text)
            .filter(F.col("text").isNotNull())
            .select("user_id", "file_path", "file_type",
                    stem.alias("stem"),
                    patient_id_from_path(F.col("file_path")).alias("patientId"),
                    F.posexplode(chunk_expr(F.col("text"), chunk_size))
                     .alias("chunk_idx", "unstructuredText")))
    return base.select(
        F.concat_ws("-", F.col("stem"), F.col("chunk_idx").cast("string"),
                    F.lit("unstructured")).alias("doc_id"),
        F.lit("unstructured").alias("doc_type"),
        F.lit(None).cast("string").alias("resourceType"),
        "user_id", "file_path", "file_type", "patientId", "unstructuredText")


def list_ingest_paths(root: str) -> dict[str, list[str]]:
    """S5 directory walk (app/main.py:1285-1321): extension whitelist
    .json/.md/.txt (P5, app/main.py:104). Returns {kind: [paths]}."""
    out: dict[str, list[str]] = {"json": [], "text": []}
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            ext = os.path.splitext(n)[1].lower()
            full = os.path.join(dirpath, n)
            if ext == ".json":
                out["json"].append(full)
            elif ext in (".md", ".txt"):
                out["text"].append(full)
    return out
