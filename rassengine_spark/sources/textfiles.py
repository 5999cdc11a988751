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


# S4 strip chain, shared with the SQL oracle generator
# (__spark_entry__._sql_s3_markdown converts '$1' -> '\\1'): every pattern
# is in the RE2/Java common subset (no backreferences, no lookaround) so a
# SQL engine runs the identical chain — emphasis rules are split per marker
# instead of back-referencing the opener. Order matters: fence markers drop
# first (inner text kept), links/images reduce to labels, reference-style
# links and their definition lines next (app/embedding_gen.py:98-115 gets
# these through the markdown->HTML->bs4 round-trip), then block markers,
# then inline emphasis, then raw HTML (comments before tags).
MARKDOWN_STRIP_RULES: list[tuple[str, str]] = [
    (r"(?m)^```[^\n]*$", " "),                 # fence lines
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),         # images
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),          # inline links
    (r"\[([^\]]*)\]\[[^\]]*\]", "$1"),         # reference-style links
    (r"(?m)^\[[^\]]+\]:\s+\S[^\n]*$", " "),    # link definition lines
    (r"(?m)^#{1,6}\s+", ""),                   # atx headings
    (r"(?m)^=+\s*$", " "),                     # setext H1 underline
    (r"(?m)^\s*([-*+]|\d+\.)\s+", ""),         # list items
    (r"(?m)^>\s?", ""),                        # blockquote
    (r"(?m)^([-*_]\s*){3,}$", " "),            # hrule / setext H2
    (r"`([^`]*)`", "$1"),                      # inline code
    (r"\*\*(.*?)\*\*", "$1"),                  # bold **
    (r"__(.*?)__", "$1"),                      # bold __
    (r"\*([^*]*)\*", "$1"),                    # italics *
    (r"_([^_]*)_", "$1"),                      # italics _
    (r"~~(.*?)~~", "$1"),                      # strikethrough
    (r"<!--[\s\S]*?-->", " "),                 # HTML comments
    (r"</?[A-Za-z][A-Za-z0-9]*[^>]*>", " "),   # inline HTML tags
]

# Literal (non-regex) entity decodes, applied AFTER tag strip so a decoded
# '<' can't create a tag; '&amp;' decodes last so '&amp;lt;' yields the
# literal '&lt;' exactly like html.unescape / the reference's bs4 pass.
MARKDOWN_ENTITY_RULES: list[tuple[str, str]] = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def decode_entities_and_collapse(col: Column) -> Column:
    """Shared tail of every text-extraction chain (markdown, WARC HTML):
    entity decode in MARKDOWN_ENTITY_RULES order, whitespace collapse,
    empty -> NULL."""
    c = col
    for src, dst in MARKDOWN_ENTITY_RULES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.nullif(F.trim(F.regexp_replace(c, r"\s+", " ")), F.lit(""))


def markdown_to_text(col: Column) -> Column:
    """S4: markdown -> plaintext, declaratively (app/embedding_gen.py:98-115).

    One chain of regexp_replace + literal replace projections — the whole
    parse stays inside WholeStageCodegen; see MARKDOWN_STRIP_RULES for the
    rule order rationale.
    """
    c = col
    for pat, repl in MARKDOWN_STRIP_RULES:
        c = F.regexp_replace(c, pat, repl)
    return decode_entities_and_collapse(c)


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
