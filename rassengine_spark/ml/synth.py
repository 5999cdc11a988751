"""Synthetic labeled-query corpus generation as a Spark job.

Reference: the trainers generate 2k intent-labeled and 10k NER-labeled
queries from template families slot-filled with Synthea-style pools, seeded
RNG (app/train_intent.py:33-116; app/train_ner.py:237-675, seed at :20).
Here the same generation runs data-parallel: ``spark.range(n)`` drives
deterministic md5-based slot selection, so any engine (or the DuckDB
oracle) reproduces the corpus bit-for-bit — no driver-side RNG loop.

Scale: generating 10B labeled rows is a single narrow stage; the md5
selection hash is the only per-row cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Template families (one per intent, mirroring app/train_intent.py:45-116)
TEMPLATES: list[tuple[str, str]] = [
    ("What are the symptoms of {condition}?", "EXPLANATORY"),
    ("Fetch the medical records for patient {name}.", "DOCUMENT_FETCH"),
    ("How many patients have {condition}?", "AGGREGATE"),
    ("Compare the outcomes of {procedure} vs. medication.", "COMPARISON"),
    ("Show me trends in {labtest} for patient {pid} over time.", "TEMPORAL"),
    ("Find patients with {condition}.", "HYBRID"),
    ("Get details for patient {name}.", "ENTITY_SPECIFIC"),
    ("Search for {condition} treatment options.", "SEMANTIC"),
    ("List all procedures with CPT code {cpt}.", "STRUCTURED"),
    ("Look up ICD-10 code {icd}.", "KEYWORD"),
    ("Search for female patients over {age} with {condition} and high blood "
     "pressure.", "HYBRID_STRUCTURED"),
    ("Explain the procedure for {procedure} and list patients who had it.",
     "MULTI_INTENT"),
]

FIRST = ["Julian", "Emma", "Liam", "Olivia", "Noah", "Ava"]
LAST = ["Stamm", "Turner", "Smith", "Johnson", "Brown"]
CONDITIONS = ["migraine", "sinusitis", "hypertension", "diabetes"]
PROCEDURES = ["knee replacement", "heart surgery", "appendectomy"]
LABTESTS = ["blood pressure", "cholesterol levels", "glucose"]
CPTS = ["99213", "90792", "12345"]
ICDS = ["I21", "E11", "J32"]


def _pick(pool: list[str], salt: str) -> Column:
    """Deterministic md5-based selection: pool[h(id, salt) % len] — the
    engine-portable analog of the trainers' seeded random.choice."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{salt}"))),
        1, 8), 16, 10).cast("bigint")
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (h % len(pool) + 1).cast("int"))


def intent_corpus(spark: SparkSession, n: int = 2000) -> DataFrame:
    """(qid, query, intent) — n labeled queries, deterministic in qid."""
    name = F.concat(_pick(FIRST, "fn"),
                    (F.col("id") % 900 + 100).cast("string"),
                    F.lit(" "), _pick(LAST, "ln"),
                    (F.col("id") % 890 + 110).cast("string"))
    t_idx = (F.conv(F.substring(F.md5(F.concat(
        F.col("id").cast("string"), F.lit(":t"))), 1, 8), 16, 10)
        .cast("bigint") % len(TEMPLATES)).cast("int")
    template = F.element_at(
        F.array(*[F.lit(t) for t, _ in TEMPLATES]), t_idx + 1)
    intent = F.element_at(
        F.array(*[F.lit(i) for _, i in TEMPLATES]), t_idx + 1)
    query = template
    for slot, col in [
            ("{condition}", _pick(CONDITIONS, "c")),
            ("{procedure}", _pick(PROCEDURES, "p")),
            ("{labtest}", _pick(LABTESTS, "l")),
            ("{cpt}", _pick(CPTS, "cpt")),
            ("{icd}", _pick(ICDS, "icd")),
            ("{pid}", (F.col("id") % 900 + 100).cast("string")),
            ("{age}", (F.col("id") % 40 + 40).cast("string")),
            ("{name}", name)]:
        query = F.replace(query, F.lit(slot), col)
    return (spark.range(n)
            .select(F.col("id").alias("qid"), query.alias("query"),
                    intent.alias("intent")))


def intent_corpus_sql(n: int = 2000) -> str:
    """The DuckDB twin of intent_corpus — same md5 selection, same pools."""
    def pick(pool: list[str], salt: str) -> str:
        arr = "[" + ", ".join(f"'{x}'" for x in pool) + "]"
        h = (f"CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':{salt}'), "
             f"1, 8) AS BIGINT)")
        return f"{arr}[CAST({h} % {len(pool)} + 1 AS INT)]"

    t_arr = "[" + ", ".join("'" + t.replace("'", "''") + "'"
                            for t, _ in TEMPLATES) + "]"
    i_arr = "[" + ", ".join(f"'{i}'" for _, i in TEMPLATES) + "]"
    t_h = ("CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':t'), 1, 8) "
           "AS BIGINT)")
    name = (f"{pick(FIRST, 'fn')} || CAST(id % 900 + 100 AS VARCHAR) || ' ' "
            f"|| {pick(LAST, 'ln')} || CAST(id % 890 + 110 AS VARCHAR)")
    q = f"{t_arr}[CAST({t_h} % {len(TEMPLATES)} + 1 AS INT)]"
    for slot, expr in [
            ("{condition}", pick(CONDITIONS, "c")),
            ("{procedure}", pick(PROCEDURES, "p")),
            ("{labtest}", pick(LABTESTS, "l")),
            ("{cpt}", pick(CPTS, "cpt")),
            ("{icd}", pick(ICDS, "icd")),
            ("{pid}", "CAST(id % 900 + 100 AS VARCHAR)"),
            ("{age}", "CAST(id % 40 + 40 AS VARCHAR)"),
            ("{name}", name)]:
        q = f"replace({q}, '{slot}', {expr})"
    return f"""
SELECT id AS qid, {q} AS query,
       {i_arr}[CAST({t_h} % {len(TEMPLATES)} + 1 AS INT)] AS intent
FROM generate_series(0, {n - 1}) t(id)
"""
