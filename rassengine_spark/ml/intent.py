"""M1: intent classification — the engine's "planner".

Reference: zero-shot NLI over 12 labels (``classify_intent``,
app/main.py:2613-2634; labels ``INTENT_CATEGORIES`` app/main.py:2174-2187).
The learned router is the reference's only query planner — it picks which of
the 12 search pipelines runs (SURVEY.md §4).

Default here is a deterministic rule router whose decision boundaries mirror
the reference's few-shot examples (app/main.py:2189-2230): first matching
rule wins, rules ordered most-specific-first. A learned model (HF zero-shot
via pandas_udf) plugs in through the same ``str -> label`` contract.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

INTENT_CATEGORIES = [
    "SEMANTIC", "KEYWORD", "HYBRID", "STRUCTURED", "HYBRID_STRUCTURED",
    "AGGREGATE", "COMPARISON", "TEMPORAL", "EXPLANATORY", "MULTI_INTENT",
    "ENTITY_SPECIFIC", "DOCUMENT_FETCH",
]

_CODE_RE = re.compile(
    r"\b(icd-?10|cpt|loinc)\b|\b[A-Z]\d{2}(\.\d+)?\b|\b\d{5}\b|\b\d+-\d\b")
_FETCH_RE = re.compile(
    r"\b(fetch|get|retrieve|pull|download)\b.*\b(record|document|file|chart|"
    r"results?)\b|\bdocument for\b|\brecords? (of|for)\b")
_AGG_RE = re.compile(
    r"\bhow many\b|\bcount\b|\bnumber of\b|\btotal\b|\bmost common\b|"
    r"\bdistribution\b|\btop \d+\b")
_CMP_RE = re.compile(r"\bcompare\b|\bversus\b|\bvs\.?\b|\bdifference between\b")
_TMP_RE = re.compile(
    r"\btrends?\b|\bover time\b|\blast (year|month|week|\d+ (days?|months?|"
    r"years?))\b|\brecent(ly)?\b|\bsince \d{4}\b|\bhistory of\b")
_EXPL_RE = re.compile(
    r"\bwhat (is|are)\b|\bexplain\b|\bwhy\b|\bsymptoms?\b|\btell me about\b|"
    r"\bstatus of\b|\bhow (is|does|do)\b")
_ENTITY_RE = re.compile(
    r"\bdetails? (for|of)\b|\bcontact\b|\bphone\b|\bemail\b|\baddress of\b|"
    r"\bwho is\b")
_STRUCT_RE = re.compile(
    r"\b(list|give me) all\b|\bwith (icd-?10|cpt|loinc) code\b")
_MULTI_SPLIT_RE = re.compile(r"\band (also|the)\b|; | and .*\b(list|get|code)\b")
_SEM_RE = re.compile(
    r"\bsearch for\b|\babout\b|\btreatment\b|\boptions?\b|\brelated to\b")
_HYBRID_STRUCT_RE = re.compile(
    r"\b(both|and)\b.*\b(and)\b|\b(male|female)\b.*\b(over|under) \d+\b")
_NAMENUM_RE = re.compile(r"\b[A-Z][a-z]+\d{2,}\b")   # Synthea-style Julian140


def classify_intent(query: str) -> str:
    """Rule router; boundaries follow app/main.py:2189-2230 examples."""
    q = query.strip()
    ql = q.lower()
    # MULTI_INTENT: two clause-like requests joined (examples 23-24).
    if _MULTI_SPLIT_RE.search(ql) and (
            _CODE_RE.search(q) or _FETCH_RE.search(ql) or
            _EXPL_RE.search(ql)):
        return "MULTI_INTENT"
    if _FETCH_RE.search(ql) or (_NAMENUM_RE.search(q) and "document" in ql):
        return "DOCUMENT_FETCH"
    if _AGG_RE.search(ql):
        return "AGGREGATE"
    if _CMP_RE.search(ql):
        return "COMPARISON"
    if _TMP_RE.search(ql):
        return "TEMPORAL"
    if _STRUCT_RE.search(ql) and _CODE_RE.search(q):
        return "STRUCTURED"
    if re.search(r"\b(look ?up|search for)\b", ql) and _CODE_RE.search(q):
        return "KEYWORD"
    if _HYBRID_STRUCT_RE.search(ql) and re.search(
            r"\bpatients?\b", ql):
        return "HYBRID_STRUCTURED"
    if _ENTITY_RE.search(ql):
        return "ENTITY_SPECIFIC"
    if _EXPL_RE.search(ql):
        return "EXPLANATORY"
    if _SEM_RE.search(ql):
        return "SEMANTIC"
    if re.search(r"\bfind\b|\bpatients? with\b", ql):
        return "HYBRID"
    return "HYBRID"      # unknown intents default to hybrid (app/main.py:2871)


def classify_batch(queries: Iterable[str],
                   fn: Callable[[str], str] | None = None) -> list[str]:
    f = fn or classify_intent
    return [f(q) for q in queries]


# ------------------------------------------------------- expression router
# The same decision list as classify_intent, as a Column / SQL expression:
# every regex atom above is RE2- and Java-compatible (\b, \d, alternation,
# .* — no lookaround, no backreferences), so the router runs inside
# whole-stage codegen on a 100 TB query log AND reproduces exactly in the
# DuckDB oracle. Parity with classify_intent is pinned by
# tests/test_ml.py::test_intent_expr_matches_python_router.

_LOOKUP_PAT = r"\b(look ?up|search for)\b"
_PATIENTS_PAT = r"\bpatients?\b"


def intent_expr(col):
    """Column form of classify_intent (first matching rule wins)."""
    from pyspark.sql import functions as F
    q = F.trim(col)
    ql = F.lower(q)
    code = q.rlike(_CODE_RE.pattern)
    fetch = ql.rlike(_FETCH_RE.pattern)
    multi = ql.rlike(_MULTI_SPLIT_RE.pattern)
    expl = ql.rlike(_EXPL_RE.pattern)
    return (
        F.when(multi & (code | fetch | expl), "MULTI_INTENT")
         .when(fetch | (q.rlike(_NAMENUM_RE.pattern)
                        & ql.contains("document")), "DOCUMENT_FETCH")
         .when(ql.rlike(_AGG_RE.pattern), "AGGREGATE")
         .when(ql.rlike(_CMP_RE.pattern), "COMPARISON")
         .when(ql.rlike(_TMP_RE.pattern), "TEMPORAL")
         .when(ql.rlike(_STRUCT_RE.pattern) & code, "STRUCTURED")
         .when(ql.rlike(_LOOKUP_PAT) & code, "KEYWORD")
         .when(ql.rlike(_HYBRID_STRUCT_RE.pattern)
               & ql.rlike(_PATIENTS_PAT), "HYBRID_STRUCTURED")
         .when(ql.rlike(_ENTITY_RE.pattern), "ENTITY_SPECIFIC")
         .when(expl, "EXPLANATORY")
         .when(ql.rlike(_SEM_RE.pattern), "SEMANTIC")
         .otherwise("HYBRID"))


def intent_case_sql(col: str) -> str:
    """DuckDB CASE twin of intent_expr over column expression `col`."""
    def m(target: str, pat: str) -> str:
        return f"regexp_matches({target}, '{pat}')"

    q, ql = "trim(" + col + ")", "lower(trim(" + col + "))"
    code = m(q, _CODE_RE.pattern)
    fetch = m(ql, _FETCH_RE.pattern)
    expl = m(ql, _EXPL_RE.pattern)
    return f"""CASE
  WHEN {m(ql, _MULTI_SPLIT_RE.pattern)} AND ({code} OR {fetch} OR {expl})
    THEN 'MULTI_INTENT'
  WHEN {fetch} OR ({m(q, _NAMENUM_RE.pattern)}
                   AND contains({ql}, 'document')) THEN 'DOCUMENT_FETCH'
  WHEN {m(ql, _AGG_RE.pattern)} THEN 'AGGREGATE'
  WHEN {m(ql, _CMP_RE.pattern)} THEN 'COMPARISON'
  WHEN {m(ql, _TMP_RE.pattern)} THEN 'TEMPORAL'
  WHEN {m(ql, _STRUCT_RE.pattern)} AND {code} THEN 'STRUCTURED'
  WHEN {m(ql, _LOOKUP_PAT)} AND {code} THEN 'KEYWORD'
  WHEN {m(ql, _HYBRID_STRUCT_RE.pattern)} AND {m(ql, _PATIENTS_PAT)}
    THEN 'HYBRID_STRUCTURED'
  WHEN {m(ql, _ENTITY_RE.pattern)} THEN 'ENTITY_SPECIFIC'
  WHEN {expl} THEN 'EXPLANATORY'
  WHEN {m(ql, _SEM_RE.pattern)} THEN 'SEMANTIC'
  ELSE 'HYBRID' END"""
