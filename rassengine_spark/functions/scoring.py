"""Multi-field scoring builders — the OpenSearch `bool`/`multi_match` algebra.

Semantics reproduced (SURVEY.md §2.3; public OpenSearch docs):
- `bool.should` = sum of matching clause scores x boost, with
  `minimum_should_match: 1` -> keep rows where >=1 scoring clause matched.
- `multi_match best_fields` = max over fields of the per-field score; the
  per-field score for an OR query is the count of matching terms (our
  indicator-score fidelity level; BM25-weighted variant in functions/bm25.py).
- `multi_match type=phrase` = phrase containment per field, max over fields.
- `multi_match type=phrase_prefix, operator=and` = all terms prefix-match.
- `filter` clauses are non-scoring predicates.

All builders return plain Column expressions; a search operator is then
`df.withColumn("score", expr).filter(score > 0).orderBy(desc, id).limit(k)`
which Spark executes as scan -> project -> TakeOrderedAndProject: no shuffle,
limit pushed to every partition — the same early-termination the reference
gets from `terminate_after: k` (app/main.py:1515).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import text as T


def _field_col(field: str) -> Column:
    return F.col(field)


def phrase_best_fields(fields: list[str], query: str, boost: float = 1.0) -> Column:
    """Max-over-fields phrase indicator x boost (type=phrase multi_match)."""
    per = [T.phrase_match(f, query).cast("double") for f in fields]
    return F.greatest(*per, F.lit(0.0)) * F.lit(boost) if per else F.lit(0.0)


def exact_best_fields(fields: list[str], query: str, boost: float = 1.0) -> Column:
    """Max-over-fields exact-term-count (OR match on untokenized keywords:
    a keyword field matches when it equals any query term, or — for
    multi-word keywords — contains the full phrase)."""
    terms = T.terms_of(query)
    per = []
    for f in fields:
        c = F.lower(_field_col(f))
        eq_any = F.lit(False)
        for t in terms:
            eq_any = eq_any | (c == t)
        eq_any = eq_any | c.contains(" ".join(terms))
        per.append(F.coalesce(eq_any, F.lit(False)).cast("double"))
    return F.greatest(*per, F.lit(0.0)) * F.lit(boost) if per else F.lit(0.0)


def fuzzy_best_fields(fields: list[str], query: str, boost: float = 1.0,
                      field_boosts: dict[str, float] | None = None) -> Column:
    """Max over fields of (matched-term-count x per-field boost) with AUTO
    fuzziness (best_fields + fuzziness:AUTO + operator:or)."""
    terms = T.terms_of(query)
    field_boosts = field_boosts or {}
    per = []
    for f in fields:
        tokens = T.tokenize(f)
        cnt = T.fuzzy_term_count(tokens, terms).cast("double")
        per.append(cnt * F.lit(float(field_boosts.get(f, 1.0))))
    return F.greatest(*per, F.lit(0.0)) * F.lit(boost) if per else F.lit(0.0)


def exact_term_best_fields(fields: list[str], query: str, boost: float = 1.0,
                           field_boosts: dict[str, float] | None = None) -> Column:
    """Max over fields of exact matched-term-count (best_fields, no fuzz)."""
    terms = T.terms_of(query)
    field_boosts = field_boosts or {}
    per = []
    for f in fields:
        tokens = T.tokenize(f)
        cnt = T.exact_term_count(tokens, terms).cast("double")
        per.append(cnt * F.lit(float(field_boosts.get(f, 1.0))))
    return F.greatest(*per, F.lit(0.0)) * F.lit(boost) if per else F.lit(0.0)


def prefix_and_best_fields(fields: list[str], query: str,
                           boost: float = 1.0) -> Column:
    """Max over fields of all-terms-prefix indicator (phrase_prefix, op=and;
    reference structured search field list app/main.py:1722-1742)."""
    terms = T.terms_of(query)
    per = [T.all_terms_prefix(T.tokenize(f), terms).cast("double")
           for f in fields]
    return F.greatest(*per, F.lit(0.0)) * F.lit(boost) if per else F.lit(0.0)


def should_sum(*clauses: Column) -> Column:
    """bool.should scoring: sum of clause scores (each already boosted).
    minimum_should_match:1 is enforced by the caller's `score > 0` filter."""
    out = F.lit(0.0)
    for c in clauses:
        out = out + F.coalesce(c, F.lit(0.0))
    return out
