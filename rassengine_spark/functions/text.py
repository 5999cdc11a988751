"""Lexical text expressions — tokenizer, phrase/prefix/fuzzy term predicates.

These reproduce the OpenSearch match semantics the reference relies on
(reference: app/main.py:1480-2074 builds `multi_match` DSL of types
`phrase` / `phrase_prefix` / `best_fields` with `fuzziness: AUTO`):

- standard-analyzer approximation: lowercase + non-alphanumeric split
- phrase match  = query terms adjacent in order  -> substring containment
  on the lowercased text (exact for whitespace-joined corpora)
- prefix match  = any token starts with the term
- fuzzy AUTO    = per-term edit distance 0/1/2 for term lengths <=2 / 3-5 / >=6

Everything is a pure Column expression (whole-stage codegen; no Python UDFs),
so Catalyst can push filters and the expressions vectorize JVM-side — this is
the hot path for every search operator and must survive 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(col: Column | str) -> Column:
    """Lowercase + split on non-alphanumerics, drop empty tokens.

    Mirrors the reference's analyzer approximation (app/main.py:2164 uses
    whitespace word-split; OpenSearch standard analyzer lowercases).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def terms_of(query: str) -> list[str]:
    """Driver-side tokenization of a constant query string (same rules)."""
    import re
    return [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]


def phrase_match(col: Column | str, phrase: str) -> Column:
    """Phrase containment: all query terms adjacent in order.

    Implemented as lowercase substring containment of the normalized phrase —
    exact for the single-space-joined corpora this engine stores (the chunker
    S6 joins words with single spaces, app/main.py:2164-2169)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = " ".join(terms_of(phrase))
    return F.coalesce(F.lower(c).contains(norm), F.lit(False))


def auto_fuzziness(term: str) -> int:
    """OpenSearch `fuzziness: AUTO`: 0 / 1 / 2 by term length (public docs)."""
    n = len(term)
    if n <= 2:
        return 0
    if n <= 5:
        return 1
    return 2


def fuzzy_term_match(tokens: Column, term: str) -> Column:
    """True if any token is within AUTO edit distance of `term`."""
    d = auto_fuzziness(term)
    if d == 0:
        return F.coalesce(F.array_contains(tokens, term), F.lit(False))
    return F.coalesce(
        F.exists(tokens, lambda t: F.levenshtein(t, F.lit(term)) <= d),
        F.lit(False))


def prefix_term_match(tokens: Column, term: str) -> Column:
    """True if any token starts with `term` (phrase_prefix last-term rule,
    generalized per-term as the reference's `operator: and` demands)."""
    return F.coalesce(
        F.exists(tokens, lambda t: t.startswith(term)), F.lit(False))


def exact_term_count(tokens: Column, terms: list[str]) -> Column:
    """Number of query terms present in the token array (OR-match score)."""
    out = F.lit(0)
    for t in terms:
        out = out + F.coalesce(
            F.array_contains(tokens, t), F.lit(False)).cast("int")
    return out


def fuzzy_term_count(tokens: Column, terms: list[str]) -> Column:
    """Number of query terms fuzzy-matching some token (AUTO distances)."""
    out = F.lit(0)
    for t in terms:
        out = out + fuzzy_term_match(tokens, t).cast("int")
    return out


def all_terms_prefix(tokens: Column, terms: list[str]) -> Column:
    """`phrase_prefix` with `operator: and`: every term matches as a prefix
    of some token (reference structured search, app/main.py:1722-1742)."""
    out = F.lit(True)
    for t in terms:
        out = out & prefix_term_match(tokens, t)
    return out


def basic_cleaning(col: Column | str) -> Column:
    """Newline strip + trim (reference `basic_cleaning`, app/main.py:2156-2157)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "\n", " "))
