"""Text-analysis columns for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (regex + array built-ins): a 100 TB corpus gets
these as one narrow projection stage fused into the scan — no shuffle, no
Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..sources.chunker import word_ngram_array, words_of
from ..util import spread
from .dedup import hash60

# Tiny per-language stopword profiles (n-gram heuristic stand-in; the
# interface is what matters — swap in real profiles for production).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "la", "de", "et", "les", "des", "en"],
}

STOPWORDS_EN = LANG_PROFILES["en"] + ["a", "an", "on", "at", "it", "as"]


def _profile_score(tokens: Column, words: list[str]) -> Column:
    out = F.lit(0)
    for wd in words:
        out = out + F.coalesce(F.array_contains(tokens, wd),
                               F.lit(False)).cast("int")
    return out


def lang_id_expr(text_col: Column) -> Column:
    """argmax over language profiles of stopword hits; ties and no-hits
    resolve to 'und' then alphabetical (deterministic)."""
    toks = tokenize(text_col)
    scores = [(lang, _profile_score(toks, ws))
              for lang, ws in sorted(LANG_PROFILES.items())]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # first alphabetical language achieving the max wins
    for lang, s in reversed(scores):
        pred = F.when(s == best_score, F.lit(lang)).otherwise(pred)
    return F.when(best_score > 0, pred).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str, id_col: str,
                     round_to: int = 6) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1] (heuristics in the spirit of C4/Gopher quality rules)."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    avg_token_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
        .cast("double") / n_tokens).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    punct_ratio = F.when(n_chars > 0,
                         n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_hits = _profile_score(toks, STOPWORDS_EN)
    stop_ratio = F.when(n_tokens > 0,
                        stop_hits.cast("double") / n_tokens).otherwise(0.0)
    # composite: long enough, words not too long/short, little punctuation
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), 1.0).otherwise(0.0)
    wordlen_ok = F.when((avg_token_len >= 2.0) & (avg_token_len <= 12.0),
                        1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    quality = (length_ok + wordlen_ok + punct_ok) / F.lit(3.0)
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, round_to).alias("avg_token_len"),
        F.round(punct_ratio, round_to).alias("punct_ratio"),
        F.round(stop_ratio, round_to).alias("stopword_ratio"),
        F.round(quality, round_to).alias("quality"))


def lang_id_fast(df: DataFrame, text_col: str, id_col: str,
                 out_col: str = "lang_pred") -> DataFrame:
    """Arrow-batched twin of ``lang_id_expr`` — identical output (id,
    lang_pred). The argmax over stopword-presence counts is pure integer
    logic, so the Python form reproduces the expression form exactly:
    best>0 required, ties resolve to the alphabetically-first language.
    The expression form pays |profiles|x|stopwords| interpreted
    array_contains per row; here it is one token-set per doc."""
    import re
    from typing import Iterator

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    split = re.compile(r"[^a-z0-9]+").split
    profiles = sorted(LANG_PROFILES.items())

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            preds = []
            for txt in pdf["txt"].tolist():
                if txt is None:
                    preds.append("und")   # all counts null -> und branch
                    continue
                tset = {t for t in split(txt.lower()) if t}
                counts = [(lang, sum(1 for w in ws if w in tset))
                          for lang, ws in profiles]
                best = max(c for _, c in counts)
                if best <= 0:
                    preds.append("und")
                else:
                    preds.append(next(l for l, c in counts if c == best))
            yield pd.DataFrame({"id": pdf["id"], out_col: preds})

    return df.select(F.col(id_col).alias("id"),
                     F.col(text_col).cast("string").alias("txt")) \
             .mapInPandas(run, schema=f"id {id_type}, {out_col} string")


def quality_features_fast(df: DataFrame, text_col: str, id_col: str,
                          round_to: int = 6) -> DataFrame:
    """Arrow-batched twin of ``quality_features`` — identical output.

    One mapInPandas pass computes the per-doc INTEGER stats (char/token/
    punct counts, token-length sum, distinct-stopword hits); the ratio and
    composite math stays JVM-side with the SAME expressions as the
    expression form, so the doubles are bit-identical and the DuckDB
    oracle keeps matching. The expression form pays an interpreted
    aggregate per doc plus |STOPWORDS| array_contains traversals — the
    profiled hot spot; here it is one tokenize + one set per doc."""
    import re
    from typing import Iterator

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"id {id_type}, n_chars int, n_tokens int, "
              "tok_len_sum long, n_punct int, stop_hits int")
    # tokenize == split(lower, '[^a-z0-9]+'): explicit ASCII classes are
    # identical in Java and Python regex
    split = re.compile(r"[^a-z0-9]+").split
    # Java \s (no UNICODE flag) is exactly this ASCII class
    keep = re.compile("[a-zA-Z0-9 \t\n\x0b\f\r]")
    stopset = set(STOPWORDS_EN)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"id": pdf["id"], "n_chars": [], "n_tokens": [],
                   "tok_len_sum": [], "n_punct": [], "stop_hits": []}
            for txt in pdf["txt"].tolist():
                if txt is None:     # mirror ANSI null semantics of the
                    for k in ("n_chars", "n_tokens", "tok_len_sum",
                              "n_punct", "stop_hits"):   # expression form
                        out[k].append(None)
                    continue
                toks = [t for t in split(txt.lower()) if t]
                out["n_chars"].append(len(txt))
                out["n_tokens"].append(len(toks))
                out["tok_len_sum"].append(sum(map(len, toks)))
                out["n_punct"].append(len(keep.sub("", txt)))
                tset = set(toks)
                out["stop_hits"].append(
                    sum(1 for w in stopset if w in tset))
            yield pd.DataFrame(out)

    stats = df.select(F.col(id_col).alias("id"),
                      F.col(text_col).cast("string").alias("txt")) \
              .mapInPandas(run, schema=schema)

    n_chars, n_tokens = F.col("n_chars"), F.col("n_tokens")
    avg_token_len = F.when(
        n_tokens > 0,
        F.col("tok_len_sum").cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0,
                         F.col("n_punct").cast("double")
                         / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0,
                        F.col("stop_hits").cast("double")
                        / n_tokens).otherwise(0.0)
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000),
                       1.0).otherwise(0.0)
    wordlen_ok = F.when((avg_token_len >= 2.0) & (avg_token_len <= 12.0),
                        1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    quality = (length_ok + wordlen_ok + punct_ok) / F.lit(3.0)
    return stats.select(
        "id",
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, round_to).alias("avg_token_len"),
        F.round(punct_ratio, round_to).alias("punct_ratio"),
        F.round(stop_ratio, round_to).alias("stopword_ratio"),
        F.round(quality, round_to).alias("quality"))


# BPE-ish pretokenizer: letter runs, digit runs, or single non-space symbols
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pretoken count (regex runs)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, "\\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0))
    return df.select(F.col(id_col).alias("id"),
                     ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def _ngram_list(w: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition metrics need multiplicity);
    texts shorter than n words yield an empty list."""
    return word_ngram_array(w, n)


def repetition_features(df: DataFrame, text_col: str, id_col: str,
                        n: int = 2, round_to: int = 6) -> DataFrame:
    """Repetition signals in the spirit of the Gopher data-quality rules
    (Rae et al. 2021 §A1.1, public paper): per doc

    - ``dup_word_frac``   1 - distinct/total words (vocabulary collapse)
    - ``max_word_run``    longest run of the same word repeated back-to-back
    - ``top_ngram_frac``  occurrences of the most frequent word n-gram /
                          total n-gram occurrences
    - ``dup_ngram_frac``  fraction of n-gram occurrences that are repeats

    Scale shape: dup_word_frac and max_word_run are row-local expressions
    (whole-stage codegen, zero shuffle). The n-gram fractions need per-doc
    gram counts, which an O(len^2) row-local expression would make
    pathological on long docs — instead grams explode to (id, gram) rows
    and two linear hash-aggregates (gram count, then per-doc max/sum/count)
    produce the stats; AQE coalesces the small result."""
    t = F.col(text_col)
    w = words_of(t)
    n_words = F.size(w)
    dup_word_frac = F.when(
        n_words > 0,
        1.0 - F.size(F.array_distinct(w)).cast("double") / n_words) \
        .otherwise(F.lit(0.0))
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    max_run = F.aggregate(w, acc0, _step, lambda a: a["best"])
    base = df.select(F.col(id_col).alias("id"), n_words.alias("n_words"),
                     F.round(dup_word_frac, round_to).alias("dup_word_frac"),
                     max_run.alias("max_word_run"),
                     _ngram_list(w, n).alias("_grams"))
    gram_counts = (base.select("id", F.explode("_grams").alias("gram"))
                   .groupBy("id", "gram")
                   .agg(F.count(F.lit(1)).alias("c")))
    gram_stats = (gram_counts.groupBy("id")
                  .agg(F.max("c").alias("_mx"), F.sum("c").alias("_tot"),
                       F.count(F.lit(1)).alias("_nd")))
    out = base.drop("_grams").join(gram_stats, "id", "left")
    top_frac = F.when(F.col("_tot") > 0,
                      F.col("_mx").cast("double") / F.col("_tot")) \
        .otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("_tot") > 0,
        1.0 - F.col("_nd").cast("double") / F.col("_tot")) \
        .otherwise(F.lit(0.0))
    return (out.withColumn("top_ngram_frac", F.round(top_frac, round_to))
            .withColumn("dup_ngram_frac", F.round(dup_frac, round_to))
            .drop("_mx", "_tot", "_nd"))


def repetition_features_fast(df: DataFrame, text_col: str, id_col: str,
                             n: int = 2, round_to: int = 6) -> DataFrame:
    """Arrow-batched twin of ``repetition_features`` — identical output.

    The expression form explodes every word n-gram to a row and pays two
    hash-aggregate shuffles over the gram stream. Here one mapInPandas pass
    computes the per-doc INTEGER stats (word/gram/run counts via np.unique
    — exact, no float math in Python), and the fractions + rounding stay
    JVM-side with the very same expressions as the expression form, so the
    doubles are bit-identical and the DuckDB oracle keeps matching. Zero
    shuffles, one Python stage fused over the scan."""
    import re
    from typing import Iterator

    import numpy as np
    import pandas as pd

    # Java's default \s (ASCII-only), matching words_of / the RE2 oracle:
    ws_re = re.compile("[ \t\n\x0b\f\r]+")

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            m = len(pdf)
            n_words = np.zeros(m, dtype=object)   # None for null text (ANSI)
            ndw = np.zeros(m, dtype=np.int64)
            max_run = np.zeros(m, dtype=object)   # None for null text
            mx = np.zeros(m, dtype=np.int64)
            tot = np.zeros(m, dtype=np.int64)
            nd = np.zeros(m, dtype=np.int64)
            for i, text in enumerate(pdf[text_col].tolist()):
                if text is None:
                    n_words[i] = None             # size(split(NULL)) is NULL
                    max_run[i] = None
                    continue
                wlist = [w for w in ws_re.split(text) if w != ""]
                n_words[i] = len(wlist)
                if not wlist:
                    max_run[i] = 0
                    continue
                arr = np.asarray(wlist, dtype=object)
                codes, counts = np.unique(arr, return_inverse=True)[1], None
                ndw[i] = int(codes.max()) + 1
                # longest back-to-back run of one word, vectorized:
                change = np.flatnonzero(np.diff(codes) != 0)
                bounds = np.concatenate(([-1], change, [len(codes) - 1]))
                max_run[i] = int(np.diff(bounds).max())
                if len(wlist) >= n:
                    grams = np.asarray(
                        [" ".join(wlist[j:j + n])
                         for j in range(len(wlist) - n + 1)], dtype=object)
                    _, counts = np.unique(grams, return_counts=True)
                    mx[i] = int(counts.max())
                    tot[i] = len(grams)
                    nd[i] = len(counts)
            yield pd.DataFrame({
                "id": pdf[id_col], "n_words": n_words, "_ndw": ndw,
                "max_word_run": max_run, "_mx": mx, "_tot": tot, "_nd": nd})

    id_type = df.schema[id_col].dataType.simpleString()
    stats = df.mapInPandas(
        run, schema=(f"id {id_type}, n_words int, _ndw long, "
                     "max_word_run int, _mx long, _tot long, _nd long"))
    # fractions + rounding: the SAME JVM expressions as repetition_features
    dup_word_frac = F.when(
        F.col("n_words") > 0,
        1.0 - F.col("_ndw").cast("double") / F.col("n_words")) \
        .otherwise(F.lit(0.0))
    top_frac = F.when(F.col("_tot") > 0,
                      F.col("_mx").cast("double") / F.col("_tot")) \
        .otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("_tot") > 0,
        1.0 - F.col("_nd").cast("double") / F.col("_tot")) \
        .otherwise(F.lit(0.0))
    return stats.select(
        "id", "n_words",
        F.round(dup_word_frac, round_to).alias("dup_word_frac"),
        "max_word_run",
        F.round(top_frac, round_to).alias("top_ngram_frac"),
        F.round(dup_frac, round_to).alias("dup_ngram_frac"))


def fingerprint_expr(text_col: Column, k: int = 8) -> Column:
    """Document fingerprint: min 60-bit hash over all k-char shingles of the
    normalized text (the min-sampling step of winnowing). Rolling-hash
    equivalent but engine-exact via salted md5."""
    norm = F.regexp_replace(F.lower(text_col), "\\s+", " ")
    n = F.length(norm)
    shingles = F.transform(F.sequence(F.lit(1), n - (k - 1)),
                           lambda i: norm.substr(i, F.lit(k)))
    # min over the md5 hex strings, ONE conv at the end: fixed-width
    # lowercase hex makes string order = numeric order, and hash60 reads a
    # prefix, so conv(substr(min(md5))) == min(conv(substr(md5))) — saves
    # a conv+substring per shingle in the interpreted transform
    min_md5 = F.array_min(F.transform(shingles, lambda s: F.md5(s)))
    return F.when(
        n >= k,
        F.conv(F.substring(min_md5, 1, 15), 16, 10).cast("bigint")) \
        .otherwise(hash60(norm))


def fingerprints(df: DataFrame, text_col: str, id_col: str,
                 k: int = 8) -> DataFrame:
    """Arrow-batched implementation of fingerprint_expr's semantics.

    The k-gram expansion is a per-row ~40x blowup: every JVM formulation
    either evaluates md5 interpreted per element (higher-order transform)
    or copies the whole text into each of the ~|text| generated rows
    (explode+substring — hundreds of MB of UTF8String memcpy at sf0.1).
    Hashing in-place over Arrow batches does neither: the text crosses into
    Python once and the min-hash loop runs on slices. hashlib.md5 is
    bit-identical to Spark/DuckDB md5, so oracle exactness is preserved.
    Scale: per-partition, embarrassingly parallel, zero shuffle."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    md5 = hashlib.md5

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for t in pdf[text_col].fillna(""):
                # ASCII \s matches Java's [ \t\n\x0B\f\r]; Python's default
                # unicode \s would also eat U+3000 etc. — a mismatch
                norm = re.sub(r"\s+", " ", t.lower(), flags=re.ASCII)
                if len(norm) >= k:
                    # min over raw digests == min over hexdigests: hex is a
                    # per-byte monotone encoding, so byte order = hex order.
                    # ASCII fast path slices the encoded bytes (char == byte)
                    # instead of str-slice+encode per shingle.
                    if norm.isascii():
                        b = norm.encode()
                        d = min(md5(b[i:i + k]).digest()
                                for i in range(len(b) - k + 1))
                    else:
                        d = min(md5(norm[i:i + k].encode()).digest()
                                for i in range(len(norm) - k + 1))
                    # first 15 hex chars = top 60 bits of the digest
                    fp = int.from_bytes(d[:8], "big") >> 4
                else:
                    fp = int(md5(norm.encode()).hexdigest()[:15], 16)
                fps.append(fp)
            yield pd.DataFrame({"id": pdf[id_col], "fingerprint": fps})

    return spread(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"id {id_type}, fingerprint bigint")


def winnow_expr(text_col: Column, k: int = 8, w: int = 4) -> Column:
    """array<bigint> winnowing fingerprint set (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    scheme): the min k-char-shingle hash of every window of w consecutive
    shingles, distinct. GUARANTEE: two documents sharing a normalized
    substring of >= k+w-1 chars select at least one common fingerprint,
    at ~2/(w+1) index density — the bounded form of Lee et al.'s
    exact-substring dedup pass. fingerprint_expr is the degenerate
    one-window case. Same engine-exact conventions as fingerprint_expr:
    ASCII-\\s normalization, min over fixed-width md5 hex (= numeric
    order), hash60 prefix conv only on the selected few."""
    norm = F.regexp_replace(F.lower(text_col), "\\s+", " ")
    n = F.length(norm)
    m = F.greatest(n - (k - 1), F.lit(0))   # shingle count
    # LINEAR construction throughout (the word_ngram_array lesson): an
    # expression captured inside a HOF lambda body is re-evaluated PER
    # ELEMENT (no subexpression sharing in interpreted HOFs), so the
    # naive transform(seq, j -> array_min(slice(hs, j, w))) form costs
    # O(m²) md5 evals per row. Shifted-slice zips keep every reuse an
    # ARGUMENT expression (evaluated once per row per reference).
    chars = F.split(norm, "")
    grams = F.slice(chars, 1, m)
    for j in range(1, k):
        grams = F.zip_with(grams, F.slice(chars, j + 1, m),
                           lambda a, b: F.concat(a, b))
    hs = F.transform(grams, lambda g: F.md5(g))
    # sliding min of width w == elementwise least of w shifted views;
    # m < w degenerates to ONE window (short slices null-pad, least
    # skips nulls). min over fixed-width hex == numeric min; conv only
    # the selected few.
    nwin = F.greatest(m - (w - 1), F.lit(1))
    wins = F.slice(hs, 1, nwin)
    for j in range(1, w):
        wins = F.zip_with(wins, F.slice(hs, j + 1, nwin),
                          lambda a, b: F.least(a, b))
    fps = F.transform(F.array_distinct(wins),
                      lambda h: F.conv(F.substring(h, 1, 15), 16, 10)
                                 .cast("bigint"))
    return F.when(n >= k, fps).otherwise(F.array(hash60(norm)))


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, w: int = 4) -> DataFrame:
    """(id, fp) exploded winnowing fingerprint set — Arrow twin of
    winnow_expr (parity-pinned by tests/test_winnow.py), same rationale
    as fingerprints(): the shingle expansion crosses into Python once per
    partition and the per-window min runs as a monotone-deque sweep —
    O(m) digest comparisons per doc vs the expression form's O(m*w)
    interpreted md5/array_min evals. Scale: per-partition, zero shuffle;
    output is ~2/(w+1) rows per shingle. Parity boundary (all .lower()
    twins share it): codepoints whose case mappings were added in a
    newer Unicode version than Python's tables diverge from the JVM
    (e.g. U+1C89 under JDK-vs-Unicode-14) — unreachable for real
    corpora, pinned in the property test's alphabet bound."""
    import hashlib
    import re
    from collections import deque
    from typing import Iterator

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    md5 = hashlib.md5

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    # expression-form parity: NULL text yields one NULL
                    # fp row (which equality joins then drop) — not the
                    # fingerprint of "", which would pair null with empty
                    ids.append(rid)
                    fps.append(None)
                    continue
                norm = re.sub(r"\s+", " ", t.lower(), flags=re.ASCII)
                if len(norm) < k:
                    sel = {int(md5(norm.encode()).hexdigest()[:15], 16)}
                else:
                    # digest byte order == hex order (fingerprints() note)
                    if norm.isascii():
                        b = norm.encode()
                        digs = [md5(b[i:i + k]).digest()
                                for i in range(len(b) - k + 1)]
                    else:
                        digs = [md5(norm[i:i + k].encode()).digest()
                                for i in range(len(norm) - k + 1)]
                    if len(digs) <= w:
                        mins = {min(digs)}
                    else:
                        mins, dq = set(), deque()
                        for i, d in enumerate(digs):
                            while dq and digs[dq[-1]] > d:
                                dq.pop()
                            dq.append(i)
                            if dq[0] <= i - w:
                                dq.popleft()
                            if i >= w - 1:
                                mins.add(digs[dq[0]])
                    sel = {int.from_bytes(d[:8], "big") >> 4 for d in mins}
                ids.extend([rid] * len(sel))
                fps.extend(sorted(sel))
            # dtype=object: a None (null-text row) in a plain list makes
            # pandas coerce the column to float64, which ROUNDS 60-bit
            # fingerprints (>2^53) — config-dependent and silent
            yield pd.DataFrame({"id": ids,
                                "fp": pd.Series(fps, dtype="object")})

    return spread(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"id {id_type}, fp bigint")


# ------------------------------------------------------------- PII scrub
# Pattern dialect is the RE2/Java common subset (no lookaround, no \b
# ambiguity differences for these shapes) so Spark and SQL oracles agree.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_redact(text_col: Column) -> Column:
    """Replace each PII match with a typed placeholder ('[EMAIL]' etc.).
    A chained regexp_replace projection — codegen, scan-fused, no shuffle;
    order matters (SSNs would otherwise half-match the phone shape)."""
    out = text_col
    for name in ("email", "ssn", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[name],
                               f"[{name.upper()}]")
    return out


def pii_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII hit counts + the redacted text."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        *[F.size(F.regexp_extract_all(t, F.lit(p), 0)).alias(f"n_{name}")
          for name, p in PII_PATTERNS.items()],
        pii_redact(t).alias("redacted"))


# zero-width / BOM codepoints and C0+DEL controls (tab+newline kept):
# the characters multilingual web scrapes actually smuggle in
ZERO_WIDTH_RE = "[\u200b\u200c\u200d\ufeff]"
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def nfc_normalize_udf():
    """Arrow-vectorized NFC normalization (unicodedata follows the same
    Unicode standard as DuckDB's utf8proc ``nfc_normalize``, so the
    oracle reproduces it exactly). NFC has no Spark built-in — this is
    the one genuinely Python step of the cleanup, batched through Arrow,
    never row-at-a-time."""
    import unicodedata

    import pandas as pd

    def _nfc(s: "pd.Series") -> "pd.Series":
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))
    # explicit Series->Series hints break under `from __future__ import
    # annotations` (pandas_udf can't resolve the stringified hints), so
    # the eval type is passed explicitly
    from pyspark.sql.pandas.functions import PandasUDFType
    return F.pandas_udf(_nfc, "string", PandasUDFType.SCALAR)


def unicode_clean(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Multilingual ingest cleanup: NFC normalization (decomposed
    sequences -> composed), CRLF/CR -> LF, zero-width/BOM strip, C0
    control strip (tab and newline survive). Returns
    (id, clean, n_chars_before, n_chars_after) — the char-count delta is
    the cheap corpus-health metric (a spike means an encoding-broken
    source). One projection stage: Arrow batch for NFC, codegen
    regexp_replace chain for the rest."""
    t = F.col(text_col)
    c = nfc_normalize_udf()(t)
    c = F.regexp_replace(c, "\r\n", "\n")
    c = F.regexp_replace(c, "\r", "\n")
    c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    c = F.regexp_replace(c, CONTROL_RE, "")
    return df.select(F.col(id_col).alias("id"), c.alias("clean"),
                     F.length(t).alias("n_chars_before"),
                     F.length(c).alias("n_chars_after"))


def line_dedup(df: DataFrame, text_col: str, id_col: str,
               min_count: int = 2, sep: str = "\n") -> DataFrame:
    """Corpus-level repeated-line removal — the C4 / RefinedWeb
    boilerplate pass (Raffel et al. 2020 §2.2; Penedo et al. 2023, both
    public): any normalized line (lower+trim) occurring >= min_count
    times ACROSS the corpus is dropped from every document except its
    first occurrence (first = smallest (id, line position)); blank lines
    are exempt (dropping all-but-one blank line corpus-wide would mangle
    every doc). Documents are reassembled in original line order.
    Returns (id, text, n_kept, n_dropped).

    Plan at 100 TB: posexplode is scan-fused (no shuffle); line stats are
    ONE hash aggregate on the normalized line (map-side combined — the
    heavy hitters that matter combine perfectly); the stats join keys on
    the same column so it reuses that clustering; reassembly is one
    groupBy(id). No window over the corpus, no driver state. Skewed
    boilerplate lines are exactly the rows the aggregate compresses
    hardest.

    `sep` picks the unit: the default "\\n" is the line pass;
    "\\n\\n" gives the paragraph variant (whole repeated paragraphs
    drop — closer to C4's span rule for prose corpora)."""
    import re as _re

    sep_re = _re.escape(sep)
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             sep_re)).alias("pos", "line"))
    lines = lines.withColumn("norm", F.lower(F.trim(F.col("line"))))
    stats = (lines.groupBy("norm")
             .agg(F.count(F.lit(1)).alias("_cnt"),
                  F.min(F.struct("id", "pos")).alias("_first")))
    keep = (lines.join(stats, "norm")
            .withColumn("_keep",
                        (F.col("_cnt") < min_count) | (F.col("norm") == "")
                        | ((F.col("id") == F.col("_first.id"))
                           & (F.col("pos") == F.col("_first.pos")))))
    return (keep.groupBy("id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("_keep"),
                                    F.struct("pos", "line")))),
                         lambda s: s["line"]), sep).alias("text"),
                 F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(F.col("_keep"), 0).otherwise(1))
                  .alias("n_dropped")))


def top_ngrams(df: DataFrame, text_col: str,
               n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level most-frequent word n-grams — the discovery pass that
    finds boilerplate worth feeding to line/span dedup and phrases worth
    a contamination review. Lowercased whitespace tokens; returns the
    top `k` rows (ngram, cnt) by (count desc, ngram asc).

    Plan at 100 TB: the n-gram expansion is scan-fused (transform over
    an index sequence, then one explode), counting is ONE hash aggregate
    on the ngram string — the heavy hitters being looked for are exactly
    the keys map-side combine compresses hardest — and the top-k is a
    TakeOrdered, never a global sort."""
    toks = words_of(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    exploded = df.select(
        F.explode(word_ngram_array(toks, n)).alias("ngram"))
    return (exploded.groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
            .limit(k))


def sentence_array(col: Column) -> Column:
    """Deterministic sentence split: a sentence ender ([.!?]) followed by
    spaces becomes a break, and pre-existing newlines already are breaks.
    No lookbehind (RE2-safe, so the DuckDB twin is the same two-step
    regex): rewrite 'ender + spaces' to 'ender + \\n', then split on
    \\n. Empty segments are kept — positions must be stable for
    first-occurrence ordering."""
    return F.split(F.regexp_replace(col, "([.!?]) +", "$1\n"), "\n")


def span_dedup(df: DataFrame, text_col: str, id_col: str,
               span_sents: int = 3, min_count: int = 2) -> DataFrame:
    """C4-style three-sentence-span dedup (Raffel et al. 2020 §2.2,
    public): documents split into sentences, grouped into TUMBLING
    `span_sents`-sentence spans; any normalized span (lower+trim)
    occurring >= min_count times ACROSS the corpus is dropped from every
    document except its first occurrence (smallest (id, span_pos));
    blank spans exempt. Documents are reassembled in span order with
    single spaces (the sentence splitter already consumed the original
    inter-sentence whitespace). Tumbling, not sliding: removing
    overlapping spans makes reconstruction ambiguous, and the duplicated
    unit this pass targets (injected boilerplate paragraphs) is
    contiguous. Returns (id, text, n_kept, n_dropped) in span units.

    Plan at 100 TB mirrors line_dedup: the sentence explode is
    scan-fused; span assembly is one groupBy(id, span_pos); span stats
    are ONE hash aggregate on the normalized span (map-side combined —
    boilerplate heavy-hitters compress hardest); the stats join reuses
    that key; reassembly is one groupBy(id). No corpus-wide window, no
    driver state."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    sents = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sentence_array(t)).alias("pos", "sent"))
    spans = (sents
             .withColumn("span_pos",
                         (F.col("pos") / span_sents).cast("int"))
             .groupBy("id", "span_pos")
             .agg(F.array_join(
                      F.transform(
                          F.array_sort(F.collect_list(
                              F.struct("pos", "sent"))),
                          lambda s: s["sent"]), " ").alias("span")))
    spans = spans.withColumn("norm", F.lower(F.trim(F.col("span"))))
    stats = (spans.groupBy("norm")
             .agg(F.count(F.lit(1)).alias("_cnt"),
                  F.min(F.struct(F.col("id"), F.col("span_pos")))
                   .alias("_first")))
    keep = (spans.join(stats, "norm")
            .withColumn("_keep",
                        (F.col("_cnt") < min_count) | (F.col("norm") == "")
                        | ((F.col("id") == F.col("_first.id"))
                           & (F.col("span_pos") == F.col("_first.span_pos")))))
    return (keep.groupBy("id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("_keep"),
                                    F.struct("span_pos", "span")))),
                         lambda s: s["span"]), " ").alias("text"),
                 F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(F.col("_keep"), 0).otherwise(1))
                  .alias("n_dropped")))


def gopher_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public —
    "Scaling Language Models", app. A1.1): word-count window, mean word
    length window, bullet/ellipsis line fractions, alpha-word fraction,
    minimum stopword hits. One row per doc with the raw counts, one
    boolean per rule, and the composite `keep`.

    Every threshold is an INTEGER cross-multiplication (10*bullets >
    9*lines instead of bullets/lines > 0.9): no FP ratio ever feeds a
    comparison, so flags are engine-exact by construction. Everything is
    a per-row codegen projection — the filter costs one scan at any
    corpus size."""
    from ..sources.chunker import words_of

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = words_of(t)
    n_words = F.size(words)
    total_wchars = F.aggregate(words, F.lit(0),
                               lambda a, w: a + F.length(w))
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda l: F.trim(l).startswith("-")
        | F.trim(l).startswith("*")))
    n_ellipsis = F.size(F.filter(lines,
                                 lambda l: F.trim(l).endswith("...")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    stop_hits = F.size(F.array_intersect(
        F.transform(words, F.lower),
        F.array(*[F.lit(w) for w in STOPWORDS_EN])))

    f_words = (n_words < 50) | (n_words > 100000)
    f_wlen = (total_wchars < 3 * n_words) | (total_wchars > 10 * n_words)
    f_bullet = 10 * n_bullet > 9 * n_lines
    f_ellipsis = 10 * n_ellipsis > 3 * n_lines
    f_alpha = 10 * n_alpha < 8 * n_words
    f_stop = stop_hits < 2
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"), n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"), stop_hits.alias("stop_hits"),
        f_words.alias("flag_word_count"),
        f_wlen.alias("flag_mean_word_len"),
        f_bullet.alias("flag_bullet_lines"),
        f_ellipsis.alias("flag_ellipsis_lines"),
        f_alpha.alias("flag_alpha_words"),
        f_stop.alias("flag_stopwords"),
        (~(f_words | f_wlen | f_bullet | f_ellipsis | f_alpha | f_stop))
        .alias("keep"))
