"""Text-analysis expression builders — pure ``pyspark.sql.functions``
column expressions (whole-stage codegen, no UDFs), each with an ANSI-SQL
twin used by the DuckDB oracles in plans/queries.py.

Covers the training-data pipeline text operators: token counting,
quality scoring, stopword-based language ID, and content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the heuristic language ID;
# deliberately small + disjoint so the SQL twin stays readable
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "que", "es", "una"),
}


def tokens(col: str | Column) -> Column:
    return F.split(col, " ")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: str | Column, words: tuple[str, ...]) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.size(toks)


def lang_score(col: str | Column, lang: str) -> Column:
    return stopword_ratio(col, LANG_MARKERS[lang])


def lang_guess(col: str | Column) -> Column:
    """argmax over marker-set hit ratios; 'und' (undetermined) when no
    marker hits at all. Ties resolve in LANG_MARKERS insertion order."""
    langs = list(LANG_MARKERS)
    best = None
    best_score = None
    for lang in langs:
        s = lang_score(col, lang)
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_score(col: str | Column) -> Column:
    """[0,1] quality heuristic: length band + mean token length band.
    Deterministic closed form (mirrors the SQL twin in queries.py)."""
    n_chars = F.length(col)
    n_toks = token_count(col)
    mean_tok = n_chars / n_toks
    len_ok = (n_chars >= 100).cast("int")
    tok_ok = ((mean_tok >= 3) & (mean_tok <= 12)).cast("int")
    return (len_ok + tok_ok) / F.lit(2.0)


def fingerprint(col: str | Column) -> Column:
    """Order-invariant document fingerprint: md5 over the sorted distinct
    token set — a cheap canonical content id robust to word order."""
    toks = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.array_join(toks, " "))


def top_word_count(col: str | Column) -> Column:
    """Count of the most frequent token, computed IN-ROW with zero
    shuffle: sort the token array, then a single aggregate fold tracks
    the longest equal-run (Gopher-style repetition signal — a shuffling
    groupBy(doc, word) would move one row per word per doc at 100 TB;
    this moves nothing)."""
    toks = F.array_sort(tokens(col))
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    acc = F.aggregate(
        toks,
        init,
        lambda a, t: F.struct(
            t.alias("prev"),
            F.when(t == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(t == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
    )
    return acc.best


def bigrams(col: str | Column) -> Column:
    """Adjacent token pairs as 'w1 w2' strings (in-row)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def dup_bigram_fraction(col: str | Column) -> Column:
    """1 − distinct/total adjacent bigrams; NULL for single-token docs
    (nullif keeps ANSI mode from raising on the empty-bigram case)."""
    bi = bigrams(col)
    return 1 - F.size(F.array_distinct(bi)) / F.nullif(F.size(bi), F.lit(0))


# PII scrubbing — curation pipelines redact contact info before training.
# Patterns are deliberately engine-portable (no backreferences, no
# lookaround): Spark regexp_replace (Java regex, global by default) and
# DuckDB regexp_replace(..., 'g') (RE2) interpret them identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(\(\d{3}\)\s?|\d{3}-)\d{3}-\d{4}"


def redact_pii(col: str | Column) -> Column:
    """Replace emails then phone numbers with typed placeholders."""
    c = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")
