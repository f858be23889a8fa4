"""Text-analysis column functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path.  Every function here has an exact ANSI-SQL twin used as the
DuckDB oracle in ``__spark_entry__.py``, so the semantics are pinned by the
driver's correctness gate, not just unit tests.

These extend the reference's transform repertoire (SURVEY.md §2.2 — filters,
imputation, string splits) with the text ops a 100 TB document pipeline
needs: token counting, quality scoring, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared with the SQL oracles — keep sorted, lowercase
STOPWORDS = ["a", "an", "and", "in", "of", "the", "to"]

# tiny per-language marker sets for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "los", "las", "y"],
    "fr": ["le", "les", "des", "et"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


# ---- token-bound variants -------------------------------------------------
# Each *_of_tokens/_of_lower form computes over an ALREADY-MATERIALIZED
# lowercased-token-array / lowercased-text column instead of re-deriving it
# from the raw text.  The convenience forms below re-derive per call — fine
# for one metric, but a query computing several metrics evaluates the regex
# split once PER METRIC unless it binds the array first (see text_quality in
# plans/driver_queries.py).

def stopword_ratio_of_tokens(ltoks: Column) -> Column:
    hits = F.size(F.filter(ltoks, lambda t: t.isin(*STOPWORDS)))
    n = F.size(ltoks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio_of_lower(lt: Column) -> Column:
    n = F.length(lt)
    punct = F.length(F.regexp_replace(lt, "[a-z0-9 ]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def bpe_ish_token_count_of_lower(lt: Column) -> Column:
    return F.size(F.regexp_extract_all(lt, F.lit(BPE_ISH_PATTERN), 0))


def quality_score_of(ltoks: Column, lt: Column) -> Column:
    len_term = F.least(F.size(ltoks).cast("double") / F.lit(200.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio_of_lower(lt))
        + F.lit(0.2) * (F.lit(1.0) - stopword_ratio_of_tokens(ltoks)),
        4,
    )


def lang_id_of_tokens(ltoks: Column) -> Column:
    pairs = [
        F.struct(
            F.size(F.filter(ltoks, lambda t: t.isin(*LANG_MARKERS[lang]))).alias(
                "hits"
            ),
            F.lit(-idx).alias("rank"),
            F.lit(lang).alias("lang"),
        )
        for idx, lang in enumerate(sorted(LANG_MARKERS))
    ]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return bpe_ish_token_count_of_lower(F.lower(col))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    return punct_ratio_of_lower(F.lower(col))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    return stopword_ratio_of_tokens(ws_tokens(F.lower(col)))


def quality_score(col: Column) -> Column:
    """Deterministic document quality score in [0, 1]:

    ``0.5*min(tokens/200, 1) + 0.3*(1 - punct_ratio) + 0.2*(1 - stopword_ratio)``

    (length favors substance, punctuation noise and stopword stuffing
    penalized — the usual cheap pre-filter before expensive dedup.)
    """
    return quality_score_of(ws_tokens(F.lower(col)), F.lower(col))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language marker-token hits,
    ties broken by language code order (negated index in the comparison
    struct, matching the SQL oracle's CASE order), 'und' (undetermined)
    when no marker hits at all."""
    return lang_id_of_tokens(ws_tokens(F.lower(col)))


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) over an ALREADY-MATERIALIZED token
    array column (a bound attribute, not an inline ``split`` expression).
    Texts shorter than n tokens yield an EMPTY array (guarded: Spark's
    ``sequence(1, 0)`` would count DOWN, not return empty).

    SCALE NOTE — why the token array must be bound first: ``slice(toks, i,
    n)`` inside the ``transform`` lambda is evaluated once PER SHINGLE INDEX.
    If ``toks`` is the inline ``split(trim(lower(text)))`` expression,
    Catalyst re-executes the regex split for every index — O(tokens²) work
    per row (measured 10× slowdown on 300-char docs at sf0.1).  With ``toks``
    projected in a preceding ``select``/``withColumn``, CollapseProject will
    NOT inline it (non-cheap expression consumed more than once) and the
    split runs once per row.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of lowercased text.  Convenience form for small
    inputs and oracles — HOT PATHS must materialize the token array first and
    use :func:`shingles_of_tokens` (see its scale note)."""
    return shingles_of_tokens(ws_tokens(F.lower(col)), n)


def doc_fingerprint_of_tokens(toks: Column, n: int = 3) -> Column:
    """Document fingerprint over a pre-materialized token array: lexicographic
    min of md5 over word n-gram shingles (a 1-hash MinHash / winnowing-style
    rolling fingerprint).  md5 is bit-identical across Spark and DuckDB →
    oracle-checkable."""
    return F.array_min(F.transform(shingles_of_tokens(toks, n), lambda s: F.md5(s)))


def doc_fingerprint(col: Column, n: int = 3) -> Column:
    """Convenience form of :func:`doc_fingerprint_of_tokens`; hot paths must
    bind the token array first (see :func:`shingles_of_tokens`)."""
    return doc_fingerprint_of_tokens(ws_tokens(F.lower(col)), n)
