"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

All implemented as pure Spark SQL Column expressions (JVM-side,
whole-stage codegen — no Python in the hot path). Each has an exact
ANSI-SQL oracle (see __spark_entry__.oracle_sql), which also documents
the semantics precisely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token filtering."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Average token length, 4dp (0.0 for empty docs)."""
    t = tokens(text)
    total = F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x)
    return F.round(
        F.when(F.size(t) > 0, total.cast("double") / F.size(t)).otherwise(F.lit(0.0)), 4
    )


# GPT-2-style pre-tokenizer approximation: contraction suffixes,
# letter runs, digit runs, punctuation runs (each with optional leading
# space), remaining whitespace. Counts pre-merge segments — the stable
# upper-bound estimate a BPE tokenizer refines.
_SUBWORD_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def subword_token_count(text: Column) -> Column:
    """BPE-ish token count (segments of the GPT-2 pre-tokenizer regex).
    Whole-stage-codegen regexp; no Python."""
    return F.size(F.regexp_extract_all(text, F.lit(_SUBWORD_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of punctuation characters, 4dp."""
    np = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.round(
        F.when(F.length(text) > 0, np.cast("double") / F.length(text)).otherwise(0.0), 4
    )


_EN_STOP = r"\b(the|and|of|to|is|in|that|it|was|for)\b"


def stopword_hits(text: Column) -> Column:
    """Count of English stopword occurrences (quality / lang-ID signal)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(_EN_STOP), 1))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: English if the stopword density clears a
    threshold, else 'unk'. (A real model slots in behind the same
    column contract; the engine-level contract is deterministic
    vectorized classification.)"""
    density = stopword_hits(text).cast("double") / F.greatest(
        token_count(text), F.lit(1)
    ).cast("double")
    return F.when(density >= 0.05, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1], 4dp: rewards mid-length docs
    and plain prose, penalizes punctuation soup."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    return F.round(len_score * (F.lit(1.0) - punct_pen), 4)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the casefolded,
    whitespace-collapsed text (near-dup-resistant to spacing/case)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def ngrams(text: Column, n: int = 3) -> Column:
    """All word n-grams (NOT deduplicated), casefolded — the
    denominator for repetition scoring. Built by zipping the token
    array with its shifted slices (one concat per position)."""
    t = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    acc = t
    for k in range(1, n):
        shifted = F.slice(t, k + 1, F.greatest(F.size(t) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(acc, 1, F.greatest(F.size(t) - (n - 1), F.lit(0)))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of repeated word n-grams: 1 - distinct/total, 4dp
    (0.0 when the doc has fewer than n tokens). A Gopher-style
    quality signal — high values flag templated/spammy documents.
    Pure SQL expression, whole-stage codegen."""
    g = ngrams(text, n)
    return F.round(
        F.when(
            F.size(g) > 0,
            1.0 - F.size(F.array_distinct(g)).cast("double") / F.size(g),
        ).otherwise(F.lit(0.0)),
        4,
    )


# PII patterns shared by Spark (Java regex) and the DuckDB oracle
# (RE2): character classes and bounded repetition only — no
# lookaround, no backreferences, so both dialects agree exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# 7-15 ACTUAL digits (not run length — '2020 - 2023' is 11 chars but
# only 4+4 digits) with at most 2 separator chars between consecutive
# digits, so spaced year ranges / dash-separated ID lists don't redact
PHONE_RE = r"\+?[0-9](?:[ ()-]{0,2}[0-9]){6,14}"


def pii_counts(text: Column) -> Column:
    """struct(n_emails, n_phones) — screening signal for curation
    filters (drop or route documents with dense contact info)."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
    )


def redact_pii(text: Column) -> Column:
    """Replace emails then phone-like runs with typed placeholders.
    Order matters: the email pattern consumes digits-in-local-parts
    that the phone pattern could otherwise split."""
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
