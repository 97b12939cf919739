"""Text analysis operators — M6 extension (language-ID, quality scoring,
token counting, document fingerprinting).

All pure column expressions over the ``documents`` table — codegen'd,
shuffle-free per row; aggregations shuffle only on tiny keys (lang).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.expr import let as _let

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "fr": ["le", "la", "de", "et"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " ")).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE pre-tokenizer's segment count."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0)).cast("bigint")


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    stripped = F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_count(text: Column, lang: str = "en") -> Column:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0)).cast("bigint")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length + punctuation + stopword
    signals, the standard cheap pre-filter in LLM data pipelines.

    The three regex/split features are let-bound (functions/expr.py) so
    each scans the text once regardless of how often the formula references
    them — CollapseProject would otherwise re-inline per reference."""
    feats = F.struct(
        ws_token_count(text).alias("n_toks"),
        punct_ratio(text).alias("punct"),
        stopword_count(text).alias("stop"),
    )

    def body(f: Column) -> Column:
        len_sig = F.least(f.n_toks / F.lit(100.0), F.lit(1.0))
        punct_sig = F.lit(1.0) - F.least(f.punct * 5, F.lit(1.0))
        stop_sig = F.least(f.stop / F.greatest(f.n_toks, F.lit(1)) * 5, F.lit(1.0))
        return F.round(0.4 * len_sig + 0.3 * punct_sig + 0.3 * stop_sig, 4)

    return _let(feats, body)


def lang_id(text: Column) -> Column:
    """N-gram-heuristic language ID: argmax of per-language stopword hits,
    ties broken by fixed language order (en > fr > es > de), 'und' when no
    list matches at all. Counts are let-bound: one regex scan per language
    per row, not one per reference."""
    langs = ["en", "fr", "es", "de"]
    counts = F.struct(*[stopword_count(text, lang).alias(lang) for lang in langs])

    def body(c: Column) -> Column:
        best = F.greatest(*[c[lang] for lang in langs])
        out = F.when(best == 0, F.lit("und"))
        for lang in langs:
            out = out.when(c[lang] == best, F.lit(lang))
        return out

    return _let(counts, body)


def doc_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key that survives
    formatting-only edits."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)
