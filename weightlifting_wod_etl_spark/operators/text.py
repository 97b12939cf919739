"""Text analysis operators — M6 extension (language-ID, quality scoring,
token counting, document fingerprinting).

All pure column expressions over the ``documents`` table — codegen'd,
shuffle-free per row; aggregations shuffle only on tiny keys (lang).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.casefold import (
    oracle_portable_lower_sql,
    portable_lower,
)
from ..functions.expr import let as _let

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "fr": ["le", "la", "de", "et"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
}


# ASCII punctuation (codepoints 33-47, 58-64, 91-96, 123-126) — the same
# class in Java regex (Spark) and RE2 (DuckDB), so oracles stay portable.
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count: split-on-single-space segments — the
    cross-engine convention every oracle shares (``len(string_split)``);
    run-collapsing belongs to normalization (see ``doc_fingerprint``).
    NULL text → NULL: with ANSI off, ``size()`` of a null array is -1,
    which silently poisoned sums and rankings."""
    return F.when(
        text.isNotNull(), F.size(F.split(text, " ")).cast("bigint")
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE pre-tokenizer's segment count.
    NULL text → NULL (not -1). Lowercased via ``portable_lower`` (r16):
    Java full-casing grows 'İ' to two codepoints and applies the
    final-sigma rule, splitting the token count from the oracle's
    simple-mapping lower() on real multilingual text."""
    return F.when(
        text.isNotNull(),
        F.size(
            F.regexp_extract_all(
                portable_lower(text), F.lit(BPE_ISH_PATTERN), 0
            )
        ).cast("bigint"),
    )


def punct_ratio(text: Column) -> Column:
    """ASCII-punctuation chars / total chars. The old complement-class
    definition (everything outside ``[a-z0-9 ]``) counted every accented
    letter, newline, and tab as punctuation — systematically depressing
    quality_score for the very fr/es/de corpora the stopword lists
    support. NULL text → NULL."""
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_CLASS), 0))
    return F.when(
        text.isNotNull(), n_punct / F.greatest(F.length(text), F.lit(1))
    )


def stopword_count(text: Column, lang: str = "en") -> Column:
    # explicit ASCII boundaries, NOT \b: Java's \b is Unicode-aware (ï is
    # a word char) while the DuckDB/RE2 oracles' \b is ASCII-only, so a
    # stopword abutting an accented letter ('laïque', 'elías y el mar')
    # would count differently per engine — exactly on the fr/es/de corpora
    # the lists target. The lookarounds reproduce RE2's [0-9A-Za-z_] word
    # class in Java.
    # portable_lower (r16): Spark's full-casing lower() turns 'İDE' into
    # 'i' + combining-dot + 'de' — the U+0307 is not a word char, so the
    # ASCII lookaround MATCHES 'de' while the oracle's simple-mapping
    # 'ide' does not. The shared pre-translate pin keeps both engines on
    # identical lowered text.
    words = "|".join(STOPWORDS[lang])
    pat = r"(?<![a-zA-Z0-9_])(" + words + r")(?![a-zA-Z0-9_])"
    return F.when(
        text.isNotNull(),
        F.size(
            F.regexp_extract_all(portable_lower(text), F.lit(pat), 0)
        ).cast("bigint"),
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length + punctuation + stopword
    signals, the standard cheap pre-filter in LLM data pipelines.

    The three regex/split features are let-bound (functions/expr.py) so
    each scans the text once regardless of how often the formula references
    them — CollapseProject would otherwise re-inline per reference.

    Rounded on the EXACT RATIONAL, never the double composite (r15,
    found by the sf0.1-scale parity sweep: doc 1828 read 0.8402 in Spark
    vs 0.8403 in DuckDB — the r13 round()-on-double class; the score is
    a rational of the integer counts, so the knife edge is avoidable
    entirely). With m = min(n_toks, 100), L = max(n_chars, 1),
    T = max(n_toks, 1), q = min(5·n_punct, L), r = min(5·n_stop, T):

        0.4·m/100 + 0.3·(L−q)/L + 0.3·r/T
          = (4·m·L·T + 300·(L−q)·T + 300·r·L) / (1000·L·T)

    The rounding decision is tiered by a per-row domain test (r15,
    A/B-measured): rows with L·T < (2^63−1)/10^7 — everything up to
    multi-megabyte documents — take :func:`round_ratio_exact_i64` over
    pure-long arithmetic, because this site is per-row inside a HOF
    (interpreted) projection where each BigDecimal divide/remainder
    costs ~µs and doubled q_curation_pipeline; larger documents fall
    back to the let-bound decimal form
    (:func:`round_ratio_exact_posden`) instead of raising, so a
    gigabyte-scale document still scores exactly. den = 1000·L·T > 0
    by construction, so the omitted sign/zero guards cannot act. The
    oracle twin is ``ORACLE_QUALITY_FORMULA_SQL`` below — HUGEINT
    arithmetic, value-identical on both tiers' domains."""
    from ..functions.money import (
        round_ratio_exact_i64,
        round_ratio_exact_posden,
    )

    feats = F.struct(
        ws_token_count(text).alias("n_toks"),
        F.size(F.regexp_extract_all(text, F.lit(PUNCT_CLASS), 0))
        .cast("bigint")
        .alias("n_punct"),
        F.length(text).cast("bigint").alias("n_chars"),
        stopword_count(text).alias("stop"),
    )

    def body(f: Column) -> Column:
        m = F.least(f.n_toks, F.lit(100))
        big_l = F.greatest(f.n_chars, F.lit(1))
        big_t = F.greatest(f.n_toks, F.lit(1))
        q = F.least(5 * f.n_punct, big_l)
        r = F.least(5 * f.stop, big_t)

        def rational(cast_to: str):
            def c(x: Column) -> Column:
                return x.cast(cast_to)

            num = (
                F.lit(4) * c(m) * c(big_l) * c(big_t)
                + F.lit(300) * (c(big_l) - c(q)) * c(big_t)
                + F.lit(300) * c(r) * c(big_l)
            )
            return num, F.lit(1000) * c(big_l) * c(big_t)

        # i64 tier: num ≤ 1000·L·T and the helper scales by 10^4, so
        # L·T < (2^63−1)/10^7 keeps every intermediate exactly inside a
        # long (L·T itself cannot wrap: both factors are ≤ 2^31). All
        # operands are let-bound (the r14 jaccard rule): the helpers
        # reference them repeatedly and this projection runs interpreted.
        n64, d64 = rational("long")
        nde, dde = rational("decimal(38,0)")
        bound = (2**63 - 1) // 10**7

        def bound_call(num, den, helper):
            # per-branch let: each tier's (num, den) pair is built once
            # per TAKEN branch only (a shared struct would evaluate both
            # tiers' operands eagerly for every row)
            return _let(
                F.struct(num.alias("n"), den.alias("d")),
                lambda nd: helper(nd.getField("n"), nd.getField("d"), 4),
            )

        return F.when(
            big_l * big_t < F.lit(bound),
            bound_call(n64, d64, round_ratio_exact_i64),
        ).otherwise(bound_call(nde, dde, round_ratio_exact_posden))

    # explicit NULL guard: least()/greatest() SKIP nulls (Spark and DuckDB
    # alike), so null features would quietly blend into a bogus in-range
    # score (-1.504 before the feature null fixes) instead of propagating
    return F.when(text.isNotNull(), _let(feats, body))


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

    # NULL text → NULL, not 'en': unguarded, every count is NULL, greatest
    # skips nulls, and the first tie-break branch (en) matched NULL == NULL
    # semantics through the ANSI-off -1 path
    return F.when(text.isNotNull(), _let(counts, body))


def bigram_structs(text: Column) -> Column:
    """Let-bound array of (w1, bg) structs over adjacent space-split
    tokens — the ONE definition of bigram minting (review r12:
    q_bigram_topk and q_bigram_lm_score hand-maintained near-identical
    copies of the guard and index arithmetic, inviting one-sided fixes).

    when-without-otherwise guard: ``sequence(1, 0)`` counts DOWN for a
    single-token doc and ``element_at(arr, 0)`` aborts the whole job —
    short docs must yield NULL, which explode drops, matching the
    oracles on NULL and 1-token text. ``concat`` (NULL-propagating)
    mirrors the oracles' ``||``; split never yields NULL tokens anyway.
    The token array is let-bound: CollapseProject would otherwise re-run
    the split per lambda reference — O(tokens²) per document."""
    return _let(
        F.split(text, " "),
        lambda arr: F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.struct(
                    F.element_at(arr, i).alias("w1"),
                    F.concat(
                        F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
                    ).alias("bg"),
                ),
            ),
        ),
    )


def oracle_stopword_regex(lang: str) -> str:
    """RE2-side stopword pattern for DuckDB oracle SQL — derived from the
    SAME ``STOPWORDS`` table the Spark expressions read, so editing a
    list can never silently desynchronize an oracle that hardcoded the
    old literal (review r12; the BPE_ISH_PATTERN f-string interpolation
    is the established pattern). RE2's ``\\b`` is ASCII-only, which the
    Spark side reproduces with explicit lookarounds (``stopword_count``)."""
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def oracle_quality_feats_sql(lang: str = "en") -> str:
    """DuckDB SQL for ``quality_score``'s three features, as SELECT-list
    columns named (n_toks, punct_ratio, n_stop) — the single source the
    quality oracles interpolate (r13: q_quality_score and
    q_curation_pipeline each hand-copied the feature exprs AND the
    weighted formula, so editing the weights or lists here needed three
    synchronized edits; one-sided drift desynchronized an oracle from the
    Spark score it filters on — the r12 interpolate-shared-constants
    rule)."""
    return (
        "len(string_split(text, ' '))::BIGINT AS n_toks,\n"
        f"               len(regexp_extract_all(text, '{PUNCT_CLASS}'))::BIGINT"
        " AS n_punct,\n"
        "               length(text)::BIGINT AS n_chars,\n"
        f"               len(regexp_extract_all({oracle_portable_lower_sql('text')}, "
        f"'{oracle_stopword_regex(lang)}'))::BIGINT AS n_stop"
    )


def _oracle_quality_formula_sql() -> str:
    """The exact-rational composite over the oracle_quality_feats_sql
    columns — GENERATED through the same oracle_round_ratio_sql twin the
    Spark side's round_ratio_exact mirrors (r15; the previous
    round()-on-double form split the engines on knife-edge scores at
    sf0.1). Factors cast ::HUGEINT up front so gigabyte-scale documents
    cannot trip DuckDB's loud BIGINT-overflow before the helper's own
    HUGEINT cast."""
    from ..functions.money import oracle_round_ratio_sql

    big_l = "greatest(n_chars, 1)::HUGEINT"
    big_t = "greatest(n_toks, 1)::HUGEINT"
    num = (
        f"(4 * least(n_toks, 100)::HUGEINT * {big_l} * {big_t}"
        f" + 300 * ({big_l} - least(5 * n_punct, greatest(n_chars, 1))::HUGEINT)"
        f" * {big_t}"
        f" + 300 * least(5 * n_stop, greatest(n_toks, 1))::HUGEINT * {big_l})"
    )
    den = f"(1000 * {big_l} * {big_t})"
    return oracle_round_ratio_sql(num, den, 4)


ORACLE_QUALITY_FORMULA_SQL = _oracle_quality_formula_sql()


def doc_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key that survives
    formatting-only edits."""
    # explicit class, not \s: Java's \s includes \x0B (vertical tab),
    # RE2's does not — a \x0B-separated text would fingerprint
    # differently per engine (review r11; same fix class as the ASCII
    # \b stopword pin)
    # portable_lower (r16): the fingerprint is an exact-dedup KEY — a
    # full-vs-simple casing split ('İstanbul' headlines) would cluster
    # duplicates differently per engine
    normalized = F.trim(
        F.regexp_replace(portable_lower(text), r"[ \t\n\f\r]+", " ")
    )
    return F.md5(normalized)
