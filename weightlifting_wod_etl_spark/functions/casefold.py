"""Cross-engine-portable lowercasing (r16).

``lower()`` is NOT portable between Spark and DuckDB. Measured r16 by a
full-codepoint sweep (U+0020..U+2FFFF through a live Spark session vs
DuckDB 1.x, the authoritative pair — NOT python, whose tables differ
from both): the pin table below holds 72 entries = 71 codepoints that
natively diverge in the sweep's a_a context (İ plus 70 version-lag
letters; test_pin_table_has_no_stale_entries asserts each one) + Σ,
whose divergence is context-only (word-final position). Three classes:

- **U+0130 'İ'**: Spark applies Unicode FULL lowercase (SpecialCasing:
  ``i`` + U+0307 combining dot — the string GROWS), DuckDB's utf8proc
  applies the simple map (``i``). The only unconditional full-casing
  divergence in the lowercase direction.
- **U+03A3 'Σ'**: Spark applies the context-sensitive final-sigma rule
  (``ς`` word-finally, ``σ`` otherwise); DuckDB maps ``σ`` always.
- **70 Unicode-version-lag letters** (Vithkuqi U+10570.., Garay
  U+10D50.., recent Latin Extended-D additions, Ᲊ): each engine knows
  mappings the other's tables predate — in BOTH directions (Spark 4's
  ICU-backed tables lower U+A7CB; utf8proc lowers U+1C89 differently).

Any lower() feeding an oracled VALUE (fingerprints, token/stopword
counts, normalized keys) would hash-split the engines on such input —
real multilingual corpora contain 'İstanbul' headlines and all-caps
Greek. The pin: BOTH engines pre-translate the divergent codepoints to
a canonical single lowercase (the modern mapping; 'İ' pinned to the
simple ``i``, 'Σ' to ``σ`` unconditionally), then apply their native
lower(), which agrees on every remaining codepoint. translate() is
codepoint-wise 1:1 in both engines, astral planes included.

The constant table is GENERATED from the sweep and pinned by
tests/test_casefold.py, which re-runs the sweep against the live
engines and fails loudly if either engine's Unicode tables move (the
regeneration recipe is in that test's docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fmt: off
PORTABLE_LOWER_FROM = (
    "İΣᲉⰯꟀꟇꟉꟋꟌꟐ"
    "ꟖꟘꟚꟜꟵ"
    "\U00010570\U00010571\U00010572\U00010573\U00010574\U00010575"
    "\U00010576\U00010577\U00010578\U00010579\U0001057a\U0001057c"
    "\U0001057d\U0001057e\U0001057f\U00010580\U00010581\U00010582"
    "\U00010583\U00010584\U00010585\U00010586\U00010587\U00010588"
    "\U00010589\U0001058a\U0001058c\U0001058d\U0001058e\U0001058f"
    "\U00010590\U00010591\U00010592\U00010594\U00010595"
    "\U00010d50\U00010d51\U00010d52\U00010d53\U00010d54\U00010d55"
    "\U00010d56\U00010d57\U00010d58\U00010d59\U00010d5a\U00010d5b"
    "\U00010d5c\U00010d5d\U00010d5e\U00010d5f\U00010d60\U00010d61"
    "\U00010d62\U00010d63\U00010d64\U00010d65"
)
PORTABLE_LOWER_TO = (
    "iσᲊⱟꟁꟈꟊɤꟍꟑ"
    "ꟗꟙꟛƛꟶ"
    "\U00010597\U00010598\U00010599\U0001059a\U0001059b\U0001059c"
    "\U0001059d\U0001059e\U0001059f\U000105a0\U000105a1\U000105a3"
    "\U000105a4\U000105a5\U000105a6\U000105a7\U000105a8\U000105a9"
    "\U000105aa\U000105ab\U000105ac\U000105ad\U000105ae\U000105af"
    "\U000105b0\U000105b1\U000105b3\U000105b4\U000105b5\U000105b6"
    "\U000105b7\U000105b8\U000105b9\U000105bb\U000105bc"
    "\U00010d70\U00010d71\U00010d72\U00010d73\U00010d74\U00010d75"
    "\U00010d76\U00010d77\U00010d78\U00010d79\U00010d7a\U00010d7b"
    "\U00010d7c\U00010d7d\U00010d7e\U00010d7f\U00010d80\U00010d81"
    "\U00010d82\U00010d83\U00010d84\U00010d85"
)
# fmt: on

assert len(PORTABLE_LOWER_FROM) == len(PORTABLE_LOWER_TO) == 72
# no duplicate FROM chars: both engines' translate() is first-wins
# (probed r17, they agree), so a dup would be silently shadowed — it
# cannot split the engines, but it means a regeneration glitch
assert len(set(PORTABLE_LOWER_FROM)) == 72


def portable_lower(col: Column | str) -> Column:
    """``lower()`` with identical output in Spark and DuckDB for every
    codepoint — use this (with :func:`oracle_portable_lower_sql` as the
    oracle twin) wherever a lowercased string feeds an oracled value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.translate(c, PORTABLE_LOWER_FROM, PORTABLE_LOWER_TO)
    )


def oracle_portable_lower_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_lower` — generated from the SAME
    constants (the interpolate-shared-constants rule), never hand-copied."""
    frm = PORTABLE_LOWER_FROM.replace("'", "''")
    to = PORTABLE_LOWER_TO.replace("'", "''")
    return f"lower(translate({expr}, '{frm}', '{to}'))"
