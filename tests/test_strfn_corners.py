"""Cross-engine string-function corner pins (r17 sweep).

Following the casefold discipline (r16) and the JSON-channel discipline
(r17): every string primitive an oracled value path shares between
Spark and DuckDB is probed on a hostile corpus against BOTH live
engines. Where the engines agree, the agreement is asserted so an
engine upgrade that breaks it fails here instead of as a driver hash
mismatch; where they diverge, the divergence is asserted AS divergent
with a note on why no shipped path can reach it — so a future rewrite
that walks into the corner flips a loud, documented test.

Divergences found by the r17 sweep (148 agreeing probes, 3 classes of
divergence):

1. ``regexp_replace`` with a pattern that can match EMPTY ('a*'): after
   a non-empty match, Java's regex retries the zero-width match at the
   next position ('a' -> 'XX'), RE2 does not ('X'). Unreachable today:
   every shipped replace pattern requires >= 1 char (audited r17 —
   classes are all ``X+``/``X{2,}``/literal-anchored).
2. ``substring``/``substr`` at position 0: Spark clamps the start to 1
   but keeps the requested LENGTH window from the clamp ('aaa',0,2 ->
   'aa'); DuckDB treats [0, len) as the window, clipping one char
   ('a'). Positions >= 1 and negative positions agree. Unreachable:
   every shipped position is a literal >= 1 or 1+k*n with k,n >= 0.
3. ``trim()``: Spark's numeric-cast trimming strips the single-byte
   class [\\x00-\\x20\\x7F]; DuckDB's trim() strips ' ' plus Unicode
   spaces (NBSP/U+2007/U+3000) and keeps control chars. Oracles that
   mirror a Spark cast must use _spark_cast_trim_sql
   (queries/joins_dedup.py), never bare trim() — pinned here and
   end-to-end by the 9300019/9300020 dirty rows.

Also pinned as AGREEING (used by shipped oracles): regex split incl.
leading/trailing empties, split_part out-of-range/negative, regexp
no-match -> '' on both sides, non-zero substring windows, lpad
truncation, ascii() on multibyte, codepoint reverse, and RE2's ``\\s``
being exactly [ \\t\\n\\f\\r] (llm_ops' oracle uses \\s+ where the
Spark side uses the explicit class — equal only because RE2 excludes
VT/NEL/NBSP, asserted below).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

ROWS = [
    "", "a", "a b", " a  b ", "a,b,,", ",a,", "héllo wörld",
    "a\nb\n", "aaa", "x\ty", " a ", "𝄞a",
]


def _pairs(spark, spark_expr: str, duck_sql: str, rows=ROWS):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    got = [r.o for r in df.select(F.expr(spark_expr).alias("o")).collect()]
    con = duckdb.connect()
    try:
        want = [
            con.execute(f"SELECT {duck_sql}", [r]).fetchone()[0] for r in rows
        ]
    finally:
        con.close()
    return list(zip(rows, got, want))


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("split_ws", r"split(s, '\\s+')", r"string_split_regex(?, '\s+')"),
        ("split_comma", r"split(s, ',')", "string_split_regex(?, ',')"),
        (
            "n_split_ws",
            r"size(split(s, '\\s+'))",
            r"len(string_split_regex(?, '\s+'))",
        ),
        (
            "re_replace_ws",
            r"regexp_replace(s, '\\s+', ' ')",
            r"regexp_replace(?, '\s+', ' ', 'g')",
        ),
        (
            "re_extract_nomatch",
            r"regexp_extract(s, '([0-9]+)', 1)",
            "regexp_extract(?, '([0-9]+)', 1)",
        ),
        ("substr_1_2", "substring(s, 1, 2)", "substr(?, 1, 2)"),
        ("substr_neg", "substring(s, -2, 2)", "substr(?, -2, 2)"),
        ("substr_over", "substring(s, 2, 100)", "substr(?, 2, 100)"),
        ("split_part_1", "split_part(s, ',', 1)", "split_part(?, ',', 1)"),
        ("split_part_oob", "split_part(s, ',', 9)", "split_part(?, ',', 9)"),
        (
            "split_part_neg",
            "split_part(s, ',', -1)",
            "split_part(?, ',', -1)",
        ),
        ("lpad", "lpad(s, 3, '*')", "lpad(?, 3, '*')"),
        ("ascii", "ascii(s)", "ascii(?)"),
        ("reverse", "reverse(s)", "reverse(?)"),
    ],
)
def test_shared_string_primitives_agree(spark, label, spark_expr, duck_sql):
    diffs = [
        (r, g, w) for r, g, w in _pairs(spark, spark_expr, duck_sql) if g != w
    ]
    assert not diffs, f"{label} split the engines: {diffs}"


def test_zero_width_regexp_replace_divergence(spark):
    """DOCUMENTED divergent corner #1: Java retries the empty match
    after a non-empty one, RE2 does not. No shipped replace pattern can
    match empty (all are +/{2,}/literal-anchored); if either engine
    changes this, re-audit before anyone ships a '*' quantifier."""
    pairs = _pairs(
        spark,
        "regexp_replace(s, 'a*', 'X')",
        "regexp_replace(?, 'a*', 'X', 'g')",
        rows=["a", "aaa"],
    )
    assert [g for _, g, _ in pairs] == ["XX", "XX"]  # Java
    assert [w for _, _, w in pairs] == ["X", "X"]  # RE2


def test_substring_position_zero_divergence(spark):
    """DOCUMENTED divergent corner #2: position 0 clamps differently
    (Spark keeps the length window, DuckDB clips it). Every shipped
    position is >= 1; a computed position that can reach 0 must be
    guarded with greatest(pos, 1) on BOTH sides."""
    pairs = _pairs(
        spark, "substring(s, 0, 2)", "substr(?, 0, 2)", rows=["aaa", "héllo"]
    )
    assert [g for _, g, _ in pairs] == ["aa", "hé"]
    assert [w for _, _, w in pairs] == ["a", "h"]


def test_trim_divergence_on_unicode_spaces(spark):
    """DOCUMENTED divergent corner #3: DuckDB trim() strips NBSP (and
    other Unicode spaces) that Spark's trim()/casts keep, and keeps the
    control chars Spark's casts strip — why _spark_cast_trim_sql
    exists. Pinned from both directions."""
    nbsp = " a "
    df = spark.createDataFrame([(nbsp,)], "s string")
    assert df.select(F.trim("s").alias("o")).collect()[0].o == nbsp
    con = duckdb.connect()
    try:
        assert con.execute("SELECT trim(?)", [nbsp]).fetchone()[0] == "a"
        # tab survives DuckDB trim (it is NOT stripped there)
        assert con.execute("SELECT trim(?)", ["\ta\t"]).fetchone()[0] == "\ta\t"
    finally:
        con.close()


def test_re2_whitespace_class_is_ascii_no_vt(spark):
    """llm_ops' fingerprint oracle writes ``\\s+`` where the Spark side
    (operators/text.py) uses the explicit class [ \\t\\n\\f\\r]+ —
    equal ONLY because RE2's \\s is exactly that set (no VT, no NEL, no
    NBSP). Java's \\s INCLUDES VT, so the SPARK side must keep the
    explicit class; if either side's class moves, this fails."""
    con = duckdb.connect()
    try:
        for ch, member in [
            ("\t", True), ("\n", True), ("\f", True), ("\r", True),
            (" ", True),
            ("\x0b", False), ("\x85", False), (" ", False),
        ]:
            got = con.execute(
                "SELECT regexp_matches(?, '\\s')", [ch]
            ).fetchone()[0]
            assert got == member, (hex(ord(ch)), got)
    finally:
        con.close()
    # and Java's \s DOES include VT — the reason the Spark side uses
    # the explicit class, not \s
    df = spark.createDataFrame([("\x0b",)], "s string")
    assert df.select(
        F.expr(r"s rlike '\\s'").alias("o")
    ).collect()[0].o is True


def test_regex_lookaround_is_silently_unsupported_in_re2(spark):
    """DOCUMENTED divergent corner (r18 addition): Java regex supports
    lookahead/lookbehind; RE2 does NOT — and rather than erroring,
    DuckDB's regexp_extract returns NO MATCH (''), i.e. the divergence
    is SILENT. A lookaround in any pattern SHARED with an oracle
    would quietly zero the oracle side. Audited r18: the one
    lookaround in the engine (operators/text.py stopword_count) is
    SPARK-SIDE-ONLY and exists precisely because of this asymmetry —
    Java lookarounds emulate RE2's ASCII word boundary there so the
    ORACLE can use plain \\b; no oracle-side pattern contains
    lookaround. Backreferences and possessive quantifiers also
    differ, but those at least fail LOUDLY on DuckDB (invalid escape
    / bad repetition), so they can't slip through a green oracle
    run."""
    assert (
        spark.sql(
            r"SELECT regexp_extract('foo123', 'foo(?=1)', 0) AS o"
        ).collect()[0].o
        == "foo"
    )
    con = duckdb.connect()
    try:
        assert con.execute(
            r"SELECT regexp_extract('foo123', 'foo(?=1)', 0)"
        ).fetchone()[0] == ""
        for bad in (r"regexp_matches('abcabc', '(abc)\1')",
                    r"regexp_matches('aaa', 'a*+')"):
            with pytest.raises(duckdb.Error):
                con.execute(f"SELECT {bad}").fetchone()
    finally:
        con.close()
    assert spark.sql(
        r"SELECT regexp_like('abcabc', '(abc)\\1') AS o"
    ).collect()[0].o is True


def test_regex_word_class_is_ascii_on_both(spark):
    """AGREEING (r18): \\w is ASCII-only on BOTH engines — Java
    without UNICODE_CHARACTER_CLASS and RE2 both stop '\\w+' at the
    first non-ASCII letter ('héllo' -> 'h'). Agreement pinned because
    a Java-side switch to the unicode flag (or an engine default
    change) would silently widen Spark's matches only."""
    assert spark.sql(
        r"SELECT regexp_extract('héllo', '\\w+', 0) AS o"
    ).collect()[0].o == "h"
    con = duckdb.connect()
    try:
        assert con.execute(
            r"SELECT regexp_extract('héllo', '\w+', 0)"
        ).fetchone()[0] == "h"
    finally:
        con.close()


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("concat_ws_skips_null",
         "concat_ws(',', 'a', CAST(NULL AS STRING), 'b')",
         "concat_ws(',', 'a', NULL, 'b')"),
        ("pipe_propagates_null", "'a' || CAST(NULL AS STRING)",
         "'a' || NULL"),
        ("array_join_skips_null",
         "array_join(array('a', CAST(NULL AS STRING), 'b'), ',')",
         "array_to_string(['a', NULL, 'b'], ',')"),
        ("left_overlong", "left('hi', 10)", "left('hi', 10)"),
        ("nullif_eq", "cast(nullif(3, 3) as string)",
         "CAST(nullif(3, 3) AS VARCHAR)"),
    ],
)
def test_string_builder_null_edges_agree(spark, label, spark_expr,
                                         duck_sql):
    """r18 addendum: the NULL-edge builder semantics shipped oracles
    rely on — concat_ws and array_join SKIP NULL elements on both
    engines, while the || operator NULL-propagates on both (which is
    why every oracle uses ||, see the divergence below)."""
    got = spark.sql(f"SELECT {spark_expr} AS o").collect()[0].o
    con = duckdb.connect()
    try:
        want = con.execute(f"SELECT {duck_sql}").fetchone()[0]
    finally:
        con.close()
    assert got == want, (label, got, want)


def test_bare_concat_null_divergence(spark):
    """DOCUMENTED divergent corner (r18 addendum): concat() with a
    NULL argument NULL-propagates on Spark but SKIPS the NULL on
    DuckDB ('a' || NULL is NULL on both — the safe spelling).
    Audited r18: zero oracle SQL strings use bare concat( (checked
    mechanically over oracle_sql()); every string build mirrors via
    ||. Spark-side F.concat sites all feed non-nullable operands
    (literals, md5 digests, coalesced text)."""
    assert spark.sql(
        "SELECT concat('a', CAST(NULL AS STRING)) AS o"
    ).collect()[0].o is None
    con = duckdb.connect()
    try:
        assert con.execute("SELECT concat('a', NULL)").fetchone()[0] == "a"
    finally:
        con.close()


def test_negative_length_left_right_divergence(spark):
    """DOCUMENTED divergent corner (r18 addendum): left/right with a
    NEGATIVE length return '' on Spark but Python-style
    all-but-the-last|first-n on DuckDB (left('hello', -2) ->
    'hel'). Unreachable: every shipped left/right length is a
    literal >= 1."""
    assert spark.sql("SELECT left('hello', -2) AS o").collect()[0].o == ""
    assert spark.sql("SELECT right('hello', -2) AS o").collect()[0].o == ""
    con = duckdb.connect()
    try:
        assert con.execute("SELECT left('hello', -2)").fetchone()[0] == "hel"
        assert con.execute(
            "SELECT right('hello', -2)").fetchone()[0] == "llo"
    finally:
        con.close()


def test_hex_prefix_cast_divergence(spark):
    """DOCUMENTED divergent corner (r18 addendum, extends the r17
    lenient-cast class): DuckDB's TRY_CAST parses '0x' HEX prefixes
    ('0x1A' -> 26); Spark's numeric cast rejects them (NULL). The
    cast-trim gates' digits-only regexes already exclude such
    strings from every mirrored channel; pinned so a new numeric
    channel remembers the hex hole too."""
    assert spark.sql(
        "SELECT try_cast('0x1A' as int) AS o").collect()[0].o is None
    con = duckdb.connect()
    try:
        assert con.execute(
            "SELECT TRY_CAST('0x1A' AS INT)").fetchone()[0] == 26
    finally:
        con.close()
