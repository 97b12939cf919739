"""Cross-engine lower() pin (functions/casefold.py) — r16.

Spark's lower() (ICU-backed full casing) and DuckDB's (utf8proc simple
mapping) disagree on 71 codepoints plus the final-sigma context rule;
``portable_lower`` pre-translates the divergent set so both engines
agree everywhere. These tests ARE the generation recipe: if either
engine's Unicode tables move (JDK/Spark/DuckDB upgrade), the full-
codepoint sweep below fails and prints the new divergence set — paste
it into PORTABLE_LOWER_FROM/_TO (canonical target = the modern single-
char lowercase; 'İ' stays pinned to simple 'i', 'Σ' to 'σ').
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.functions.casefold import (
    PORTABLE_LOWER_FROM,
    PORTABLE_LOWER_TO,
    oracle_portable_lower_sql,
    portable_lower,
)

CPS = [cp for cp in range(0x20, 0x30000) if not (0xD800 <= cp <= 0xDFFF)]


def test_portable_lower_agrees_with_duckdb_on_every_codepoint(spark):
    """THE completeness proof: portable_lower == the oracle twin for
    every codepoint in an 'a_a' context (planes 0-2 cover every cased
    letter; the context suppresses the final-sigma rule, probed
    separately below). A divergence here means an engine's Unicode
    tables moved — regenerate the pin table per the module docstring."""
    rows = [(cp, "a" + chr(cp) + "a") for cp in CPS]
    df = spark.createDataFrame(rows, "cp long, s string")
    got = {
        r.cp: r.l
        for r in df.select("cp", portable_lower("s").alias("l")).collect()
    }
    con = duckdb.connect()
    lower_sql = oracle_portable_lower_sql("'a' || chr(cp) || 'a'")
    want = dict(
        con.execute(
            f"SELECT cp, {lower_sql} FROM (SELECT unnest(?) AS cp)",
            [CPS],
        ).fetchall()
    )
    con.close()
    diffs = {
        hex(cp): (got[cp], want[cp]) for cp in CPS if got[cp] != want[cp]
    }
    assert not diffs, (
        f"{len(diffs)} codepoints diverge after the pin — an engine's "
        f"Unicode tables moved; regenerate PORTABLE_LOWER_FROM/_TO "
        f"(first 10: {dict(list(diffs.items())[:10])})"
    )


def test_pin_table_has_no_stale_entries(spark):
    """Every FROM char must actually NEED pinning: native lower() must
    diverge on it (or be Σ, whose divergence is context-only). A stale
    entry would silently rewrite text both engines already agree on."""
    chars = list(PORTABLE_LOWER_FROM)
    df = spark.createDataFrame(
        [(c, "a" + c + "a") for c in chars], "c string, s string"
    )
    got = {r.c: r.l for r in df.select("c", F.lower("s").alias("l")).collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT c, lower('a' || c || 'a') FROM (SELECT unnest(?) AS c)",
            [chars],
        ).fetchall()
    )
    con.close()
    stale = [
        hex(ord(c)) for c in chars if c != "Σ" and got[c] == want[c]
    ]
    assert not stale, f"pin-table entries no longer divergent: {stale}"


def test_final_sigma_context_is_pinned(spark):
    """Spark lowers word-final Σ to ς (context rule), DuckDB to σ
    always; the pin maps Σ→σ BEFORE lower so both agree — while a
    pre-existing lowercase ς passes through untouched on both sides
    (utf8proc's lower(ς) is ς; translating ς would corrupt it)."""
    cases = ["ΒΑΣ", "ΒΑΣ ΤΗΣ", "Σ", "αΣβ", "ήδη ς τέλος"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r.l for r in df.select(portable_lower("s").alias("l")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {oracle_portable_lower_sql('?')}", [s]
        ).fetchone()[0]
        for s in cases
    ]
    con.close()
    assert got == want, list(zip(cases, got, want))
    assert got[0] == "βασ"  # simple mapping, not the full-casing βας


def test_portable_lower_on_hostile_multilingual_strings(spark):
    """End-to-end string parity on realistic hostile input: Turkish İ
    (the only codepoint whose FULL lowercase grows the string), Greek
    all-caps with final sigma, stopword-adjacent İ (the combining-dot
    word-boundary seam), astral Vithkuqi letters, and mixed ASCII."""
    cases = [
        "İSTANBUL BÜYÜKŞEHİR",
        "THE İDE OF MARCH",          # 'İDE' -> 'ide': no 'de' stopword hit
        "ΑΘΗΝΑ ΚΑΙ Η ΘΕΣΣΑΛΟΝΙΚΗ ΒΑΣ",
        "mixed İ and Σ mid-word: AİB CΣD",
        "\U00010570\U00010571 astral vithkuqi",
        "plain ascii THE QUICK FOX",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r.l for r in df.select(portable_lower("s").alias("l")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {oracle_portable_lower_sql('?')}", [s]
        ).fetchone()[0]
        for s in cases
    ]
    con.close()
    assert got == want, [
        (c, g, w) for c, g, w in zip(cases, got, want) if g != w
    ]
    # and the native forms DO diverge on these (the pin is load-bearing)
    native = [r.l for r in df.select(F.lower("s").alias("l")).collect()]
    nat_duck = [
        con2.execute("SELECT lower(?)", [s]).fetchone()[0]
        for con2 in [duckdb.connect()]
        for s in cases
    ]
    assert any(a != b for a, b in zip(native, nat_duck))
