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


# ---------------------------------------------------------------------------
# Registry-level casing guard (VERDICT r17 #5): upper()'s cross-engine
# divergence class (ß→SS full casing, Unicode-version lag — same family
# as lower()'s 72-entry pin, documented in functions_surface.py's domain
# note) is UNPINNED because no value path uses it on a non-ASCII domain.
# This guard keeps it that way mechanically: any new upper()/initcap()
# on a value path must either go through a portable casefold wrapper or
# be added to the pinned allowlist below WITH a domain-note docstring —
# the class cannot be reopened silently.

def _casing_call_sites():
    """(relpath, count) of upper(/initcap( CALLS in engine source, with
    docstrings stripped (prose mentions don't count; oracle SQL strings
    and F.upper expressions do)."""
    import ast
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weightlifting_wod_etl_spark",
    )
    pat = re.compile(r"\b(?:upper|initcap)\s*\(")
    out = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            src = open(path, encoding="utf-8").read()
            tree = ast.parse(src)
            body = src
            # strip module/class/function docstrings (prose): replace
            # each docstring's text with blanks so offsets stay valid
            for node in ast.walk(tree):
                if isinstance(
                    node,
                    (ast.Module, ast.ClassDef, ast.FunctionDef,
                     ast.AsyncFunctionDef),
                ) and (doc := ast.get_docstring(node, clean=False)):
                    body = body.replace(doc, "", 1)
            n = len(pat.findall(body))
            if n:
                out[os.path.relpath(path, pkg)] = n
    return out


def test_no_unguarded_upper_initcap_on_value_paths():
    # Pinned allowlist — each entry's module carries a domain note
    # explaining why native casing is safe there (ASCII-only domain):
    #   queries/functions_surface.py — q_string_fns demonstrates the RAW
    #     JVM surface on the ASCII customer table (docstring r16 note);
    #     2 = oracle SQL upper() + F.upper().
    #   queries/joins_dedup.py — q_collation_group's mixed-case key
    #     synthesis on generated-ASCII o_orderpriority (docstring r16
    #     note); 2 = oracle SQL upper() + selectExpr upper().
    allowed = {
        "queries/functions_surface.py": 2,
        "queries/joins_dedup.py": 2,
    }
    sites = _casing_call_sites()
    unexpected = {
        path: n for path, n in sites.items() if allowed.get(path) != n
    }
    assert not unexpected, (
        f"upper()/initcap() call-site drift vs the pinned allowlist: "
        f"{unexpected} (allowed={allowed}). Native upper()/initcap() "
        "diverge cross-engine on the full-casing class (ß→SS etc.). "
        "Route the new site through a portable wrapper in "
        "functions/casefold.py, or — if the domain is provably ASCII — "
        "add a domain-note docstring and re-pin the allowlist here."
    )
    # the allowlisted modules must still carry their domain notes
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weightlifting_wod_etl_spark",
    )
    for path in allowed:
        src = open(os.path.join(pkg, path), encoding="utf-8").read()
        assert "ASCII" in src and "diverge" in src, (
            f"{path} lost its ASCII-domain note justifying native casing"
        )
