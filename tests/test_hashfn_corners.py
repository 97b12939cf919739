"""Cross-engine hash-function corner pins (r18 sweep).

Eighth member of the gate family. md5 is the engine's
content-addressing primitive — hash_sample cutoffs, dataset splits,
pack buckets, weighted-sample uniforms, and passage fingerprints all
ride on it (queries/sampling.py) — so its cross-engine identity is
load-bearing for a dozen oracled queries.

AGREE (asserted): md5 and sha2-256 produce IDENTICAL lowercase-hex
digests on both engines for ASCII, empty string, and multibyte
Unicode (both hash the UTF-8 bytes of a VARCHAR — the 𝄞 supplement-
plane case pins the encoding), NULL propagates to NULL, digests of
casted integers match (the doc_id::VARCHAR pattern), hex-PREFIX
string comparison is stable (the `< '1a'` cutoff idiom), and the
shipped 32-bit uniform mirror — Spark ``conv(substr(md5, 1, 8), 16,
10)`` vs DuckDB ``('0x' || substr(md5, 1, 8))::UBIGINT`` — agrees
exactly (asserted on a value whose leading hex digit is >= 8, where
a signed-parse bug would surface).

DIVERGE / API gaps (asserted):

1. ``sha1`` and ``crc32`` exist only on Spark (DuckDB: no such
   function) — neither may appear in an oracled value path.
2. md5 over BINARY: Spark accepts it; DuckDB's md5(BLOB) overload
   does not exist under the same name/signature. Hash VARCHARs.
3. ``conv``'s DuckDB mirror must parse UNSIGNED (UBIGINT): the
   first 8 hex chars can exceed 2^31 and a signed 32-bit parse
   would flip negative. Spark's conv(…, 16, 10) is unsigned by
   contract; the '0x'-prefix UBIGINT cast is the one DuckDB
   spelling that matches it (sampling.py:321,341 — pinned here so
   the pair can't drift apart).
"""

from __future__ import annotations

import duckdb
import pytest


def _s(spark, sql: str):
    return spark.sql(f"SELECT {sql} AS o").collect()[0].o


def _d(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {sql}").fetchone()[0]
    finally:
        con.close()


def _d_raises(sql: str) -> bool:
    con = duckdb.connect()
    try:
        con.execute(f"SELECT {sql}").fetchone()
        return False
    except duckdb.Error:
        return True
    finally:
        con.close()


@pytest.mark.parametrize(
    "label,spark_expr,duck_sql",
    [
        ("md5_ascii", "md5('abc')", "md5('abc')"),
        ("md5_empty", "md5('')", "md5('')"),
        # multibyte incl. a supplementary-plane codepoint: pins that
        # both engines hash UTF-8 bytes
        ("md5_unicode", "md5('héllo𝄞')", "md5('héllo𝄞')"),
        ("md5_null", "md5(cast(null as string))", "md5(NULL::VARCHAR)"),
        ("sha256", "sha2('abc', 256)", "sha256('abc')"),
        ("md5_int_cast", "md5(cast(42 as string))", "md5(42::VARCHAR)"),
        ("md5_prefix", "substring(md5('k42'), 1, 4)",
         "substr(md5('k42'), 1, 4)"),
        ("cutoff_cmp", "md5('k42') < '1a'", "md5('k42') < '1a'"),
        ("u32_uniform_mirror",
         "conv(substring(md5('k42'), 1, 8), 16, 10)",
         "(('0x' || substr(md5('k42'), 1, 8))::UBIGINT)::VARCHAR"),
        # leading hex digit >= 8: a signed 32-bit parse would go
        # negative here ('doc-1' -> 'cabcf898')
        ("u32_uniform_highbit",
         "conv(substring(md5('doc-1'), 1, 8), 16, 10)",
         "(('0x' || substr(md5('doc-1'), 1, 8))::UBIGINT)::VARCHAR"),
    ],
)
def test_hash_primitives_agree(spark, label, spark_expr, duck_sql):
    got, want = _s(spark, spark_expr), _d(duck_sql)
    assert got == want, (label, got, want)


def test_u32_highbit_case_really_exercises_the_sign_seam(spark):
    """Guard the guard: the high-bit probe above is only meaningful
    while its md5 prefix actually has the top bit set."""
    assert int(_s(spark, "substring(md5('doc-1'), 1, 8)"), 16) >= 2**31


def test_sha1_crc32_are_spark_only(spark):
    """DOCUMENTED API gap #1: no DuckDB counterpart — not oracle-able."""
    assert _s(spark, "sha1('abc')") == (
        "a9993e364706816aba3e25717850c26c9cd0d89d"
    )
    assert _s(spark, "crc32(cast('abc' as binary))") == 891568578
    assert _d_raises("sha1('abc')")
    assert _d_raises("crc32('abc')")


def test_md5_binary_overload_is_spark_only(spark):
    """DOCUMENTED API gap #2: md5(BINARY) works on Spark; DuckDB's
    md5 takes VARCHAR only. Content-address VARCHARs."""
    assert _s(spark, "md5(cast('ab' as binary))") == (
        "187ef4436122d1cc2f40dc2b92f0eba0"
    )
    assert _d_raises("md5('ab'::BLOB)")
