"""Regression tests for the glue/edge review findings (round 10, batch 10):
null-propagating idempotency keys, never-expires ledger entries, reserved
column collision in exact_dedup, NULL media_id through the multimodal
mapInPandas stubs, empty persisted stats index in read_pruned, and the
sum_fixed scaling contract."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="wod_edges2_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_idempotency_key_null_identifier_yields_null_key(spark):
    """NULL identifier must produce a NULL key (like sha256('op:' || id) in
    SQL) — concat_ws would collapse all null rows onto sha256('put'), and a
    single ledger hit would then anti-join away EVERY null-identifier row."""
    from weightlifting_wod_etl_spark.operators.dedup import (
        anti_join_ledger,
        idempotency_key,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, ident string"
    ).select("id", idempotency_key("put", F.col("ident")).alias("idem_key"))
    rows = {r.id: r.idem_key for r in df.collect()}
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None

    # a ledger containing one of the (null-keyed) rows must not suppress
    # the other null-keyed row: NULL never equals NULL in the anti-join
    ledger = df.filter(F.col("id") == 2).select("idem_key")
    kept = {r.id for r in anti_join_ledger(df, ledger, "idem_key").collect()}
    assert kept == {1, 2, 3}


def test_expire_ledger_keeps_null_ttl(spark):
    from weightlifting_wod_etl_spark.operators.dedup import expire_ledger

    ledger = spark.createDataFrame(
        [("k1", None), ("k2", 1), ("k3", 2**33)], "idem_key string, ttl long"
    )
    kept = {r.idem_key for r in expire_ledger(ledger).collect()}
    # k1 (never expires) and k3 (far future) survive; k2 (1970) expires
    assert kept == {"k1", "k3"}


def test_exact_dedup_preserves_preexisting_rn_column(spark):
    from weightlifting_wod_etl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, 10, "keep-me"), (1, 20, "keep-me-too"), (2, 5, "x")],
        "k long, v long, __rn string",
    )
    out = exact_dedup(df, key_cols=["k"], order_cols=[F.col("v").desc()])
    assert "__rn" in out.columns  # caller's column survives
    got = {(r["k"], r["v"], r["__rn"]) for r in out.collect()}
    assert got == {(1, 20, "keep-me-too"), (2, 5, "x")}


def test_multimodal_null_media_id_does_not_crash(spark):
    """A NULL media_id arrives in pandas as NaN; astype('int64')/int(NaN)
    used to kill the stage after task retries. All three stubs must pass
    nulls through (features/resize) or emit null-keyed rows (frames)."""
    from weightlifting_wod_etl_spark.operators.multimodal import (
        extract_features,
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            (None, "image", bytearray(b"payload-bytes"), {"src": "t"}),
            (7, "image", None, {"src": "t"}),
            (8, "image", bytearray(b"x" * 130), {"src": "t"}),
        ],
        "media_id long, media_type string, payload binary, meta map<string,string>",
    )

    feats = {
        r.media_id: r for r in extract_features(media).collect()
    }
    assert feats[None].n_bytes == 13 and len(feats[None].features) == 8
    assert feats[7].features is None and feats[7].n_bytes is None
    assert feats[8].feature0_u32 is not None

    resized = {r.media_id: r for r in resize_media(media, 8, 8).collect()}
    assert resized[None].payload is not None and resized[7].payload is None

    frames = sample_frames(media, every_n=1).collect()
    by_id: dict = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert by_id[None] == [0]  # 13 bytes → 1 fake frame, null-keyed
    assert 7 not in by_id  # null payload → no frames
    assert by_id[8] == [0, 1]  # 130 bytes → 2 fake frames


def test_read_pruned_rebuilds_on_empty_index_with_data_present(spark, tmp):
    """A zero-entry persisted index next to real data files must trigger a
    footer rebuild, not a vacuous prune-to-nothing (all() over [] is True)."""
    from weightlifting_wod_etl_spark.io import read_pruned
    from weightlifting_wod_etl_spark.operators.skipping import save_stats_index

    path = os.path.join(tmp, "t")
    spark.range(100).select(F.col("id").alias("k")).write.parquet(path)
    # build a VALID zero-entry index in an empty sibling, then plant it
    # here to simulate data appended outside the commit protocol
    empty = os.path.join(tmp, "empty")
    os.makedirs(empty)
    shutil.copy(save_stats_index(empty, ["k"]), os.path.join(path, "_stats_index.parquet"))
    got = read_pruned(spark, path, "k", 10, 19).count()
    assert got == 10  # rows present, not silently empty


def test_sum_fixed_scaling_contract(spark):
    from weightlifting_wod_etl_spark.functions.money import avg_fixed, sum_fixed

    df = spark.createDataFrame([(1.21,), (2.34,)], "x double")
    row = df.agg(
        sum_fixed("x").alias("s2"),
        sum_fixed("x", scale=4).alias("s4"),
        avg_fixed("x", round_to=4).alias("a"),
    ).collect()[0]
    # scale only changes quantization, never the magnitude
    assert row.s2 == pytest.approx(3.55, abs=1e-9)
    assert row.s4 == pytest.approx(3.55, abs=1e-9)
    assert row.a == pytest.approx(1.775, abs=1e-9)


def test_to_fixed_nonfinite_is_null(spark):
    """Review r10: ANSI-off cast turned NaN into 0 and ±Inf into
    ±Long.MAX — garbage finite numbers that silently wrapped sums."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.functions.money import sum_fixed, to_fixed

    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None), (6, 2.25)],
        "id long, v double",
    )
    vals = {r.id: r.f for r in df.select("id", to_fixed("v").alias("f")).collect()}
    assert vals[1] == 150 and vals[6] == 225
    assert vals[2] is None and vals[3] is None and vals[4] is None and vals[5] is None
    total = df.agg(sum_fixed("v").alias("s")).collect()[0].s
    assert total == 3.75  # finite rows only, no Long.MAX wrap


def test_to_fixed_huge_finite_is_null_and_avg_divisor_matches(spark):
    """Review r11: (a) a huge FINITE double (1e17 at scale 2 → 1e19 >
    Long.MAX) silently clamped to Long.MAX under the ANSI-off cast —
    the same garbage-wrap the r10 non-finite guard fixed; (b) avg_fixed
    divided by count(col), counting the NaN/overflow rows the numerator
    nulls out ([1.0, NaN] averaged to 0.5)."""
    from weightlifting_wod_etl_spark.functions.money import avg_fixed, to_fixed

    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 1e17)], "id long, v double"
    )
    vals = {r.id: r.f for r in df.select("id", to_fixed("v").alias("f")).collect()}
    assert vals[1] == 100
    assert vals[2] is None and vals[3] is None  # NaN AND overflow → NULL
    avg = df.agg(avg_fixed("v").alias("a")).collect()[0].a
    assert avg == 1.0  # divisor counts only rows the numerator kept


def test_ordered_concat_null_order_last_and_ties_deterministic(spark):
    """Review r10: struct array_sort put NULL order keys FIRST (SQL
    string_agg ORDER BY defaults NULLS LAST) and broke ties by shuffle
    order; both are pinned now."""
    from weightlifting_wod_etl_spark.operators.pivot import ordered_group_concat

    df = spark.createDataFrame(
        [(1, 2, "c"), (1, None, "z"), (1, 1, "a"), (1, 2, "b")],
        "g long, o long, v string",
    )
    row = ordered_group_concat(df, ["g"], "o", "v").collect()[0]
    # order 1, then the o=2 tie value-ordered (b, c), then the NULL key last
    assert row.joined == "a b c z"


def test_ordered_concat_all_null_values_yield_null_like_string_agg(spark):
    """Review r15 (pivot.py subsystem pass, confirmed against DuckDB):
    array_join over an array of null elements yields '' while SQL
    string_agg over only NULLs yields NULL — an all-NULL-value group must
    return NULL, and NULL values inside a MIXED group are skipped by
    both engines."""
    from weightlifting_wod_etl_spark.operators.pivot import ordered_group_concat

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (2, 1, "a"), (2, 2, None), (2, 3, "b")],
        "g long, o long, v string",
    )
    rows = {r.g: r.joined for r in ordered_group_concat(df, ["g"], "o", "v").collect()}
    assert rows[1] is None          # all-NULL group: string_agg semantics
    assert rows[2] == "a b"         # mixed group: NULLs skipped, not ''


def test_exact_percentiles_rejects_out_of_range_cuts(spark):
    import pytest as _pytest

    from weightlifting_wod_etl_spark.operators.percentile import exact_percentiles

    df = spark.createDataFrame([(1, 10)], "g long, v long")
    with _pytest.raises(ValueError, match="outside"):
        exact_percentiles(df, ["g"], "v", [1.25])


def test_write_jsonl_keeps_null_fields(spark, tmp):
    """Review r10: the JSON writer's default drops null-valued fields,
    breaking json.dumps-style '"key": null' parity."""
    import glob
    import json
    import os

    from weightlifting_wod_etl_spark.io import write_jsonl

    df = spark.createDataFrame([(1, None)], "id long, seg string")
    out = os.path.join(tmp, "jsonl")
    write_jsonl(df, out)
    [line] = [
        ln
        for f in glob.glob(os.path.join(out, "part-*"))
        for ln in open(f).read().splitlines()
        if ln
    ]
    assert json.loads(line) == {"id": 1, "seg": None}
    assert '"seg"' in line  # explicit null, not a missing key


def test_exact_percentiles_keeps_all_null_group(spark):
    """Review r11: a group whose values are ALL NULL vanished from the
    output (the pre-groupBy filter erased its rows) where quantile_cont
    keeps the group with NULL quantiles — downstream joins silently lost
    the group. It now survives with NULL percentiles and n_items 0."""
    from weightlifting_wod_etl_spark.operators.percentile import exact_percentiles

    df = spark.createDataFrame(
        [("g1", 10.0), ("g1", 20.0), ("g1", None), ("g2", None), ("g2", None)],
        "g string, v double",
    )
    out = {r.g: r for r in exact_percentiles(df, ["g"], "v", [0.5]).collect()}
    assert set(out) == {"g1", "g2"}
    assert out["g1"].p50 == 15.0 and out["g1"].n_items == 2  # NULL ignored
    assert out["g2"].p50 is None and out["g2"].n_items == 0  # group kept


def test_dataset_split_null_id_is_null_not_test(spark):
    """Review r11: a NULL id fell through otherwise('test') — every
    unidentifiable record pooled in the test split (contamination once
    ids are fixed); NULL id now yields a NULL split."""
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.sampling import dataset_split

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    got = {r.doc_id: r.s for r in df.select(
        "doc_id", dataset_split(F.col("doc_id")).alias("s")
    ).collect()}
    assert got[1] in ("train", "val", "test")
    assert got[None] is None


def test_token_chunks_rejects_nonpositive_chunk_size(spark):
    """Review r11: chunk_size=0 divided by lit(0) -> NULL under ANSI-off,
    silently chunking the whole corpus to zero rows."""
    import pytest
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.sampling import token_chunks

    with pytest.raises(ValueError, match="chunk_size"):
        token_chunks(F.col("text"), chunk_size=0)


def test_observe_quality_default_names_do_not_collide(spark):
    """Review r11: two default-named observations in one plan raised
    AnalysisException at action time (Spark requires unique names)."""
    from weightlifting_wod_etl_spark.operators.metrics import observe_quality

    d1, o1 = observe_quality(spark.range(5), required=["id"])
    d2, o2 = observe_quality(d1, required=["id"])
    assert d2.count() == 5  # one action drives both observations
    assert o1.get["n_rows"] == 5 and o2.get["n_rows"] == 5


def test_to_fixed_guards_the_scaled_product_not_the_input(spark):
    """r12 advice: the r11 guard tested abs(input) < Long.MAX/10^scale —
    a bound with a one-double-ULP window where round(c * 10^scale) still
    lands at 2^63 and the ANSI-off long cast clamps it to Long.MAX (the
    exact garbage-finite hazard the guard exists to close). The guard now
    bounds the scaled, rounded product itself, so no boundary input may
    ever surface the clamp value."""
    import math

    from weightlifting_wod_etl_spark.functions.money import to_fixed

    lmax = 2**63 - 1
    cases = []
    for scale in (0, 2, 4):
        limit = lmax / float(10**scale)
        # walk the doubles straddling the old input-side limit
        v = math.nextafter(limit, 0.0)
        for _ in range(6):
            cases.append((scale, v))
            v = math.nextafter(v, math.inf)
        cases.append((scale, limit))
        cases.append((scale, -limit))
        cases.append((scale, math.nextafter(-limit, -math.inf)))
    for scale in (0, 2, 4):
        vals = [
            (i, float(v))
            for i, (s, v) in enumerate(cases)
            if s == scale
        ]
        df = spark.createDataFrame(vals, "id long, v double")
        out = df.select("id", to_fixed("v", scale=scale).alias("f")).collect()
        for r in out:
            # either rejected (NULL) or a genuine in-range long — never
            # the Long.MAX clamp artifact, never past the long range
            # (Long.MIN = -2^63 is legitimate: exactly representable as
            # a double and cast faithfully, unlike the positive clamp)
            if r.f is not None:
                assert r.f != lmax and -(2**63) <= r.f <= lmax


def test_connected_components_raises_on_null_node_ids(spark):
    """Review r13 (reproduced): [(NULL,'a'), (NULL,'b')] converged with
    'a' and 'b' in two clusters although they are one component through
    the NULL node — the null-unsafe neighbor join never propagates across
    NULL and the != probe masks the split. Loud failure instead."""
    import pytest

    from weightlifting_wod_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(None, "a"), (None, "b")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="NULL node ids"):
        connected_components(edges)


def test_pagerank_raises_on_nonpositive_out_weight_sum(spark):
    """Review r13: a zero out-weight sum made w/wout NULL (ANSI off), the
    NULL contributions were skipped by sum, and the node's out-mass
    silently vanished (a SQL oracle would propagate NaN instead)."""
    import pytest

    from weightlifting_wod_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 0.0)], "src string, dst string, w double"
    )
    with pytest.raises(ValueError, match="sum to <= 0"):
        pagerank(edges)


def test_bloom_semi_join_rejects_nonpositive_num_bits(spark):
    """Review r13 (reproduced): pmod(hash, 0) is NULL under ANSI-off, so
    num_bits=0 silently returned an EMPTY result where the docstring
    promises semi-join equivalence."""
    import pytest

    from weightlifting_wod_etl_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.createDataFrame([(1,), (2,)], "k long")
    dim = spark.createDataFrame([(1,)], "k2 long")
    with pytest.raises(ValueError, match="num_bits"):
        bloom_semi_join(fact, dim, "k", "k2", num_bits=0)


def test_multimodal_ids_survive_null_in_batch_above_2_53(spark):
    """Review r13: a batch containing one NULL media_id arrived in pandas
    as float64, so astype('Int64') silently corrupted ids >= 2^53 (the
    float mantissa limit). Ids now travel as strings through the Arrow
    boundary and parse back exactly."""
    from weightlifting_wod_etl_spark.operators.multimodal import (
        extract_features,
        resize_media,
        sample_frames,
    )

    big = (1 << 53) + 1  # not representable as float64
    media = spark.createDataFrame(
        [(big, "image", bytearray(b"x" * 130), {"s": "a"}),
         (None, "image", bytearray(b"y"), {"s": "b"})],
        "media_id long, media_type string, payload binary, meta map<string,string>",
    )
    feats = {r.media_id for r in extract_features(media).collect()}
    assert big in feats and None in feats
    resized = {r.media_id for r in resize_media(media, 4, 4).collect()}
    assert big in resized and None in resized
    frames = sample_frames(media, every_n=1).collect()
    assert {r.media_id for r in frames} == {big, None}


def test_extract_features_matches_reference_implementation(spark):
    """deterministic_fake_features is the SPEC for the self-contained
    worker closure (which cannot import it) — this equality pin is what
    keeps the two copies from drifting (review r13: the exported function
    was otherwise dead code with a misleading docstring)."""
    from weightlifting_wod_etl_spark.operators.multimodal import (
        deterministic_fake_features,
        extract_features,
    )

    payload = b"reference payload bytes"
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_features(media).collect()[0]
    want = deterministic_fake_features(payload)
    import math
    assert all(
        math.isclose(a, b, rel_tol=1e-6) for a, b in zip(row.features, want)
    )


def test_sample_frames_digest_matches_concat_form(spark):
    """Review r13: the O(frames x payload) per-frame re-hash was replaced
    by an O(1) hashlib state copy — this pins that the digests are still
    byte-identical to the documented sha256(payload + ':{i}') concat form
    an external oracle reconstructs."""
    import hashlib

    from weightlifting_wod_etl_spark.operators.multimodal import sample_frames

    payload = b"f" * 200  # 3 fake frames at 64 bytes/frame
    media = spark.createDataFrame(
        [(5, bytearray(payload))], "media_id long, payload binary"
    )
    frames = {r.frame_idx: bytes(r.frame_payload)
              for r in sample_frames(media, every_n=1).collect()}
    assert frames == {
        i: hashlib.sha256(payload + f":{i}".encode()).digest() for i in range(3)
    }


def test_avg_fixed_knife_edge_rounding_matches_duckdb_exact(spark):
    """Review r13 (verified): Spark's round() on a double rounds the
    SHORTEST decimal repr (round(0.285, 2) = 0.29) while DuckDB rounds
    the exact binary value (0.28) — 57 cents over 200 rows hit exactly
    that seam at round_to=4. avg_fixed now decides half-away-from-zero
    on the exact rational, so both engines agree by construction."""
    import duckdb

    from weightlifting_wod_etl_spark.functions.money import avg_fixed

    # 200 rows summing to 57 fixed units: 57/200/100 = 0.00285 exactly
    # (as a rational) -> half-up at round_to=4 gives 0.0029
    rows = [(0.01,)] * 57 + [(0.0,)] * 143
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(avg_fixed("v", round_to=4).alias("a")).collect()[0].a
    assert got == 0.0029, got
    # negative mirror: -57/200/100 -> -0.0029 (ties away from zero)
    neg = spark.createDataFrame([(-v[0],) for v in rows], "v double")
    got_n = neg.agg(avg_fixed("v", round_to=4).alias("a")).collect()[0].a
    assert got_n == -0.0029, got_n


def test_quality_score_knife_edge_is_exact_rational(spark):
    """r15 (found by the sf0.1-scale parity sweep, sf0.1 doc 1828): the
    quality composite is a rational of integer counts, and deciding the
    4-digit rounding on the DOUBLE split the engines on a true tie —
    feats (n_toks=96, n_punct=0, n_chars=512, n_stop=10) give exactly
    3361/4000 = 0.84025, whose double is 0.84024999..., which Spark's
    shortest-repr round() took DOWN to 0.8402 while the true
    half-away-from-zero rounding is 0.8403. Both the Spark form and the
    generated HUGEINT oracle must now agree on 0.8403."""
    import duckdb
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.text import (
        ORACLE_QUALITY_FORMULA_SQL,
        oracle_quality_feats_sql,
        quality_score,
    )

    # 96 space-separated tokens, 512 chars, 10 'the' stopwords, no punct
    toks = ["the"] * 10 + ["xxxx"] * 85 + ["x" * 47]
    text = " ".join(toks)
    assert len(text) == 512 and len(toks) == 96

    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(quality_score(F.col("text")).alias("q"))
        .collect()[0]
        .q
    )
    duck = duckdb.connect()
    duck.execute("CREATE TABLE t AS SELECT ? AS text", [text])
    want = duck.sql(
        f"SELECT {ORACLE_QUALITY_FORMULA_SQL} FROM "
        f"(SELECT {oracle_quality_feats_sql('en')} FROM t)"
    ).fetchone()[0]
    assert got == want == 0.8403, (got, want)


def test_quality_score_decimal_tier_for_huge_documents(spark):
    """r15: the per-row i64/decimal tier split — a multi-megabyte document
    whose L·T passes (2^63−1)/10^7 must take the decimal fallback and
    still score EXACTLY (the i64 tier would raise there; the old
    non-tiered decimal form was ~2x slower for every row). Ground truth
    via Fraction on the same integer feats."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.text import quality_score

    text = " ".join(["x"] * 1_000_000)  # L=1999999, T=1000000 -> L*T ~ 2e12
    n_toks = 1_000_000
    n_chars = 2 * n_toks - 1
    assert n_chars * n_toks > (2**63 - 1) // 10**7
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(quality_score(F.col("text")).alias("q"))
        .collect()[0]
        .q
    )
    m, big_l, big_t, q, r = 100, n_chars, n_toks, 0, 0
    val = Fraction(4 * m * big_l * big_t + 300 * (big_l - q) * big_t + 300 * r * big_l,
                   1000 * big_l * big_t)
    scaled = val * 10**4
    fl = scaled.numerator // scaled.denominator
    frac = scaled - fl
    k = fl + 1 if (frac > Fraction(1, 2) or frac == Fraction(1, 2)) else fl
    assert got == k / 10**4, (got, float(val))
