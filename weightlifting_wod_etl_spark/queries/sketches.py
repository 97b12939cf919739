"""Quantile sketches, verified against exact percentiles via band checks.

Exact percentiles are the correctness gold standard but shuffle one row
per distinct (group, value) pair; at 100 TB the default is a mergeable
sketch whose wire volume is independent of row count. A sketch's output
can't hash-match an oracle directly (the approximation is engine-
specific), so these queries verify the thing the sketch GUARANTEES
instead: the estimate must land inside a generous exact RANK band:
the estimate's true rank in the group (counted exactly from the data)
must sit within the sketch's promised rank error of the target quantile,
plus a ±1-2 row discreteness slack so the check is deterministic for
groups of ANY size (an interpolated value-percentile band is knife-edge
for tiny groups, where a discrete sketch answer legitimately falls
outside the interpolated p±band). Spark computes the booleans genuinely
— estimate vs exact rank counts, both its own; the DuckDB oracle asserts
the guaranteed outcome (TRUE) plus the exact per-group counts and (for
the built-in) the exact dyadic percentiles themselves. A sketch
regression (lost mass, broken merge, rank drift) flips a boolean or a
count and the driver's value-hash catches it.

q_tdigest_quantile and q_quantile_bound restrict to non-NULL
(event_type, value) in BOTH engines: sketches and exact twins drop NULL
measures by definition, and a NULL group key would silently vanish from
q_tdigest_quantile's pandas stages while the oracle's GROUP BY emits it.
q_hll_bound deliberately restricts NEITHER — it has no pandas stage, its
Spark groupBy keeps NULL keys exactly like the oracle's GROUP BY, and
adding a filter on one side only would hash-mismatch (review r11: the
old docstring claimed 'all three' and invited exactly that edit).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.money import to_fixed
from ..io import load_table
from ..operators.percentile import exact_percentiles
from ..operators.tdigest import DEFAULT_K, make_digest_fns
from ..queries_registry import register


@register(
    "q_quantile_bound",
    oracle="""
    WITH c AS (SELECT event_type, round(value * 100)::BIGINT AS cents
               FROM events
               -- NOT isnan too (r13, same fix as q_tdigest_quantile r11):
               -- NaN passes IS NOT NULL in both engines, then crashes the
               -- oracle's BIGINT cast and inflates Spark's __n against a
               -- straddle that percentile_approx excluded NaN from
               WHERE value IS NOT NULL AND NOT isnan(value)
                 AND event_type IS NOT NULL)
    SELECT event_type,
           quantile_cont(cents, [0.25, 0.5, 0.75])[1]::DOUBLE / 100.0 AS p25,
           quantile_cont(cents, [0.25, 0.5, 0.75])[2]::DOUBLE / 100.0 AS p50,
           quantile_cont(cents, [0.25, 0.5, 0.75])[3]::DOUBLE / 100.0 AS p75,
           count(*)::BIGINT AS n_items,
           TRUE AS approx_in_band
    FROM c
    GROUP BY event_type
    """,
)
def q_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in quantile sketch (``percentile_approx``, a KLL-family
    rank sketch) cross-checked against exact percentiles, per group.

    Outputs the EXACT dyadic p25/p50/p75 (hash-verified values, same
    engine-exactness argument as q_percentile) plus ``approx_in_band``:
    the sketch guarantees it returns an ELEMENT whose rank is within
    eps·n of 0.5·n (eps = 1/accuracy = 1e-4), so the check counts the
    estimate's true rank straddle (rows strictly below / at-or-below it)
    and asserts it inside 0.5·n ± (eps·n + 1); the +1 absorbs rank
    discreteness so the boolean is deterministically TRUE for groups of
    any size — including n=2, where any interpolated value band fails a
    correct discrete answer. Plan: the sketch agg and the rank counts are
    combine-friendly passes (constant-size buffers / two conditional
    sums); the exact side is the counts-first percentile operator; all
    reduce to |groups| rows before broadcast joins — the fact table is
    scanned by the verification twins but never shuffled raw."""
    e = (
        load_table(spark, sf_dir, "events")
        # ~isnan mirrors the oracle (r13): percentile_approx drops NaN
        # from the sketch, so a NaN row counted into __n would shift the
        # band center against a straddle the estimate never saw —
        # flipping approx_in_band False on a CORRECT sketch answer
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("event_type").isNotNull()
        )
        .select("event_type", to_fixed("value").alias("__cents"))
    )
    exact = exact_percentiles(e, ["event_type"], "__cents", [0.25, 0.5, 0.75])
    approx = e.groupBy("event_type").agg(
        F.percentile_approx("__cents", 0.5, 10000).alias("approx_p50")
    )
    slack = 1e-4 * F.col("__n") + 1
    chk = (
        e.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("__cents") < F.col("approx_p50"), 1).otherwise(0)
            ).alias("__n_lt"),
            F.sum(
                F.when(F.col("__cents") <= F.col("approx_p50"), 1).otherwise(0)
            ).alias("__n_le"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "event_type",
            (
                (F.col("__n_lt") <= 0.5 * F.col("__n") + slack)
                & (F.col("__n_le") >= 0.5 * F.col("__n") - slack)
            ).alias("approx_in_band"),
        )
    )
    return (
        exact.join(F.broadcast(chk), "event_type")
        .select(
            "event_type",
            (F.col("p25") / F.lit(100.0)).alias("p25"),
            (F.col("p50") / F.lit(100.0)).alias("p50"),
            (F.col("p75") / F.lit(100.0)).alias("p75"),
            "n_items",
            "approx_in_band",
        )
    )


_DIGEST_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
    ]
)

_EST_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_digest", LongType()),
        StructField("q50_est", DoubleType()),
        StructField("q90_est", DoubleType()),
    ]
)


@register(
    "q_tdigest_quantile",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_items,
           TRUE AS q50_in_band,
           TRUE AS q90_in_band
    FROM events
    -- NOT isnan too: NaN passes IS NOT NULL in BOTH engines but the
    -- digest (np-side) drops it — counting it in n_items/__n while the
    -- digest loses its mass would silently hash-mismatch (review r11)
    WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_tdigest_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom mergeable centroid digest (operators/tdigest.py) built
    scan-locally and merged per group — the 100 TB quantile path.

    Stage 1 (mapInPandas, ZERO shuffle): each task folds its Arrow
    batches into one ≤K-centroid digest per group incrementally — memory
    is K centroids + one batch, never the partition's raw values. Stage 2
    (applyInPandas after the only exchange): per group, merge the ≤K·tasks
    centroid rows and read q50/q90 off the merged digest. Only centroids
    cross the wire — shuffle volume is O(groups · tasks · K), independent
    of row count.

    Verification: ``n_items`` is the digest's total weight (unit weights
    sum exactly in doubles below 2^53, so lost or duplicated mass changes
    an exact integer the oracle counts directly) and each estimate's TRUE
    rank straddle (counted exactly from the data) must sit within
    q·n ± (0.05·n + 2): the digest's rank error is ≲2/K = 1.6%, the 5%
    band gives 3× headroom, and the +2 absorbs anchor-clamping on tiny
    groups (n≤3, where the digest legitimately answers min/max and any
    interpolated value band is knife-edge). Raw estimates are NOT output
    — batch boundaries are nondeterministic, so only the rank-band
    booleans (stable under that wobble) and the exact count are hashed."""
    build_digest, merge_digests, digest_quantile = make_digest_fns(DEFAULT_K)
    e = (
        load_table(spark, sf_dir, "events")
        # ~isnan mirrors the oracle: NaN is not a number for quantiles —
        # it must vanish from n_items, the digest, AND the straddle sums
        # together, in both engines (review r11)
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("event_type").isNotNull()
        )
        .select("event_type", "value")
    )

    def part_digests(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, tuple] = {}
        for pdf in batches:
            for etype, grp in pdf.groupby("event_type"):
                # drop nulls before digesting: a NULL value arrives as NaN,
                # np.sort places it last, and the compress fold would smear
                # NaN through every tail centroid mean (the exact band side
                # already drops nulls — percentile.py)
                vals = grp["value"].dropna().to_numpy()
                if len(vals) == 0:
                    continue
                d = build_digest(vals)
                prev = acc.get(etype)
                acc[etype] = d if prev is None else merge_digests([prev, d])
        if acc:
            yield pd.DataFrame(
                {
                    "event_type": list(acc),
                    "means": [m.tolist() for m, _ in acc.values()],
                    "weights": [w.tolist() for _, w in acc.values()],
                }
            )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        parts = [
            (np.asarray(m, dtype=np.float64), np.asarray(w, dtype=np.float64))
            for m, w in zip(pdf["means"], pdf["weights"])
        ]
        means, weights = merge_digests(parts)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_digest": [int(round(float(weights.sum())))],
                "q50_est": [digest_quantile(means, weights, 0.5)],
                "q90_est": [digest_quantile(means, weights, 0.9)],
            }
        )

    est = (
        e.mapInPandas(part_digests, _DIGEST_SCHEMA)
        .groupBy("event_type")
        .applyInPandas(merge_group, _EST_SCHEMA)
    )

    def _straddle(col: str, bound) -> list:
        return [
            F.sum(F.when(F.col("value") < F.col(col), 1).otherwise(0)).alias(
                f"__lt_{bound}"
            ),
            F.sum(F.when(F.col("value") <= F.col(col), 1).otherwise(0)).alias(
                f"__le_{bound}"
            ),
        ]

    def _in_band(q: float, bound: str) -> "F.Column":
        slack = 0.05 * F.col("__n") + 2
        return (
            (F.col(f"__lt_{bound}") <= q * F.col("__n") + slack)
            & (F.col(f"__le_{bound}") >= q * F.col("__n") - slack)
        )

    return (
        e.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_digest").alias("n_items"),
            F.count(F.lit(1)).alias("__n"),
            *_straddle("q50_est", "50"),
            *_straddle("q90_est", "90"),
        )
        .select(
            "event_type",
            "n_items",
            _in_band(0.5, "50").alias("q50_in_band"),
            _in_band(0.9, "90").alias("q90_in_band"),
        )
    )


@register(
    "q_hll_bound",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS hll_in_band
    FROM events
    GROUP BY event_type
    """,
)
def q_hll_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count per group, band-checked against the
    exact count — the oracle-bearing upgrade of q_approx_distinct (which
    stays registered as the raw rows-only sketch output).

    ``approx_count_distinct`` at rsd=0.01 is asked to stay within ±5%
    (5σ) of the exact count; at the testdata's cardinalities the sketch
    runs in sparse mode and is near-exact, so the boolean is
    deterministically TRUE unless the sketch regresses.

    Plan note: the two measures must NOT share one ``agg`` — mixing a
    DISTINCT aggregate with the sketch makes Catalyst's distinct-rewrite
    carry the rsd=0.01 HLL buffer (1640 longs!) as grouping state through
    a per-(group, user) pre-aggregate: measured 1.5 s vs 0.35 s at sf0.1.
    Instead the stream dedups to distinct (group, user) pairs first (one
    map-side-combined shuffle), then ONE tiny agg computes exact=count(*)
    and feeds the sketch exactly once per surviving row — HLL is
    duplicate-insensitive, so the estimate is unchanged. At 100 TB you
    DROP the exact column and the dedup stage, keeping the single-pass
    constant-buffer sketch — which is the point this query certifies."""
    e = load_table(spark, sf_dir, "events")
    dedup = e.select("event_type", "user_id").distinct()
    return (
        dedup.groupBy("event_type")
        .agg(
            # count(user_id), not count(*): the dedup keeps one
            # (group, NULL) row per group with a NULL user, which the
            # oracle's count(DISTINCT user_id) — and the HLL — both skip
            F.count("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", 0.01).alias("n_hll"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_hll") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("hll_in_band"),
        )
    )


@register(
    "q_hll_union",
    oracle="""
    SELECT count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS union_in_band
    FROM events
    """,
)
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the Datasketches HLL surface: one sketch
    per event_type (hll_sketch_agg), unioned (hll_union_agg) into a
    global estimate that must land within ±5% of the exact global
    distinct — users appear under several event types, so a broken union
    would overcount their overlap and blow the band.

    This is the 100 TB architecture for COUNT(DISTINCT) over any
    grouping: partial sketches are tiny (2^lgK registers), merge is
    associative, and re-aggregation to coarser groupings never rescans
    the fact table. The exact twin (count_distinct) exists here only as
    the verification harness."""
    e = load_table(spark, sf_dir, "events")
    union_est = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_union")
        )
    )
    exact = e.agg(F.count_distinct("user_id").alias("n_exact"))
    return (
        exact.join(F.broadcast(union_est))
        .select(
            "n_exact",
            (
                F.abs(F.col("n_union") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("union_in_band"),
        )
    )


@register(
    "q_cms_estimate",
    oracle="""
    WITH vocab AS (
        SELECT t.tok, count(*)::BIGINT AS n
        FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
        WHERE t.tok <> ''
        GROUP BY 1
    ), hashes AS (
        SELECT * FROM (VALUES (0), (1), (2), (3)) h(k)
    ), cells AS (
        SELECT h.k,
               ('0x' || substr(md5(h.k::VARCHAR || ':' || v.tok), 1, 8))::UBIGINT
                 % 64 AS bucket,
               sum(v.n)::BIGINT AS c
        FROM vocab v, hashes h
        GROUP BY 1, 2
    ), probes AS (
        SELECT * FROM (VALUES ('join'), ('hash'), ('customer'),
                              ('window'), ('spark')) p(tok)
    ), est AS (
        -- LEFT JOIN + coalesce 0 (r13): a CMS cell no token hashed into
        -- holds count 0, so a probe hitting an unoccupied cell must
        -- contribute 0 to the min (the canonical CMS answer), not
        -- silently drop out of the row set — the old inner join both
        -- overstated estimates (min over occupied cells only) and could
        -- lose a probe row entirely on a small/filtered vocabulary
        SELECT p.tok, min(coalesce(c.c, 0))::BIGINT AS cms_est
        FROM probes p
        JOIN hashes h ON TRUE
        LEFT JOIN cells c
          ON c.k = h.k
         AND c.bucket = ('0x' || substr(md5(h.k::VARCHAR || ':' || p.tok), 1, 8)
                        )::UBIGINT % 64
        GROUP BY 1
    )
    SELECT p.tok, coalesce(v.n, 0)::BIGINT AS exact_n, e.cms_est,
           (e.cms_est - coalesce(v.n, 0))::BIGINT AS overcount
    FROM probes p
    JOIN est e USING (tok)
    LEFT JOIN vocab v USING (tok)
    """,
)
def q_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the document token stream: a 4×64 counter
    matrix (4 md5-derived hash rows, 64 buckets), probed for five tokens —
    estimate = min over rows of the probed cell, always ≥ the true count.
    The frequency-sketch sibling of the HLL cardinality queries: mergeable
    constant-size state for heavy-hitter / frequency queries over streams.

    Scale shape: the token stream collapses to a (token, n) VOCABULARY
    first (one shuffle keyed on token — volume = distinct tokens), the 4×
    hash expansion runs over the vocabulary (never the corpus), and the
    sketch itself is 256 rows. Probing broadcasts. The exact-count column
    re-derives the vocabulary (a second corpus scan — the verification
    twin, same accepted shape as q_quantile_bound/q_hll_bound); at 100 TB
    you keep only the sketch side and the plan is a single scan. Hashes are the same
    portable md5-hex-slice family as MinHash/weighted sampling, so both
    engines materialize the IDENTICAL sketch — est, exact, and overcount
    are all exact ints, hash-compared with no tolerance band."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))

    def bucket(k: int, tok) -> "F.Column":
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{k}:"), tok)), 1, 8), 16, 10
            ).cast("long")
            % 64
        )

    def hash_cells(frame: DataFrame, *keep: str) -> DataFrame:
        # ONE site encodes the sketch geometry (4 hash rows × %64
        # buckets, via bucket() above) for both the build and the probe
        # sides — the est join matches on (k, bucket), so two drifting
        # copies would silently break the probe-to-cell correspondence
        return frame.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("k"),
                            bucket(k, F.col("tok")).alias("bucket"),
                        )
                        for k in range(4)
                    ]
                )
            ).alias("cell"),
        ).select(*keep, "cell.k", "cell.bucket")

    cells = hash_cells(vocab, "n").groupBy("k", "bucket").agg(
        F.sum("n").alias("c")
    )
    probes = spark.createDataFrame(
        [("join",), ("hash",), ("customer",), ("window",), ("spark",)], ["tok"]
    )
    probe_cells = hash_cells(probes, "tok")
    est = (
        # left join + 0-fill (r13, mirrored in the oracle): an unoccupied
        # CMS cell counts 0 — it must pull the min down to the canonical
        # answer, and a probe whose 4 cells are ALL empty must still
        # emit a row (the inner join dropped it on small vocabularies)
        probe_cells.join(F.broadcast(cells), ["k", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )
    return (
        est.join(F.broadcast(vocab.join(F.broadcast(probes), "tok")), "tok", "left")
        .select(
            "tok",
            F.coalesce("n", F.lit(0)).alias("exact_n"),
            "cms_est",
            (F.col("cms_est") - F.coalesce("n", F.lit(0))).alias("overcount"),
        )
    )
