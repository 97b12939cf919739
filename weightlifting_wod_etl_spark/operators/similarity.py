"""Similarity search over embedding columns — M6 scale extension.

Two paths, as a real 100 TB pipeline needs both:
  - brute-force cosine top-k: exact, one pass, no shuffle until the final
    top-k (``orderBy + limit`` → Spark's TakeOrderedAndProject, which keeps
    only k rows per partition before the single-reduce);
  - LSH/IVF-bucketed ANN: a deterministic coarse quantizer (sign bits of
    the leading dimensions) partitions vectors into buckets; the probe only
    scans its own bucket — at scale the bucket column is the partition key
    so a probe touches one partition instead of all of them.

Dot products use ``zip_with`` + ``aggregate`` — native JVM expressions with
an in-order double fold, so results are bit-identical to any engine that
folds in order (no Pandas UDF needed; Arrow round-trips would be slower
and nondeterministic only in exotic SIMD cases).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """In-order double fold of the elementwise product."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic coarse quantizer: bit i = sign(vec[i]) for the leading
    n_bits dimensions → bucket id in [0, 2^n_bits)."""
    out = None
    for i in range(n_bits):
        term = F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out.cast("int")


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def _sim_from_parts(va, vb, na, nb) -> Column:
    """cosine from precomputed norms — compute each side's norm ONCE PER ROW
    before the join, not once per pair: a pairwise cosine join otherwise
    folds 3 dot products per candidate pair (dot(a,b), dot(a,a), dot(b,b))
    — 3× the hot-loop work, and the norm of a hot row is redone for every
    partner it meets.

    Zero-norm guard: an all-zeros embedding (an empty doc) would yield
    0/0 = NaN, and Spark sorts NaN ABOVE every real double and passes
    ``NaN >= threshold`` — the zero vector would rank FIRST in every top-k
    and pair with everything in neardup. Undefined similarity is NULL:
    nulls sort last under desc and fail every threshold filter."""
    return F.when(na * nb > 0, F.round(dot(va, vb) / (na * nb), 6))


def brute_force_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``df`` against a single-row ``probe`` frame.

    The probe is crossJoin-broadcast (1 row) — never collected to Python.
    Ordering is total: (rounded cosine desc, id) so ties are deterministic.
    """
    p = probe.select(F.col(vec_col).alias("__probe"), norm(F.col(vec_col)).alias("__pn"))
    base = df.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__n"))
    sim = _sim_from_parts(F.col(vec_col), F.col("__probe"), F.col("__n"), F.col("__pn"))
    return (
        base.crossJoin(F.broadcast(p))
        .select(F.col(id_col), sim.alias("cos_sim"))
        # asc_nulls_last (r13, reproduced in ivf_topk's seed): Spark ASC
        # is NULLS FIRST, DuckDB is NULLS LAST — a NULL-id row tying at
        # the LIMIT cut would keep different rows per engine
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )


def neardup_pairs(
    df: DataFrame,
    min_cosine: float = 0.25,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bucket blocking.

    The all-pairs cosine join is quadratic; blocking on the sign-bit
    quantizer makes the self-join equi on ``bucket`` — Spark shuffles both
    sides by bucket and the quadratic work happens only within a bucket
    (n²/2^n_bits expected comparisons). Recall is approximate by design
    (pairs straddling a sign boundary are missed — the classic LSH
    trade-off); raise recall with multiple independent bit-sets like
    ``lsh_candidate_pairs`` does for MinHash.

    Exact-duplicate collapse (r11, found by the 30× scale smoke): a raw
    within-bucket self-join pays one 64-dim dot product PER ROW PAIR, so
    m exact copies of one vector — the common case in crawled corpora,
    and the regime the replicated smoke models — cost m²/2 dot products
    for pairs whose similarity is a constant. Rows are first collapsed to
    DISTINCT (bucket, vector) groups carrying their id lists; dot
    products run once per distinct-vector pair (plus one self-sim per
    group), and the m²-sized pair list is re-expanded from the id lists
    with zero arithmetic. Same output, compute linear in distinct
    vectors: the committed SCALE_SMOKE_30.json ratio fell 57.7× → ~1×
    (measured 0.67× — 30× replicas collapse to the SAME distinct set, so
    the work is genuinely flat and the sub-1.0 residue is run noise).

    At 100 TB the bucket is the shuffle key: no broadcast, no driver state,
    skew bounded by 2^n_bits balanced sign buckets (random projections give
    near-uniform occupancy on centered data); the duplicate collapse also
    bounds the join input by DISTINCT vectors, so boilerplate embeddings
    cannot swamp a bucket.
    """
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), n_bits).alias("__bucket"),
    )
    # one group per distinct (bucket, vector); ids are unique, so
    # array_min gives a stable, disjoint group key for pair dedup
    g = (
        b.groupBy("__bucket", vec_col)
        .agg(F.collect_list(F.col(id_col)).alias("__ids"))
        .select(
            "__bucket",
            F.col(vec_col),
            "__ids",
            norm(F.col(vec_col)).alias("__norm"),
            F.array_min("__ids").alias("__gmin"),
        )
        # Pin the bucket exchange the self-join needs anyway to
        # 4*2^n_bits slots (r18 optimization round, guide §2.2/§7.2):
        # AQE sizes the post-shuffle partition count by BYTES and
        # coalesced the tiny collapsed-group relation to 2 partitions,
        # serializing the quadratic within-bucket dot-product stage —
        # the one stage whose cost is pairs, not bytes. 4x over-
        # provisioning keeps bucket->partition hash collisions rare, so
        # ~every bucket gets its own task; the operator's parallelism
        # ceiling is 2^n_bits by design at ANY scale, so the constant
        # is bucket-derived, not machine-derived. Measured 2.2x at
        # sf0.1 (1.05 -> 0.48 s), identical pair set.
        .repartition(4 * (1 << n_bits), "__bucket")
    )
    left = g.select(
        "__bucket", F.col(vec_col).alias("__va"), F.col("__norm").alias("__na"),
        F.col("__ids").alias("__ids_a"), F.col("__gmin").alias("__gmin_a"),
    )
    right = g.select(
        "__bucket", F.col(vec_col).alias("__vb"), F.col("__norm").alias("__nb"),
        F.col("__ids").alias("__ids_b"), F.col("__gmin").alias("__gmin_b"),
    )
    sim = _sim_from_parts(F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb"))
    # cross-group pairs: each unordered group pair once (gmin is strictly
    # ordered across disjoint groups), sim computed once, then expanded
    cross = (
        left.join(right, "__bucket")
        .filter(F.col("__gmin_a") < F.col("__gmin_b"))
        .select("__ids_a", "__ids_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
        .select(F.explode("__ids_a").alias("__ia"), "__ids_b", "cos_sim")
        .select(
            "__ia", F.explode("__ids_b").alias("__ib"), "cos_sim"
        )
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "cos_sim",
        )
    )
    # within-group pairs: identical vectors — one self-sim per group
    # (NULL for zero-norm, same guard as any pair), combinations from the
    # id list with no join and no dot products. Expansion is CHUNKED:
    # posexplode each id first, then slice its strictly-later partners —
    # per-row memory O(m), never the single C(m,2)-element array a
    # flatten-of-combinations would build (at m ≈ 66k that array passes
    # 2^31 elements and the task dies; far below that it OOMs the
    # executor — the exact mass-duplicate regime this collapse targets).
    self_sim = _sim_from_parts(
        F.col(vec_col), F.col(vec_col), F.col("__norm"), F.col("__norm")
    )
    within = (
        g.filter(F.size("__ids") >= 2)
        .select("__ids", self_sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
        .select(
            "__ids", "cos_sim", F.posexplode("__ids").alias("__i", "__ia")
        )
        .select(
            "__ia",
            # 1-based slice starting just past position __i (0-based):
            # each unordered id pair appears exactly once
            F.explode(
                F.slice(
                    F.col("__ids"),
                    F.col("__i") + F.lit(2),
                    F.size("__ids") - F.col("__i") - F.lit(1),
                )
            ).alias("__ib"),
            "cos_sim",
        )
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "cos_sim",
        )
    )
    # ids are assumed unique, but tolerate violations the way the pre-r11
    # pairwise join (id_a < id_b) did: a duplicated id would self-pair both
    # within a group (collect_list keeps both copies) and across groups
    # (same id, two different vectors) — least/greatest renders those as
    # id_a == id_b, so one filter drops them from both branches (r11 advice)
    return cross.unionByName(within).filter(F.col("id_a") != F.col("id_b"))


def ivf_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (coarse
    quantizer), probe only the ``nprobe`` centroid lists nearest the query.

    Default centroids are the ``n_centroids`` lowest-id vectors — a
    deterministic seed set standing in for an offline k-means|| fit; pass
    ``centroids`` (a ``(id_col, vec_col)`` frame, e.g. Spark ML KMeans
    cluster centers — see tests/test_similarity_ml.py) to use a trained
    quantizer instead: the assignment / inverted-list / probe machinery is
    identical whichever way the centroids were produced. At 100 TB the
    centroid id is the partition (or Z-order) key of the stored table, so a
    query reads nprobe/n_centroids of the data instead of all of it — the
    same contract as FAISS IVF.

    Shuffle shape: centroids are broadcast (tiny), assignment is a map-side
    ``max_by`` over the replicated scores (partial agg collapses the
    n_centroids rows per vector before the exchange), and the probe's
    candidate scan is an equi-join on the centroid id.
    """
    base = df.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__n"))
    # asc_nulls_last (r13, REPRODUCED): Spark sorts NULL ids FIRST where
    # the oracle's ORDER BY vec_id LIMIT n is NULLS LAST — one NULL-id
    # vector made the engines train on DIFFERENT centroid sets and
    # return different neighbors
    cent_src = (
        centroids
        if centroids is not None
        else df.orderBy(F.col(id_col).asc_nulls_last()).limit(n_centroids)
    )
    cents = cent_src.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    csim = _sim_from_parts(F.col(vec_col), F.col("__cv"), F.col("__n"), F.col("__cn"))
    assign = (
        base.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), F.col(vec_col), F.col("__n"), F.col("__cid"), csim.alias("__sim"))
        .groupBy(id_col)
        .agg(
            # ties broken toward the larger centroid id — mirrors the
            # oracle's ORDER BY sim DESC, cid DESC / row_number()=1
            F.max_by("__cid", F.struct("__sim", "__cid")).alias("__cid"),
            F.first(vec_col).alias(vec_col),
            F.first("__n").alias("__n"),
        )
    )

    p = probe.select(F.col(vec_col).alias("__pv"), norm(F.col(vec_col)).alias("__pn"))
    psim = _sim_from_parts(F.col("__pv"), F.col("__cv"), F.col("__pn"), F.col("__cn"))
    probe_cents = (
        p.crossJoin(F.broadcast(cents))
        .select(F.col("__cid"), psim.alias("__psim"))
        .orderBy(F.col("__psim").desc(), F.col("__cid").desc())
        .limit(nprobe)
        .select("__cid")
    )
    qsim = _sim_from_parts(F.col(vec_col), F.col("__pv"), F.col("__n"), F.col("__pn"))
    return (
        assign.join(F.broadcast(probe_cents), "__cid")
        .crossJoin(F.broadcast(p))
        .select(F.col(id_col), qsim.alias("cos_sim"))
        # NULLS LAST pin — same seam as the centroid seed above
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )


def lsh_bucket_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the scan to the probe's sign-bucket, then exact cosine
    top-k within it. Recall < 1 by design; at scale the bucket is the
    partition key so this reads 1/2^n_bits of the data."""
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        norm(F.col(vec_col)).alias("__n"),
    )
    p = probe.select(
        F.col(vec_col).alias("__probe"),
        sign_bucket(F.col(vec_col), n_bits).alias("__pbucket"),
        norm(F.col(vec_col)).alias("__pn"),
    )
    sim = _sim_from_parts(F.col(vec_col), F.col("__probe"), F.col("__n"), F.col("__pn"))
    return (
        bucketed.join(F.broadcast(p), F.col("__bucket") == F.col("__pbucket"))
        .select(F.col(id_col), sim.alias("cos_sim"))
        # NULLS LAST pin — same seam as brute_force_topk
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc_nulls_last())
        .limit(k)
    )
