"""Content-addressed sampling, dataset splits, and token chunking.

Training-data pipelines sample, split, and chunk at every stage. The only
sampling that survives 100 TB and reruns is CONTENT-ADDRESSED: bucket every
record by a hash of its stable id and keep bucket ranges. Unlike
``df.sample()`` (seed + partition-layout dependent — adding one input file
reshuffles who's sampled) a hash bucket is a pure projection: reproducible
across engines, runs, repartitions, and incremental appends, and it pushes
down to a scan-local filter (no shuffle, no state).

Buckets are the first two hex digits of ``md5(id)`` compared as STRINGS —
256 uniform buckets with zero hex→int conversion, the same portable-md5
trick as operators/minhash.py (reference fingerprints one record at a time,
`services/idempotency_service.py:49-62`; here the hash is the sampling
universe itself).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(id_col: Column) -> Column:
    """First two hex digits of md5(id) — one of 256 uniform string buckets."""
    return F.substring(F.md5(id_col.cast("string")), 1, 2)


def _hex_cutoff(c: str) -> str:
    """Normalize + validate a bucket cutoff. md5 hex is always LOWERCASE:
    an uppercase cutoff would compare by raw ASCII ('4F' excludes buckets
    '4a'-'4f') and silently shift the sampling rate / split boundaries."""
    c = c.lower()
    if len(c) != 2 or any(ch not in "0123456789abcdef" for ch in c):
        raise ValueError(f"cutoff must be two hex digits, got {c!r}")
    return c


def hash_sample(id_col: Column, hex_cutoff: str) -> Column:
    """Keep-predicate sampling at rate ≈ int(hex_cutoff, 16)/256.

    ``hex_cutoff`` is a two-hex-digit string, e.g. '1a' → 26/256 ≈ 10.2%.
    """
    return hash_bucket(id_col) < F.lit(_hex_cutoff(hex_cutoff))


def dataset_split(id_col: Column, train_cutoff: str = "cd", val_cutoff: str = "e6") -> Column:
    """'train' / 'val' / 'test' by hash bucket range — ≈80.1 / 9.8 / 10.2%
    with the defaults. Deterministic per id: a record never migrates between
    splits when the corpus grows (no leakage across reruns).

    A NULL id gets a NULL split, not 'test' (review r11): the bare
    otherwise() silently funneled every unidentifiable record into the
    test split — train/test contamination waiting for the ids to be fixed
    — while hash_sample's keep-predicate DROPS the same record; NULL is
    the honest answer for both to key on."""
    b = hash_bucket(id_col)
    return F.when(
        b.isNotNull(),
        F.when(b < F.lit(_hex_cutoff(train_cutoff)), F.lit("train"))
        .when(b < F.lit(_hex_cutoff(val_cutoff)), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def token_chunks(text: Column, chunk_size: int = 512) -> Column:
    """Array of (chunk_id, token_start, token_end) structs covering the
    whitespace tokens of ``text`` in windows of ``chunk_size``.

    Context-window chunking as a pure expression: explode the result and
    slice tokens downstream. Scan-local — at 100 TB this adds zero shuffle;
    the ×ceil(n/size) row amplification happens map-side where the
    documents already live.

    The token count is let-bound — CollapseProject would otherwise re-run
    the full split once per chunk element. The ``n >= 0`` guard returns
    NULL (explodes to zero rows) for NULL text: unguarded, size(NULL) = -1
    under ANSI-off makes ``sequence(0, -1)`` count DOWN and mint two
    phantom chunks (chunk_id 0 and -1) no oracle ever emits.
    """
    from ..functions.expr import let

    if chunk_size < 1:
        # ANSI-off division by lit(0) is NULL: every document would
        # silently chunk to NULL (zero rows), indistinguishable from
        # all-NULL input (review r11)
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")

    return let(
        F.size(F.split(text, " ")).cast("bigint"),
        lambda n: F.when(
            # n >= 1, not >= 0: split() never returns an empty array for
            # non-NULL text, and a 0 would make the sequence bound -1
            n >= 1,
            F.transform(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.floor((n + F.lit(chunk_size - 1)) / F.lit(chunk_size)).cast(
                        "bigint"
                    )
                    - 1,
                ),
                lambda i: F.struct(
                    i.alias("chunk_id"),
                    (i * chunk_size).alias("token_start"),
                    F.least(i * chunk_size + chunk_size, n).alias("token_end"),
                    # the already-computed token count rides along so
                    # consumers never re-split the text for it (review
                    # r11: q_token_chunks_ids paid two full splits/doc)
                    n.alias("n_tokens"),
                ),
            ),
        ),
    )
