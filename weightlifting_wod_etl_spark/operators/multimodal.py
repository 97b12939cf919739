"""Multimodal column plumbing — M6 extension.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side machinery (schema, Arrow batching, partition-parallel decode) is
real and tested. The codec step itself is STUBBED: the decode libraries
(Pillow/ffmpeg/librosa) are not in this container, so ``decode_media``
raises ``NotImplementedError``. ``deterministic_fake_features`` — a
sha256-derived feature vector with the same shape the real decoder would
produce — is the SPEC for the worker closure inside ``extract_features``
(which must stay self-contained and cannot import it); a test pins the
two byte-for-byte so they cannot drift.

Scale notes: feature extraction is ``mapInPandas`` — per-partition Arrow
batches, so a 1000-executor cluster decodes partitions independently; the
binary payload never moves through the driver. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (keep payload_bytes ×
batch_rows under executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

N_FEATURES = 8


def decode_media(payload: bytes, media_type: str):
    """Real codec entry point — requires Pillow/ffmpeg/librosa.

    STUB: decode libraries are not available in this environment.
    """
    raise NotImplementedError(
        "media decode requires Pillow/ffmpeg/librosa; use "
        "deterministic_fake_features for plumbing tests"
    )


def deterministic_fake_features(payload: bytes, n: int = N_FEATURES) -> list[float]:
    """Stand-in for the decoder: n floats in [0,1) derived from sha256 of
    the payload — deterministic, shape-compatible with a real embedder."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)
    ]


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
        # the raw first-word digest as an exact integer: float32 features
        # lose the low 8 bits of the 32-bit word, so value-level
        # verification uses this lossless column (oracle reconstructs it
        # from substr(sha256-hex, 1, 8))
        StructField("feature0_u32", LongType()),
    ]
)


def extract_features(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    ``mapInPandas`` processes Arrow record batches; swap
    ``deterministic_fake_features`` for the real decoder when codec libs
    exist — the plumbing (schema, batching, distribution) is unchanged.
    """

    # NOTE: the closure must be SELF-CONTAINED (stdlib imports only, no
    # references to this package) — cloudpickle ships nested functions by
    # value, but a reference to a module-level symbol would require the
    # package to be importable on every Python worker, which is not true
    # when the driver process adds the repo to sys.path dynamically.
    n_feat = N_FEATURES

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        # NULL payloads (schema says nullable; documents_as_media yields
        # them for NULL text) must produce NULL features, not a TypeError
        # that kills the stage after task retries
        for pdf in it:
            payloads = pdf[payload_col]
            # ONE sha256 per payload (the dominant CPU cost at scale);
            # features / feature0_u32 / n_bytes all derive from the same
            # digest pass
            n_bytes, features, u32s = [], [], []
            for p in payloads:
                if p is None:
                    n_bytes.append(None)
                    features.append(None)
                    u32s.append(None)
                    continue
                digest = _hashlib.sha256(p).digest()
                n_bytes.append(len(p))
                features.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(n_feat)
                    ]
                )
                u32s.append(int.from_bytes(digest[:4], "big"))
            yield pd.DataFrame(
                {
                    # ids travel as STRINGS through the Arrow boundary
                    # (review r13): a batch with one NULL id used to
                    # arrive as float64 and astype('Int64') silently
                    # corrupted ids >= 2^53; int(str) is exact int64
                    "media_id": pd.array(
                        [
                            None if v is None or pd.isna(v) else int(v)
                            for v in pdf[id_col]
                        ],
                        dtype="Int64",
                    ),
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "features": pd.Series(features, dtype="object"),
                    "feature0_u32": pd.array(u32s, dtype="Int64"),
                }
            )

    return df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(payload_col).alias(payload_col),
    ).mapInPandas(batches, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as binary payloads so the multimodal
    plumbing is exercisable on the synthetic tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


# resize is 1:1 over canonical records — reuse MEDIA_SCHEMA rather than a
# field-for-field duplicate that could drift (review r11)
RESIZED_SCHEMA = MEDIA_SCHEMA


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """1:1 resize over binary image payloads (mapInPandas, Arrow-batched).

    Real path: decode → resample → re-encode per batch (Pillow). STUB: the
    output payload is the sha256 digest of (payload, WxH) — deterministic,
    shape-stable — and ``meta`` gains ``width``/``height`` keys exactly as
    the real resizer would write them. Rows never leave their partition;
    payload bytes never pass through the driver.
    """
    w, h = int(width), int(height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        tag = f"{w}x{h}".encode()

        def _resize(payload):
            if payload is None:  # null payload stays null, never a crash
                return None
            return _hashlib.sha256(bytes(payload) + tag).digest()

        for pdf in it:
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": str(w), "height": str(h)}
            )
            yield pd.DataFrame(
                {
                    # string-routed ids (review r13): the float64 NULL-in-
                    # batch round-trip corrupted ids >= 2^53
                    "media_id": pd.array(
                        [
                            None if v is None or pd.isna(v) else int(v)
                            for v in pdf["media_id"]
                        ],
                        dtype="Int64",
                    ),
                    "media_type": pdf["media_type"],
                    "payload": pdf["payload"].map(_resize),
                    "meta": meta,
                }
            )

    return df.select(
        F.col("media_id").cast("string").alias("media_id"),
        "media_type", "payload", "meta",
    ).mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("n_src_bytes", LongType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """1:N frame sampling over video payloads — the table-generating
    multimodal op (one input row → ceil(n_frames / every_n) output rows).

    Real path: demux + keyframe decode (ffmpeg). STUB: the frame count is
    derived deterministically from payload length (64 bytes ≈ one fake
    frame) and each sampled frame payload is sha256(payload, frame_idx).
    The expansion happens inside ``mapInPandas`` — per-partition, streaming
    one Arrow batch at a time — so a 10-hour video row fans out on its
    executor without a shuffle or driver round-trip.
    """
    step = max(1, int(every_n))
    # flush threshold: output memory stays O(chunk), never O(fan-out) — a
    # long video row otherwise accumulated its ENTIRE frame expansion in
    # Python lists before the single yield (review r11: the '10-hour
    # video' case the docstring advertises OOM'd the worker)
    chunk_rows = 10_000

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        ids, idxs, payloads, sizes = [], [], [], []

        def flush() -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_payload": list(payloads),
                    "n_src_bytes": pd.Series(sizes, dtype="int64"),
                }
            )
            ids.clear(), idxs.clear(), payloads.clear(), sizes.clear()
            return out

        for pdf in it:
            for mid_s, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # no payload → no frames, not a crash
                    continue
                raw = bytes(payload)
                n_frames = max(1, len(raw) // 64)
                # ids travel as STRINGS through the Arrow/pandas boundary
                # (review r13): a batch containing one NULL id arrives as
                # float64, silently corrupting ids >= 2^53; int(str) is
                # exact for any int64
                mid = None if mid_s is None or pd.isna(mid_s) else int(mid_s)
                # ONE payload hash per row, frames via .copy() (review
                # r13): sha256(raw + tag) per frame re-hashed the ENTIRE
                # payload and re-allocated a payload-sized concat per
                # frame — O(n_frames × payload_bytes), so the docstring's
                # 10-hour-video row never finished. hashlib state copies
                # are O(1) and digest-identical to the concat form (the
                # ':{i}' text tag still lets an external oracle rebuild
                # each digest by string concat).
                base = _hashlib.sha256(raw)
                for i in range(0, n_frames, step):
                    ids.append(mid)
                    idxs.append(i)
                    d = base.copy()
                    d.update(f":{i}".encode())
                    payloads.append(d.digest())
                    sizes.append(len(raw))
                    if len(ids) >= chunk_rows:
                        yield flush()
        if ids:
            yield flush()

    return df.select(
        F.col("media_id").cast("string").alias("media_id"), "payload"
    ).mapInPandas(batches, FRAME_SCHEMA)
