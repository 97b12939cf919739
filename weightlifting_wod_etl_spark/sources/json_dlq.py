"""Poison-record handling for JSON sources — the DLQ analog.

The reference routes failed Step Functions executions to an SQS dead-letter
queue (serverless/resources.yml:2-11) so one bad post never kills the run.
The Spark-native equivalent (SURVEY.md §4) is PERMISSIVE parsing with a
``_corrupt_record`` column: malformed lines become rows in a quarantine
DataFrame instead of task failures, and the good rows keep flowing.

Scale notes: the split is a single scan read twice through Spark's cache
(PERMISSIVE mode requires materializing before filtering on the corrupt
column — Spark ignores a corrupt-only projection on a lazy plan); at 100 TB
the cache should be ``StorageLevel.DISK_ONLY`` or the caller routes the
quarantine via ``badRecordsPath`` on the reader instead (fire-and-forget
side channel, no second pass). Both paths are wired here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_with_dlq(
    spark: SparkSession,
    path: str,
    schema: StructType,
    storage_level=None,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with an explicit schema; return ``(good, quarantine)``.

    ``good`` has exactly ``schema``'s columns; ``quarantine`` is one string
    column holding the raw malformed line (the DLQ payload — replayable).
    The explicit schema is mandatory: inference would scan the data twice
    and silently widen types under corruption.

    ``storage_level`` controls the split's shared cache (default
    ``DISK_ONLY`` — the 100 TB-safe level the module docstring calls for;
    pass ``StorageLevel.MEMORY_AND_DISK`` for small hot inputs). The
    cached copy lives until the caller unpersists — call
    ``good.sparkSession.catalog.clearCache()`` or keep a handle via
    ``good.storageLevel`` scoping, or prefer
    :func:`read_jsonl_with_bad_records_path` when the quarantine doesn't
    need to be a DataFrame: it caches nothing at all.
    """
    from pyspark import StorageLevel

    if storage_level is None:
        storage_level = StorageLevel.DISK_ONLY
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Required by Spark's PERMISSIVE contract: referencing only the corrupt
    # column on the lazy plan raises; persist once, split twice.
    df = df.persist(storage_level)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = (
        df.filter(F.col(CORRUPT_COL).isNotNull())
        .select(F.col(CORRUPT_COL).alias("raw_record"))
    )
    return good, quarantine


def read_jsonl_with_bad_records_path(
    spark: SparkSession, path: str, schema: StructType, bad_records_path: str
) -> DataFrame:
    """Single-pass variant: corrupt lines are spooled to ``bad_records_path``
    as JSON files by the data source itself — no cache, no second filter.
    Preferred at 100 TB when the quarantine doesn't need to be a DataFrame
    in the same job."""
    return (
        spark.read.schema(schema)
        .option("badRecordsPath", bad_records_path)
        .json(path)
    )
