"""Python UDTF (Spark 4 lateral table function) — API-surface demo.

The engine's hot paths stay JVM-side (SCALE.md global posture); this
pins that the *capability* works when a genuinely-Python row-expanding
transform is needed: a UDTF yields multiple typed rows per input and
composes with LATERAL in SQL, the table-function analog of the
sanctioned mapInPandas edge."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id int, n_words int, chunk string")
class _ChunkWords:
    def eval(self, text: str, size: int):
        words = (text or "").split()
        for i in range(0, len(words), size):
            piece = words[i : i + size]
            yield i // size, len(piece), " ".join(piece)


def test_udtf_expands_rows_with_typed_schema(spark):
    out = _ChunkWords(lit("a b c d e f g"), lit(3)).collect()
    assert [(r.chunk_id, r.n_words, r.chunk) for r in out] == [
        (0, 3, "a b c"),
        (1, 3, "d e f"),
        (2, 1, "g"),
    ]


def test_udtf_lateral_join_over_table(spark):
    spark.udtf.register("chunk_words", _ChunkWords)
    spark.createDataFrame(
        [(1, "one two three four"), (2, "five")], ["doc_id", "text"]
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM udtf_docs d, LATERAL chunk_words(d.text, 2) c
        ORDER BY d.doc_id, c.chunk_id
        """
    ).collect()
    assert [(r.doc_id, r.chunk_id, r.chunk) for r in rows] == [
        (1, 0, "one two"),
        (1, 1, "three four"),
        (2, 0, "five"),
    ]
