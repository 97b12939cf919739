"""weightlifting_wod_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (bdolly/weightlifting-WOD-ETL), re-expressed as
idiomatic Spark DataFrame / SQL plans, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
such a pipeline needs at 100 TB scale.

Layout:
    session     — SparkSession factory tuned for local[N] dev and cluster scale
    io          — table loaders / writers for the synthetic star schema
    operators/  — sessionization, pivot, dates, clean, dedup, similarity, text
    functions/  — scalar expression helpers (hash keys, html strip, regex)
    plans/      — end-to-end pipeline assemblies (reference parity)
    streaming/  — structured-streaming flavors of the stateful operators
"""

__version__ = "0.1.0"
