"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -- flagship: span-ify sf0.001 documents into the input_hint
                   shape, plant duplicates, run the engine's duplicate check.
queries()       -- operator registry (datachecker_spark.entry_queries).
oracle_sql()    -- DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def spanify(docs: DataFrame) -> DataFrame:
    """Lift the driver's flat documents table into the input_hint shape:
    (doc_id string, spans array<struct<kind,text,media_ref,offset>>, part).
    Each doc becomes two text spans (text halved) + one media span."""
    half = (F.length("text") / 2).cast("int")
    null_s = F.lit(None).cast("string")
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").substr(F.lit(1), half).alias("text"),
            null_s.alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").substr(half + 1, F.length("text")).alias("text"),
            null_s.alias("media_ref"),
            F.lit(1).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"),
            null_s.alias("text"),
            F.concat(F.lit("media_"), F.col("source")).alias("media_ref"),
            F.lit(2).cast("int").alias("offset"),
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
        F.col("source").alias("part"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: duplicate-document detection over span-structured docs."""
    from datachecker_spark.constraints.duplicates import check_duplicates

    flat = spark.read.parquet(f"{SF0001}/documents.parquet")
    docs = spanify(flat)
    planted = spanify(
        flat.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )
    return check_duplicates(docs.unionByName(planted))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datachecker_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datachecker_spark.entry_queries import ORACLES

    return dict(ORACLES)
