"""Iceberg table-format gateway (import-gated).

The production deployment (BASELINE.json: Iceberg table at 10^12-clip scale)
reads/writes through an Iceberg catalog:

    spark.read.format("iceberg").load("catalog.db.clips")
    df.writeTo("catalog.db.chunks").partitionedBy(
        F.col("algo"), F.bucket(1024, "clip_id")).createOrReplace()

The iceberg-spark-runtime jars are not in this image, so `available()`
returns False here and every caller falls back to plain Parquet written in
an Iceberg-compatible layout: hash-bucketed clip_id via
`write.partitionBy(bucket_col)` where bucket_col = pmod(xxhash64(clip_id),
n_buckets) -- the same physical clustering Iceberg's bucket transform gives,
so the query-side pruning/bucket-join properties are preserved locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path_or_ident: str,
    n_buckets: int = 0,
    bucket_col: str = "clip_id",
    mode: str = "overwrite",
) -> None:
    spark = df.sparkSession
    if available(spark) and not path_or_ident.startswith("/"):
        writer = df.writeTo(path_or_ident)
        if n_buckets:
            writer = writer.partitionedBy(F.bucket(n_buckets, bucket_col))
        writer.createOrReplace()
        return
    if n_buckets:
        df = df.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
        )
        df.write.mode(mode).partitionBy("_bucket").parquet(path_or_ident)
    else:
        df.write.mode(mode).parquet(path_or_ident)


def read_table(spark: SparkSession, path_or_ident: str) -> DataFrame:
    if available(spark) and not path_or_ident.startswith("/"):
        return spark.read.format("iceberg").load(path_or_ident)
    df = spark.read.parquet(path_or_ident)
    return df.drop("_bucket") if "_bucket" in df.columns else df
