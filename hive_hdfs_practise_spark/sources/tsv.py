"""Reference-faithful ingest: tab-delimited text → managed tables.

Reference: ``create_table.sql`` declares text-format Hive tables
(``ROW FORMAT DELIMITED FIELDS TERMINATED by '\\t'``, lines 13/25/38)
and bulk-loads CSV/TSV with ``LOAD DATA LOCAL INPATH`` (14/26/39).

Engine-side: ``spark.read.csv(sep='\\t', schema=...)`` for the wire
format, but canonical storage is PARQUET via ``saveAsTable`` — the
engine is columnar where the reference was row-oriented (pure win:
column pruning + min/max skipping, identical query semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import MOVIE_SCHEMA, ORDER_SCHEMA, REVIEW_SCHEMA

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "movie": MOVIE_SCHEMA,
    "review": REVIEW_SCHEMA,
    "order_info": ORDER_SCHEMA,
}


def read_tsv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """S2: schema-on-read scan of a reference-format TSV file (no
    header, UTF-8 — the data is predominantly CJK)."""
    return spark.read.csv(
        path,
        sep="\t",
        schema=TABLE_SCHEMAS[table],
        header=False,
        encoding="UTF-8",
        mode="PERMISSIVE",
    )


def create_database(spark: SparkSession, name: str = "movie_shop") -> None:
    """S3: DDL — Spark SQL runs the reference's statements verbatim
    (``create_table.sql:1-2``)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def load_table(
    spark: SparkSession,
    tsv_path: str,
    table: str,
    database: str = "movie_shop",
    overwrite: bool = True,
) -> None:
    """S2+S3: the ``LOAD DATA ... OVERWRITE INTO TABLE`` path as
    read→saveAsTable. Parquet managed table; OVERWRITE matches the
    reference's load semantics."""
    create_database(spark, database)
    df = read_tsv(spark, tsv_path, table)
    (
        df.write.mode("overwrite" if overwrite else "append")
        .format("parquet")
        .saveAsTable(f"{database}.{table}")
    )


def drop_table(spark: SparkSession, table: str, database: str = "movie_shop") -> None:
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
