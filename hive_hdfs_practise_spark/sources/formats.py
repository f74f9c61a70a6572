"""Format matrix: write/read any table in parquet, ORC, JSON-lines,
or CSV with schema preserved.

Parquet is the canonical storage (columnar, statistics, pushdown —
see SURVEY §1.5); the other formats exist for interchange edges:
ORC for Hive-ecosystem consumers (the reference lived in that
ecosystem), JSON-lines and CSV for export/ingest boundaries. Text
formats carry no type information, so reads REQUIRE the explicit
schema — never inference (reference DDL declares types; inference
at 100 TB also costs a full extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` at ``path`` in ``fmt``. CSV keeps a header for
    interchange; timestamps serialize as ISO-8601 with µs so text
    round-trips are lossless at Spark's timestamp precision."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        w = w.option("timestampFormat", _TS_FMT)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Read ``path`` as ``fmt`` with the EXPLICIT schema (schema-on-
    read like the reference's Hive DDL, but typed — no inference)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        r = r.option("timestampFormat", _TS_FMT)
    return r.load(path)


def round_trip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    """Write then re-read with the source schema — the identity
    transform a lossless format must satisfy (pinned per-format in
    tests)."""
    write_table(df, path, fmt)
    return read_table(df.sparkSession, path, fmt, df.schema)
