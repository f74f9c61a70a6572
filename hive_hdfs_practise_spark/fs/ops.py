"""GreilFS command parity over the real filesystem (SURVEY.md §2.9).

The reference hand-implements an inode/block filesystem with
mkdir/ls/cd/vi/more/rm/find commands over asyncio TCP
(``Server/managers.py``). On Spark the storage layer (HDFS / object
store / local FS) already provides the durable, replicated substrate
— so the engine-level parity surface is the COMMAND SEMANTICS,
implemented against Hadoop's ``FileSystem`` API via the JVM gateway
(works identically on file://, hdfs://, s3a://).

``find``/``ls`` return DataFrames — listings become queryable
relations (the reference returns printed strings), which is what
makes P8's "filter listing by substring" a real predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_dir", T.BooleanType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime_ms", T.LongType(), False),
    ]
)


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    return jvm, fs, hadoop_path


def mkdir(spark: SparkSession, path: str) -> bool:
    """H1: ``mkdir`` — parents created as needed (the reference
    copy-on-writes the parent dir file; the FS does this natively)."""
    _, fs, p = _fs(spark, path)
    return bool(fs.mkdirs(p))


def ls(spark: SparkSession, path: str) -> DataFrame:
    """H2: ``ls`` — one directory level, as a DataFrame."""
    _, fs, p = _fs(spark, path)
    rows = [
        (
            st.getPath().toString(),
            st.getPath().getName(),
            st.isDirectory(),
            st.getLen(),
            st.getModificationTime(),
        )
        for st in fs.listStatus(p)
    ]
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def find(spark: SparkSession, path: str, name_contains: str = "") -> DataFrame:
    """H7+P8: recursive subtree listing filtered by filename
    substring (the reference's ``subfile`` walk + lambda filter,
    ``Server/managers.py:440-463``)."""
    _, fs, p = _fs(spark, path)
    it = fs.listFiles(p, True)  # recursive
    rows = []
    while it.hasNext():
        st = it.next()
        rows.append(
            (
                st.getPath().toString(),
                st.getPath().getName(),
                False,
                st.getLen(),
                st.getModificationTime(),
            )
        )
    df = spark.createDataFrame(rows, LISTING_SCHEMA)
    if name_contains:
        df = df.filter(F.col("name").contains(name_contains))
    return df


def rm(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """H6: ``rm`` — recursive delete (the reference walks depth-first
    freeing blocks; the FS guarantees no orphans)."""
    _, fs, p = _fs(spark, path)
    return bool(fs.delete(p, recursive))


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """H4: ``vi`` — write content; the storage layer handles block
    split + replication (the reference's 128 B blocks × 3 replicas
    round-robin, ``Server/managers.py:319-359``)."""
    _, fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """H5: ``more`` — read back; split fetch + ordered merge is the
    platform's job (the reference sorts fragments by Position by
    hand, ``Server/managers.py:182``)."""
    df = spark.read.text(path, wholetext=True)
    rows = df.collect()
    return rows[0][0] if rows else ""
