"""hive_hdfs_practise_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``Greilfang/hive-hdfs-practise``
(a Hive/Impala movie-analytics backend + simulated HDFS), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the stateful pieces, and Pandas UDFs only where
built-ins cannot express the semantics.

Layout:
  session       SparkSession factory tuned for the target cluster
  sources/      table catalog, TSV/CSV ingest, DDL, sinks
  operators/    relational operators (filter/join/topk/paginate/agg)
  functions/    scalar/JSON/text/vector function library
  plans/        the public query registry (queries + DuckDB oracles)
  streaming/    heartbeat liveness monitor, windowed stream aggs
  dedup/        exact + MinHash/SimHash/n-gram/embedding dedup
  similarity/   brute-force + LSH-bucketed ANN over embeddings
  multimodal/   binary-column (image/audio) pipeline plumbing
  fs/           GreilFS-analog storage ops (ls/find/rm, reassembly,
                replication audit)
"""

__version__ = "0.1.0"
