"""Registration machinery for the query surface.

Every operator from SURVEY.md §2 (plus the scale extensions) lands
here as a named query with an optional DuckDB oracle. The driver's
correctness gate sorts result columns by name and compares row-count
+ schema + order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY in Spark and SQL;
- double-typed aggregates are ``round``-ed on BOTH sides (Spark and
  DuckDB sum floats in different orders; rounding removes the
  last-ulp nondeterminism without weakening the check);
- oracle-side integer functions are cast to match Spark's types
  (e.g. DuckDB ``year()`` returns BIGINT, Spark's returns INT);
- double→int casts: Spark TRUNCATES, DuckDB ROUNDS — oracles use
  ``CAST(trunc(x) AS ...)``; and Spark's ``sequence(1, 0)`` is the
  DESCENDING [1,0] where DuckDB's generate_series(1,0) is empty —
  guard any dynamic-length sequence.

Queries whose semantics are not ANSI-SQL-expressible (stateful
streaming, iterative/approximate algorithms) register without an
oracle; the driver then records a weaker rows-only check.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ``--`` end-of-line SQL comments must be stripped BEFORE the oracle
# is flattened to one line: flattening would otherwise turn the first
# comment into a comment-to-end-of-string, silently swallowing the
# rest of the query (DuckDB: "syntax error at end of input"). Applied
# line-wise, so it cannot touch anything except a genuine comment
# tail; oracles never carry ``--`` inside string literals
# (test_entry asserts every registered oracle EXPLAIN-parses).
_SQL_COMMENT = re.compile(r"--[^\n]*")


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(_SQL_COMMENT.sub("", oracle).split())
        return fn

    return deco
