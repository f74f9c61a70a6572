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

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ``--`` end-of-line SQL comments must be stripped BEFORE the oracle
# is flattened to one line: flattening would otherwise turn the first
# comment into a comment-to-end-of-string, silently swallowing the
# rest of the query (DuckDB: "syntax error at end of input"). The
# scan is quote-aware — a ``--`` inside a '...' string literal or a
# "..." quoted identifier is data, not a comment, so a future oracle
# matching e.g. LIKE '%--%' is flattened intact instead of silently
# truncated (the old regex would have corrupted it, and the EXPLAIN
# test only catches that when the mangled SQL happens not to parse).


def _strip_sql_comments(sql: str) -> str:
    """Remove ``--``-to-end-of-line comments, honoring single-quoted
    strings (with '' escapes) and double-quoted identifiers; quote
    state carries across lines so multi-line literals stay intact."""
    out: list[str] = []
    quote: str | None = None
    for line in sql.split("\n"):
        i, n = 0, len(line)
        while i < n:
            ch = line[i]
            if quote is not None:
                if ch == quote:
                    if quote == "'" and i + 1 < n and line[i + 1] == "'":
                        i += 2  # escaped '' stays inside the literal
                        continue
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "-" and i + 1 < n and line[i + 1] == "-":
                line = line[:i]
                break
            i += 1
        out.append(line)
    return "\n".join(out)


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(_strip_sql_comments(oracle).split())
        return fn

    return deco
