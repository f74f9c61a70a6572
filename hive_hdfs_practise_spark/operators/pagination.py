"""Sort + paginate operators (SURVEY.md §2.6, O1-O3/O5).

Two forms:

- ``paginate``: LIMIT/OFFSET, bit-compatible with the reference
  (``DatabaseAccessor.py:101,108,115``). Spark plans this as a
  global TakeOrderedAndProject — each task keeps offset+limit rows,
  the driver merges. Fine for UI page sizes; cost grows with the
  offset.
- ``keyset_page``: WHERE last_key < key ORDER BY key LIMIT n — the
  100 TB form. The predicate pushes into the scan (row-group
  skipping), so page 10 000 costs the same as page 1. Requires a
  unique ordering key, which every reference query has (ids,
  create_time+id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def paginate(df: DataFrame, order: list[Column], start_from: int, limitation: int) -> DataFrame:
    """Reference semantics: ORDER BY ... LIMIT limitation OFFSET
    start_from."""
    out = df.orderBy(*order)
    if start_from:
        out = out.offset(start_from)
    return out.limit(limitation)


def keyset_page(
    df: DataFrame,
    key: Column,
    after: object | None,
    limitation: int,
    descending: bool = False,
) -> DataFrame:
    """Scale-stable pagination: seek past the last seen key instead
    of discarding ``offset`` rows."""
    if after is not None:
        df = df.filter(key < after if descending else key > after)
    return df.orderBy(key.desc() if descending else key.asc()).limit(limitation)
