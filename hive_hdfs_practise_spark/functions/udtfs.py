"""Python UDTFs (Spark 4 user-defined TABLE functions).

The UDTF surface complements the Pandas-UDF edges: a Python class
whose ``eval`` yields ROWS, usable in SQL ``LATERAL`` position —
the user-extensible form of ``explode``-like fan-out. Keep UDTFs
off hot paths (per-row Python); they exist for logic that genuinely
needs imperative row generation. The reference has no UDF surface
at all (SURVEY §2.11) — this is engine-completeness, demonstrated
on sentence splitting whose semantics stay SQL-expressible so the
whole Python hop remains oracle-checked.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx: int, sentence: string")
class SplitSentences:
    """Yield ('. '-delimited) sentences with their 0-based split
    position; empty segments are skipped but still consume an index
    (matching the SQL restatement: position among ALL split parts,
    filtered non-empty)."""

    def eval(self, text: str):  # noqa: ANN001 — UDTF contract
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            if s:
                yield i, s


def register_udtfs(spark) -> None:
    """Idempotently register the UDTF surface on a session."""
    spark.udtf.register("split_sentences", SplitSentences)
