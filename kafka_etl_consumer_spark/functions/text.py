"""Text column builders shared by the text-analysis and dedup operators.

Tokenization rule (deliberately simple + cross-engine reproducible):
lowercase, split on whitespace runs, drop empty tokens. Both Spark
(``split``/``filter``) and DuckDB (``regexp_split_to_array``/``list_filter``)
implement it identically, which the dedup oracles depend on.

All JVM-side built-ins — at 100 TB these run inside whole-stage codegen with
zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """array<string> of lowercase whitespace tokens, empties removed."""
    toks = F.split(F.lower(F.trim(_c(col))), r"\s+")
    return F.filter(toks, lambda t: F.length(t) > 0)


TOKENS_SQL = "list_filter(regexp_split_to_array(lower(trim({expr})), '\\s+'), t -> len(t) > 0)"


def tokens_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`tokens`."""
    return TOKENS_SQL.format(expr=expr)


def word_shingles(tok_col: Column | str, k: int = 3) -> Column:
    """k-word shingles (space-joined) from a token array column.

    ``sequence(1, n-k+1)`` × ``slice`` keeps this in codegen; documents with
    fewer than k tokens yield an empty array (matches the SQL oracle).
    """
    t = _c(tok_col)
    n = F.size(t)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, k)))


def word_shingles_sql(tokens_expr: str, k: int = 3) -> str:
    """DuckDB SQL equivalent of :func:`word_shingles` over a token-array expr."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {k} THEN "
        f"list_transform(range(1, len({tokens_expr}) - {k - 1} + 1), "
        f"i -> array_to_string(({tokens_expr})[i : i + {k - 1}], ' ')) "
        f"ELSE [] END"
    )
