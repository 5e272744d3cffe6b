"""Skew mitigation: salted aggregation and salted joins.

First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): it splits oversized SHUFFLE JOIN partitions at runtime.
What AQE does NOT fix:

- a hot GROUP BY key (one reducer gets the whole key even after AQE, since
  a group can't be split without changing semantics) → ``salted_agg``:
  two-stage partial/final with a deterministic salt, so the hot key spreads
  over N reducers in stage 1 and only N pre-aggregated rows meet in stage 2;
- a skewed join where the build side must stay broadcast-free and AQE's
  split heuristics miss (or streaming, where AQE is off) → ``salted_join``:
  salt the fact side, replicate the dimension side ×N on a generated salt.

Salt is ``pmod(xxhash64(salt_src), buckets)`` — deterministic (reruns and
retries agree), uniform, and computed from a column the caller knows is
high-cardinality (an id), never ``rand()`` (retry-unsafe: a re-executed task
would re-salt differently and double-count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# op → (partial aggregate, final re-aggregate of the partials)
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    salt_src: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation with an explicit salt for hot GROUP BY keys.

    ``specs``: (op, column, alias) with op in count|sum|min|max|avg —
    the algebraic aggregates that decompose into partial+final (avg
    decomposes as sum/count). Semantically identical to
    ``df.groupBy(keys).agg(...)``; physically the first shuffle is on
    (keys, salt) so no reducer ever sees more than ~1/buckets of any key."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)).alias("__salt")

    partials, finals = [], []
    for op, col, alias in specs:
        if op == "avg":
            partials += [F.sum(col).alias(f"__s_{alias}"), F.count(col).alias(f"__c_{alias}")]
            finals.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        elif op in _ALGEBRAIC:
            part, fin = _ALGEBRAIC[op]
            partials.append(part(col).alias(f"__p_{alias}"))
            finals.append(fin(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"unsupported op {op!r} (count|sum|min|max|avg)")

    return (
        df.groupBy(*keys, salt)
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_src: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated ×
    ``buckets``. Use when the join key is skewed, the dim side is too big
    to broadcast whole but small enough to replicate ×buckets, and AQE
    can't intervene. Join key becomes (on, salt): the hot key's rows spread
    over ``buckets`` tasks instead of one.

    ``how`` is restricted to inner|left (fact-preserving sides): with
    'right'/'full' an unmatched dim row would be emitted once PER SALT
    REPLICA — ``buckets`` copies — silently corrupting the outer result."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "the dim side is replicated x buckets, so right/full outer "
            "would duplicate unmatched dim rows once per replica"
        )
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
