"""Geospatial primitives: haversine distance and a grid-blocked radius
join.

The reference engine has no geo surface (it is a pass-through Kafka→Parquet
ETL, ETLTask.java:261-283); these extend the analytics surface the brief
requires, Spark-first:

- :func:`haversine_km` is a pure JVM column expression (whole-stage
  codegen, no Python).
- :func:`radius_join` blocks on 1°×1° grid cells: one side is exploded to
  its 3×3 neighborhood (a 9× narrow map, NO shuffle growth on the big
  side), then an equi-join on the cell key. At 100 TB this is the
  standard spatial-bin join — pair candidates are bounded by cell
  population, never the O(N·M) cross product a raw θ-join
  (`dist(a,b) <= r`) would force through BroadcastNestedLoopJoin.

Correctness bound: with cells of 1° and both latitudes within ±45°, one
degree of longitude is ≥ 78.7 km and one degree of latitude ≥ 110.5 km, so
any pair within ``radius_km <= 75`` differs by < 1 cell index per axis —
the 3×3 neighborhood provably contains every qualifying pair (the
driver-checked query's oracle brute-forces ALL pairs, so the no-missed-pair
claim is hash-verified, not just argued).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

# one explicit multiply by this double constant on BOTH engines —
# `radians()` is x/180*PI in the JVM but x*(PI/180) in DuckDB, a 1-ulp
# divergence this formulation removes
DEG_TO_RAD = 0.017453292519943295


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; exact same operation
    sequence as the SQL oracle so both engines evaluate identical double
    arithmetic, modulo libm sin/cos ulp — absorbed by the caller's
    round-to-metres)."""
    rad = lambda c: c * F.lit(DEG_TO_RAD)  # noqa: E731
    dlat = rad(lat2 - lat1)
    dlon = rad(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rad(lat1)) * F.cos(rad(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_cols: tuple[str, str] = ("l_lat", "r_lat"),
    lon_cols: tuple[str, str] = ("l_lon", "r_lon"),
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, via grid blocking.

    Returns left.columns + right.columns + ``dist_km`` (rounded to 3 —
    metre precision — so downstream filters/hashes are ulp-stable across
    engines). Caller guarantees |lat| <= 45 and radius_km <= 75 (see
    module docstring for the bound); violating either raises —
    radius_km at plan-build time, latitudes at execution time via an
    in-plan ``raise_error`` guard (a per-row comparison, no extra
    action), because an out-of-range latitude would silently shrink the
    1-degree-cell containment bound and drop qualifying pairs.
    """
    if radius_km > 75:
        raise ValueError(f"radius_km must be <= 75 for 1-degree cells, got {radius_km}")
    llat, rlat = lat_cols
    llon, rlon = lon_cols

    def checked_lat(c: Column) -> Column:
        return F.when(
            F.abs(c) > 45,
            F.raise_error(
                F.concat(
                    F.lit("radius_join: |lat| must be <= 45, got "),
                    c.cast("string"),
                )
            ).cast("double"),
        ).otherwise(c)
    # left explodes to its 3x3 cell neighborhood; right maps to one cell
    off = F.array([F.lit(i) for i in (-1, 0, 1)])
    lt = (
        left.withColumn("__dy", F.explode(off))
        .withColumn("__dx", F.explode(off))
        .withColumn("__cy", F.floor(checked_lat(F.col(llat))) + F.col("__dy"))
        .withColumn("__cx", F.floor(F.col(llon)) + F.col("__dx"))
        .drop("__dy", "__dx")
    )
    rt = right.withColumn("__cy", F.floor(checked_lat(F.col(rlat)))).withColumn(
        "__cx", F.floor(F.col(rlon))
    )
    dist = F.round(
        haversine_km(F.col(llat), F.col(llon), F.col(rlat), F.col(rlon)), 3
    )
    return (
        lt.join(rt, ["__cy", "__cx"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .drop("__cy", "__cx")
    )
