"""Geospatial-lite: grid-blocked proximity self-join (engine
addition; SURVEY.md §2.6).

Spatial distance joins are theta joins — no equality key — and the
naive plan is an all-pairs cartesian. The scalable pattern (used by
every distributed spatial engine, e.g. Apache Sedona's partitioned
spatial join) is GRID BLOCKING: bucket points into cells sized to
the query radius, replicate each probe point into its 3x3 cell
neighborhood, and equi-join on the cell id — every true pair lands
in exactly one (probe-cell = home-cell) bucket, candidate volume is
bounded by local density, and the join is a plain shuffle hash join
on an integer key. This is the same bucketize-the-theta-join move as
join_range_bucketized (1-D) lifted to 2-D.

Coordinates are derived deterministically from the events table
(multiplicative hashes of the ids — no RNG, registry contract), and
all geometry is INTEGER math (squared Euclidean distance), so the
DuckDB differential is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query

# Radius (grid cell edge = R, membership = squared distance <= R*R).
_R = 2
_GRID = 200  # coordinate domain [0, _GRID)

_POINTS_SQL = f"""
    pts AS (
        SELECT event_id AS point_id,
               (user_id * 2654435761) % {_GRID} AS x,
               (event_id * 2246822519) % {_GRID} AS y
        FROM events
    )
"""


@query(
    "geo_grid_proximity_join",
    oracle=f"""
    WITH {_POINTS_SQL}
    SELECT a.point_id AS pa, b.point_id AS pb,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM pts a JOIN pts b
      ON a.point_id < b.point_id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R * _R}
    ORDER BY dist2 ASC, pa ASC, pb ASC
    LIMIT 20
    """,
    tags=("geo", "spatial-join", "blocking", "theta-join"),
)
def geo_grid_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 nearest point pairs within radius R — computed with a
    grid-blocked equi-join, never a cartesian: each point gets a home
    cell (edge = R); the probe side is replicated into its 3x3 cell
    neighborhood (a 9x narrow fan-out, no shuffle); the join is a
    plain hash join on the integer cell id; the exact squared
    distance then filters candidates. Every true pair is produced
    exactly once (probe replica meets the build point's unique home
    cell; pa < pb kills the mirror orientation), so no distinct is
    needed.

    The ORACLE is the naive theta join — DuckDB's IEJoin grinds
    through it at test scale — which is exactly the point: same
    rows, different asymptotics.

    Scale shape: fan-out 9x, one shuffle on cell id, per-cell work
    bounded by local density (skew only where the data is physically
    dense — the spatial version of key skew; the treatment is
    finer cells + a second-level split, same salting playbook).
    Integer-only geometry keeps the differential exact."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        F.col("event_id").alias("point_id"),
        ((F.col("user_id") * F.lit(2654435761)) % _GRID).alias("x"),
        ((F.col("event_id") * F.lit(2246822519)) % _GRID).alias("y"),
    )
    home = pts.select(
        "point_id",
        "x",
        "y",
        (F.col("x") / _R).cast("bigint").alias("cx"),
        (F.col("y") / _R).cast("bigint").alias("cy"),
    )
    # F.col/div: integer division via floor-cast is safe (coords >= 0)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        home.withColumn("o", F.explode(offsets))
        .select(
            F.col("point_id").alias("pa_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("o.dx")).alias("jcx"),
            (F.col("cy") + F.col("o.dy")).alias("jcy"),
        )
    )
    build = home.select(
        F.col("point_id").alias("pb_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    pairs = (
        probe.join(build, ["jcx", "jcy"])
        .where(F.col("pa_id") < F.col("pb_id"))
        .where(dx * dx + dy * dy <= _R * _R)
        .select(
            F.col("pa_id").alias("pa"),
            F.col("pb_id").alias("pb"),
            (dx * dx + dy * dy).cast("bigint").alias("dist2"),
        )
    )
    return pairs.orderBy(F.asc("dist2"), F.asc("pa"), F.asc("pb")).limit(20)
