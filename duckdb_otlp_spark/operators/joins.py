"""Join operators Spark lacks as built-ins: point-in-time (as-of) join
and interval (range) join, expressed in shapes that survive 100 TB.

- ``asof_join`` matches each left row to the single latest right row
  at-or-before it per key — via ONE union + window pass (a single hash
  shuffle on the key), never a sort-merge range probe. DuckDB ships
  ASOF JOIN natively; tests use it as the oracle.
- ``range_join`` matches points to enclosing intervals via BUCKETED
  equi-join: intervals explode to the time buckets they cover, points
  compute their bucket, the join runs on (key, bucket) and an exact
  range filter prunes false positives. This turns the O(n*m) interval
  probe into a uniform-key equi-join whose fan-out is bounded by
  interval_length / bucket_width — the standard OSS-Spark strategy
  (native range-join optimization is not in Apache Spark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_right",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the single right row with equal
    key(s) that is the latest at-or-before it (``direction="backward"``,
    the default: ``right_ts <= left_ts``) or the earliest at-or-after it
    (``direction="forward"``: ``right_ts >= left_ts``); right columns
    arrive suffixed, null when no match (left join semantics).

    Scale shape: both sides union into one stream tagged by side; a
    single window over (key, ts) carries the nearest right payload
    across. One hash shuffle total, no join operator, no range probe.
    At equal timestamps the right row sorts on the inclusive side —
    identical to DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` (or
    ``<=`` for forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    r_payload_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias(right_ts + suffix),
                 *[F.col(c).alias(c + suffix) for c in r_payload_cols])
        .alias("__rp"))
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lp"))
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))

    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (W.partitionBy(*keys)
         .orderBy(ts_order, F.col("__side").asc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = (l.unionByName(r)
               .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    out_cols = [F.col(f"__lp.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{right_ts + suffix}").alias(right_ts + suffix)]
    out_cols += [F.col(f"__m.{c + suffix}").alias(c + suffix)
                 for c in r_payload_cols]
    return matched.select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame,
               on: str | list[str], point_ts: str,
               interval_start: str, interval_end: str,
               bucket: str | Column = "1 hour") -> DataFrame:
    """Inner-join each point row to every interval row (same key) with
    ``interval_start <= point_ts < interval_end``.

    ``bucket`` sets the equi-join granularity (an interval string like
    '15 minutes'); choose it near the TYPICAL interval length — each
    interval explodes into ceil(len/bucket)+1 bucket rows, so a too-fine
    bucket multiplies the interval side, a too-coarse one multiplies
    the false-positive filter work. Both sides stay JVM-side; the join
    is a plain equi-join on (key, bucket) that AQE can re-plan."""
    keys = [on] if isinstance(on, str) else list(on)
    step = F.expr(f"INTERVAL {bucket}") if isinstance(bucket, str) else bucket
    istart, iend = F.col(interval_start), F.col(interval_end)

    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(_trunc(istart, bucket),
                             _trunc(iend, bucket), step)))
    pt = points.withColumn("__bucket", _trunc(F.col(point_ts), bucket))
    joined = pt.join(iv, keys + ["__bucket"])
    return (joined.filter((F.col(point_ts) >= istart)
                          & (F.col(point_ts) < iend))
            .drop("__bucket"))


def _trunc(ts: Column, bucket: str) -> Column:
    """Floor a timestamp to the bucket grid (epoch-anchored)."""
    n, unit = bucket.strip().split()
    seconds = int(n) * {"second": 1, "seconds": 1, "minute": 60,
                        "minutes": 60, "hour": 3600, "hours": 3600,
                        "day": 86400, "days": 86400}[unit.lower()]
    return F.timestamp_seconds(
        (F.unix_timestamp(ts.cast("timestamp")) / seconds).cast("long")
        * seconds)
