"""Join operators Spark lacks as built-ins: point-in-time (as-of) join
and interval (range) join, expressed in shapes that survive 100 TB.

- ``asof_join`` matches each left row to the single nearest right row
  per key — via ONE union + window pass (a single hash shuffle on the
  key), never a sort-merge range probe. DuckDB ships ASOF JOIN
  natively; tests use it as the oracle, including its NULL semantics:
  NULL keys and NULL timestamps never match (right rows dropped, left
  rows passed through unmatched).
- ``range_join`` matches points to enclosing intervals via BUCKETED
  equi-join: intervals explode to the time buckets they cover, points
  compute their bucket, the join runs on (key, bucket) and an exact
  range filter prunes false positives. This turns the O(n*m) interval
  probe into a uniform-key equi-join whose fan-out is bounded by
  interval_length / bucket_width — the standard OSS-Spark strategy
  (native range-join optimization is not in Apache Spark).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _all_not_null(cols: list[str]) -> Column:
    return reduce(lambda a, b: a & b,
                  [F.col(c).isNotNull() for c in cols])


_BUCKET_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _bucket_seconds(bucket: str) -> int:
    """Parse '15 minutes' / '1 hour 30 minutes' / '1 week' to seconds."""
    toks = bucket.strip().lower().split()
    if not toks or len(toks) % 2:
        raise ValueError(f"bucket must be '<n> <unit> ...': {bucket!r}")
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        if unit not in _BUCKET_UNITS:
            raise ValueError(
                f"unsupported bucket unit {unit!r} (use "
                f"{sorted(set(_BUCKET_UNITS))})")
        total += int(n) * _BUCKET_UNITS[unit]
    if total <= 0:
        raise ValueError(f"bucket must be positive: {bucket!r}")
    return total


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_right",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the single right row with equal
    key(s) that is the latest at-or-before it (``direction="backward"``,
    the default: ``right_ts <= left_ts``) or the earliest at-or-after it
    (``direction="forward"``: ``right_ts >= left_ts``); right columns
    arrive suffixed, null when no match (left join semantics).

    NULL handling follows SQL comparison semantics: a right row with a
    null key or timestamp can never match (dropped before the window);
    a left row with a null key or timestamp passes through unmatched.
    (DuckDB's native ASOF orders NULL timestamps and will pair a
    null-ts left row with a null-ts right row — an artifact of its
    sort-based implementation that this operator deliberately does not
    copy; the tests pin both behaviors explicitly.)

    Scale shape: both sides union into one stream tagged by side; a
    single window over (key, ts) carries the nearest right payload
    across. One hash shuffle total, no join operator, no range probe,
    and key/ts bytes ship through the shuffle once (the payload struct
    holds only non-key columns). At equal timestamps the right row
    sorts on the inclusive side — identical to DuckDB
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` (or ``<=`` for forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    l_pay = [c for c in left.columns if c not in keys and c != left_ts]
    r_pay = [c for c in right.columns if c not in keys and c != right_ts]

    ok_l = _all_not_null(keys + [left_ts])
    ok_r = _all_not_null(keys + [right_ts])

    r = right.filter(ok_r).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias(right_ts + suffix),
                 *[F.col(c).alias(c + suffix) for c in r_pay])
        .alias("__rp"))
    # __rp's struct type is fetched once and reused for BOTH null casts
    # below; the former out.schema access analyzed the whole union+window
    # plan to re-read these same field types. (Measured neutral on build
    # wall at sf0.1 — the build cost sits in the ~20 plan ops, not the
    # schema fetch — kept for the fewer analysis passes.)
    rp_t = r.schema["__rp"].dataType
    l = left.filter(ok_l).select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rp_t).alias("__rp"),
        F.struct(*[F.col(c) for c in l_pay]).alias("__lp"))
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))

    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (W.partitionBy(*keys)
         .orderBy(ts_order, F.col("__side").asc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = (l.unionByName(r)
               .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))

    def _out(frame, lp_prefix, ts_col, m_prefix):
        cols = []
        for c in left.columns:
            if c in keys:
                cols.append(F.col(c))
            elif c == left_ts:
                cols.append(F.col(ts_col).alias(left_ts))
            else:
                cols.append(F.col(f"{lp_prefix}{c}").alias(c))
        for c in [right_ts + suffix] + [c + suffix for c in r_pay]:
            cols.append((F.col(f"{m_prefix}{c}") if m_prefix is not None
                         else F.lit(None)).alias(c))
        return frame.select(*cols)

    out = _out(matched, "__lp.", "__ts", "__m.")
    # null-key / null-ts left rows: SQL semantics say they never match —
    # pass them through with null right columns, typed via the __rp
    # struct fields (identical to the matched side's types: __m.<c> is a
    # field access on that same struct). Kept lazy: no isEmpty() probe —
    # a plan build must never run a job; the empty-side union costs
    # nothing at execution.
    null_right = left.filter(~ok_l).select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in rp_t.fields])
    return out.unionByName(null_right)


def range_join(points: DataFrame, intervals: DataFrame,
               on: str | list[str], point_ts: str,
               interval_start: str, interval_end: str,
               bucket: str = "1 hour") -> DataFrame:
    """Inner-join each point row to every interval row (same key) with
    ``interval_start <= point_ts < interval_end``.

    ``bucket`` is an interval string (anything ``F.window`` accepts:
    '15 minutes', '1 hour 30 minutes', '1 week') setting the equi-join
    granularity; choose it near the TYPICAL interval length — each
    interval explodes into ceil(len/bucket)+1 bucket rows, so a too-fine
    bucket multiplies the interval side, a too-coarse one multiplies
    the false-positive filter work. Malformed intervals (end < start,
    or null bounds) match nothing, like the equivalent inner join.
    Both sides stay JVM-side; the join is a plain equi-join on
    (key, bucket) that AQE can re-plan."""
    keys = [on] if isinstance(on, str) else list(on)
    secs = _bucket_seconds(bucket)
    # grid step in seconds so the sequence lands exactly on the floor
    # grid (F.window can't truncate here: two time-window expressions in
    # one projection are rejected by the analyzer)
    step = F.expr(f"INTERVAL {secs} seconds")
    istart, iend = F.col(interval_start), F.col(interval_end)

    def _trunc(ts: Column) -> Column:
        # epoch-anchored FLOOR (not cast-truncation — pre-epoch
        # timestamps must round down, same idiom as q_time_bucket)
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(ts.cast("timestamp")) / secs)
            .cast("long") * secs)

    iv = (intervals
          .filter(istart.isNotNull() & iend.isNotNull() & (iend >= istart))
          .withColumn("__bucket",
                      F.explode(F.sequence(_trunc(istart), _trunc(iend),
                                           step))))
    pt = (points.filter(F.col(point_ts).isNotNull())
          .withColumn("__bucket", _trunc(F.col(point_ts))))
    joined = pt.join(iv, keys + ["__bucket"])
    return (joined.filter((F.col(point_ts) >= istart)
                          & (F.col(point_ts) < iend))
            .drop("__bucket"))
