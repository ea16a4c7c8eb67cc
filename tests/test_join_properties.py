"""Property-based NULL/boundary matrix for asof_join and range_join vs
DuckDB, closing the deterministic-fixtures-only gap in test_joins.py:
hypothesis generates random key/ts sets with NULL keys, NULL
timestamps, equal-timestamp ties, epoch-crossing (negative) times, and
inverted/degenerate intervals; every example is checked against an
independent DuckDB evaluation.

Oracle contracts:
- asof: DuckDB's native ASOF LEFT JOIN over the null-free rows, plus
  the operator's documented pass-through of null-key/null-ts left rows
  (DuckDB's sort-based ASOF pairs null-ts rows with each other — an
  artifact the operator deliberately does not copy; see
  operators/joins.py docstring and test_asof_join_null_keys_and_timestamps).
- range: a plain SQL range-predicate join — NULL bounds and
  end < start fall out of the predicate identically in both engines,
  so no special-casing at all.

Each hypothesis example builds ONE pair of DataFrames (max_examples
bounds total Spark job count).
"""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_otlp_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _m(minutes):
    return None if minutes is None else T0 + dt.timedelta(minutes=minutes)


# small domains force key collisions, ts ties, and epoch-relative
# negatives (minutes < 0 cross the T0 anchor used by the bucket floor)
KEY = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
TS = st.one_of(st.none(), st.integers(min_value=-90, max_value=90))

ASOF_LEFT = st.lists(st.tuples(KEY, TS), min_size=1, max_size=12)
ASOF_RIGHT = st.lists(st.tuples(KEY, TS), min_size=0, max_size=12)

POINTS = st.lists(st.tuples(KEY, TS), min_size=1, max_size=12)
INTERVALS = st.lists(st.tuples(KEY, TS, TS), min_size=0, max_size=8)


def _rows(con, sql):
    return sorted(map(repr, (tuple(r) for r in con.execute(sql).fetchall())))


@settings(max_examples=25, deadline=None)
@given(ASOF_LEFT, ASOF_RIGHT, st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_duckdb_on_random_null_boundary_sets(
        spark, left_rows, right_rows, direction):
    # right (key, ts) must be unique: at an exact tie between two right
    # rows ASOF picks an arbitrary one, so both engines could disagree
    # legitimately. Left duplicates/ties stay — each row matches alone.
    seen: set = set()
    right_rows = [r for r in right_rows
                  if not (r in seen or seen.add(r))]
    trades = spark.createDataFrame(
        [(k, _m(t), float(i)) for i, (k, t) in enumerate(left_rows)],
        "sym long, ts timestamp, price double")
    quotes = spark.createDataFrame(
        [(k, _m(t), float(100 + i)) for i, (k, t) in enumerate(right_rows)],
        "sym long, ts timestamp, quote double") if right_rows else \
        spark.createDataFrame([], "sym long, ts timestamp, quote double")

    got = sorted(map(repr, (tuple(r) for r in
                            asof_join(trades, quotes, on="sym",
                                      direction=direction).collect())))

    con = duckdb.connect()
    con.register("t", trades.toArrow())   # Arrow keeps int64+nulls;
    con.register("q", quotes.toArrow())   # toPandas would float-ify sym
    op = ">=" if direction == "backward" else "<="
    want = _rows(con, f"""
        WITH ln AS (SELECT * FROM t WHERE sym IS NOT NULL AND ts IS NOT NULL),
             qn AS (SELECT * FROM q WHERE sym IS NOT NULL AND ts IS NOT NULL)
        SELECT ln.sym, ln.ts, ln.price, qn.ts AS ts_right,
               qn.quote AS quote_right
        FROM ln ASOF LEFT JOIN qn
          ON ln.sym = qn.sym AND ln.ts {op} qn.ts
        UNION ALL
        SELECT sym, ts, price, NULL, NULL
        FROM t WHERE sym IS NULL OR ts IS NULL
    """)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(POINTS, INTERVALS, st.sampled_from(["5 minutes", "1 hour", "2 hours"]))
def test_range_join_matches_duckdb_on_random_null_boundary_sets(
        spark, point_rows, interval_rows, bucket):
    events = spark.createDataFrame(
        [(k, _m(t), float(i)) for i, (k, t) in enumerate(point_rows)],
        "uid long, ts timestamp, v double")
    windows = spark.createDataFrame(
        [(k, _m(a), _m(b), str(i))
         for i, (k, a, b) in enumerate(interval_rows)],
        "uid long, w_start timestamp, w_end timestamp, tag string") \
        if interval_rows else spark.createDataFrame(
            [], "uid long, w_start timestamp, w_end timestamp, tag string")

    got = sorted(map(repr, (tuple(r) for r in
                            range_join(events, windows, on="uid",
                                       point_ts="ts",
                                       interval_start="w_start",
                                       interval_end="w_end",
                                       bucket=bucket).collect())))

    con = duckdb.connect()
    con.register("p", events.toArrow())
    con.register("i", windows.toArrow())
    # NULL keys/bounds and end < start match nothing through the plain
    # predicate — identical semantics, no special-casing
    want = _rows(con, """
        SELECT p.uid, p.ts, p.v, i.w_start, i.w_end, i.tag
        FROM p JOIN i ON p.uid = i.uid
         AND p.ts >= i.w_start AND p.ts < i.w_end
    """)
    assert got == want
