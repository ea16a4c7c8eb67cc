"""General as-of and range join operators vs independent oracles:
DuckDB's native ASOF JOIN for asof_join, and a brute-force
crossJoin+filter for range_join (exact at test scale; the bucketed
plan exists so 100 TB never pays that cross product). Plan gates pin
the shapes: asof has NO join operator at all; range_join is an
equi-join, never a BroadcastNestedLoopJoin."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_otlp_spark.operators.joins import asof_join, range_join
from duckdb_otlp_spark.plans import audit

T0 = dt.datetime(2024, 1, 1)


def _m(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, _m(5), 100.0), (1, _m(10), 101.0), (2, _m(3), 50.0),
         (3, _m(1), 7.0)],                       # key 3: no quote at all
        "sym long, ts timestamp, price double")
    quotes = spark.createDataFrame(
        [(1, _m(4), 99.5), (1, _m(5), 99.9),     # tie at trade ts: inclusive
         (1, _m(9), 100.5), (2, _m(2), 49.5),
         (2, _m(7), 50.5)],                      # after key 2's only trade
        "sym long, ts timestamp, quote double")
    return trades, quotes


def test_asof_join_matches_duckdb(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = sorted(
        tuple(r) for r in
        asof_join(trades, quotes, on="sym").collect())

    con = duckdb.connect()
    con.register("t", trades.toPandas())
    con.register("q", quotes.toPandas())
    want = sorted(tuple(r) for r in con.execute("""
        SELECT t.sym, t.ts, t.price, q.ts AS ts_right, q.quote AS quote_right
        FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts >= q.ts
    """).fetchall())
    assert got == want
    # the tie at (sym=1, 5m) matched the equal-ts quote (inclusive bound)
    by_key = {(r[0], r[1]): r for r in got}
    assert by_key[(1, _m(5))][3] == _m(5)
    assert by_key[(3, _m(1))][3] is None        # keyed left join: no match


def test_asof_join_has_no_join_operator(spark, trades_quotes):
    trades, quotes = trades_quotes
    rep = audit(asof_join(trades, quotes, on="sym"))
    assert rep.broadcast_joins + rep.sort_merge_joins \
        + rep.shuffled_hash_joins + rep.nested_loop_joins == 0
    assert not rep.has_python_eval


@pytest.fixture(scope="module")
def events_windows(spark):
    events = spark.createDataFrame(
        [(u, _m(m), float(m)) for u in (1, 2) for m in range(0, 120, 7)],
        "uid long, ts timestamp, v double")
    windows = spark.createDataFrame(
        [(1, _m(0), _m(30), "a"), (1, _m(25), _m(40), "b"),  # overlapping
         (2, _m(100), _m(200), "c"), (9, _m(0), _m(500), "z")],
        "uid long, w_start timestamp, w_end timestamp, tag string")
    return events, windows


def test_range_join_matches_bruteforce(spark, events_windows):
    events, windows = events_windows
    got = range_join(events, windows, on="uid", point_ts="ts",
                     interval_start="w_start", interval_end="w_end",
                     bucket="15 minutes").collect()
    brute = (events.join(windows, "uid")
             .filter((F.col("ts") >= F.col("w_start"))
                     & (F.col("ts") < F.col("w_end"))))
    # column order differs; compare as row dicts
    got_rows = sorted(map(repr, (r.asDict() for r in got)))
    want_rows = sorted(map(repr, (r.asDict() for r in brute.collect())))
    assert got_rows == want_rows
    assert len(got) > 0


def test_range_join_stays_equi_join(spark, events_windows):
    events, windows = events_windows
    rep = audit(range_join(events, windows, on="uid", point_ts="ts",
                           interval_start="w_start", interval_end="w_end",
                           bucket="15 minutes"))
    assert rep.nested_loop_joins == 0
    assert not rep.has_python_eval


def test_range_join_bucket_coarser_than_interval(spark, events_windows):
    """A bucket larger than every interval must still be exact (each
    interval spans 1-2 bucket rows; the filter does the precision)."""
    events, windows = events_windows
    fine = range_join(events, windows, on="uid", point_ts="ts",
                      interval_start="w_start", interval_end="w_end",
                      bucket="5 minutes")
    coarse = range_join(events, windows, on="uid", point_ts="ts",
                        interval_start="w_start", interval_end="w_end",
                        bucket="2 hours")
    a = sorted(map(repr, (r.asDict() for r in fine.collect())))
    b = sorted(map(repr, (r.asDict() for r in coarse.collect())))
    assert a == b


def test_asof_join_forward_matches_duckdb(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = sorted(
        tuple(r) for r in
        asof_join(trades, quotes, on="sym", direction="forward").collect())
    con = duckdb.connect()
    con.register("t", trades.toPandas())
    con.register("q", quotes.toPandas())
    want = sorted(tuple(r) for r in con.execute("""
        SELECT t.sym, t.ts, t.price, q.ts AS ts_right, q.quote AS quote_right
        FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts <= q.ts
    """).fetchall())
    assert got == want
    # key 2's trade at 3m matches the 7m quote only in forward mode
    by_key = {(r[0], r[1]): r for r in got}
    assert by_key[(2, _m(3))][3] == _m(7)


def test_asof_join_null_keys_and_timestamps(spark):
    """SQL comparison semantics: null-key or null-ts right rows never
    match anyone; null-key or null-ts left rows pass through unmatched.
    (DuckDB's native ASOF would pair the null-ts left row with the
    null-ts right row — a sort-implementation artifact this operator
    deliberately does not copy; the operator docstring pins this.)"""
    trades = spark.createDataFrame(
        [(1, _m(5), 100.0), (None, _m(6), 1.0), (1, None, 2.0)],
        "sym long, ts timestamp, price double")
    quotes = spark.createDataFrame(
        [(1, _m(4), 99.5), (None, _m(3), 0.5), (1, None, 0.7)],
        "sym long, ts timestamp, quote double")
    got = sorted(map(repr, (r.asDict() for r in
                            asof_join(trades, quotes, on="sym").collect())))
    want = sorted(map(repr, [
        {"sym": 1, "ts": _m(5), "price": 100.0,
         "ts_right": _m(4), "quote_right": 99.5},
        {"sym": None, "ts": _m(6), "price": 1.0,
         "ts_right": None, "quote_right": None},
        {"sym": 1, "ts": None, "price": 2.0,
         "ts_right": None, "quote_right": None},
    ]))
    assert got == want


def test_range_join_malformed_intervals_and_compound_bucket(spark):
    """end < start or null bounds match nothing (not a crash), and a
    compound interval bucket string works."""
    events = spark.createDataFrame(
        [(1, _m(10), 1.0)], "uid long, ts timestamp, v double")
    windows = spark.createDataFrame(
        [(1, _m(20), _m(5), "inverted"), (1, None, _m(30), "nullstart"),
         (1, _m(0), _m(30), "good")],
        "uid long, w_start timestamp, w_end timestamp, tag string")
    out = range_join(events, windows, on="uid", point_ts="ts",
                     interval_start="w_start", interval_end="w_end",
                     bucket="1 hour 30 minutes").collect()
    assert [r["tag"] for r in out] == ["good"]
