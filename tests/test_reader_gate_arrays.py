"""Guard for the reader gate's array-to-JSON twin serialization
(reader_gate._arrays_as_json vs _project_arrays_to_json): the oracle
side uses Python json.dumps, the Spark side Jackson-backed F.to_json.
Those agree for integers and short doubles but diverge on scientific
notation (json.dumps: 1e-07, Jackson: 1.0E-7) — a fixture edit adding
such a double would break the driver gate non-obviously. This test
asserts, for every ArrayType cell in the actual gate fixture rows,
byte-identical output from both serializers, so any unsafe fixture
value fails HERE with a clear message instead of as a silent gate
hash-mismatch."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql.types import ArrayType

from duckdb_otlp_spark import reader_gate as rg
from duckdb_otlp_spark import schemas as _schemas


def _array_cells():
    cases = [
        (rg.expected_histogram(), _schemas.METRICS_HISTOGRAM_SCHEMA),
        (rg.expected_exp_histogram(), _schemas.METRICS_EXP_HISTOGRAM_SCHEMA),
    ]
    for rows, schema in cases:
        arr_fields = [f for f in schema.fields
                      if isinstance(f.dataType, ArrayType)]
        assert arr_fields, "gate schema lost its array columns?"
        for r in rows:
            for f in arr_fields:
                if r[f.name] is not None:
                    yield f.name, r[f.name], f.dataType


def test_fixture_arrays_serialize_identically_python_vs_jackson(spark):
    cells = list(_array_cells())
    assert cells, "no array cells in the gate fixtures?"
    # one DataFrame, one job: each cell as a row of its own array column
    # is impossible (types differ), so evaluate per distinct type
    by_type: dict = {}
    for name, val, dtype in cells:
        by_type.setdefault(dtype.simpleString(), []).append((name, val, dtype))
    for type_str, group in by_type.items():
        df = spark.createDataFrame(
            [Row(i=i, a=val) for i, (_, val, _) in enumerate(group)],
            f"i long, a {type_str}")
        from pyspark.sql import functions as F
        got = {r["i"]: r["j"]
               for r in df.select("i", F.to_json("a").alias("j")).collect()}
        for i, (name, val, _) in enumerate(group):
            py = json.dumps(val, separators=(",", ":"))
            assert got[i] == py, (
                f"fixture array {name!r} value {val!r} serializes as "
                f"{got[i]!r} under Spark to_json but {py!r} under "
                f"json.dumps — pick gate fixture values that round-trip "
                f"identically (see reader_gate._arrays_as_json)")
