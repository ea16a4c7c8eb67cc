"""Property-based round-trip for the from-scratch Avro OCF pair:
iceberg_export's encoder and iceberg_scan's decoder must agree on
random records (identity round-trip), and the INDEPENDENT Apache Avro
Java implementation must decode the same bytes to the same values —
the cross-engine pin that protects the Iceberg metadata path from
latent varint/union/nesting bugs the fixed exporter schemas never
exercise."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_otlp_spark.iceberg_export import write_avro_ocf
from duckdb_otlp_spark.iceberg_scan import read_avro_ocf
from tests.test_iceberg_export import read_avro_jvm

# A record schema stressing every branch the decoder implements:
# primitives (incl. zigzag-sensitive negative longs), nullable unions,
# arrays, maps, and a nested record.
SCHEMA = {
    "type": "record", "name": "prop", "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "flag", "type": "boolean"},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "sub", "type": {
            "type": "record", "name": "sub_r", "fields": [
                {"name": "a", "type": ["null", "string"]},
                {"name": "b", "type": "long"}]}},
    ]}

# text avoiding Avro-legal-but-JSON-render-ambiguous content so the
# Java GenericRecord's toString() (JSON) comparison stays exact
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters='"\\'),
    max_size=12)
LONGS = st.integers(min_value=-(2 ** 62), max_value=2 ** 62)

RECORDS = st.lists(st.fixed_dictionaries({
    "i": LONGS,
    "s": TEXT,
    "flag": st.booleans(),
    "maybe": st.one_of(st.none(), LONGS),
    "xs": st.lists(LONGS, max_size=5),
    "m": st.dictionaries(TEXT.filter(bool), TEXT, max_size=4),
    "sub": st.fixed_dictionaries({
        "a": st.one_of(st.none(), TEXT),
        "b": LONGS}),
}), min_size=0, max_size=8)


@settings(max_examples=40, deadline=None)
@given(RECORDS)
def test_ocf_round_trip_identity(tmp_path_factory, records):
    path = tmp_path_factory.mktemp("avro") / "prop.avro"
    write_avro_ocf(path, SCHEMA, records)
    meta, got = read_avro_ocf(path)
    assert got == records
    assert json.loads(meta["avro.schema"]) == SCHEMA


@settings(max_examples=10, deadline=None)
@given(RECORDS)
def test_java_decoder_agrees(spark, tmp_path_factory, records):
    path = tmp_path_factory.mktemp("avro") / "prop_jvm.avro"
    write_avro_ocf(path, SCHEMA, records)
    _, py_records = read_avro_ocf(path)
    jvm_records = [json.loads(r.toString())
                   for r in read_avro_jvm(spark, path)]
    assert py_records == jvm_records == records
