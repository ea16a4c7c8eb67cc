"""Spark 4 Python DataSource surface: ``spark.read.format("otlp")``.

Mirrors test_read_otlp_json.py's contracts through the format API and
differentials every signal against the function API (the same oracle
style as the reader gate): identical schema, identical row sets, on
both protobuf and JSONL inputs.
"""

from __future__ import annotations

import json

import pytest

from duckdb_otlp_spark.sources.otlp_json import READERS
from duckdb_otlp_spark.sources.otlp_proto_encode import encode_envelope_pb
from tests.fixtures import (
    LOGS_SIMPLE,
    METRICS_ALL_TYPES,
    TRACES_SIMPLE,
)

_ENV_SETS = {"logs": LOGS_SIMPLE, "traces": TRACES_SIMPLE,
             "metrics": METRICS_ALL_TYPES}


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds_fixtures")
    for name, envs in _ENV_SETS.items():
        for i, env in enumerate(envs):
            (root / f"{name}_{i}.pb").write_bytes(encode_envelope_pb(env))
        (root / f"{name}.jsonl").write_text(
            "\n".join(json.dumps(e) for e in envs) + "\n")
    return root


@pytest.fixture(scope="module")
def ds_spark(spark):
    from duckdb_otlp_spark.sources.datasource import register
    register(spark)
    return spark


def _fmt(spark, signal, path):
    return (spark.read.format("otlp").option("signal", signal)
            .load(str(path)))


@pytest.mark.parametrize("signal,stem", [
    ("logs", "logs"), ("traces", "traces"),
    ("metrics_gauge", "metrics"), ("metrics_sum", "metrics"),
    ("metrics_histogram", "metrics"),
    ("metrics_exp_histogram", "metrics"),
])
@pytest.mark.parametrize("ext", ["_*.pb", ".jsonl"])
def test_format_matches_function_api(ds_spark, ds_dir, signal, stem, ext):
    fmt = _fmt(ds_spark, signal, ds_dir / f"{stem}{ext}")
    fn = READERS[signal](ds_spark, str(ds_dir / f"{stem}{ext}"))
    assert fmt.schema == fn.schema
    assert fmt.count() == fn.count()
    assert fmt.exceptAll(fn).count() == 0
    assert fn.exceptAll(fmt).count() == 0


def test_zero_match_glob_errors(ds_spark, ds_dir):
    with pytest.raises(Exception, match="no files matched"):
        _fmt(ds_spark, "logs", ds_dir / "nope_*.pb").count()


def test_unknown_signal_errors(ds_spark, ds_dir):
    with pytest.raises(Exception, match="unknown signal"):
        _fmt(ds_spark, "spans", ds_dir / "logs_0.pb").count()


def test_mixed_glob_auto_detects_per_file(ds_spark, ds_dir, tmp_path):
    (tmp_path / "a.pb").write_bytes(encode_envelope_pb(LOGS_SIMPLE[0]))
    (tmp_path / "b.jsonl").write_text(json.dumps(LOGS_SIMPLE[1]) + "\n")
    df = _fmt(ds_spark, "logs", tmp_path / "*")
    fn = READERS["logs"](ds_spark, str(tmp_path / "*"))
    assert df.count() == fn.count()
    assert df.exceptAll(fn).count() == 0


def test_garbage_protobuf_errors(ds_spark, tmp_path):
    (tmp_path / "junk.pb").write_bytes(b"\xff\xfe\xfd not protobuf")
    with pytest.raises(Exception, match="OTLP parse error"):
        _fmt(ds_spark, "logs", tmp_path / "junk.pb").count()


def test_directory_load_reads_all_files(ds_spark, ds_dir, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    for i, env in enumerate(LOGS_SIMPLE):
        (d / f"l{i}.pb").write_bytes(encode_envelope_pb(env))
    df = _fmt(ds_spark, "logs", d)
    fn = READERS["logs"](ds_spark, str(d / "*.pb"))
    assert df.count() == fn.count()
    assert df.exceptAll(fn).count() == 0


@pytest.mark.parametrize("prefix", ["file:", "file://", "file:///"])
def test_file_scheme_uri_forms(ds_spark, ds_dir, prefix):
    """All three file: URI forms resolve — the single-slash form is the
    one Spark's Path.toUri emits and used to be mangled by a blanket
    7-char strip."""
    path = ds_dir / "logs_0.pb"
    uri = prefix + str(path).lstrip("/") if prefix == "file:///" \
        else prefix + str(path)
    df = (ds_spark.read.format("otlp").option("signal", "logs")
          .load(uri))
    fn = READERS["logs"](ds_spark, str(path))
    assert df.count() == fn.count()
    assert df.exceptAll(fn).count() == 0


def test_nonexistent_nonglob_path_hits_zero_match_contract(ds_spark, tmp_path):
    with pytest.raises(Exception, match="no files matched"):
        _fmt(ds_spark, "logs", tmp_path / "absent.pb").count()


def test_directory_load_skips_subdirectories(ds_spark, tmp_path):
    d = tmp_path / "dir"
    (d / "nested").mkdir(parents=True)
    (d / "l0.pb").write_bytes(encode_envelope_pb(LOGS_SIMPLE[0]))
    df = _fmt(ds_spark, "logs", d)
    fn = READERS["logs"](ds_spark, str(d / "l0.pb"))
    assert df.count() == fn.count()


def test_empty_directory_hits_zero_match_contract(ds_spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(Exception, match="no files matched"):
        _fmt(ds_spark, "logs", d).count()


OTAP_DIR = __import__("pathlib").Path("/root/reference/test/data/otap")


@pytest.mark.skipif(not OTAP_DIR.exists(),
                    reason="reference OTAP fixtures not present")
@pytest.mark.parametrize("signal,bar", [
    ("logs", "logs-initial.bar"), ("traces", "traces-initial.bar"),
    ("metrics_gauge", "metrics-initial.bar"),
    ("metrics_sum", "metrics-initial.bar"),
    ("metrics_histogram", "metrics-initial.bar"),
    ("metrics_exp_histogram", "metrics-initial.bar"),
])
def test_otap_format_matches_function_api(ds_spark, signal, bar):
    from duckdb_otlp_spark.sources.otap import OTAP_READERS
    fmt = (ds_spark.read.format("otap").option("signal", signal)
           .load(str(OTAP_DIR / bar)))
    fn = OTAP_READERS[signal](ds_spark, str(OTAP_DIR / bar))
    assert fmt.schema == fn.schema
    assert fmt.count() == fn.count()
    assert fmt.exceptAll(fn).count() == 0
    assert fn.exceptAll(fmt).count() == 0


@pytest.mark.skipif(not OTAP_DIR.exists(),
                    reason="reference OTAP fixtures not present")
def test_otap_format_wrong_signal_errors(ds_spark):
    with pytest.raises(Exception, match="OTAP decode error"):
        (ds_spark.read.format("otap").option("signal", "logs")
         .load(str(OTAP_DIR / "metrics-initial.bar")).count())


# --- r13: columnar flatten fast path + file URI authority contract ---

def test_columnar_flatten_matches_rowwise():
    """expected_logs_columns / expected_traces_columns are the
    DataSource hot path; they must stay value-identical (same order,
    same values) to the row-wise oracles on every fixture envelope
    plus a generated multi-group one."""
    from duckdb_otlp_spark import reader_gate

    gen = {"resourceLogs": [
        {"resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": f"s{g}"}},
            {"key": "extra", "value": {"intValue": str(g)}}]},
         "scopeLogs": [{"scope": {"name": f"sc{g}", "version": "2"},
                        "logRecords": [
             {"timeUnixNano": str(1700000000000000000 + g * 100 + i),
              "severityNumber": 9, "severityText": "INFO",
              "body": {"stringValue": f"m-{g}-{i}"},
              "attributes": [{"key": "k",
                              "value": {"doubleValue": i + 0.5}}],
              "droppedAttributesCount": i % 2,
              "flags": 1} for i in range(5)]}]}
        for g in range(3)]}
    for envs in ([gen], reader_gate.LOGS_ENVELOPES):
        rows = reader_gate.expected_logs(envelopes=envs)
        names, cols = reader_gate.expected_logs_columns(envs)
        assert len(cols) == len(names)
        assert all(len(c) == len(rows) for c in cols)
        for i, r in enumerate(rows):
            assert dict(zip(names, (c[i] for c in cols))) == r, i

    trows = reader_gate.expected_traces(
        envelopes=reader_gate.TRACES_ENVELOPES)
    tnames, tcols = reader_gate.expected_traces_columns(
        reader_gate.TRACES_ENVELOPES)
    assert all(len(c) == len(trows) for c in tcols)
    for i, r in enumerate(trows):
        assert dict(zip(tnames, (c[i] for c in tcols))) == r, i
    # empty input: zero-length columns, stable shape
    enames, ecols = reader_gate.expected_traces_columns([])
    assert len(ecols) == len(enames) and all(len(c) == 0 for c in ecols)


def test_file_uri_remote_authority_rejected(ds_spark):
    """'file://host/path' names a remote host — must raise the explicit
    authority error, not misread 'host/path' as a relative local path
    and surface a baffling 0-match (r12 ADVICE)."""
    with pytest.raises(Exception, match="non-local authority 'evilhost'"):
        (ds_spark.read.format("otlp").option("signal", "logs")
         .load("file://evilhost/tmp/x.jsonl").count())


def test_file_uri_localhost_authority_accepted(ds_spark, ds_dir):
    n_plain = (ds_spark.read.format("otlp").option("signal", "logs")
               .load(str(ds_dir / "logs.jsonl")).count())
    n_local = (ds_spark.read.format("otlp").option("signal", "logs")
               .load(f"file://localhost{ds_dir}/logs.jsonl").count())
    assert n_plain == n_local > 0
