"""Attribute-promotion helpers: the write-side column naming and the
documented read pattern for mixed old/new data.

The reference promotes configured resource/scope attribute keys into
``resource_attr_<key>`` / ``scope_attr_<key>`` VARCHAR columns at ingest
(reference: src/otlp_column_promote.cpp:27-127) and documents the read
pattern for tables where early files predate the promotion: COALESCE the
promoted column with the JSON extraction
(reference: site/src/content/docs/reference/serve.md:234-243).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ATTR_SOURCES = {
    "resource_attr_": "resource_attributes",
    "scope_attr_": "scope_attributes",
}


def sanitize_key(key: str) -> str:
    """Promotion column sanitization (reference: otlp_column_promote.cpp:27-38)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", key)


def promoted_column(prefix: str, key: str) -> str:
    return prefix + sanitize_key(key)


def attr(df: DataFrame, key: str, prefix: str = "resource_attr_") -> Column:
    """The promotion-aware read: the promoted column when this DataFrame
    has it (rows from pre-promotion files are NULL there and fall back to
    the JSON blob), else the plain JSON extraction. Reading mixed files
    needs ``spark.read.option("mergeSchema", True)`` so the promoted
    column surfaces at all — same caveat as the reference's
    ``union_by_name`` note (reference: performance.md:18-20)."""
    source = _ATTR_SOURCES[prefix]
    extracted = F.get_json_object(F.col(source), f"$['{key}']")
    target = promoted_column(prefix, key)
    if target in df.columns:
        return F.coalesce(F.col(target), extracted)
    return extracted
