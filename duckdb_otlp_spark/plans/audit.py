"""Physical-plan audit: machine-readable facts about what Catalyst
actually planned, so plan quality is testable instead of eyeballed.

The reference delegates all planning to DuckDB and its performance
doctrine is layout-side (reference: site/.../reference/performance.md);
on Spark the equivalent discipline is: filters reach the parquet scan
(PushedFilters), scans read only needed columns (ReadSchema), small
dimensions broadcast instead of shuffling, and hot expressions stay
inside WholeStageCodegen. ``audit(df)`` extracts exactly those facts
from ``df.explain('formatted')`` output; tests assert on them per
headline query (tests/test_plans.py).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    location: str
    read_columns: list[str]
    pushed_filters: list[str]
    partition_filters: list[str]


@dataclass
class PlanReport:
    text: str
    scans: list[ScanInfo] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    codegen_stages: int = 0
    has_python_eval: bool = False

    def scan_for(self, table_substr: str) -> ScanInfo | None:
        for s in self.scans:
            if table_substr in s.location:
                return s
        return None


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _split_filters(s: str) -> list[str]:
    """Split a bracketed filter list at top-level commas."""
    s = s.strip()
    if s.startswith("["):
        s = s[1:-1]
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            item = "".join(cur).strip()
            if item:
                out.append(item)
            cur = []
        else:
            cur.append(ch)
    item = "".join(cur).strip()
    if item:
        out.append(item)
    return out


def audit(df: DataFrame) -> PlanReport:
    text = _formatted_plan(df)
    rep = PlanReport(text=text)
    rep.broadcast_joins = len(re.findall(r"BroadcastHashJoin", text))
    rep.sort_merge_joins = len(re.findall(r"SortMergeJoin", text))
    rep.shuffled_hash_joins = len(re.findall(r"ShuffledHashJoin", text))
    rep.nested_loop_joins = len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", text))
    rep.exchanges = len(re.findall(r"\bExchange\b|\n\s*\(\d+\) Exchange", text))
    # with AQE on, the pre-execution formatted plan carries no codegen
    # ids; the codegen explain mode compiles the plan and reports the
    # subtree count directly
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    rep.codegen_stages = int(m.group(1)) if m else 0
    rep.has_python_eval = bool(re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas", text))

    # formatted explain prints one detail block per scan node
    for block in re.split(r"\n\n", text):
        if "Scan parquet" not in block or "Location:" not in block:
            continue
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        read = re.search(r"ReadSchema: struct<([^>]*)>", block)
        pushed = re.search(r"PushedFilters: (\[.*?\])\n", block, re.S)
        part = re.search(r"PartitionFilters: (\[.*?\])\n", block, re.S)
        cols = []
        if read:
            cols = [c.split(":")[0].strip() for c in read.group(1).split(",") if ":" in c]
        rep.scans.append(ScanInfo(
            location=loc.group(1) if loc else "",
            read_columns=cols,
            pushed_filters=_split_filters(pushed.group(1)) if pushed else [],
            partition_filters=_split_filters(part.group(1)) if part else [],
        ))
    return rep
