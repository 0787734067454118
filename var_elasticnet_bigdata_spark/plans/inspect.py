"""Physical-plan inspection helpers.

The 100 TB-readiness contract is checked on the PLAN, not just the
results: filters must reach the parquet scan (PushedFilters),
projections must narrow ReadSchema, dimension joins must broadcast,
and expression pipelines must fuse into WholeStageCodegen spans.
These helpers parse `.explain("formatted")` output so tests (and the
bench) can assert those properties instead of eyeballing them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (pruning evidence)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of fused codegen subtrees (codegen-mode explain — the
    formatted mode hides the markers under AQE until execution)."""
    text = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    if m:
        return int(m.group(1))
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))


def assert_scan_pruned(
    df: DataFrame, table_cols: int, max_read_cols: int
) -> None:
    """Raise if any scan reads more columns than expected — the
    '2-column projection reading all columns' failure mode."""
    schemas = read_schema_columns(df)
    if not schemas:
        raise AssertionError("no parquet scans found in plan")
    widest = max(len(s) for s in schemas)
    if widest > max_read_cols:
        raise AssertionError(
            f"scan reads {widest} columns (> {max_read_cols}) of {table_cols}: "
            f"column pruning failed; schemas={schemas}"
        )


def scan_ancestry(df: DataFrame, table_pattern: str) -> list[str]:
    """Plan-node descriptions on the path from the first scan whose
    line matches ``table_pattern`` (regex) UP to the plan root,
    nearest-first. Lets tests assert shuffle-elimination precisely:
    "no Exchange between the bucketed store scan and its join" rather
    than "no Exchange anywhere" (the other join side legitimately
    shuffles)."""
    text = df._jdf.queryExecution().executedPlan().toString()
    lines = text.splitlines()

    def marker(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else -1  # -1 = root depth

    target = None
    for i, ln in enumerate(lines):
        if re.search(table_pattern, ln):
            target = i
            break
    if target is None:
        raise AssertionError(
            f"no plan line matches {table_pattern!r}:\n{text}"
        )
    out: list[str] = []
    depth = marker(lines[target])
    for i in range(target - 1, -1, -1):
        d = marker(lines[i])
        if d < depth:
            body = lines[i][d + 3 :] if d >= 0 else lines[i]
            out.append(body.strip())
            depth = d
            if d == -1:
                break
    return out
