"""Spark-native ranged Excel scan (SURVEY §2.1 S1/S4).

The reference reads rectangular ranges from xlsx workbooks
(``read_excel(file, range, col_names)``, Main.R:32-60,
Testing.R:23-28,224). Round 1 handled this with an offline converter
(tools/sw_convert.py); this module is the direct Spark source:

    read_excel_range(spark, "/data/drops/*.xlsx", "FRED", "A12:EQ707",
                     header=False, col_names=[...])

Physical shape: ``binaryFile`` source lists and reads the workbooks
(one row per file, Spark handles listing/locality), then an
Arrow-batched ``mapInPandas`` parses each workbook's requested range
with the stdlib zip+XML reader — no openpyxl/POI dependency. An xlsx
file is a zip and therefore NOT splittable: parallelism is one task
per workbook, which is the realistic 100 TB shape for spreadsheet
data (directories of per-period/per-entity drops, each small). A
single multi-GB workbook is a data-modeling problem, not a scan
problem — ``binaryFile`` caps files at spark.sql.sources
maxBytesPerTrigger-style limits long before that.

Cell semantics match tools/sw_convert.py (shared strings, inline
strings, numeric coercion); the range is A1-style and inclusive.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def col_to_idx(col: str) -> int:
    """Excel column letters → 0-based index (A→0, AA→26)."""
    i = 0
    for ch in col:
        i = i * 26 + (ord(ch) - 64)
    return i - 1


def idx_to_col(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def parse_range(cell_range: str) -> tuple[int, int, int, int]:
    """A1-style inclusive range → (row0, col0, row1, col1), 0-based."""
    m = re.fullmatch(r"([A-Z]+)(\d+):([A-Z]+)(\d+)", cell_range)
    if not m:
        raise ValueError(f"not an A1-style range: {cell_range!r}")
    return (
        int(m.group(2)) - 1,
        col_to_idx(m.group(1)),
        int(m.group(4)) - 1,
        col_to_idx(m.group(3)),
    )


def sheet_xml_path(z: zipfile.ZipFile, name: str) -> str:
    """Resolve a sheet name to its xml part via the workbook rels."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_R}Relationship")
    }
    for sh in wb.iter(f"{_M}sheet"):
        if sh.get("name") == name:
            return "xl/" + rid_to_target[sh.get(_RID)].lstrip("/")
    raise KeyError(name)


def load_cells(
    z: zipfile.ZipFile, sheet: str
) -> dict[tuple[int, int], object]:
    """All populated cells of a sheet as {(row, col): value} with
    shared/inline strings resolved and numerics as float."""
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_M}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_M}t")))
    root = ET.fromstring(z.read(sheet_xml_path(z, sheet)))
    cells: dict[tuple[int, int], object] = {}
    for c in root.iter(f"{_M}c"):
        m = re.match(r"([A-Z]+)(\d+)", c.get("r"))
        ci, ri = col_to_idx(m.group(1)), int(m.group(2)) - 1
        t = c.get("t")
        v = c.find(f"{_M}v")
        if v is None:
            is_el = c.find(f"{_M}is")
            if is_el is not None:
                cells[(ri, ci)] = "".join(
                    tt.text or "" for tt in is_el.iter(f"{_M}t")
                )
            continue
        if t == "s":
            cells[(ri, ci)] = shared[int(v.text)]
        elif t == "str":
            cells[(ri, ci)] = v.text
        else:
            try:
                cells[(ri, ci)] = float(v.text)
            except (TypeError, ValueError):
                cells[(ri, ci)] = v.text
    return cells


def read_excel_range(
    spark: SparkSession,
    path: str,
    sheet: str,
    cell_range: str,
    col_names: list[str] | None = None,
    header: bool = False,
    value_type: str = "double",
    with_source_file: bool = False,
) -> DataFrame:
    """Distributed ranged Excel scan → DataFrame.

    ``header=True`` takes column names from the range's first row
    (parsed once, driver-side, from the first listed file);
    ``col_names`` overrides. Without either, columns are named by
    their Excel letters. ``value_type`` 'double' coerces cells to
    numeric (non-numeric → NULL, matching readxl's behavior on
    #N/A-style literals); 'string' keeps cell text.
    """
    r0, c0, r1, c1 = parse_range(cell_range)
    ncols = c1 - c0 + 1
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    data_r0 = r0
    if header and col_names is None:
        first = files.select("path").orderBy("path").first()
        if first is None:
            raise FileNotFoundError(path)
        import urllib.parse

        local = urllib.parse.urlparse(first["path"]).path
        with zipfile.ZipFile(local) as z:
            cells = load_cells(z, sheet)
        col_names = [
            str(cells.get((r0, c0 + j), idx_to_col(c0 + j))) for j in range(ncols)
        ]
        data_r0 = r0 + 1
    if col_names is None:
        col_names = [idx_to_col(c0 + j) for j in range(ncols)]
    if len(col_names) != ncols:
        raise ValueError(
            f"{len(col_names)} col_names for a {ncols}-column range"
        )

    vtype = DoubleType() if value_type == "double" else StringType()
    fields = [StructField(n, vtype) for n in col_names]
    if with_source_file:
        fields = [StructField("_source_file", StringType()), *fields]
    schema = StructType(fields)
    want_double = value_type == "double"
    src_col = with_source_file
    rlo, rhi, clo = data_r0, r1, c0

    def parse(batches) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as z:
                    cells = load_cells(z, sheet)
                rows = []
                for ri in range(rlo, rhi + 1):
                    row = [cells.get((ri, clo + j)) for j in range(ncols)]
                    if src_col:
                        row = [fpath, *row]
                    rows.append(row)
                out = pd.DataFrame(
                    rows, columns=[f.name for f in schema.fields]
                )
                if want_double:
                    for n in col_names:
                        out[n] = pd.to_numeric(out[n], errors="coerce")
                else:
                    for n in col_names:
                        out[n] = out[n].map(
                            lambda v: None if v is None else str(v)
                        )
                yield out

    return files.mapInPandas(parse, schema)
