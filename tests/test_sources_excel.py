"""Spark-native ranged Excel scan (S1): distributed binaryFile +
mapInPandas parse, checked against hand-built workbooks and the
actual reference workbook's ranges."""

from __future__ import annotations

import os
import zipfile

import pytest


def write_xlsx(path: str, sheet: str, cells: dict[tuple[int, int], object]):
    """Minimal OOXML workbook writer (stdlib only) for fixtures."""
    from var_elasticnet_bigdata_spark.sources.excel import idx_to_col

    rows: dict[int, list[tuple[int, object]]] = {}
    for (r, c), v in sorted(cells.items()):
        rows.setdefault(r, []).append((c, v))
    body = []
    for r in sorted(rows):
        cs = []
        for c, v in rows[r]:
            ref = f"{idx_to_col(c)}{r + 1}"
            if isinstance(v, str):
                cs.append(f'<c r="{ref}" t="str"><v>{v}</v></c>')
            else:
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f'<row r="{r + 1}">{"".join(cs)}</row>')
    sheet_xml = (
        '<?xml version="1.0"?><worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets><sheet name="{sheet}" sheetId="1" '
        'r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    ct = (
        '<?xml version="1.0"?><Types xmlns='
        '"http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def test_ranged_scan_values_and_header(spark, tmp_path):
    from var_elasticnet_bigdata_spark.sources.excel import read_excel_range

    cells = {(0, 0): "date", (0, 1): "alpha", (0, 2): "beta"}
    for r in range(1, 5):
        cells[(r, 0)] = 100.0 + r
        cells[(r, 1)] = r * 1.5
        cells[(r, 2)] = "#N/A" if r == 2 else r * 2.0
    p = str(tmp_path / "one.xlsx")
    write_xlsx(p, "Data", cells)

    df = read_excel_range(spark, p, "Data", "A1:C5", header=True)
    assert df.columns == ["date", "alpha", "beta"]
    rows = {int(r["date"]): r for r in df.collect()}
    assert len(rows) == 4
    assert rows[102]["beta"] is None  # '#N/A' coerces to NULL
    assert rows[103]["alpha"] == pytest.approx(4.5)

    # string mode keeps cell text; letter names without header
    ds = read_excel_range(
        spark, p, "Data", "B2:C3", value_type="string"
    )
    assert ds.columns == ["B", "C"]
    vals = {(r["B"], r["C"]) for r in ds.collect()}
    assert ("3.0", "#N/A") in vals


def test_multi_workbook_distribution(spark, tmp_path):
    from var_elasticnet_bigdata_spark.sources.excel import read_excel_range

    for f in range(3):
        cells = {(0, 0): float(f), (1, 0): float(10 + f)}
        write_xlsx(str(tmp_path / f"wb{f}.xlsx"), "S", cells)
    df = read_excel_range(
        spark, str(tmp_path / "*.xlsx"), "S", "A1:A2",
        col_names=["v"], with_source_file=True,
    )
    pdf = df.toPandas()
    assert pdf["_source_file"].nunique() == 3
    assert sorted(pdf["v"]) == [0.0, 1.0, 2.0, 10.0, 11.0, 12.0]


def test_reads_reference_workbook_ranges(spark):
    """Parity with the reference's own reads (Main.R:32,36): the
    FRED header range and a slice of the Monthly Data block."""
    ref = "/root/reference/SW_Updated.xlsx"
    if not os.path.exists(ref):
        pytest.skip("reference workbook not present")
    from var_elasticnet_bigdata_spark.sources.excel import read_excel_range

    hdr = read_excel_range(
        spark, ref, "FRED", "A1:EQ1", value_type="string"
    )
    row = hdr.collect()[0]
    assert len(hdr.columns) == 147
    assert row["A"] == "1date"

    block = read_excel_range(
        spark, ref, "Monthly Data", "A12:C14",
        col_names=["serial", "s1", "s2"],
    )
    vals = block.collect()
    assert len(vals) == 3
    assert all(v["serial"] is not None for v in vals)
