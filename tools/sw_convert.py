"""Convert the reference workbook SW_Updated.xlsx to parquet using
only stdlib (zipfile + XML) — openpyxl is not in this environment.

Extracted per the reference's ranges (Main.R:32-60):
- FRED!A1:EQ1            → 147 column names (first is the date col)
- 'Monthly Data'!A12:EQ707 → 696 rows × 147 cols (date serial + 146 series)
- 'US GDP'!A56:B287      → 232 quarterly rows (date, GDP level)
- FRED!DK1:EB1, ED1:EP1, CW1:DA1 → currency-unit series name lists

Output: /tmp/sw_converted/{monthly.parquet, gdp.parquet, meta.json}.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
XLSX = "/root/reference/SW_Updated.xlsx"
OUT = "/tmp/sw_converted"


def col_to_idx(col: str) -> int:
    i = 0
    for ch in col:
        i = i * 26 + (ord(ch) - 64)
    return i - 1


def load_sheet(z: zipfile.ZipFile, path: str) -> dict[tuple[int, int], object]:
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(
                "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
    root = ET.fromstring(z.read(path))
    cells: dict[tuple[int, int], object] = {}
    for c in root.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}c"):
        ref = c.get("r")
        m = re.match(r"([A-Z]+)(\d+)", ref)
        ci, ri = col_to_idx(m.group(1)), int(m.group(2)) - 1
        t = c.get("t")
        v = c.find("m:v", NS)
        if v is None:
            is_el = c.find("m:is", NS)
            if is_el is not None:
                cells[(ri, ci)] = "".join(
                    tt.text or "" for tt in is_el.iter(
                        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")
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


def sheet_path(z: zipfile.ZipFile, name: str) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target")
        for r in rels.iter("{http://schemas.openxmlformats.org/package/2006/relationships}Relationship")
    }
    for sh in wb.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}sheet"):
        if sh.get("name") == name:
            rid = sh.get("{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id")
            target = rid_to_target[rid]
            return "xl/" + target.lstrip("/")
    raise KeyError(name)


def excel_serial_to_date(serial: float) -> dt.date:
    return dt.date(1899, 12, 30) + dt.timedelta(days=int(serial))


def convert(out_dir: str = OUT) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    z = zipfile.ZipFile(XLSX)
    fred = load_sheet(z, sheet_path(z, "FRED"))
    monthly = load_sheet(z, sheet_path(z, "Monthly Data"))
    gdp = load_sheet(z, sheet_path(z, "US GDP"))

    # FRED!A1:EQ1 → names
    names = [fred.get((0, ci)) for ci in range(col_to_idx("A"), col_to_idx("EQ") + 1)]
    # currency ranges (Main.R:58-60)
    def rng(a, b):
        return [fred.get((0, ci)) for ci in range(col_to_idx(a), col_to_idx(b) + 1)]

    currency = [n for n in rng("DK", "EB") + rng("ED", "EP") + rng("CW", "DA") if n]
    # Testing.R:63 uses only the first two ranges (no CW1:DA1)
    currency_2ranges = [n for n in rng("DK", "EB") + rng("ED", "EP") if n]

    # readxl name repair: duplicate mnemonics get '...{1-based pos}'
    seen: dict[str, int] = {}
    repaired = []
    counts: dict[str, int] = {}
    for n in names:
        counts[n] = counts.get(n, 0) + 1
    for pos, n in enumerate(names, start=1):
        if counts[n] > 1:
            repaired.append(f"{n}...{pos}")
        else:
            repaired.append(n)
    names = repaired

    # 'Monthly Data'!A12:EQ707 (0-based rows 11..706)
    rows = []
    for ri in range(11, 707):
        rows.append([monthly.get((ri, ci)) for ci in range(147)])
    mdf = pd.DataFrame(rows, columns=names)
    date_col = names[0]
    mdf["obs_date"] = [
        excel_serial_to_date(s) if s is not None else None for s in mdf[date_col]
    ]
    mdf = mdf.drop(columns=[date_col])
    series_cols = [c for c in mdf.columns if c != "obs_date"]
    # '#N/A' and similar error literals → NaN (ragged series starts);
    # positional loop — duplicate mnemonics would break label indexing
    for i in range(mdf.shape[1]):
        if mdf.columns[i] == "obs_date":
            continue
        mdf.isetitem(i, pd.to_numeric(mdf.iloc[:, i], errors="coerce"))

    # 'US GDP'!A56:B287 (0-based rows 55..286): quarterly from 1959Q1
    grows = []
    for ri in range(55, 287):
        grows.append((gdp.get((ri, 0)), gdp.get((ri, 1))))
    q0 = pd.Period("1959Q1")
    gdf = pd.DataFrame(
        {
            "obs_date": [
                (q0 + i).start_time.date() for i in range(len(grows))
            ],
            "gdp": [float(v) for _, v in grows],
        }
    )

    mdf.to_parquet(f"{out_dir}/monthly.parquet", index=False)
    gdf.to_parquet(f"{out_dir}/gdp.parquet", index=False)
    meta = {"currency_series": currency,
            "currency_series_2ranges": currency_2ranges,
            "n_series": len(series_cols),
            "n_months": len(mdf), "n_gdp": len(gdf)}
    with open(f"{out_dir}/meta.json", "w") as f:
        json.dump(meta, f)
    return meta


if __name__ == "__main__":
    print(convert())
