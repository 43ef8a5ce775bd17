#!/usr/bin/env python3
"""One-time Excel-dimension preconversion (SURVEY.md S12 disposition).

Spark core ships no Excel reader, so Excel dimension workbooks (the
reference's `scripts/dim_region_manual.xlsx`, service-type sheets in
`scripts/ads_ridership_passenger_trips_di...py:19`) are converted once
to CSV at deployment time and then read through
`graft.io.Sinks.readCsvWithSidecar` like any other dim.

Usage: python3 scripts/convert_excel_dims.py <in.xlsx> <out.csv> [sheet]
Requires pandas+openpyxl (deployment-side tooling, not part of the
Spark library).
"""
import sys

import pandas as pd


def main(xlsx: str, out_csv: str, sheet: str | int = 0) -> None:
    df = pd.read_excel(xlsx, sheet_name=sheet)
    df.to_csv(out_csv, index=False)
    print(f"{xlsx}[{sheet}] -> {out_csv}: {len(df)} rows, {len(df.columns)} cols")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else 0)
