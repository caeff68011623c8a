"""Run the driver-style Spark-vs-DuckDB parity check for a subset of
queries: ``python scripts/parity_subset.py name1 name2 ...`` (default
sf dir from $PARITY_SF_DIR or /root/testdata/sf0.01).

Reuses the exact comparison discipline of tests/test_oracle_parity.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"rows {len(spark_pdf)} vs {len(duck_pdf)}"]
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"cols {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"]
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        fa, fb = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        if fa != fb:
            errs.append(f"{col}: dtype kind {av.dtype} vs {bv.dtype}")
            continue
        if fa:
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x) and not pd.isna(y) and float(x) == float(y)
                )
                if not ok:
                    errs.append(f"{col}[{i}]: {x!r} != {y!r}")
                    break
        else:
            mm = av.astype(str) != bv.astype(str)
            if mm.any():
                i = int(mm.idxmax())
                errs.append(f"{col}[{i}]: {av[i]!r} != {bv[i]!r}")
    return errs


def main() -> int:
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if not names:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    from medical_examination_data_etl_system_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            rc = 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            rc = 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            rc = 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
