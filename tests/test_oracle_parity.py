"""Local replica of the driver's t2 correctness gate: every query in
``__spark_entry__.queries()`` runs on Spark and (where an oracle exists)
in DuckDB; row counts, column names, and values must match.

Value comparison: columns sorted by name, rows sorted by all columns,
floats compared EXACTLY — the driver's gate value-hashes results, so a
last-ulp float divergence or an int64-vs-float64 dtype artifact that a
tolerance would forgive IS a driver hash-fail (r1 lost q12 and
events_json_extract to exactly that). Queries must therefore produce
bit-identical numerics on both engines (exact-cents sums, mirrored
formula trees, BIGINT casts in oracles).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_oracle, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_frames_equal(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) vs {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        fa, fb = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        assert fa == fb, (
            f"{name}.{col}: dtype kind mismatch {av.dtype} (spark) vs {bv.dtype} "
            f"(duckdb) — the driver value-hash distinguishes int from float "
            f"(r1 q12 class); CAST the oracle side"
        )
        if fa or fb:
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x) and not pd.isna(y) and float(x) == float(y)
                )
                assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r} (exact compare)"
        else:
            mismatch = av.astype(str) != bv.astype(str)
            if mismatch.any():
                i = int(mismatch.idxmax())
                raise AssertionError(f"{name}.{col}[{i}]: {av[i]!r} != {bv[i]!r}")


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_against_oracle(name, spark, sf_oracle, duck):
    result = _QUERIES[name](spark, sf_oracle)
    spark_pdf = result.toPandas()
    if name not in _ORACLES:
        # rows-only contract: must run and have a stable schema
        assert spark_pdf is not None
        assert len(result.columns) > 0
        return
    duck_pdf = duck.execute(_ORACLES[name]).df()
    _assert_frames_equal(spark_pdf, duck_pdf, name)
