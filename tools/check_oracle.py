"""Local emulation of the driver's DuckDB-oracle correctness gate.

For each entry in ``__spark_entry__.queries()``: run the Spark query and
the oracle SQL at the given sf dir, then compare row count, column-name
set, and an order-insensitive value hash (columns sorted by name, rows
sorted, values normalized to strings). Reports exact-hash result plus an
approximate diff when the hash mismatches, so float-noise is
distinguishable from real bugs.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # canonical text form; repr of float64 is exact round-trip
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f").where(s.notna(), "NULL")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64").astype(str)
        else:
            df[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    n = _normalize(df)
    payload = "\x01".join("\x02".join(row) for row in n.itertuples(index=False, name=None))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as e
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    names = [n for n in qs if not only or n in only]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle sql raised")
            traceback.print_exc()
            failures.append(name)
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                ns, no = _normalize(sdf), _normalize(odf)
                diff_cols = [c for c in ns.columns if not ns[c].equals(no[c])]
                problems.append(f"value-hash mismatch; differing cols={diff_cols}")
                for c in diff_cols[:3]:
                    mask = ns[c] != no[c]
                    idx = mask[mask].index[:3]
                    for i in idx:
                        problems.append(f"  {c}[{i}]: spark={ns[c][i]!r} oracle={no[c][i]!r}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            failures.append(name)
        else:
            print(f"OK    {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
