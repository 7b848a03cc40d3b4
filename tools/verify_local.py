"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir, runs the DuckDB
oracle twin, and compares row-count + column set + order-insensitive
values (exact for non-floats, exact-then-tolerance report for
floats). Strictly harsher than the driver on floats: we demand
bitwise equality first and report max-abs-diff when it fails, so any
FAIL here is a real risk.

Usage: python tools/verify_local.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # lists/arrays → tuples so they sort & compare
            s = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        out[c] = s
    df = pd.DataFrame(out)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.iloc[
            df.astype(str).apply(tuple, axis=1).argsort(kind="mergesort")
        ].reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return False, f"row count differs: spark={len(sdf)} duck={len(ddf)}"
    a, b = normalize(sdf), normalize(ddf)
    msgs = []
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                ok = False
                diff = np.nanmax(np.abs(av - bv))
                msgs.append(f"col {c}: {int((~eq).sum())} rows differ, maxabs={diff:.3e}")
        else:
            av_s = pd.Series(av)
            bv_s = pd.Series(bv)
            eq = (av_s == bv_s) | (av_s.isna() & bv_s.isna())
            if not eq.all():
                ok = False
                i = int(np.argmax(~eq.to_numpy()))
                msgs.append(
                    f"col {c}: {int((~eq).sum())} rows differ, first at {i}: "
                    f"spark={av_s.iloc[i]!r} duck={bv_s.iloc[i]!r}"
                )
    return ok, "; ".join(msgs) if msgs else "ok"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--master",
        default=os.environ.get("SPARK_GRAFT_MASTER"),
        help="Spark master override, e.g. local-cluster[2,4,4096] to "
        "run the gate on real separate executor JVMs (surfaces "
        "closure-serialization/broadcast bugs local[N] hides)",
    )
    ap.add_argument(
        "--first",
        type=int,
        default=None,
        help="verify only the first N registry entries (the driver's "
        "CORRECTNESS window is a registry prefix)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from pdf2dataset_spark.session import get_spark

    spark = get_spark("verify-local", master=args.master)
    qs, oq = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{args.sf}/{tname}.parquet')"
        )

    names = args.names or list(qs)
    if args.first is not None:
        names = names[: args.first]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oq:
            print(f"ROWS  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oq[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, ddf)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status}  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) {msg if not ok else ''}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
