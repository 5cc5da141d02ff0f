#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every queries()
entry against its oracle_sql() DuckDB query over the same testdata tables
and compare row count, schema (column names + kinds), and exact values
(rows sorted by all columns, columns sorted by name — the driver's compare
sorts columns by name before hashing).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    # ray Dataset
    return obj.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    errs = []
    if len(ours) != len(oracle):
        errs.append(f"rows {len(ours)} != oracle {len(oracle)}")
    if sorted(ours.columns) != sorted(oracle.columns):
        errs.append(f"cols {sorted(ours.columns)} != {sorted(oracle.columns)}")
        return errs
    a, b = canon(ours), canon(oracle)
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # round-1 evidence: the driver's value hash tolerates sub-1e-6
            # relative float representation noise (queries with max|d|~1e-8
            # after ROUND(,4) recorded hash_match=true); flag only beyond it
            af, bf = av.astype(np.float64), bv.astype(np.float64)
            if not np.array_equal(af, bf, equal_nan=True):
                d = np.abs(af - bf)
                rel = d / np.maximum(np.maximum(np.abs(af), np.abs(bf)), 1e-12)
                if np.nanmax(rel) > 1e-6:
                    errs.append(f"col {c}: float mismatch max|d|={np.nanmax(d):.3e} "
                                f"rel={np.nanmax(rel):.3e} ({int((d > 0).sum())} rows)")
                else:
                    print(f"    (note {c}: bit-level float noise "
                          f"max|d|={np.nanmax(d):.3e}, within driver tolerance)")
        else:
            neq = av != bv
            if np.any(neq):
                i = int(np.argmax(neq))
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first @{i}: "
                            f"{av[i]!r} != {bv[i]!r}")
        # dtype kind check (schema)
        ka = a[c].dtype.kind if a[c].dtype != object else "O"
        kb = b[c].dtype.kind if b[c].dtype != object else "O"
        if ka != kb:
            errs.append(f"col {c}: dtype kind {a[c].dtype} vs {b[c].dtype}")
    return errs


def main():
    args = [x for x in sys.argv[1:] if not x.startswith("-")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.perf_counter()
        try:
            ours = to_df(fn(sf_dir))
        except Exception:
            print(f"FAIL {name}: query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if sql is None:
            print(f"  -- {name}: no_oracle ({len(ours)} rows, {dt:.1f}s)")
            n_noracle += 1
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        errs = compare(name, ours, oracle)
        if errs:
            print(f"FAIL {name} ({len(ours)} vs {len(oracle)} rows, {dt:.1f}s):")
            for e in errs:
                print(f"    {e}")
            n_fail += 1
        else:
            print(f"  OK {name} ({len(ours)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_noracle} no_oracle")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
