"""Local correctness sweep: run every registry query AND its DuckDB
oracle at a small scale factor, compare rows / schema / values the way
the driver does (columns sorted by name, rows sorted by all columns,
exact value equality with a float tolerance fallback reported
separately).

Usage:  python scripts/correctness_sweep.py [sf_dir] [query ...]

Owns its Ray session (script entry point, not library code).
"""

from __future__ import annotations

import json
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def _normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(mine, orc):
    import numpy as np

    out = {"rows_match": len(mine) == len(orc), "schema_match": None, "hash_match": None}
    # key names mirror the driver's CORRECTNESS_r{N}.json fields verbatim
    # ("spark_rows" is the driver's label for the engine-under-test side)
    # so the two reports diff cleanly
    out["spark_rows"], out["oracle_rows"] = len(mine), len(orc)
    mine, orc = _normalize(mine), _normalize(orc)
    out["schema_match"] = list(mine.columns) == list(orc.columns)
    if not (out["rows_match"] and out["schema_match"]):
        return out
    exact = True
    close = True
    for c in mine.columns:
        a, b = mine[c], orc[c]
        # a numeric-kind mismatch (int column vs the oracle's DOUBLE or
        # vice versa) is a real defect even when values compare equal —
        # the driver's value hash is dtype-sensitive
        if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= {"i", "u", "f"}:
            out.setdefault("dtype_mismatch", {})[c] = f"{a.dtype} vs {b.dtype}"
            exact = False
            continue
        try:
            col_eq = bool((a.values == b.values).all() or a.equals(b.astype(a.dtype)))
        except (TypeError, ValueError):
            col_eq = bool(a.astype(str).equals(b.astype(str)))
        if not col_eq:
            exact = False
            try:
                if not np.allclose(
                    a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True
                ):
                    close = False
            except (TypeError, ValueError):
                close = False
    out["hash_match"] = exact
    if not exact and close:
        out["allclose"] = True
    return out


def main():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __ray_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs, sql = e.queries(), e.oracle_sql()
    names = sys.argv[2:] or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    results, n_green, n_blind, n_fail = {}, 0, 0, 0
    for name in names:
        try:
            mine = _to_pandas(qs[name](sf))
            if name not in sql:
                results[name] = {"spark_rows": len(mine), "err": "no_oracle"}
                n_blind += 1
                print(f"{name:40s} rows={len(mine):7d}  NO_ORACLE", file=sys.stderr)
                continue
            orc = con.execute(sql[name]).df()
            r = compare(mine, orc)
            results[name] = r
            ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
            n_green += bool(ok)
            n_fail += not ok
            print(
                f"{name:40s} rows={r['spark_rows']:7d}/{r['oracle_rows']:<7d} "
                f"{'GREEN' if ok else 'FAIL ' + json.dumps(r)}",
                file=sys.stderr,
            )
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            results[name] = {"err": repr(ex)[:500]}
            n_fail += 1
            print(f"{name:40s} ERROR {ex!r}", file=sys.stderr)
    print(json.dumps({"green": n_green, "no_oracle": n_blind, "fail": n_fail, "results": results}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
