"""Local stand-in for the driver's correctness gate: run every queries()
entry with an oracle_sql() against DuckDB on the same sf dir and compare
row count, schema (column names), and exact values after sorting columns by
name and rows by all columns.  Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, eng: pd.DataFrame, ora: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(eng.columns) != sorted(ora.columns):
        problems.append(f"columns differ: {sorted(eng.columns)} vs {sorted(ora.columns)}")
        return problems
    if len(eng) != len(ora):
        problems.append(f"row count {len(eng)} vs {len(ora)}")
    e, o = canon(eng), canon(ora)
    if len(e) == len(o):
        for c in e.columns:
            ec, oc = e[c], o[c]
            if np.issubdtype(ec.dtype, np.floating) or np.issubdtype(oc.dtype, np.floating):
                a = ec.astype(float).to_numpy()
                b = oc.astype(float).to_numpy()
                if not np.array_equal(a, b):
                    mx = np.max(np.abs(a - b)) if len(a) else 0
                    problems.append(f"float col {c}: max abs diff {mx:.3e}")
            else:
                if not ec.astype(str).equals(oc.astype(str)):
                    bad = (ec.astype(str) != oc.astype(str)).sum()
                    problems.append(f"col {c}: {bad} mismatched values")
    # dtype note (driver may compare schemas more strictly)
    for c in sorted(eng.columns):
        if str(eng[c].dtype) != str(ora[c].dtype):
            problems.append(f"dtype note {c}: engine {eng[c].dtype} vs oracle {ora[c].dtype}")
    return problems


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = 0
    names = [n for n in (only or list(oracles)) if n in oracles]
    for name in names:
        if name not in qs:
            print(f"[MISS] {name}: no queries() entry", flush=True)
            failed += 1
            continue
        try:
            eng = to_pandas(qs[name](sf_dir))
            ora = con.execute(oracles[name]).fetchdf()
            problems = compare(name, eng, ora)
            hard = [p for p in problems if not p.startswith("dtype note")]
            if hard:
                failed += 1
                print(f"[FAIL] {name}: " + "; ".join(problems), flush=True)
            else:
                extra = "; ".join(p for p in problems if p.startswith("dtype note"))
                print(f"[ OK ] {name} rows={len(eng)}" + (f"  ({extra})" if extra else ""), flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"[ERR ] {name}: {type(e).__name__}: {e}", flush=True)
    # rows-only entries: just execute
    for name in qs:
        if name in oracles:
            continue
        if only and name not in only:
            continue
        try:
            eng = to_pandas(qs[name](sf_dir))
            print(f"[ROWS] {name} rows={len(eng)}", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"[ERR ] {name}: {type(e).__name__}: {e}", flush=True)
    print("FAILED" if failed else "ALL OK", failed, flush=True)
    return failed


def main_window(sf_dir: str, n: int = 50) -> int:
    """Driver-window regression guard: check exactly the FIRST ``n``
    queries() entries (the slice the driver records in
    CORRECTNESS_r{N}.json) and fail if any oracle-backed query inside the
    window is not value-exact — so a battery reorder can never silently
    push a failing query out of driver sight.  Rows-only entries inside the
    window must merely execute."""
    import importlib

    entrymod = importlib.import_module("__ray_entry__")
    window = list(entrymod.queries())[:n]
    return main(sf_dir, window)


if __name__ == "__main__":
    args = sys.argv[1:]
    win = None
    if "--window" in args:
        i = args.index("--window")
        # only consume the next token as N when it IS an integer — otherwise
        # `--window <sf_dir>` keeps the default 50 and the sf dir survives
        if i + 1 < len(args) and args[i + 1].lstrip("-").isdigit():
            win = int(args[i + 1])
            args = args[:i] + args[i + 2 :]
        else:
            win = 50
            args = args[:i] + args[i + 1 :]
    sf = args[0] if args else "/root/testdata/sf0.001"
    if win is not None:
        raise SystemExit(main_window(sf, win))
    extra = [n for a in args[1:] for n in a.split(",")]
    raise SystemExit(main(sf, extra or None))
