"""Local mimic of the driver's correctness gate: run every
``queries()[name](sf_dir)`` and compare row-count + sorted-column
value-hash against ``oracle_sql()[name]`` via DuckDB.

Usage: python tools/check_contract.py [sf_dir] [--only name1,name2]
Owns its Ray session (the real driver owns its own).
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def to_arrow(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)
    if isinstance(res, pa.Table):
        return res
    raise TypeError(type(res))


def value_hash(tbl) -> str:
    """Order-insensitive AND dtype-faithful: sort columns by name, sort
    rows by all columns, hash ``type(v).__name__:repr(v)`` per cell.

    Dtype-faithful matters: the driver's compare distinguishes e.g.
    DuckDB's ``sum(BIGINT)`` -> HUGEINT (pandas ``Decimal``) from the
    engine's int64 — round 1's CSV-stringified hash masked exactly that
    class of mismatch (9 hash-fails the local gate called green)."""

    tbl = tbl.select(sorted(tbl.column_names))
    df = tbl.to_pandas()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        for v in df[col].tolist():
            h.update(f"{type(v).__name__}:{v!r};".encode())
    return h.hexdigest()[:16]


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import warnings

    warnings.filterwarnings("ignore")
    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_arrow(fn(sf_dir))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {got.num_rows} rows ({dt:.1f}s) [rows-only]")
            if got.num_rows == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        want = con.execute(oracles[name]).arrow()
        ok_rows = got.num_rows == want.num_rows
        ok_schema = sorted(got.column_names) == sorted(want.column_names)
        gh, wh = value_hash(got), value_hash(want)
        status = "OK  " if (ok_rows and ok_schema and gh == wh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: rows {got.num_rows}/{want.num_rows} "
              f"schema={'ok' if ok_schema else sorted(got.column_names)} "
              f"hash {gh}/{wh} ({dt:.1f}s)")

    # entry() smoke
    if only is None:
        res = e.entry()
        tbl = to_arrow(res)
        print(f"entry(): {tbl.num_rows} rows, schema {tbl.schema.names}")
    ray.shutdown()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0] if args else "/root/testdata/sf0.01", only))
