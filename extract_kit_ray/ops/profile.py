"""Table profiler — the ANALYZE primitive: per-column row/null counts,
EXACT distinct counts and min/max over any mix of int64 and string
columns, in one small table.  This is what a data platform runs before
planning work over an unknown 100 TB drop: skew screening (distinct
counts), null audits, and range discovery for partitioning choices.

Scale shape, two streaming passes over the input (the classic ANALYZE
trade — constant-size state per pass, nothing wide except the distinct
exchange which IS the product):

1. stats pass: each batch reduces to ONE tiny row per column
   ``(col, n, n_null, min/max partials)``; a groupby(col) over
   n_batches x n_cols rows folds them — min/max/sum are all
   tree-mergeable, so this is map-side combine end to end;
2. distinct pass: each batch emits its column-wise UNIQUE values as
   narrow ``(col, val)`` rows (per-batch dedup bounds the exchange by
   distinct-values-per-batch, not rows); ``groupby(col, val)`` then a
   per-col count gives exact n_distinct — the one unavoidable
   value-keyed shuffle, the same cost every exact ANALYZE pays.
   NULLs are excluded (SQL COUNT(DISTINCT) semantics).

Typed min/max: int columns report ``min_int/max_int`` (int64), string
columns ``min_str/max_str`` — never a lexicographic compare of
stringified numbers.  The driver-side assembly joins two
n_cols-bounded tables (annotated-collect convention).

The DuckDB oracle is a UNION ALL of one exact aggregate row per
column, hash-exact throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _check_cols(schema: pa.Schema, int_cols: list[str],
                str_cols: list[str]) -> None:
    for c in int_cols:
        if not pa.types.is_integer(schema.field(c).type):
            raise TypeError(f"profile_table: {c} is not an integer column")
    for c in str_cols:
        t = schema.field(c).type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise TypeError(f"profile_table: {c} is not a string column")


def profile_table(ds, *, int_cols: list[str],
                  str_cols: list[str]) -> pa.Table:
    """Dataset -> one row per column: (col_name, n_rows, n_nulls,
    n_distinct, min_int, max_int, min_str, max_str)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    int_cols, str_cols = list(int_cols), list(str_cols)
    all_cols = int_cols + str_cols
    if len(set(all_cols)) != len(all_cols):
        raise ValueError("duplicate column names")

    def stat_partials(batch: pa.Table) -> pa.Table:
        _check_cols(batch.schema, int_cols, str_cols)
        rows = {"col_name": [], "n": [], "n_null": [],
                "min_int": [], "max_int": [], "min_str": [], "max_str": []}
        for c in all_cols:
            col = batch[c]
            rows["col_name"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            if c in int_cols:
                rows["min_int"].append(pc.min(col).as_py())
                rows["max_int"].append(pc.max(col).as_py())
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                rows["min_int"].append(None)
                rows["max_int"].append(None)
                rows["min_str"].append(pc.min(col).as_py())
                rows["max_str"].append(pc.max(col).as_py())
        return pa.table({
            "col_name": pa.array(rows["col_name"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_int": pa.array(rows["min_int"], pa.int64()),
            "max_int": pa.array(rows["max_int"], pa.int64()),
            "min_str": pa.array(rows["min_str"], pa.string()),
            "max_str": pa.array(rows["max_str"], pa.string()),
        })

    stats = (ds.map_batches(stat_partials, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("col_name")
             .aggregate(Sum("n", alias_name="n_rows"),
                        Sum("n_null", alias_name="n_nulls"),
                        Min("min_int", alias_name="min_int"),
                        Max("max_int", alias_name="max_int"),
                        Min("min_str", alias_name="min_str"),
                        Max("max_str", alias_name="max_str")))

    def distinct_partials(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in all_cols:
            u = pc.unique(pc.drop_null(batch[c]))
            # render int values as digits: the (col, val) exchange is
            # distinct-COUNTING only, never compared for order
            v = (pc.cast(u, pa.string()) if c in int_cols else u)
            vals.append(v)
            cols.append(pa.array([c] * len(u), pa.string()))
        return pa.table({"col_name": pa.concat_arrays(cols),
                         "val": pa.concat_arrays(
                             [x.combine_chunks() if isinstance(
                                 x, pa.ChunkedArray) else x for x in vals])})

    distinct = (ds.map_batches(distinct_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["col_name", "val"]).count()
                .groupby("col_name").count())

    # both tables are n_cols-bounded: driver-side assembly is constant
    sdf = stats.to_pandas().set_index("col_name")
    ddf = distinct.to_pandas().set_index("col_name")
    out = {"col_name": all_cols}
    out["n_rows"] = [int(sdf.loc[c, "n_rows"]) for c in all_cols]
    out["n_nulls"] = [int(sdf.loc[c, "n_nulls"]) for c in all_cols]
    out["n_distinct"] = [int(ddf.loc[c, "count()"]) if c in ddf.index
                         else 0 for c in all_cols]

    def _cell(c, field, cast):
        v = sdf.loc[c, field]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return cast(v)  # pandas may widen nullable int64 to float

    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "min_int": pa.array([_cell(c, "min_int", int) for c in all_cols],
                            pa.int64()),
        "max_int": pa.array([_cell(c, "max_int", int) for c in all_cols],
                            pa.int64()),
        "min_str": pa.array([_cell(c, "min_str", str) for c in all_cols],
                            pa.string()),
        "max_str": pa.array([_cell(c, "max_str", str) for c in all_cols],
                            pa.string()),
    })


def oracle_profile_sql(rows_sql: str, *, int_cols: list[str],
                       str_cols: list[str]) -> str:
    """DuckDB mirror: one exact aggregate row per column, UNION ALL."""
    parts = []
    for c in list(int_cols) + list(str_cols):
        is_int = c in int_cols
        mn_i = f"CAST(MIN({c}) AS BIGINT)" if is_int else "CAST(NULL AS BIGINT)"
        mx_i = f"CAST(MAX({c}) AS BIGINT)" if is_int else "CAST(NULL AS BIGINT)"
        mn_s = "CAST(NULL AS VARCHAR)" if is_int else f"MIN({c})"
        mx_s = "CAST(NULL AS VARCHAR)" if is_int else f"MAX({c})"
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mn_i} AS min_int, {mx_i} AS max_int, "
            f"{mn_s} AS min_str, {mx_s} AS max_str FROM ({rows_sql})")
    return " UNION ALL ".join(parts)
