"""Per-domain lineage rollup — THE wide shuffle of the flagship pipeline
(SURVEY.md §2.6-new, §4.2).

Skew-safe by construction: heavy-hitter domains are pre-aggregated inside
``map_batches`` (one partial row per domain per batch), so the
``groupby("domain")`` shuffle moves at most ``n_batches x n_domains``
tiny rows, not every document row (ray_guide.md "Aggregation at scale").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

PARTIAL_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("n_docs", pa.int64()),
        ("n_valid", pa.int64()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
        ("sum_parse_ms", pa.float64()),
    ]
)


def partial_rollup_batch(batch: pa.Table) -> pa.Table:
    """One extracted batch -> per-domain partial aggregates (map-side
    combine). Pure pyarrow group_by — vectorized, no Python loop."""
    meta = batch["meta"]
    flat = pa.table(
        {
            "domain": batch["domain"],
            "one": pa.array([1] * len(batch), pa.int64()),
            "valid_i": pc.cast(batch["valid"], pa.int64()),
            "n_bytes_in": pc.struct_field(meta, "n_bytes_in"),
            "n_bytes_out": pc.struct_field(meta, "n_bytes_out"),
            "parse_ms": pc.struct_field(meta, "parse_ms"),
        }
    )
    grouped = flat.group_by("domain").aggregate(
        [
            ("one", "sum"),
            ("valid_i", "sum"),
            ("n_bytes_in", "sum"),
            ("n_bytes_out", "sum"),
            ("parse_ms", "sum"),
        ]
    )
    return grouped.rename_columns(
        ["domain", "n_docs", "n_valid", "n_bytes_in", "n_bytes_out", "sum_parse_ms"]
    ).cast(PARTIAL_SCHEMA)


def lineage_rollup(extracted_ds) -> "pa.Table":
    """extracted Dataset -> small per-domain lineage table (materialized —
    result cardinality is the domain count, safely tiny)."""
    partials = extracted_ds.map_batches(
        partial_rollup_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    final = partials.groupby("domain").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_valid", alias_name="n_valid"),
        Sum("n_bytes_in", alias_name="n_bytes_in"),
        Sum("n_bytes_out", alias_name="n_bytes_out"),
        Sum("sum_parse_ms", alias_name="sum_parse_ms"),
    )
    tbl = pa.Table.from_pandas(final.to_pandas(), preserve_index=False)
    mean_ms = pc.divide(
        pc.cast(tbl["sum_parse_ms"], pa.float64()),
        pc.cast(tbl["n_docs"], pa.float64()),
    )
    tbl = tbl.drop_columns(["sum_parse_ms"]).append_column("mean_parse_ms", mean_ms)
    return tbl.sort_by("domain")
