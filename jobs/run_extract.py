"""Cluster job entrypoint: the flagship extraction as a `ray job submit`
payload (north rule: "run via ray job submit on a fixed-size multi-node
Ray cluster").

Usage (from any node with the cluster address configured):

    ray job submit --working-dir . -- \\
        python jobs/run_extract.py --input /data/pages --output /data/out \\
        --n-parts 4096

    # resume after a failure: same command — finished partitions are
    # skipped via their manifests, unmanifested partials are cleaned

Design notes for the cluster run:
- ``ray.init(address="auto")`` joins the running cluster (the driver
  brief's single-node sandbox uses address="local"; this entrypoint is
  the only place that decides).
- ``--n-parts`` sizes output partitions AND resume granularity: aim for
  ~1 GB of extracted text per part (100 TB input => O(10^5) parts).
- The pipeline streams: column-pruned parquet read -> oversize router ->
  extractor actor pool (sized cluster-wide by Ray; override with
  EKRAY_EXTRACT_WORKERS) -> per-part write-then-commit with manifests.
  Nothing corpus-sized ever materializes on the driver.
- Per-domain lineage rollup (small result) lands next to the output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir (shared storage)")
    ap.add_argument("--n-parts", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--no-boilerplate-strip", action="store_true")
    ap.add_argument("--lineage", action="store_true",
                    help="also write the per-domain lineage rollup")
    ap.add_argument("--address", default=os.environ.get("RAY_ADDRESS", "auto"),
                    help='"auto" on a cluster; "local" for single-node runs')
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=args.address)

    from extract_kit_ray.pipelines.resume import run_partitioned_extract

    t0 = time.perf_counter()
    stats = run_partitioned_extract(
        args.input,
        args.output,
        n_parts=args.n_parts,
        strip_boilerplate=not args.no_boilerplate_strip,
        batch_size=args.batch_size,
    )
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)

    if args.lineage:
        from extract_kit_ray.pipelines.flagship import extract_pages, read_pages
        from extract_kit_ray.pipelines.lineage import lineage_rollup

        import pyarrow.parquet as pq

        tbl = lineage_rollup(
            extract_pages(read_pages(args.input),
                          strip_boilerplate=not args.no_boilerplate_strip,
                          batch_size=args.batch_size)
        )
        pq.write_table(tbl, os.path.join(args.output, "_lineage.parquet"))
        stats["lineage_domains"] = tbl.num_rows

    print(json.dumps(stats, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
