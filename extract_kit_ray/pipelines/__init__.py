"""End-to-end pipelines: flagship extraction, lineage rollups, resumable
partitioned output."""
