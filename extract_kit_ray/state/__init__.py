"""Checkpoint/manifest state for resumable partitioned output."""
