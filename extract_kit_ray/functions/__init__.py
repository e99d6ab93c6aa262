"""Pure, deterministic per-batch kernels. No Ray imports in this subpackage."""
