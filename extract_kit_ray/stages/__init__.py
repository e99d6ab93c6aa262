"""Ray Data stage wrappers: callable classes for actor pools and
vectorized per-batch functions. Everything here is Arrow-in/Arrow-out
(``batch_format="pyarrow"``)."""
