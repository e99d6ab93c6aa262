"""Benchmark decontamination — flag training docs that contain text
from an evaluation set.

The standard pre-training hygiene pass (GPT-3 App. C / PaLM / Llama all
document one): an n-gram probe is drawn from each benchmark item, and
any training doc containing a probe verbatim (after whitespace
normalization) is flagged.  The reference pipeline has no analog; this
is an engine extension for the training-data role.

Scale shape:

- The benchmark side is SMALL by definition (eval suites are KBs-MBs,
  not TBs), so its probes are collected once, ``ray.put`` once, and
  read by every actor — a classic broadcast lookup, never a shuffle.
- The corpus side is one stateless ``map_batches``: whitespace
  normalization and per-probe substring scan are all pyarrow kernels
  (``replace_substring_regex`` / ``count_substring``) — P vectorized
  passes per batch for P probes, no Python string loop.
- For probe sets beyond a few thousand, swap the per-probe scan for an
  Aho-Corasick automaton built in the actor's ``__init__`` (one pass
  per batch regardless of P) or an n-gram-hash ``Dataset.join``; the
  broadcast shape stays the same.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# probe geometry: 13-gram is the GPT-3 decontamination convention
PROBE_WORDS = 13


def _normalize(col):
    """Collapse runs of whitespace to single spaces and trim — the
    equivalence class under which probes are matched (DuckDB mirror:
    ``trim(regexp_replace(text, '\\s+', ' ', 'g'))``)."""
    return pc.utf8_trim(pc.replace_substring_regex(col, r"\s+", " "), " ")


def benchmark_probes(ds, *, text_col: str = "text", key_col: str = "doc_id",
                     select_mod: int = 97, select_rem: int = 3,
                     n_words: int = PROBE_WORDS) -> list[str]:
    """Extract the distinct leading-``n_words`` probes of the benchmark
    subset (rows where ``key % select_mod == select_rem`` with at least
    ``n_words`` words).  Distributed extraction, tiny collected result
    (the benchmark is small by definition — see module docstring)."""

    def probe_batch(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy()
        sel = batch.filter(pa.array(keys % select_mod == select_rem))
        if sel.num_rows == 0:
            return pa.table({"probe": pa.array([], pa.string())})
        words = pc.split_pattern_regex(_normalize(sel[text_col]), r"\s+")
        enough = pc.greater_equal(pc.list_value_length(words), n_words)
        first_n = pc.binary_join(
            pc.list_slice(pc.filter(words, enough), 0, n_words), " ")
        return pa.table({"probe": first_n})

    out = ds.map_batches(probe_batch, batch_format="pyarrow",
                         zero_copy_batch=True).take_all()
    return sorted({r["probe"] for r in out})


def mark_contamination(ds, probes: list[str], *, text_col: str = "text",
                       key_col: str = "doc_id"):
    """Per-doc count of distinct probes found verbatim in the
    normalized text.  Broadcast probes via ``ray.put``; one stateless
    vectorized pass over the corpus."""
    import ray as _ray

    probes_ref = _ray.put(list(probes))

    class Marker:
        def __init__(self):
            import ray as _r

            self.probes = _r.get(probes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            norm = _normalize(batch[text_col])
            hits = pa.nulls(len(batch), pa.int64()).fill_null(0)
            for p in self.probes:
                found = pc.greater(pc.count_substring(norm, p), 0)
                hits = pc.add(hits, pc.cast(found, pa.int64()))
            return pa.table({key_col: batch[key_col], "n_probes_hit": hits})

    return ds.map_batches(Marker, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))
