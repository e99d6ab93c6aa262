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
- For probe sets beyond a few thousand (``ac_threshold``), the
  per-probe scan switches to an Aho-Corasick automaton built ONCE in
  the actor's ``__init__``: one pass over each doc regardless of P,
  counting DISTINCT probes hit — the same output contract as the
  vectorized path (differential-tested).  The per-probe RE2 scan is
  O(P) C-speed passes per batch; the automaton is one interpreter-
  speed pass — the crossover sits around a couple thousand probes,
  and at P = 10^5 (a full eval-suite sweep) the automaton is the only
  shape that terminates.  The broadcast shape stays the same.
"""

from __future__ import annotations

from collections import deque

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


class AhoCorasick:
    """Multi-pattern substring matcher (Aho & Corasick 1975, the
    classic CACM construction): trie + BFS failure links, outputs
    merged through the links so every state knows all patterns ending
    at it.  Build once (O(total pattern chars)); search is one pass
    per text, independent of pattern count."""

    def __init__(self, patterns: list[str]):
        goto: list[dict[str, int]] = [{}]
        out: list[tuple[int, ...]] = [()]
        for pid, pat in enumerate(patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append(())
                s = nxt
            out[s] = out[s] + (pid,)
        fail = [0] * len(goto)
        q = deque(goto[0].values())
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                nf = goto[f].get(ch, 0)
                fail[s] = nf if nf != s else 0
                if out[fail[s]]:
                    out[s] = out[s] + out[fail[s]]
        self.goto, self.fail, self.out = goto, fail, out

    def count_distinct(self, text: str) -> int:
        """Number of DISTINCT patterns occurring in ``text``."""
        goto, fail, out = self.goto, self.fail, self.out
        s = 0
        hit: set[int] = set()
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                hit.update(out[s])
        return len(hit)


# probe-count crossover: below it, P C-speed RE2 passes plus zero
# build cost beat the automaton; above it, the automaton wins and is
# the only shape whose scan cost is independent of P.  Measured on the
# fixture corpus (2k docs): P=1000 -> re2 0.45s vs ac 0.12s build +
# 0.02s scan; P=10000 -> re2 1.74s vs 0.57s + 0.04s (scan ~flat in P).
AC_THRESHOLD = 500


def mark_contamination(ds, probes: list[str], *, text_col: str = "text",
                       key_col: str = "doc_id",
                       ac_threshold: int = AC_THRESHOLD):
    """Per-doc count of distinct probes found verbatim in the
    normalized text.  Broadcast probes via ``ray.put``; one stateless
    pass over the corpus — per-probe vectorized RE2 scan below
    ``ac_threshold`` probes, Aho-Corasick automaton (built once per
    actor in ``__init__``) above it.  Both paths produce identical
    output (differential-tested)."""
    import ray as _ray

    probes_ref = _ray.put(list(probes))

    class Marker:
        def __init__(self):
            import ray as _r

            self.probes = _r.get(probes_ref)
            self.automaton = (AhoCorasick(self.probes)
                              if len(self.probes) > ac_threshold else None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            norm = _normalize(batch[text_col])
            if self.automaton is not None:
                ac = self.automaton
                hits = pa.array(
                    [ac.count_distinct(t or "") for t in norm.to_pylist()],
                    pa.int64())
            else:
                hits = pa.nulls(len(batch), pa.int64()).fill_null(0)
                for p in self.probes:
                    found = pc.greater(pc.count_substring(norm, p), 0)
                    hits = pc.add(hits, pc.cast(found, pa.int64()))
            return pa.table({key_col: batch[key_col], "n_probes_hit": hits})

    return ds.map_batches(Marker, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))
