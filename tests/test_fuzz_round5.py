"""Property fuzz for round-5 late ops — pure references, no Ray:
the engine sides are oracle-compared elsewhere; these pin the SHARED
semantics (oracle SQL / pure kernels) against brute-force models, so
an engine+oracle pair can't be consistently wrong together."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_kit_ray.ops.funnel import oracle_funnel_sql
from extract_kit_ray.ops.zorder import morton_key


@given(st.lists(st.tuples(st.integers(0, (1 << 31) - 1),
                          st.integers(0, (1 << 31) - 1)),
                min_size=1, max_size=50),
       st.integers(1, 31))
@settings(max_examples=100, deadline=None)
def test_morton_matches_per_bit_reference(pairs, bits):
    xs = np.array([p[0] for p in pairs], dtype=np.int64)
    ys = np.array([p[1] for p in pairs], dtype=np.int64)
    got = morton_key(xs, ys, bits=bits)
    for x, y, z in zip(xs, ys, got):
        ref = 0
        for i in range(bits):
            ref |= ((int(x) >> i) & 1) << (2 * i)
            ref |= ((int(y) >> i) & 1) << (2 * i + 1)
        assert int(z) == ref


def _brute_funnel(events, steps):
    """Greedy earliest-completion subsequence matcher per user."""
    out = {}
    for u in {e[0] for e in events}:
        evs = sorted((t, ty) for uu, t, ty in events if uu == u)
        t_prev, depth = -1, 0
        for step in steps:
            cands = [t for t, ty in evs if ty == step and t > t_prev]
            if not cands:
                break
            t_prev = min(cands)
            depth += 1
        out[u] = depth
    return out


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30),
                          st.sampled_from(["a", "b", "c", "x"])),
                min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_funnel_oracle_matches_brute(events):
    steps = ["a", "b", "c"]
    df = pd.DataFrame({
        "user_id": [e[0] for e in events],
        "ts": pd.to_datetime([e[1] for e in events], unit="s"),
        "event_type": [e[2] for e in events],
    })
    con = duckdb.connect()
    con.register("ev_src", df)
    got = {int(u): int(s) for u, s in con.execute(
        oracle_funnel_sql("SELECT * FROM ev_src", steps)).fetchall()}
    want = _brute_funnel(
        [(e[0], e[1] * 1_000_000, e[2]) for e in events], steps)
    # brute includes users with only non-funnel events; the oracle
    # (like the engine) drops them
    want = {u: d for u, d in want.items()
            if any(e[0] == u and e[2] in steps for e in events)}
    assert got == want


def _brute_chunks(n, w, s):
    spans, start = [], 0
    while True:
        spans.append((start, min(w, n - start)))
        if start + w >= n:
            break
        start += s
    return spans


@given(st.integers(0, 500), st.integers(1, 50), st.data())
@settings(max_examples=150, deadline=None)
def test_chunk_closed_form_matches_walk(n, w, data):
    s = data.draw(st.integers(1, w))
    nc = 1 + (max(n - w, 0) + s - 1) // s
    spans = [(i * s, min(w, n - i * s)) for i in range(nc)]
    assert spans == _brute_chunks(n, w, s)
    # coverage + non-degenerate lengths (n=0 -> single empty chunk)
    assert spans[-1][0] + spans[-1][1] == max(n, 0)
    assert all(ln > 0 for _, ln in spans) or n == 0
