"""Decontamination operator (ops/decontam.py): probe extraction,
contamination marking, and whitespace-normalization equivalence."""

import pyarrow as pa

from extract_kit_ray.ops.decontam import PROBE_WORDS, benchmark_probes, mark_contamination

W13 = " ".join(f"w{i}" for i in range(PROBE_WORDS))


def _docs_table():
    rows = [
        # doc_id 3 and 100 are benchmark rows (id % 97 == 3)
        (3, W13 + " tail words here"),
        (100, "alpha beta " + " ".join(f"x{i}" for i in range(PROBE_WORDS))),
        (0, "clean document " + " ".join(f"z{i}" for i in range(20))),
        # contains doc 3's probe with messy whitespace -> must hit
        (1, "prefix   " + W13.replace(" ", "\t") + "  suffix"),
        (2, "short"),
        # benchmark row too short for a probe
        (197, "only five words in here sadly"),
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_probe_extraction(ray_session):
    import ray.data

    probes = benchmark_probes(ray.data.from_arrow(_docs_table()))
    # doc 197 is benchmark but too short; docs 3 and 100 yield probes
    assert len(probes) == 2
    assert W13 in probes
    assert probes == sorted(probes)


def test_marking_normalizes_whitespace(ray_session):
    import ray.data

    tbl = _docs_table()
    probes = benchmark_probes(ray.data.from_arrow(tbl))
    out = mark_contamination(ray.data.from_arrow(tbl), probes).take_all()
    hits = {r["doc_id"]: r["n_probes_hit"] for r in out}
    assert len(hits) == tbl.num_rows  # every doc scored, clean ones at 0
    assert hits[3] == 1    # self-hit
    assert hits[100] == 1  # self-hit
    assert hits[1] == 1    # tab-separated copy still matches
    assert hits[0] == 0 and hits[2] == 0 and hits[197] == 0


def test_empty_probe_set(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b", "c d"], pa.string())})
    out = mark_contamination(ray.data.from_arrow(tbl), []).take_all()
    assert sorted(r["n_probes_hit"] for r in out) == [0, 0]


def test_aho_corasick_matches_bruteforce():
    """Automaton distinct-count must equal per-pattern `in` checks on
    overlapping/nested/prefix-suffix pattern sets."""
    from extract_kit_ray.ops.decontam import AhoCorasick

    pats = ["he", "she", "his", "hers", "her", "a b c", "b c d", "c",
            "abc abc", "bc a"]
    ac = AhoCorasick(pats)
    texts = ["ushers", "she sells", "a b c d e", "abc abc abc", "", "xyz",
             "hishers", "b c a b c"]
    for t in texts:
        want = sum(1 for p in pats if p in t)
        assert ac.count_distinct(t) == want, t


def test_ac_path_matches_vectorized(ray_session):
    """Forcing the automaton path (ac_threshold=0) must reproduce the
    vectorized per-probe scan exactly on the fixture corpus."""
    import ray.data

    from extract_kit_ray.ops.decontam import mark_contamination

    docs = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog "
                              "near the old stone bridge today"},
        {"doc_id": 1, "text": "completely unrelated   content\nwith  odd "
                              "whitespace everywhere"},
        {"doc_id": 2, "text": "prefix text then the quick brown fox jumps "
                              "over the lazy dog near the old stone bridge "
                              "today and more"},
        {"doc_id": 3, "text": ""},
    ]
    probes = ["the quick brown fox jumps over the lazy dog near the old "
              "stone bridge today",
              "with odd whitespace everywhere",
              "never present probe body that matches nothing at all here"]
    a = sorted(mark_contamination(
        ray.data.from_items(docs), probes).take_all(),
        key=lambda r: r["doc_id"])
    b = sorted(mark_contamination(
        ray.data.from_items(docs), probes, ac_threshold=0).take_all(),
        key=lambda r: r["doc_id"])
    assert a == b
    assert [r["n_probes_hit"] for r in a] == [1, 1, 1, 0]
