"""Paragraph-level dedup (ops/paradedup.py): first-occurrence wins,
doc reassembly, all-dropped docs survive, determinism.  The dedup
decision runs on narrow hash rows; text never rides a shuffle in the
broadcast path (see module docstring)."""

import pyarrow as pa

from extract_kit_ray.ops.paradedup import dedup_paragraphs, split_paragraph_hashes


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_split_hashes_narrow():
    out = split_paragraph_hashes(_t(["a b\n\nc d\n\ne", "solo"]),
                                 text_col="text", key_col="doc_id")
    assert out.column_names == ["doc_id", "idx", "h1", "h2", "pos"]
    assert "para" not in out.column_names   # the 100 TB point: no text
    assert out["doc_id"].to_pylist() == [0, 0, 0, 1]
    assert out["idx"].to_pylist() == [0, 1, 2, 0]
    # identical paragraphs hash identically, distinct ones differ
    h = list(zip(out["h1"].to_pylist(), out["h2"].to_pylist()))
    assert len(set(h)) == 4
    assert out["pos"].to_pylist() == [0, 1, 2, 1 << 20]


def test_first_occurrence_wins(ray_session):
    import ray.data

    boiler = "accept all cookies to continue"
    docs = [
        boiler + "\n\nunique zero",
        "unique one\n\n" + boiler,       # boiler dropped here
        boiler,                           # fully boilerplate -> empty
        "unique two",
    ]
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(ray.data.from_arrow(_t(docs))).take_all()}
    assert len(out) == 4                  # no doc lost
    assert out[0]["text"] == boiler + "\n\nunique zero"
    assert out[0]["n_dropped"] == 0
    assert out[1]["text"] == "unique one"
    assert out[1]["n_dropped"] == 1
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text"] == "unique two"


def test_within_doc_repeats(ray_session):
    import ray.data

    out = {r["doc_id"]: r for r in dedup_paragraphs(
        ray.data.from_arrow(_t(["x\n\nx\n\ny"]))).take_all()}
    assert out[0]["text"] == "x\n\ny"     # second x dropped within doc
    assert out[0]["n_kept"] == 2 and out[0]["n_dropped"] == 1


def test_deterministic(ray_session):
    import ray.data

    docs = [f"p{i % 7}\n\nq{i}" for i in range(40)]
    a = sorted(dedup_paragraphs(ray.data.from_arrow(_t(docs))).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(dedup_paragraphs(ray.data.from_arrow(_t(docs))).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b
    # p0..p6 survive only in docs 0..6
    assert sum(r["n_dropped"] for r in a) == 40 - 7


def test_join_fallback_matches_broadcast(ray_session):
    """broadcast_max=0 forces the left_outer-join reassembly; output
    must equal the zero-text-shuffle broadcast path."""
    import ray.data

    docs = [f"p{i % 5}\n\nq{i}\n\np{(i + 1) % 5}" for i in range(30)]
    a = sorted(dedup_paragraphs(ray.data.from_arrow(_t(docs))).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(dedup_paragraphs(ray.data.from_arrow(_t(docs)),
                                broadcast_max=0,
                                num_partitions=2).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b


def test_join_fallback_tiny_skewed_partitions(ray_session):
    """Regression (round 4): a single affected doc with num_partitions
    far above group count used to crash inside the Acero join — Ray
    aggregates emit schema-less empty blocks for empty partitions and
    a join partition made only of them cannot resolve its key field.
    The rayfix schema-seed guard keeps it alive."""
    import ray.data

    docs = [{"doc_id": 0, "text": "p\n\nq"}, {"doc_id": 1, "text": "p\n\nr"},
            {"doc_id": 2, "text": "s"}]
    out = sorted(dedup_paragraphs(
        ray.data.from_pandas(__import__("pandas").DataFrame(docs)),
        broadcast_max=0, num_partitions=8).take_all(),
        key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["n_dropped"]) for r in out] == [(0, 0), (1, 1), (2, 0)]
