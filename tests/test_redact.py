"""PII redaction operator (ops/redact.py): batch-level masking,
ordering contract, DuckDB parity of the kernels, Dataset wrapper."""

import duckdb
import pyarrow as pa
import pytest

from extract_kit_ray.ops.redact import (
    PII_PATTERNS,
    oracle_count_exprs,
    oracle_redact_expr,
    redact_batch,
)


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_masks_each_category():
    out = redact_batch(_t([
        "write bob.smith+x@mail.example today",
        "server at 192.168.1.200 is down",
        "call +1-555-123-4567 now",
        "clean text with no pii",
    ]))
    texts = out["red_text"].to_pylist()
    assert texts[0] == "write <EMAIL> today"
    assert texts[1] == "server at <IP> is down"
    assert texts[2] == "call <PHONE> now"
    assert texts[3] == "clean text with no pii"
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 0, 1, 0]
    assert "text" not in out.column_names  # raw text must not flow on


def test_multiple_hits_counted():
    out = redact_batch(_t(["a@x.example b@y.example 1.2.3.4 5.6.7.8"]))
    assert out["n_email"].to_pylist() == [2]
    assert out["n_ip"].to_pylist() == [2]
    assert out["red_text"].to_pylist() == ["<EMAIL> <EMAIL> <IP> <IP>"]


def test_email_masked_before_ip():
    # pattern order is part of the operator contract: a mail domain
    # with an alphabetic TLD is consumed by the email pass, so its dots
    # can never leave IPv4-shaped residue; a purely numeric "domain" is
    # NOT an email (TLD must be alphabetic) and its address part is
    # masked by the IP pass instead
    out = redact_batch(_t(["a@b10.20.30.example x", "ping admin@10.0.0.1 soon"]))
    assert out["red_text"].to_pylist() == ["<EMAIL> x", "ping admin@<IP> soon"]
    assert out["n_email"].to_pylist() == [1, 0]
    assert out["n_ip"].to_pylist() == [0, 1]


def test_duckdb_kernel_parity():
    """pyarrow RE2 and DuckDB RE2 must agree byte-for-byte on the same
    patterns — this equivalence is what makes the query oracle exact."""
    texts = [
        "mail a.b-c_d%e+f@sub.domain.example and 10.20.30.40",
        "+12-345-678-9012 vs +1-555-000-1111 and not 555-123",
        "edge: @nope.example trailing@x. 999.999.999.999",
        "",
    ]
    got = redact_batch(_t(texts))
    counts = ", ".join(oracle_count_exprs("t"))
    want = duckdb.sql(
        f"SELECT {oracle_redact_expr('t')} AS red_text, {counts} "
        "FROM (SELECT unnest(?) AS t)", params=[texts]).arrow()
    assert got["red_text"].to_pylist() == want["red_text"].to_pylist()
    for name, _p, _r in PII_PATTERNS:
        assert got[f"n_{name}"].to_pylist() == want[f"n_{name}"].to_pylist()


def test_dataset_wrapper(ray_session):
    import ray.data

    from extract_kit_ray.ops.redact import redact_pii

    ds = ray.data.from_arrow(_t(["x@y.example", "plain"] * 10))
    rows = redact_pii(ds).take_all()
    assert len(rows) == 20
    assert all(r["red_text"] in ("<EMAIL>", "plain") for r in rows)


def test_pii_redact_query_contract(ray_session):
    from extract_kit_ray.driver import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["pii_redact"](sf).to_arrow_refs()
    import ray as _ray

    got = pa.concat_tables(_ray.get(got))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(ORACLE_SQL["pii_redact"]).arrow()
    assert got.num_rows == want.num_rows
    g = got.sort_by("doc_id")
    w = want.sort_by("doc_id")
    assert g["red_text"].to_pylist() == w["red_text"].to_pylist()
    assert g["n_email"].to_pylist() == w["n_email"].to_pylist()
    # planted footers actually fire: 2/3 of docs carry one each
    total = sum(g["n_email"].to_pylist())
    assert total == sum(1 for i in range(got.num_rows) if i % 3 != 2)


def test_repetition_signals_values():
    from extract_kit_ray.ops.textops import repetition_signals

    # 'a b a b a b c': 2-grams [ab,ba,ab,ba,bc] + ... hand-check dup2
    sig = repetition_signals("a b a b a b c")
    # grams: 'a b'x3 (len3), 'b a'x2 (len3), 'b c'x1 (len3)
    # tot = 6*3=18, dup = 5*3=15 -> 15/18
    assert sig["dup2_frac"] == 15 / 18
    assert sig["top2_frac"] == 3 / 6
    assert repetition_signals("")["dup2_frac"] == 0.0
    assert repetition_signals("one two")["dup3_frac"] == 0.0


def test_repetition_batch_columns():
    import pyarrow as pa

    from extract_kit_ray.ops.textops import repetition_batch

    out = repetition_batch(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["spam spam spam spam", "all distinct words"]),
    }))
    assert out.column_names == ["doc_id", "dup2_frac", "dup3_frac", "top2_frac"]
    assert out["dup2_frac"].to_pylist()[0] == 1.0   # every 2-gram repeated
    assert out["dup2_frac"].to_pylist()[1] == 0.0
