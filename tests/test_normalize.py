"""Unicode normalization operator (ops/normalize.py)."""

import duckdb
import pyarrow as pa

from extract_kit_ray.ops.normalize import (
    normalize_batch,
    normalize_text,
    oracle_normalize_expr,
)


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_nfc_composition():
    decomposed = "cafe" + chr(769)  # e + combining acute
    out = normalize_batch(_t([decomposed, "plain"]))
    assert out["norm_text"].to_pylist() == ["café", "plain"]
    assert out["changed"].to_pylist() == [1, 0]
    assert out["n_ctl"].to_pylist() == [0, 0]


def test_control_strip_keeps_whitespace():
    s = "a\x00b\x07c\td\ne\rf\x7fg"
    out = normalize_batch(_t([s]))
    assert out["norm_text"].to_pylist() == ["abc\td\ne\rfg"]
    assert out["n_ctl"].to_pylist() == [3]  # NUL, BEL, DEL; \t\n\r kept
    assert out["changed"].to_pylist() == [1]


def test_duckdb_parity():
    texts = ["cafe" + chr(769) + " \x07 " + chr(65) + chr(778),  # A + ring
             "ascii only", "", "\x01\x02\x03"]
    got = normalize_batch(_t(texts))
    want = duckdb.sql(
        f"SELECT {oracle_normalize_expr('t')} AS n "
        "FROM (SELECT unnest(?) AS t)", params=[texts]).arrow()
    assert got["norm_text"].to_pylist() == want["n"].to_pylist()


def test_dataset_wrapper(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_t(["e" + chr(769)] * 5))
    rows = normalize_text(ds).take_all()
    assert all(r["norm_text"] == "é" for r in rows)
    assert all(r["changed"] == 1 for r in rows)


def test_pyarrow_utf8_normalize_nfc_canary():
    """The stage avoids pc.utf8_normalize because pyarrow 16.1.0 maps
    form="NFC" to the DECOMPOSED form (output == unicodedata NFD).
    When this canary starts failing, the pinned pyarrow has been fixed
    and the stage can switch to the pure-Arrow kernel."""
    import pyarrow.compute as pc
    import unicodedata

    composed = "café"  # already NFC
    out = pc.utf8_normalize(pa.array([composed]), form="NFC").to_pylist()[0]
    assert out == unicodedata.normalize("NFD", composed)
    assert out != composed  # the bug: NFC request decomposes


def test_ascii_fastpath_differential():
    """Mixed ASCII/non-ASCII/null batch: fast-path output must equal a
    plain per-string unicodedata.normalize over every row."""
    import unicodedata

    texts = ["plain ascii", "cafe" + chr(769), None, "", "A" + chr(778),
             "mixed ascii then " + chr(7777), "\x01ascii ctl", "한글 가",
             "e" + chr(769) + chr(775)]
    out = normalize_batch(_t(texts))["norm_text"].to_pylist()
    import pyarrow.compute as pc
    stripped = pc.replace_substring_regex(
        pa.array(texts, pa.string()),
        r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "").to_pylist()
    want = [unicodedata.normalize("NFC", s) if s is not None else None
            for s in stripped]
    assert out == want
