"""Golden-file byte-identity test (north rule: byte-identical extracted
text per url). Goldens were frozen from the engine's first verified run
(FIXTURES.md §2); any drift fails here bytewise."""

import hashlib
import json
import os

from extract_kit_ray.fixtures import make_pages_table
from extract_kit_ray.functions.extract import extract_document

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden_v1.json")


def test_extraction_matches_golden_bytewise():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    tbl = make_pages_table(len(golden))
    mismatches = []
    for i in range(len(golden)):
        url = tbl["url"][i].as_py()
        rec = extract_document(tbl["html"][i].as_py(), url)
        g = golden[url]
        got_text_sha = hashlib.sha256(rec["text"].encode("utf-8")).hexdigest()
        got_span_sha = hashlib.sha256(
            json.dumps(rec["spans"], sort_keys=True).encode()
        ).hexdigest()
        if (
            got_text_sha != g["text_sha256"]
            or rec["title"] != g["title"]
            or rec["valid"] != g["valid"]
            or rec["doc_kind"] != g["doc_kind"]
            or got_span_sha != g["spans_sha256"]
        ):
            mismatches.append(url)
    assert not mismatches, f"golden drift on {len(mismatches)} urls: {mismatches[:5]}"


def test_span_invariants_on_golden_corpus():
    """Spans sorted, non-overlapping, in-bounds, non-empty fragments
    (SURVEY.md §5.2 invariant tests)."""
    tbl = make_pages_table(64)
    for i in range(64):
        rec = extract_document(tbl["html"][i].as_py(), tbl["url"][i].as_py())
        text = rec["text"]
        last_end = 0
        for s in rec["spans"]:
            assert 0 <= s["start"] < s["end"] <= len(text)
            assert s["start"] >= last_end, "overlapping spans"
            assert text[s["start"]:s["end"]].strip()
            last_end = s["end"]
        # sum of span lengths never exceeds doc length
        assert sum(s["end"] - s["start"] for s in rec["spans"]) <= len(text)


def test_corruption_rows_fail_validly():
    tbl = make_pages_table(100)
    # row 41: empty payload (seeded corruption cycle)
    rec = extract_document(tbl["html"][41].as_py(), tbl["url"][41].as_py())
    assert not rec["valid"] and rec["errors"]
    # row 91: invalid utf-8 html
    rec91 = extract_document(tbl["html"][91].as_py(), tbl["url"][91].as_py())
    assert not rec91["valid"] and "utf-8" in rec91["errors"][0]
