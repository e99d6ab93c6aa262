"""Regenerate the golden extraction fixtures (intentional changes only)."""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from extract_kit_ray.fixtures import make_pages_table  # noqa: E402
from extract_kit_ray.functions.extract import extract_document  # noqa: E402

N_ROWS = 64


def build_golden() -> dict:
    tbl = make_pages_table(N_ROWS)
    out = {}
    for i in range(N_ROWS):
        url = tbl["url"][i].as_py()
        rec = extract_document(tbl["html"][i].as_py(), url)
        span_blob = json.dumps(rec["spans"], sort_keys=True).encode()
        out[url] = {
            "text_sha256": hashlib.sha256(rec["text"].encode("utf-8")).hexdigest(),
            "text_len": len(rec["text"]),
            "title": rec["title"],
            "valid": rec["valid"],
            "doc_kind": rec["doc_kind"],
            "n_spans": len(rec["spans"]),
            "spans_sha256": hashlib.sha256(span_blob).hexdigest(),
        }
    return out


if __name__ == "__main__":
    golden = build_golden()
    path = os.path.join(os.path.dirname(__file__), "golden_v1.json")
    with open(path, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {path} ({len(golden)} urls)")
