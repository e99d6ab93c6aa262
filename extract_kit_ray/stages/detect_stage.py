"""Detector/router stage (SURVEY.md M1-M6): one vectorizable pass over the
binary column emitting ``doc_kind`` / ``detected_mime`` / ``detected_ext``
/ ``supported`` columns. Magic-byte compares touch only payload heads, so
the per-row cost is O(64 bytes) regardless of payload size."""

from __future__ import annotations

import pyarrow as pa

from ..functions import detect


def detect_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    payloads = batch[payload_col].to_pylist()
    kinds, mimes, exts, supported = [], [], [], []
    for payload in payloads:
        payload = payload or b""
        kinds.append(detect.detect_doc_kind(payload))
        detected = detect.detect_file_type(payload)
        mime = detected[0] if detected else ""
        ext = detected[1] if detected else ""
        mimes.append(mime)
        exts.append(ext)
        supported.append(detect.is_supported_file_type(mime or None, ext or None)
                         or kinds[-1] in (detect.KIND_HTML, detect.KIND_TEXT, detect.KIND_LAYOUT))
    return (
        batch.append_column("doc_kind", pa.array(kinds, pa.string()))
        .append_column("detected_mime", pa.array(mimes, pa.string()))
        .append_column("detected_ext", pa.array(exts, pa.string()))
        .append_column("supported", pa.array(supported, pa.bool_()))
    )
