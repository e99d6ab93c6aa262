"""WARC (Web ARChive, ISO 28500) record framing — the container
Common Crawl ships pages in.  The engine's page tables are Parquet,
but a real crawl lands as WARC; this module is the ingest bridge:
build records deterministically for tests, and parse concatenated
records back out with a strict incremental reader.

Format implemented (the response-record subset):

    WARC/1.0\r\n
    <Field>: <value>\r\n ...          (Content-Length is authoritative)
    \r\n
    <payload: Content-Length octets>
    \r\n\r\n                          (record boundary)

The parser walks the blob ONCE: find the header/payload split, read
``Content-Length`` octets, skip the two CRLFs, repeat.  Malformed
framing raises ``ValueError`` (failure-as-data at the stage layer).

Scale shape: blobs are opaque ``binary`` cells; building and parsing
are per-cell CPU work inside ``map_batches`` — no shuffle, no driver
involvement.  Reference scope: ingest-side sibling of the S-family
readers (SURVEY §2 S1/S8); extract-kit itself takes loose files, the
WARC reader is the web-corpus extension.
"""

from __future__ import annotations

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def build_warc(records: list[dict]) -> bytes:
    """Serialize ``[{url, ts, record_id, payload: bytes}]`` into one
    concatenated WARC blob (deterministic field order)."""
    out = bytearray()
    for rec in records:
        payload: bytes = rec["payload"]
        out += b"WARC/1.0" + _CRLF
        out += b"WARC-Type: response" + _CRLF
        out += b"WARC-Record-ID: <" + rec["record_id"].encode("ascii") + b">" + _CRLF
        out += b"WARC-Target-URI: " + rec["url"].encode("ascii") + _CRLF
        out += b"WARC-Date: " + rec["ts"].encode("ascii") + _CRLF
        out += b"Content-Type: text/html" + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        out += _CRLF
        out += payload
        out += _HDR_END
    return bytes(out)


def parse_warc(blob: bytes) -> list[dict]:
    """Parse a concatenated WARC blob into
    ``[{url, ts, record_id, payload}]``.

    Strict: version line must be ``WARC/1.0``/``WARC/1.1``,
    ``Content-Length`` must be present and honest, records must be
    separated by exactly two CRLFs.  Header field names are
    case-insensitive per the spec.
    """
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError("WARC: unterminated header block")
        header = blob[pos:hdr_end].decode("ascii", errors="strict")
        lines = header.split("\r\n")
        if lines[0] not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"WARC: bad version line {lines[0]!r}")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"WARC: malformed header line {line!r}")
            fields[name.strip().lower()] = value.strip()
        try:
            clen = int(fields["content-length"])
        except KeyError:
            raise ValueError("WARC: missing Content-Length") from None
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        if body_end + len(_HDR_END) > n:
            raise ValueError("WARC: truncated payload")
        if blob[body_end:body_end + len(_HDR_END)] != _HDR_END:
            raise ValueError("WARC: bad record boundary")
        rid = fields.get("warc-record-id", "")
        records.append({
            "url": fields.get("warc-target-uri", ""),
            "ts": fields.get("warc-date", ""),
            "record_id": rid[1:-1] if rid.startswith("<") and rid.endswith(">") else rid,
            "payload": blob[body_start:body_end],
        })
        pos = body_end + len(_HDR_END)
    return records
