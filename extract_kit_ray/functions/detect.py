"""File-type detection: magic bytes, ext<->mime maps, office disambiguation.

Port of the reference's detector semantics
(packages/office-to-markdown/src/utils/file-detector.ts:11-230) operating
on ``bytes`` payloads, plus the document-kind router the Ray pipeline
uses (SURVEY.md M1-M6): one vectorizable pass over a binary column
emitting ``doc_kind`` so downstream branches run inside a single
``map_batches`` stage instead of N dataset splits.
"""

from __future__ import annotations

EXTENSION_TO_MIME = {
    # Microsoft Office (file-detector.ts:11-54)
    ".docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".doc": "application/msword",
    ".xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".xls": "application/vnd.ms-excel",
    ".pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".ppt": "application/vnd.ms-powerpoint",
    # Documents
    ".pdf": "application/pdf",
    ".rtf": "application/rtf",
    ".odt": "application/vnd.oasis.opendocument.text",
    ".ods": "application/vnd.oasis.opendocument.spreadsheet",
    ".odp": "application/vnd.oasis.opendocument.presentation",
    # Web
    ".html": "text/html",
    ".htm": "text/html",
    ".xml": "text/xml",
    ".css": "text/css",
    ".js": "text/javascript",
    ".json": "application/json",
    # Text
    ".txt": "text/plain",
    ".md": "text/markdown",
    ".csv": "text/csv",
    # Images
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".gif": "image/gif",
    ".bmp": "image/bmp",
    ".webp": "image/webp",
    ".svg": "image/svg+xml",
    # Archives
    ".zip": "application/zip",
    ".rar": "application/x-rar-compressed",
    ".tar": "application/x-tar",
    ".gz": "application/gzip",
}

_MIME_TO_EXTENSION = {}
for _ext, _mime in EXTENSION_TO_MIME.items():
    _MIME_TO_EXTENSION.setdefault(_mime, _ext)  # first wins, like Array.find

# (signature bytes, mimetype, extension) — file-detector.ts:59-83
FILE_SIGNATURES: list[tuple[bytes, str, str]] = [
    (b"PK\x03\x04", "application/zip", ".zip"),
    (b"PK\x07\x08", "application/zip", ".zip"),
    (b"%PDF", "application/pdf", ".pdf"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "application/msword", ".doc"),
    (b"{\\rtf", "application/rtf", ".rtf"),
    (b"\xff\xd8\xff", "image/jpeg", ".jpg"),
    (b"\x89PNG\r\n\x1a\n", "image/png", ".png"),
    (b"GIF8", "image/gif", ".gif"),
    (b"BM", "image/bmp", ".bmp"),
]

SUPPORTED_MIMES = frozenset(
    {
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "application/msword",
        "text/html",
        "text/plain",
        "text/markdown",
    }
)
SUPPORTED_EXTENSIONS = frozenset({".docx", ".doc", ".html", ".htm", ".txt", ".md"})


def detect_office_format(buffer: bytes) -> tuple[str, str] | None:
    """ZIP head scan for Office markers (file-detector.ts:112-138)."""
    head = buffer[: min(1024, len(buffer))]
    if b"word/" in head and b"document.xml" in head:
        return (EXTENSION_TO_MIME[".docx"], ".docx")
    if b"xl/" in head and b"workbook.xml" in head:
        return (EXTENSION_TO_MIME[".xlsx"], ".xlsx")
    if b"ppt/" in head and b"presentation.xml" in head:
        return (EXTENSION_TO_MIME[".pptx"], ".pptx")
    return None


def detect_file_type(buffer: bytes) -> tuple[str, str] | None:
    """Magic-byte detection (file-detector.ts:88-107). Returns (mime, ext)."""
    for signature, mimetype, extension in FILE_SIGNATURES:
        if buffer[: len(signature)] == signature:
            if mimetype == "application/zip":
                return detect_office_format(buffer) or (mimetype, extension)
            return (mimetype, extension)
    return None


def guess_mime_from_extension(extension: str) -> str | None:
    return EXTENSION_TO_MIME.get(extension.lower())


def guess_extension_from_mime(mimetype: str) -> str | None:
    return _MIME_TO_EXTENSION.get(mimetype)


def is_supported_file_type(mimetype: str | None, extension: str | None) -> bool:
    """Allowlist gate (file-detector.ts:203-230)."""
    if mimetype and mimetype in SUPPORTED_MIMES:
        return True
    if extension and extension.lower() in SUPPORTED_EXTENSIONS:
        return True
    return False


def enhance_stream_info(buffer: bytes, base_info: dict | None = None) -> dict:
    """Merged stream info (SURVEY.md M4, file-detector.ts:159-198):
    magic-byte detection fills missing mime/extension, then each of
    mime<->extension guesses the other, then filename falls out of
    local_path.  Caller-provided fields always win (same precedence as
    the reference)."""
    info = {"mimetype": None, "extension": None, "filename": None,
            "local_path": None}
    info.update({k: v for k, v in (base_info or {}).items() if v})
    detected = detect_file_type(buffer)
    if detected is not None:
        if not info["mimetype"]:
            info["mimetype"] = detected[0]
        if not info["extension"]:
            info["extension"] = detected[1]
    if info["extension"] and not info["mimetype"]:
        info["mimetype"] = guess_mime_from_extension(info["extension"])
    if info["mimetype"] and not info["extension"]:
        info["extension"] = guess_extension_from_mime(info["mimetype"])
    if info["local_path"] and not info["filename"]:
        info["filename"] = info["local_path"].rsplit("/", 1)[-1] or info["local_path"]
    return info


# ---------------------------------------------------------------------------
# document-kind router for the Ray pipeline (SURVEY.md M6)
# ---------------------------------------------------------------------------

# our deterministic multi-page layout payload format (FIXTURES.md §1.2)
LAYOUT_MAGIC = b'{"kind": "ek-layout"'
LAYOUT_MAGIC_COMPACT = b'{"kind":"ek-layout"'

KIND_HTML = "html"
KIND_LAYOUT = "layout"
KIND_PDF = "pdf"
KIND_DOCX = "docx"
KIND_TEXT = "text"
KIND_EMPTY = "empty"
KIND_BINARY = "binary"


def detect_doc_kind(payload: bytes) -> str:
    """Route a raw payload to its extraction branch.

    Priority: empty -> layout payload -> magic-byte formats -> HTML sniff
    -> plain text.  Binary formats we cannot parse (real PDFs, images)
    route to ``pdf``/``binary`` and become failure-as-data rows downstream.
    """
    if not payload:
        return KIND_EMPTY
    head = payload[:64].lstrip()
    if head.startswith(LAYOUT_MAGIC) or head.startswith(LAYOUT_MAGIC_COMPACT):
        return KIND_LAYOUT
    detected = detect_file_type(payload)
    if detected is not None:
        mime = detected[0]
        if mime == "application/pdf":
            return KIND_PDF
        if mime.endswith("wordprocessingml.document"):
            return KIND_DOCX
        if mime.startswith("image/") or mime in (
            "application/zip",
            "application/msword",
        ):
            return KIND_BINARY
    if head.startswith((b"<", b"\xef\xbb\xbf<")) or b"<html" in payload[:256].lower() or b"<!doctype" in payload[:256].lower():
        return KIND_HTML
    # heuristic: mostly-printable -> text, else binary
    sample = payload[:4096]
    n_bad = sum(1 for b in sample if b < 9 or (13 < b < 32))
    if n_bad * 20 > len(sample):
        return KIND_BINARY
    return KIND_TEXT
