"""Extractor-plugin protocol (SURVEY.md §2.11 U6).

The reference exposes ``IDocumentConverter {accepts, convert,
getConversionInfo}`` (packages/office-to-markdown/src/types/converter.ts:104-113,
abstract base converters/base-converter.ts:12-40) so users can add
formats.  Here the same surface is a typed Protocol plus a module-level
ordered registry consulted by :func:`extract_kit_ray.functions.extract.
extract_document` BEFORE the built-in routing — registration happens at
import time, so each Ray actor process builds the same plugin table once
(the A3 state-per-worker pattern).

Plugins inherit the engine's failure-as-data contract: an ``extract``
that raises becomes a ``valid=False`` row, never a dead block.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class Extractor(Protocol):
    """One pluggable format handler."""

    name: str

    def accepts(self, payload: bytes, url: str) -> bool:
        """Cheap sniff (magic bytes / url pattern) — called per row."""
        ...

    def extract(self, payload: bytes, url: str) -> dict:
        """Return partial record fields: any of ``title``, ``text``,
        ``spans`` (list of {start,end,kind}), ``errors``, ``n_pages``.
        Missing fields default; ``doc_kind`` is the plugin's name."""
        ...


_REGISTRY: list[Extractor] = []


def register(extractor: Extractor) -> None:
    """Append to the routing table (first-accepts-wins, registration
    order; built-ins run after all plugins decline)."""
    if not isinstance(extractor, Extractor):
        raise TypeError("extractor must provide accepts() / extract() / name")
    _REGISTRY.append(extractor)


def unregister(name: str) -> bool:
    for i, p in enumerate(_REGISTRY):
        if p.name == name:
            del _REGISTRY[i]
            return True
    return False


def registered() -> list[str]:
    return [p.name for p in _REGISTRY]


def route(payload: bytes, url: str) -> Extractor | None:
    """First registered plugin that accepts the payload, else None."""
    for p in _REGISTRY:
        try:
            if p.accepts(payload, url):
                return p
        except Exception:
            continue  # a broken sniffer must not break routing
    return None
