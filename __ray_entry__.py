"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over sf0.001 driver
documents wrapped as Common-Crawl-style pages; ``queries()`` /
``oracle_sql()`` expose each implemented operator from SURVEY.md §2 (and
the scale ops: dedup, similarity, text analysis, multimodal plumbing).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in extract_kit_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents wrapped as
    (url, warc_ts, html, lang) pages -> HtmlExtractor actor pool ->
    (doc_id, text) extracted table."""
    from extract_kit_ray.driver import q_extract_html_roundtrip

    return q_extract_html_roundtrip(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from extract_kit_ray.driver import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from extract_kit_ray.driver import ORACLE_SQL, ensure_fixture_meta

    # the fixture-query oracles read a planted ground-truth parquet;
    # written here (atomic, idempotent) instead of at driver import
    ensure_fixture_meta()
    return dict(ORACLE_SQL)
