"""URL canonicalization operator (ops/urlnorm.py)."""

import duckdb
import pyarrow as pa

from extract_kit_ray.ops.urlnorm import (
    canonicalize_batch,
    canonicalize_urls,
    oracle_canonicalize_expr,
)


def _c(urls):
    return canonicalize_batch(
        pa.table({"url": pa.array(urls, pa.string())}))["canon_url"].to_pylist()


def test_case_and_ports():
    assert _c(["HTTP://WWW.Ex.COM:80/A"]) == ["http://www.ex.com/A"]
    assert _c(["HtTpS://H.ex:443/"]) == ["https://h.ex"]
    # non-default port survives; path case survives
    assert _c(["http://h.ex:8080/KeepCase"]) == ["http://h.ex:8080/KeepCase"]
    # :443 on http is NOT a default port
    assert _c(["http://h.ex:443/a"]) == ["http://h.ex:443/a"]


def test_fragment_and_utm():
    assert _c(["http://h.ex/a?utm_source=x&id=1#sec"]) == ["http://h.ex/a?id=1"]
    assert _c(["http://h.ex/a?utm_only=1"]) == ["http://h.ex/a"]
    assert _c(["http://h.ex/a?id=1&utm_x=2&z=3"]) == ["http://h.ex/a?id=1&z=3"]
    assert _c(["http://h.ex/#just-frag"]) == ["http://h.ex"]


def test_separator_repair_first_ampersand():
    # Regression: after utm removal consumes the '?', the FIRST '&' must
    # become '?' so equivalent URLs converge on one canonical form.
    assert _c(["http://h/a?utm_source=x&b=1&c=2"]) == ["http://h/a?b=1&c=2"]
    assert _c(["http://h/a?b=1&c=2"]) == ["http://h/a?b=1&c=2"]
    # both spellings of the same page → identical canonical key
    assert _c(["http://h/a?utm_source=x&b=1&c=2"]) == _c(["http://h/a?b=1&c=2"])


def test_no_scheme_passthrough():
    assert _c(["not a url", ""]) == ["not a url", ""]


def test_idempotent():
    urls = ["HTTP://A.Ex:80/p/?utm_a=1&q=2#f", "https://b.ex/x"]
    once = _c(urls)
    assert _c(once) == once


def test_duckdb_parity_fuzz():
    urls = [
        "HTTP://WWW.S.EX:80/P?utm_source=a&utm_medium=b&x=1#f",
        "https://h.ex:443", "ftp://Case.Host/Path",
        "http://h.ex/??", "http://h.ex/a&b", "x://y", "", "plain",
        "https://H.EX/A/B/C/?utm_1=&id=9",
    ]
    got = _c(urls)
    want = duckdb.sql(
        f"SELECT {oracle_canonicalize_expr('u')} AS c "
        "FROM (SELECT unnest(?) AS u)", params=[urls]).df()["c"].tolist()
    assert got == want


def test_dataset_wrapper(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"url": pa.array(
        ["HTTP://A.Ex/p/"] * 6, pa.string())}))
    rows = canonicalize_urls(ds).take_all()
    assert all(r["canon_url"] == "http://a.ex/p" for r in rows)
