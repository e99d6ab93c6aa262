"""Domain blocklist with subdomain inheritance (ops/blocklist.py):
host extraction totality, suffix-chain matching, most-specific-wins,
broadcast vs join path equivalence."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_kit_ray.ops.blocklist import (_suffix_fanout, apply_blocklist,
                                           extract_host)


def _docs(urls, ids=None):
    if ids is None:
        ids = list(range(len(urls)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "url": pa.array(urls, pa.string())})


def test_extract_host_totality():
    urls = pa.array([
        "https://A.B.Site.EXample/p?x=1",
        "http://user@h1.dom2.example:8080/x",
        "not a url", "", None, "ftp://x.y/z",
        "https://bare",
    ])
    got = extract_host(urls).to_pylist()
    assert got == ["a.b.site.example", "h1.dom2.example", "", "", "",
                   "x.y", "bare"]


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_blocklist_subdomain_inheritance(ray_session, broadcast_max):
    import ray.data

    urls = [
        "https://spam.example/a",            # exact entry
        "https://news.spam.example/b",       # subdomain of entry
        "https://deep.news.spam.example/c",  # deeper subdomain
        "https://ham.example/d",             # clean
        "https://spam.example.org/e",        # different TLD - clean
        "https://sub.good.example/f",        # clean
        "not a url",                         # no host - clean
    ]
    kwargs = {} if broadcast_max is None else {"broadcast_max": broadcast_max}
    ds = ray.data.from_arrow(_docs(urls)).repartition(3)
    out = (apply_blocklist(ds, ["spam.example"], **kwargs)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["blocked"].tolist() == [True, True, True, False, False,
                                       False, False]
    assert out.loc[1, "blocked_by"] == "spam.example"
    assert out.loc[3, "blocked_by"] == ""


@pytest.mark.parametrize("broadcast_max", [None, 0])
def test_most_specific_entry_wins(ray_session, broadcast_max):
    import ray.data

    kwargs = {} if broadcast_max is None else {"broadcast_max": broadcast_max}
    ds = ray.data.from_arrow(_docs([
        "https://a.b.example/x",   # matches both b.example and a.b.example
        "https://c.b.example/y",   # matches only b.example
    ]))
    out = (apply_blocklist(ds, ["b.example", "a.b.example"], **kwargs)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["blocked"].tolist() == [True, True]
    assert out.loc[0, "blocked_by"] == "a.b.example"
    assert out.loc[1, "blocked_by"] == "b.example"


def test_empty_blocklist_blocks_nothing(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs(["https://x.example/a"]))
    out = apply_blocklist(ds, []).to_pandas()
    assert not out["blocked"].any()
    assert (out["blocked_by"] == "").all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=8))
def test_host_parse_total_on_arbitrary_text(urls):
    """extract_host and the suffix fan-out are TOTAL: arbitrary junk
    never raises; hosts come back lowercase; every emitted suffix is a
    dot-suffix of its row's host with >= 2 labels."""
    tbl = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                    "url": pa.array(urls, pa.string())})
    hosts = extract_host(tbl["url"]).to_pylist()
    assert all(h == h.lower() for h in hosts)
    fan = _suffix_fanout(tbl, url_col="url", key_col="doc_id")
    for key, sfx in zip(fan["doc_id"].to_pylist(),
                        fan["suffix"].to_pylist()):
        h = hosts[key]
        assert h == sfx or h.endswith("." + sfx), (h, sfx)
        assert sfx.count(".") >= 1


def test_case_insensitive_host_and_entries(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs(["https://WWW.Spam.EXample/x"]))
    out = apply_blocklist(ds, ["SPAM.EXAMPLE"]).to_pandas()
    assert out["blocked"].tolist() == [True]
    assert out.loc[0, "blocked_by"] == "spam.example"
