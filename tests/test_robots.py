"""robots.txt parser + filter (ops/robots.py) and the WARC codec
(functions/warc.py)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extract_kit_ray.functions.warc import build_warc, parse_warc
from extract_kit_ray.ops.robots import (decide_allowed, parse_robots,
                                        robots_filter)

# ---------------------------------------------------------------- parser

ROBOTS = """\
# fixture
User-agent: badbot
Disallow: /

User-agent: crawler-a
User-agent: *
Disallow: /private/   # trailing comment
Allow: /private/ok
disallow: /tmp
Crawl-delay: 5
Disallow:
Sitemap: https://x.example/sitemap.xml
"""


def test_parse_groups_and_fields():
    rules = parse_robots(ROBOTS)
    # badbot group ignored entirely; * group via a multi-agent run
    assert rules == [(False, "/private/"), (True, "/private/ok"),
                     (False, "/tmp"), (True, "")]


def test_parse_star_absent():
    assert parse_robots("User-agent: foo\nDisallow: /\n") == []


def test_parse_blank_line_ends_group():
    txt = "User-agent: *\n\nDisallow: /x\n"
    # the Disallow is outside any group -> ignored
    assert parse_robots(txt) == []


def test_unknown_field_ends_agent_run_not_group():
    txt = "User-agent: *\nCrawl-delay: 1\nDisallow: /a\n"
    assert parse_robots(txt) == [(False, "/a")]


# -------------------------------------------------------------- decision

def _allowed(path, rules):
    return bool(decide_allowed(np.array([path], dtype="U"), rules)[0])


def test_most_specific_wins():
    rules = [(False, "/a/"), (True, "/a/b")]
    assert not _allowed("/a/x", rules)
    assert _allowed("/a/b", rules)
    assert _allowed("/a/bc", rules)


def test_allow_wins_ties_regardless_of_order():
    for rules in ([(False, "/a"), (True, "/a")],
                  [(True, "/a"), (False, "/a")]):
        assert _allowed("/a/x", rules)


def test_no_match_allows():
    assert _allowed("/free", [(False, "/blocked")])


def test_empty_disallow_is_noop():
    rules = [(True, ""), (False, "/a")]
    assert not _allowed("/a", rules)
    assert _allowed("/b", rules)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.booleans(),
                          st.text(alphabet="/abc", max_size=4)),
                max_size=6),
       st.text(alphabet="/abc", max_size=6))
def test_decide_matches_scalar_reference(rules, path):
    best_len, best_allow = -1, True
    for is_allow, prefix in rules:
        if path.startswith(prefix):
            if len(prefix) > best_len or (len(prefix) == best_len
                                          and is_allow and not best_allow):
                best_len, best_allow = len(prefix), is_allow
    assert _allowed(path, rules) == best_allow


def test_filter_dataset(ray_session):
    import ray.data

    df = pd.DataFrame({
        "host": ["a.example"] * 3 + ["b.example", "c.example"],
        "path": ["/x/1", "/y/1", "/x/ok", "/x/1", "/x/1"],
    })
    robots = {"a.example": "User-agent: *\nDisallow: /x\nAllow: /x/ok\n",
              "b.example": "User-agent: *\nDisallow: /\n"}
    out = robots_filter(ray.data.from_pandas(df), robots).to_pandas()
    got = sorted(zip(out["host"], out["path"]))
    assert got == [("a.example", "/x/ok"), ("a.example", "/y/1"),
                   ("c.example", "/x/1")]


# ------------------------------------------------------------------ WARC

def _recs(n):
    return [{"url": f"https://h{i}.example/p/{i}",
             "ts": "2026-01-01T00:00:00Z",
             "record_id": f"urn:doc:{i}",
             "payload": (("téxt %d\r\n\r\nbody" % i) * (i % 3 + 1)
                         ).encode("utf-8")}
            for i in range(n)]


def test_warc_roundtrip_exact():
    recs = _recs(5)
    out = parse_warc(build_warc(recs))
    assert out == recs


def test_warc_empty_payload_and_blob():
    assert parse_warc(b"") == []
    recs = [{"url": "u", "ts": "t", "record_id": "r", "payload": b""}]
    assert parse_warc(build_warc(recs)) == recs


def test_warc_header_case_insensitive():
    blob = (b"WARC/1.1\r\ncontent-length: 2\r\nWARC-TARGET-URI: u\r\n"
            b"\r\nhi\r\n\r\n")
    (rec,) = parse_warc(blob)
    assert rec["url"] == "u" and rec["payload"] == b"hi"


@pytest.mark.parametrize("blob", [
    b"WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n",      # bad version
    b"WARC/1.0\r\nContent-Length: 9\r\n\r\nhi\r\n\r\n",     # truncated
    b"WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nhi\r\n\r\n",    # no length
    b"WARC/1.0\r\nContent-Length: 2\r\n\r\nhixx\r\n\r\n",   # bad boundary
    b"WARC/1.0\r\nContent-Length: 2",                       # no header end
])
def test_warc_malformed_raises(blob):
    with pytest.raises(ValueError):
        parse_warc(blob)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=8))
def test_warc_fuzz_roundtrip(payloads):
    recs = [{"url": f"https://e/{i}", "ts": "T", "record_id": f"urn:x:{i}",
             "payload": p} for i, p in enumerate(payloads)]
    assert parse_warc(build_warc(recs)) == recs


def test_driver_fixture_text_parses_back_to_rule_tuples():
    """The oracle's VALUES table comes from _robots_rule_tuples; the
    engine parses the rendered robots.txt.  This pins the two to each
    other: a renderer or parser drift breaks the oracle contract."""
    from extract_kit_ray.driver import _robots_rule_tuples, _robots_texts

    texts = _robots_texts()
    for i in range(20):
        host = f"site{i}.example"
        assert parse_robots(texts[host]) == _robots_rule_tuples(i), host


def test_parse_crawl_delay_group_semantics():
    from extract_kit_ray.ops.robots import parse_crawl_delay

    txt = "User-agent: bad\nCrawl-delay: 99\n\nUser-agent: *\nCrawl-delay: 3\n"
    assert parse_crawl_delay(txt) == 3
    assert parse_crawl_delay("User-agent: bad\nCrawl-delay: 9\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nope\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.9\n") == 2
