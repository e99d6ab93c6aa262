"""URL canonicalization — the normalization that makes URL-keyed dedup
and lineage meaningful on web data (the same page arrives as
``HTTP://Site.Example:80/a?utm_source=x#frag`` and
``http://site.example/a``).

The canonical form is defined as a FIXED sequence of RE2 rewrites (plus
one lowercase-the-scheme-and-host step); every step runs as a
vectorized pyarrow kernel and has a literal DuckDB mirror, so the
operator is byte-exact against the SQL oracle.  The sequence is the
contract — pathological inputs get *some* deterministic canonical form,
identical in both engines.

Steps, in order:

1. strip the ``#fragment``
2. lowercase the ``scheme://host[:port]`` prefix (path/query case kept)
3. drop default ports — ``:80`` for http, ``:443`` for https
4. remove ``utm_*`` query parameters, then repair the separator
   (first ``&`` becomes ``?`` if the ``?`` was consumed) and trailing
   ``?``/``&``
5. strip a single trailing slash

Scale shape: stateless ``map_batches``, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PREFIX = r"^[^/?#]+://[^/?#]*"

# (pattern, rewrite) applied IN ORDER after the lowercase step;
# DuckDB regexp_replace(..., 'g') mirrors each literally
REWRITE_STEPS: list[tuple[str, str]] = [
    (r"^(http://[^/?#]*):80(/|\?|#|$)", r"\1\2"),    # default port http
    (r"^(https://[^/?#]*):443(/|\?|#|$)", r"\1\2"),  # default port https
    (r"[?&]utm_[^&#]*", ""),                          # utm_* params
    (r"^([^?&]*)&", r"\1?"),                          # first & -> ? repair
    (r"[?&]$", ""),                                   # dangling separator
    (r"/$", ""),                                      # trailing slash
]
_FRAG = (r"#.*$", "")


def canonicalize_batch(batch: pa.Table, *, url_col: str = "url",
                       out_col: str = "canon_url") -> pa.Table:
    col = pc.replace_substring_regex(batch[url_col], _FRAG[0], _FRAG[1])
    # lowercase scheme://host: split at the prefix, lower it, rejoin
    pre = pc.extract_regex(col, f"(?P<p>{_PREFIX})")
    prefix = pc.struct_field(pre, "p")
    has = pc.is_valid(prefix)
    rest = pc.replace_substring_regex(col, _PREFIX, "")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.if_else(has, prefix, "")),
        pc.if_else(has, rest, col), "")
    out = lowered
    for pat, rw in REWRITE_STEPS:
        out = pc.replace_substring_regex(out, pat, rw)
    return batch.append_column(out_col, out)


def canonicalize_urls(ds, *, url_col: str = "url", out_col: str = "canon_url"):
    """Dataset-level wrapper: one stateless vectorized pass."""
    return ds.map_batches(
        canonicalize_batch,
        fn_kwargs={"url_col": url_col, "out_col": out_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def oracle_canonicalize_expr(source_expr: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_batch` step for
    step (same RE2 patterns, same order)."""
    e = f"regexp_replace({source_expr}, '{_FRAG[0]}', '', 'g')"
    e = (f"(CASE WHEN regexp_matches({e}, '{_PREFIX}') THEN "
         f"lower(regexp_extract({e}, '({_PREFIX})', 1)) || "
         f"regexp_replace({e}, '{_PREFIX}', '', 'g') "
         f"ELSE {e} END)")
    for pat, rw in REWRITE_STEPS:
        e = f"regexp_replace({e}, '{pat}', '{rw}', 'g')"
    return e
