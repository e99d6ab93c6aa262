"""Registered-domain extraction against a public-suffix-style list —
the normalization under every per-domain rollup on web data
(``blog.site.co.uk`` and ``www.site.co.uk`` are the same registrant;
``site.co.uk`` and ``site.org.uk`` are not).

Semantics (the publicsuffix.org matching rule, reduced to exact
suffixes): the public suffix of a host is its LONGEST matching suffix
from the list (matched at a label boundary); the registered domain is
that suffix plus the one label left of it.  A host that IS a public
suffix, or has no label left of its match, registers as itself; a
host matching nothing registers as its last two labels (the
spec's implicit ``*`` rule).

Scale shape: the suffix list is tiny and shipped as a constructor
argument (one broadcast), matching runs as a per-row scan over the
handful of suffix candidates per host — ``map_batches``, zero
shuffles.  The rollup after it is one small groupby.  The SQL oracle
replays the longest-match pick over the same list as a VALUES table
+ window pick (the ops/robots.py technique).
"""

from __future__ import annotations

import pyarrow as pa


def registered_domain(host: str, suffixes: frozenset[str]) -> str:
    """Longest-suffix match; see module docstring for the edge rules."""
    labels = host.split(".")
    best = -1
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        if cand in suffixes and len(labels) - i > best:
            best = len(labels) - i
    if best < 0:
        return ".".join(labels[-2:]) if len(labels) >= 2 else host
    if best >= len(labels):
        return host
    return ".".join(labels[len(labels) - best - 1:])


class RegisteredDomainStage:
    """Actor-pool batch stage appending ``reg_domain``; the suffix set
    is frozen once per actor."""

    def __init__(self, suffixes, *, host_col: str = "host"):
        self.suffixes = frozenset(suffixes)
        self.host_col = host_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [registered_domain(h or "", self.suffixes)
               for h in batch[self.host_col].to_pylist()]
        return batch.append_column("reg_domain", pa.array(out, pa.string()))
