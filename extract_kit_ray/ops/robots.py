"""robots.txt parsing + URL allow/deny filtering — the crawl-side
gate every web corpus applies before a page is even fetched (reference
scope: ingest hygiene around extract-kit's page readers; no reference
counterpart file — this is the web-pipeline extension surface).

Two halves:

* :func:`parse_robots` — a real robots.txt parser: ``#`` comments,
  case-insensitive field names, group structure (``User-agent`` lines
  open a group; only groups naming ``*`` apply to us), ``Disallow`` /
  ``Allow`` rules, empty ``Disallow:`` meaning allow-all, unknown
  fields (``Crawl-delay``, ``Sitemap``) skipped.
* :class:`RobotsFilter` — an actor-pool batch filter.  The rules table
  (host → [(is_allow, prefix)]) is tiny relative to the corpus, so it
  is built ONCE per actor in ``__init__`` from a broadcast
  ``ray.put`` handle and applied vectorized: one numpy prefix-match
  pass per rule, tracking the longest matching prefix per row
  (most-specific-match-wins, Allow wins ties — the Google semantics).

Scale shape: the URL table streams through ``map_batches`` with NO
shuffle; rule count is O(hosts × rules/host), broadcast once.  The
decision is replayed in SQL by the driver as a VALUES rule table +
``row_number() OVER (ORDER BY plen DESC, is_allow DESC)`` pick, so the
filter is exactly oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def parse_robots(text: str) -> list[tuple[bool, str]]:
    """Parse one robots.txt body into ``[(is_allow, path_prefix)]``
    rules that apply to ``User-agent: *``.

    Group semantics: consecutive ``User-agent`` lines open a group;
    the group's rules apply to us iff any of its agents is ``*``.
    ``Disallow:`` with an empty value is the spec's allow-all (emitted
    as an Allow rule for ``/`` of length 0 — it never out-specifics a
    real rule).  Unknown fields are ignored but DO terminate the
    user-agent run (per the de-facto grammar).
    """
    rules: list[tuple[bool, str]] = []
    applies = False        # current group names '*'
    in_agent_run = False   # inside a consecutive User-agent header run
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            # blank line ends a group entirely
            applies = False
            in_agent_run = False
            continue
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                applies = value == "*"
                in_agent_run = True
            else:
                applies = applies or value == "*"
            continue
        in_agent_run = False
        if not applies:
            continue
        if field == "disallow":
            if value == "":
                rules.append((True, ""))
            else:
                rules.append((False, value))
        elif field == "allow":
            if value:
                rules.append((True, value))
        # Crawl-delay / Sitemap / anything else: ignored
    return rules


def decide_allowed(paths: np.ndarray, rules: list[tuple[bool, str]],
                   ) -> np.ndarray:
    """Vectorized most-specific-match decision for one host's rules.

    One ``startswith`` pass per rule (rule count is tiny); per row we
    keep the longest matching prefix, Allow beating Disallow on equal
    length.  No matching rule → allowed.
    """
    n = len(paths)
    best_len = np.full(n, -1, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)
    for is_allow, prefix in rules:
        m = np.char.startswith(paths, prefix)
        plen = len(prefix)
        better = m & ((plen > best_len)
                      | ((plen == best_len) & bool(is_allow) & ~best_allow))
        best_len[better] = plen
        best_allow[better] = is_allow
    return best_allow


class RobotsFilter:
    """Actor-pool batch filter: keep rows whose (host, path) the
    broadcast robots rules allow.  ``rules_ref`` is a ``ray.put``
    handle to ``{host: robots_txt_str}`` — parsed ONCE per actor."""

    def __init__(self, rules_ref, *, host_col: str = "host",
                 path_col: str = "path"):
        raw: dict[str, str] = ray.get(rules_ref)
        self.rules = {h: parse_robots(t) for h, t in raw.items()}
        self.host_col = host_col
        self.path_col = path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = np.asarray(batch[self.host_col].to_pylist(), dtype=object)
        paths = np.asarray(batch[self.path_col].to_pylist(), dtype="U")
        keep = np.ones(len(batch), dtype=bool)
        # group rows by host within the batch: one decide pass per host
        order = np.argsort(hosts, kind="stable")
        sorted_hosts = hosts[order]
        bounds = np.flatnonzero(
            np.r_[True, sorted_hosts[1:] != sorted_hosts[:-1]])
        for i, start in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(order)
            idx = order[start:end]
            rules = self.rules.get(str(sorted_hosts[start]))
            if rules:
                keep[idx] = decide_allowed(paths[idx], rules)
        return batch.filter(pa.array(keep))


def robots_filter(ds: "ray.data.Dataset", robots_by_host: dict[str, str],
                  *, host_col: str = "host", path_col: str = "path",
                  concurrency: int | tuple[int, int] = (1, 4),
                  ) -> "ray.data.Dataset":
    """Filter a URL Dataset by broadcast robots.txt rules (no shuffle)."""
    ref = ray.put(robots_by_host)
    return ds.map_batches(
        RobotsFilter,
        fn_constructor_kwargs={"rules_ref": ref, "host_col": host_col,
                               "path_col": path_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def parse_crawl_delay(text: str) -> int | None:
    """Crawl-delay (seconds) from the ``User-agent: *`` group, or None.
    Same group semantics as :func:`parse_robots`; non-numeric values
    are ignored (failure-as-data).  Fractional delays floor to ints
    (politeness budgets are integer fetches/hour)."""
    applies = False
    in_agent_run = False
    delay: int | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            applies = False
            in_agent_run = False
            continue
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                applies = value == "*"
                in_agent_run = True
            else:
                applies = applies or value == "*"
            continue
        in_agent_run = False
        if applies and field == "crawl-delay":
            try:
                delay = int(float(value))
            except ValueError:
                pass
    return delay
