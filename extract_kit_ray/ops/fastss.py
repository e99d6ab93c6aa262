"""FastSS deletion-neighborhood join: all vocabulary term pairs within
Levenshtein distance ``k`` (default 2), without an O(V^2) comparison.

Algorithm (Bocek et al., "Fast Similarity Search in Large
Dictionaries", 2007): every term emits its <=k-deletion neighborhood
(the term plus every string reachable by deleting up to ``k``
characters); two terms within edit distance k share a neighborhood key
(align them — the <=k edit positions deleted from each side leave a
common string), so a groupby(variant) finds every candidate in one
shuffle over O(V * len^k) short rows.  Sharing a key only bounds the
true distance loosely, so candidates get an exact DP verify (terms are
capped at ``max_len`` chars, the DP is O(len^2) on a 12x12 grid)
before they leave.

Scale shape: the vocabulary build is the usual map-side-combine count
shuffle (one row per distinct term per batch); the neighborhood join
shuffles O(len^2) variants per term; pair verification is
per-candidate and candidates are bucket-bounded.  The demo query caps
the vocabulary (top-V by count, deterministic tiebreak) so the DuckDB
oracle's levenshtein cross-join stays quadratic-small; the engine path
itself never goes quadratic in V.

Terms are restricted to ``^[a-z]+$`` so the Python codepoint distance
and DuckDB's ``levenshtein`` agree by construction (ASCII).
"""

from __future__ import annotations

import re
from itertools import combinations

import pandas as pd
import pyarrow as pa

_TERM_RE = re.compile(r"^[a-z]+$")


def _lev(a: str, b: str) -> int:
    """Exact Levenshtein distance; inputs are capped at max_len chars."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _deletion_neighborhood(w: str, k: int) -> set[str]:
    """All strings reachable from w by deleting up to k characters."""
    out = {w}
    n = len(w)
    for d in range(1, min(k, n) + 1):
        for idx in combinations(range(n), d):
            drop = set(idx)
            out.add("".join(c for i, c in enumerate(w) if i not in drop))
    return out


def capped_vocab(ds, *, text_col: str = "text", min_len: int = 3,
                 max_len: int = 12, top_v: int = 300):
    """documents -> the top-``top_v`` lowercase-alpha terms by count
    (count DESC, term ASC — deterministic), as a small Dataset."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            for w in (text or "").split():
                if min_len <= len(w) <= max_len and _TERM_RE.match(w):
                    c[w] += 1
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(Sum("n", alias_name="n")))
    return counts.sort(["n", "word"], descending=[True, False]).limit(top_v)


def editk_pairs(vocab_ds, *, word_col: str = "word", k: int = 2):
    """Vocabulary Dataset -> distinct (term_a, term_b, dist) pairs with
    1 <= Levenshtein distance <= k, term_a < term_b."""

    def expand(batch: pa.Table) -> pa.Table:
        variants: list[str] = []
        terms: list[str] = []
        for w in batch[word_col].to_pylist():
            for v in _deletion_neighborhood(w, k):
                variants.append(v)
                terms.append(w)
        return pa.table({"variant": pa.array(variants, pa.string()),
                         "term": pa.array(terms, pa.string())})

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        terms = sorted(set(df["term"]))
        a_out: list[str] = []
        b_out: list[str] = []
        d_out: list[int] = []
        for i in range(len(terms)):
            for j in range(i + 1, len(terms)):
                d = _lev(terms[i], terms[j])
                if 1 <= d <= k:
                    a_out.append(terms[i])
                    b_out.append(terms[j])
                    d_out.append(d)
        # explicit arrow types: an empty pandas object frame would come
        # back null-typed and poison downstream schema unification
        return pa.table({"term_a": pa.array(a_out, pa.string()),
                         "term_b": pa.array(b_out, pa.string()),
                         "dist": pa.array(d_out, pa.int64())})

    pairs = (vocab_ds.map_batches(expand, batch_format="pyarrow",
                                  zero_copy_batch=True)
             .groupby("variant")
             .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair surfaces once per shared variant -> distinct (dist rides
    # along: it is a function of the pair, Min is just the dedup)
    from ray.data.aggregate import Min

    return (pairs.groupby(["term_a", "term_b"])
            .aggregate(Min("dist", alias_name="dist")))


def oracle_editk_pairs_sql(text_sql: str, *, min_len: int = 3,
                           max_len: int = 12, top_v: int = 300,
                           k: int = 2) -> str:
    """DuckDB mirror of capped_vocab + editk_pairs: levenshtein
    cross-join over the identically-capped vocabulary."""
    return f"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
  FROM ({text_sql})
), tc AS (
  SELECT word, COUNT(*) AS n FROM w
  WHERE length(word) BETWEEN {min_len} AND {max_len}
    AND regexp_matches(word, '^[a-z]+$')
  GROUP BY word
), v AS (
  SELECT word FROM tc ORDER BY n DESC, word ASC LIMIT {top_v}
)
SELECT a.word AS term_a, b.word AS term_b,
       CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
FROM v a JOIN v b ON a.word < b.word
WHERE levenshtein(a.word, b.word) BETWEEN 1 AND {k}
"""
