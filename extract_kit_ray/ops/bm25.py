"""Distributed BM25 full-text ranking over a document corpus.

Search-style retrieval is the lookup half of a training-data engine
(pair mining, eval-set retrieval, corpus QA) next to the embedding-ANN
family in :mod:`.similarity`.  The reference has no search operator;
this is an engine extension for the training-data role.

Scale shape — two streaming passes, no document shuffle:

1. **fused vocab+stats pass** (:func:`top_terms_with_stats`): one
   tokenize ``map_batches`` emits per-word partial rows carrying BOTH
   the term-pick signal (total count) and the scoring stats (document
   frequency), plus one sentinel row per batch with the corpus totals
   (doc count, token-length sum); ONE ``groupby(word)`` folds all of
   it.  Round 3 ran this as two separate corpus passes (vocab count,
   then a dedicated stats pass) — the fusion removes a full corpus
   read per query set.
2. **score pass**: stats are broadcast into an actor pool; each batch
   computes its tf matrix vectorized (Arrow ``split_pattern`` →
   flatten + ``value_parent_indices`` → ``np.bincount``) and emits
   only its per-term top-k candidate rows.  The driver merges
   ``n_batches × T × k`` candidate rows — never the corpus.

(:func:`corpus_stats` / :func:`top_terms` remain as the standalone
single-purpose variants for callers that bring their own terms.)

Determinism contract (what makes the SQL oracle exact): the rational
idf variant ``(N - df + 0.5) / (df + 0.5)`` avoids ``ln`` (libm ulp
differences between engines), every constant is a double, the
operation order is pinned, and scores are published as
``floor(score * 1e6 + 0.5)`` micro-units in BIGINT — so numpy float64
and DuckDB DOUBLE agree bit-for-bit, including the rank order derived
from them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def _tokens(batch_col):
    """Whitespace tokens per doc (the corpus-wide convention:
    ``text.split()``): normalized → single-space split.  Returns
    (ListArray words, int64 ndarray dl) with empty docs at dl 0."""
    norm = pc.utf8_trim(pc.replace_substring_regex(batch_col, r"\s+", " "), " ")
    words = pc.split_pattern(norm, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    dl = pc.list_value_length(words).to_numpy().astype(np.int64)
    empty = pc.equal(norm, "").to_numpy(zero_copy_only=False)
    dl[empty] = 0
    return words, dl


def _tf_matrix(words: pa.ListArray, n_rows: int, terms: list[str]) -> np.ndarray:
    """(n_rows, len(terms)) int64 term-frequency matrix in ONE pass
    over the flattened token buffer, independent of ``len(terms)``:
    ``pc.index_in`` hash-joins every token against the term list (one
    hash-table build + one probe pass), then a single ``np.bincount``
    over the fused (doc, term-id) key scatters the counts.  Round 4 ran
    an equality kernel + bincount PER TERM — linear in T, ~40x slower
    at T=1000 (microbench in BASELINE.md)."""
    n_terms = len(terms)
    tf = np.zeros((n_rows, n_terms), dtype=np.int64)
    if n_terms == 0 or n_rows == 0:
        return tf
    flat = pc.list_flatten(words)
    parent = words.value_parent_indices().to_numpy().astype(np.int64)
    tid = pc.index_in(flat, value_set=pa.array(terms, pa.string()))
    tid = tid.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    hit = tid >= 0
    if hit.any():
        fused = parent[hit] * n_terms + tid[hit]
        tf = np.bincount(fused, minlength=n_rows * n_terms).astype(
            np.int64).reshape(n_rows, n_terms)
    return tf


def corpus_stats(ds, terms: list[str], *, text_col: str = "text") -> dict:
    """One streaming pass → {n_docs, sum_dl, df: [per term]}."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words, dl = _tokens(batch[text_col])
        tf = _tf_matrix(words, len(batch), terms)
        row = {"n_docs": [len(batch)], "sum_dl": [int(dl.sum())]}
        for j in range(len(terms)):
            row[f"df_{j}"] = [int((tf[:, j] > 0).sum())]
        return pa.table(row)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    aggs = [Sum(c, alias_name=c) for c in
            ["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))]]
    row = partials.aggregate(*aggs)
    return {"n_docs": row["n_docs"], "sum_dl": row["sum_dl"],
            "df": [row[f"df_{j}"] for j in range(len(terms))]}


def score_micro(tf: np.ndarray, dl: np.ndarray, *, n_docs: int, df: int,
                avgdl: float) -> np.ndarray:
    """BM25 (rational-idf variant) in micro-units — the EXACT operation
    order the SQL oracle mirrors; see module docstring."""
    idf = (n_docs - df + 0.5) / (df + 0.5)
    denom = tf + K1 * ((1.0 - B) + (B * dl) / avgdl)
    score = idf * tf / denom
    return np.floor(score * 1e6 + 0.5).astype(np.int64)


def bm25_topk(ds, terms: list[str], *, topk: int = 10,
              text_col: str = "text", key_col: str = "doc_id",
              stats: dict | None = None):
    """Top-k docs per query term.  Returns a pandas DataFrame with
    columns (term, rank, doc_id, score_micro), rank 1-based, ties
    broken by ascending doc key.

    Pass ``stats`` (from :func:`top_terms_with_stats`) to skip the
    dedicated stats pass — the fused path costs two corpus reads total
    instead of three."""
    import pandas as pd
    import ray as _ray

    if stats is None:
        stats = corpus_stats(ds, terms, text_col=text_col)
    n_docs = int(stats["n_docs"])
    avgdl = stats["sum_dl"] / n_docs  # int/int -> float64, mirrored in SQL
    plan_ref = _ray.put({"terms": terms, "df": stats["df"],
                         "n_docs": n_docs, "avgdl": avgdl, "topk": topk})

    class Scorer:
        def __init__(self):
            import ray as _r

            self.plan = _r.get(plan_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            p = self.plan
            words, dl = _tokens(batch[text_col])
            tf = _tf_matrix(words, len(batch), p["terms"])
            keys = batch[key_col].to_numpy()
            out_t, out_k, out_s = [], [], []
            for j, term in enumerate(p["terms"]):
                s = score_micro(tf[:, j], dl, n_docs=p["n_docs"],
                                df=p["df"][j], avgdl=p["avgdl"])
                hit = np.nonzero(s > 0)[0]
                if len(hit) > p["topk"]:
                    # partial top-k per batch: candidates only
                    order = np.lexsort((keys[hit], -s[hit]))[: p["topk"]]
                    hit = hit[order]
                out_t.extend([term] * len(hit))
                out_k.extend(keys[hit].tolist())
                out_s.extend(s[hit].tolist())
            return pa.table({"term": pa.array(out_t, pa.string()),
                             key_col: pa.array(out_k, pa.int64()),
                             "score_micro": pa.array(out_s, pa.int64())})

    cand = ds.map_batches(Scorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8)).to_pandas()
    # driver merge of n_batches x T x k candidate rows (tiny)
    cand = cand.sort_values(["term", "score_micro", key_col],
                            ascending=[True, False, True])
    cand["rank"] = cand.groupby("term").cumcount() + 1
    out = cand[cand["rank"] <= topk].reset_index(drop=True)
    return pd.DataFrame({"term": out["term"],
                         "rank": out["rank"].astype("int64"),
                         key_col: out[key_col].astype("int64"),
                         "score_micro": out["score_micro"].astype("int64")})


def top_terms_with_stats(ds, *, lo_rank: int, hi_rank: int,
                         text_col: str = "text"):
    """Fused vocab + corpus-stats pass.  Returns ``(terms, stats)``
    where ``terms`` are the corpus words ranked (count DESC, word ASC)
    in [lo_rank, hi_rank] 1-based inclusive, and ``stats`` is the
    :func:`corpus_stats`-shaped dict for exactly those terms.

    One tokenize pass + one ``groupby(word)`` shuffle produce both: per
    word the partial rows carry (count, document frequency); corpus
    totals (n_docs, sum_dl) ride a per-batch sentinel row under the
    empty-string word (``str.split`` can never emit an empty token, so
    the sentinel cannot collide).  Ranking reads the aggregated vocab
    with a sort+limit; the vocab Dataset is materialized once because
    the totals row and the ranked head are two consumers."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c_n: Counter = Counter()
        c_df: Counter = Counter()
        sum_dl = 0
        for text in batch[text_col].to_pylist():
            toks = (text or "").split()
            sum_dl += len(toks)
            c_n.update(toks)
            c_df.update(set(toks))
        words = list(c_n.keys())
        return pa.table({
            "word": pa.array(words + [""], pa.string()),
            "n": pa.array([c_n[w] for w in words] + [0], pa.int64()),
            "df": pa.array([c_df[w] for w in words] + [0], pa.int64()),
            "docs": pa.array([0] * len(words) + [batch.num_rows], pa.int64()),
            "dl": pa.array([0] * len(words) + [sum_dl], pa.int64()),
        })

    vocab = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"), Sum("df", alias_name="df"),
                   Sum("docs", alias_name="docs"), Sum("dl", alias_name="dl"))
        .materialize()
    )
    totals_rows = vocab.filter(expr="word == ''").take_all()
    if not totals_rows:
        raise ValueError(
            "top_terms_with_stats: empty corpus — no batches produced the "
            "sentinel totals row (input dataset has zero blocks/rows)")
    totals = totals_rows[0]
    head = (vocab.filter(expr="word != ''")
            .sort(["n", "word"], descending=[True, False])
            .limit(hi_rank).take_all())
    picked = head[lo_rank - 1: hi_rank]
    terms = [r["word"] for r in picked]
    stats = {"n_docs": int(totals["docs"]), "sum_dl": int(totals["dl"]),
             "df": [int(r["df"]) for r in picked]}
    return terms, stats


def top_terms(ds, *, lo_rank: int, hi_rank: int, text_col: str = "text") -> list[str]:
    """Corpus terms ranked (count DESC, term ASC) in [lo_rank, hi_rank]
    1-based inclusive — the self-contained query-term pick both the
    engine and the SQL oracle derive identically."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            c.update((text or "").split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(Sum("n", alias_name="n")))
    top = counts.sort(["n", "word"], descending=[True, False]).limit(hi_rank)
    rows = top.take_all()
    return [r["word"] for r in rows[lo_rank - 1: hi_rank]]


def mrr_first_relevant(ds, terms: list[str], *, stats: dict,
                       text_col: str = "text", key_col: str = "doc_id"):
    """Retrieval-eval harness: for each query term, the RANK of the
    first relevant document and its reciprocal rank in micro-units.

    Relevance is the deterministic proxy both engines can state: the
    minimum doc key containing the term.  Rank is computed EXACTLY,
    without materializing a global sort: rank = 1 + |{docs scoring
    strictly better, or equal with a smaller key}| — two streaming
    passes (find the relevant doc + its score; count better docs with
    the (rel, rel_score) pair broadcast), each a per-batch vectorized
    partial + a tiny reduce.  Collects only O(T) rows.

    Returns a pandas DataFrame (term, rel_doc, rank, rr_micro).
    """
    import pandas as pd
    import ray as _ray
    from ray.data.aggregate import Sum

    n_docs = int(stats["n_docs"])
    avgdl = stats["sum_dl"] / n_docs
    plan_ref = _ray.put({"terms": terms, "df": stats["df"],
                         "n_docs": n_docs, "avgdl": avgdl})

    class RelFinder:
        def __init__(self):
            import ray as _r

            self.plan = _r.get(plan_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            p = self.plan
            words, dl = _tokens(batch[text_col])
            tf = _tf_matrix(words, len(batch), p["terms"])
            keys = batch[key_col].to_numpy()
            out_t, out_k, out_s = [], [], []
            for j, term in enumerate(p["terms"]):
                hit = np.nonzero(tf[:, j] > 0)[0]
                if not len(hit):
                    continue
                i = hit[np.argmin(keys[hit])]
                s = score_micro(tf[i:i + 1, j], dl[i:i + 1],
                                n_docs=p["n_docs"], df=p["df"][j],
                                avgdl=p["avgdl"])
                out_t.append(term)
                out_k.append(int(keys[i]))
                out_s.append(int(s[0]))
            return pa.table({"term": pa.array(out_t, pa.string()),
                             "rel_doc": pa.array(out_k, pa.int64()),
                             "rel_score": pa.array(out_s, pa.int64())})

    partials = ds.map_batches(RelFinder, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=(1, 8)).to_pandas()
    rel = (partials.sort_values(["term", "rel_doc"])
           .groupby("term", as_index=False).first())
    rel_ref = _ray.put({r["term"]: (int(r["rel_doc"]), int(r["rel_score"]))
                        for _, r in rel.iterrows()})

    class BetterCounter:
        def __init__(self):
            import ray as _r

            self.plan = _r.get(plan_ref)
            self.rel = _r.get(rel_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            p = self.plan
            words, dl = _tokens(batch[text_col])
            tf = _tf_matrix(words, len(batch), p["terms"])
            keys = batch[key_col].to_numpy()
            out_t, out_n = [], []
            for j, term in enumerate(p["terms"]):
                if term not in self.rel:
                    continue
                rd, rs = self.rel[term]
                hit = np.nonzero(tf[:, j] > 0)[0]
                if not len(hit):
                    continue
                s = score_micro(tf[hit, j], dl[hit],
                                n_docs=p["n_docs"], df=p["df"][j],
                                avgdl=p["avgdl"])
                better = int(((s > rs) | ((s == rs)
                                          & (keys[hit] < rd))).sum())
                out_t.append(term)
                out_n.append(better)
            return pa.table({"term": pa.array(out_t, pa.string()),
                             "better": pa.array(out_n, pa.int64())})

    counts = (ds.map_batches(BetterCounter, batch_format="pyarrow",
                             zero_copy_batch=True, concurrency=(1, 8))
              .groupby("term").aggregate(Sum("better", alias_name="better"))
              .to_pandas())
    out = rel.merge(counts, on="term", how="left").fillna({"better": 0})
    out["rank"] = out["better"].astype("int64") + 1
    out["rr_micro"] = (10 ** 6 // out["rank"]).astype("int64")
    return (out[["term", "rel_doc", "rank", "rr_micro"]]
            .sort_values("term").reset_index(drop=True))
