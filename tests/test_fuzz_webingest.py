"""Multi-seed randomized parity fuzz for the round-5 web-ingest ops —
every trial re-derives the oracle in DuckDB on a fresh random frame
(rule sets, path shapes, line structures rotate per seed); the
fixed-plant parity lives in the driver queries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SEEDS = [11, 22, 33]


def _rand_prefix(rng, maxlen=5):
    alpha = "ab/c"
    return "".join(rng.choice(list(alpha))
                   for _ in range(int(rng.integers(0, maxlen))))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_robots_decision_vs_sql(ray_session, seed):
    """Random rule sets + random paths: the engine's render->parse->
    decide chain must match the SQL VALUES + window-pick replay."""
    import ray.data

    from extract_kit_ray.ops.robots import robots_filter

    rng = np.random.default_rng(seed)
    hosts = [f"h{i}.x" for i in range(3)]
    # (False, "") is unrepresentable in robots.txt (an empty Disallow
    # value means allow-all by spec), so it never enters the fixture
    rules = {h: [(a, p) for a, p in
                 ((bool(rng.integers(0, 2)), _rand_prefix(rng))
                  for _ in range(int(rng.integers(0, 5))))
                 if a or p != ""]
             for h in hosts}
    texts = {}
    for h, rs in rules.items():
        lines = ["User-agent: bad", "Disallow: /", "", "User-agent: *"]
        for allow, p in rs:
            if allow and p == "":
                lines.append("Disallow:")
            else:
                lines.append(("Allow: " if allow else "Disallow: ") + p)
        texts[h] = "\n".join(lines)

    n = 120
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "host": rng.choice(hosts + ["other.x"], n),
        "path": [_rand_prefix(rng, 7) for _ in range(n)],
    })
    out = robots_filter(ray.data.from_pandas(df), texts).to_pandas()
    got = sorted(out["doc_id"].astype(int))

    vals = [f"('{h}', '{p}', {'TRUE' if a else 'FALSE'}, {len(p)})"
            for h, rs in rules.items() for a, p in rs]
    con = duckdb.connect()
    con.register("u", df)
    if vals:
        sql = (
            f"WITH r(host, prefix, is_allow, plen) AS (VALUES {', '.join(vals)}), "
            "m AS (SELECT u.doc_id, r.is_allow, ROW_NUMBER() OVER ("
            "PARTITION BY u.doc_id ORDER BY r.plen DESC, r.is_allow DESC) AS rn "
            "FROM u JOIN r ON u.host = r.host AND starts_with(u.path, r.prefix)) "
            "SELECT u.doc_id FROM u LEFT JOIN (SELECT doc_id, is_allow FROM m "
            "WHERE rn = 1) b USING (doc_id) WHERE b.doc_id IS NULL OR b.is_allow"
        )
    else:
        sql = "SELECT doc_id FROM u"
    want = sorted(con.execute(sql).df()["doc_id"].astype(int))
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_url_template_re2_parity(seed):
    """pyarrow replace_substring_regex and DuckDB regexp_replace must
    rewrite random paths identically (both RE2, same pattern)."""
    rng = np.random.default_rng(seed)
    alpha = list("/0123456789ab")
    paths = ["".join(rng.choice(alpha)
                     for _ in range(int(rng.integers(0, 14))))
             for _ in range(200)]
    got = pc.replace_substring_regex(
        pa.array(paths, pa.string()), r"/\d+(/|$)", r"/<n>\1").to_pylist()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"p": paths}))
    want = con.execute(
        r"SELECT regexp_replace(p, '/\d+(/|$)', '/<n>\1', 'g') AS v FROM t"
    ).df()["v"].tolist()
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_c4_rule_vs_sql(seed):
    """Random multi-line texts: the Python keep-rule must match the
    DuckDB list_filter replay line for line."""
    from extract_kit_ray.ops.clean import c4_line_filter

    rng = np.random.default_rng(seed)
    alpha = list("a b.!?x\t")
    texts = ["".join(rng.choice(alpha)
                     for _ in range(int(rng.integers(0, 60))))
             .replace("x", "\n" if rng.integers(0, 2) else "x")
             for _ in range(100)]
    got = []
    for t in texts:
        kept, dropped = c4_line_filter(t.split("\n"))
        got.append(("\n".join(kept), len(kept), dropped))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(texts)), "s": texts}))
    want = con.execute(
        "SELECT i, coalesce(string_agg(CASE WHEN kept THEN line END, "
        "chr(10) ORDER BY idx), '') AS s2, "
        "count(CASE WHEN kept THEN 1 END) AS nk, "
        "count(CASE WHEN NOT kept THEN 1 END) AS nd FROM ("
        "SELECT i, idx, line, "
        "len(list_filter(regexp_split_to_array(line, '\\s+'), "
        "x -> x <> '')) >= 5 AND (ends_with(line, '.') OR "
        "ends_with(line, '!') OR ends_with(line, '?')) AS kept FROM ("
        "SELECT i, unnest(generate_series(1, len(string_split(s, chr(10)"
        ")))) AS idx, string_split(s, chr(10)) AS ls FROM t), "
        "LATERAL (SELECT ls[idx] AS line)) GROUP BY i ORDER BY i"
    ).df()
    assert got == [(r["s2"], int(r["nk"]), int(r["nd"]))
                   for _, r in want.iterrows()]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_oov_vs_sql(ray_session, seed):
    import ray.data

    from extract_kit_ray.ops.textops import OovScorer

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(int(rng.integers(5, 25)))]
    n = 150
    texts = [" ".join(rng.choice(words,
                                 size=int(rng.integers(0, 12))))
             for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    k = int(rng.integers(1, 8))

    import ray as _ray
    con = duckdb.connect()
    con.register("documents", df)
    vocab = con.execute(
        "SELECT word FROM (SELECT unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word "
        "FROM documents) GROUP BY word "
        f"ORDER BY count(*) DESC, word ASC LIMIT {k}"
    ).df()["word"].tolist()
    out = ray.data.from_pandas(df).map_batches(
        OovScorer, fn_constructor_kwargs={"vocab_ref": _ray.put(vocab)},
        batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    got = sorted((int(r["doc_id"]), int(r["n_tokens"]), int(r["n_oov"]),
                  int(r["oov_bps"])) for _, r in out.iterrows())
    want = con.execute(
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "text, '\\s+'), x -> x <> '') AS ws FROM documents), "
        "t AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "top AS (SELECT word, 1 AS hit FROM (SELECT word FROM t GROUP "
        f"BY word ORDER BY count(*) DESC, word ASC LIMIT {k})), "
        "o AS (SELECT t.doc_id, count(*) AS n_oov FROM t LEFT JOIN top "
        "USING (word) WHERE top.hit IS NULL GROUP BY t.doc_id) "
        "SELECT w.doc_id, len(w.ws) AS nt, coalesce(o.n_oov, 0) AS no, "
        "CASE WHEN len(w.ws) = 0 THEN 0 ELSE coalesce(o.n_oov, 0) "
        "* 10000 // len(w.ws) END AS bps FROM w LEFT JOIN o "
        "ON w.doc_id = o.doc_id"
    ).df()
    assert got == sorted((int(r["doc_id"]), int(r["nt"]), int(r["no"]),
                          int(r["bps"])) for _, r in want.iterrows())
