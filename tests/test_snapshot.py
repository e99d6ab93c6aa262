"""Cross-snapshot diff (ops/snapshot.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.snapshot import oracle_snapshot_diff_sql, snapshot_diff


def _run(old_df, new_df):
    import ray.data

    out = snapshot_diff(ray.data.from_pandas(old_df),
                        ray.data.from_pandas(new_df), key_col="k")
    return {r["key"]: r["status"] for r in out.take_all()}


def test_all_four_statuses(ray_session):
    old = pd.DataFrame({"k": [1, 2, 3], "text": ["a", "b", "c"]})
    new = pd.DataFrame({"k": [2, 3, 4], "text": ["b", "C!", "d"]})
    assert _run(old, new) == {1: "deleted", 2: "same", 3: "changed",
                              4: "new"}


def test_string_keys(ray_session):
    old = pd.DataFrame({"k": ["u/a"], "text": ["x"]})
    new = pd.DataFrame({"k": ["u/b"], "text": ["x"]})
    assert _run(old, new) == {"u/a": "deleted", "u/b": "new"}


def test_empty_new_snapshot(ray_session):
    old = pd.DataFrame({"k": [1], "text": ["a"]})
    new = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                        "text": pd.Series([], dtype=str)})
    assert _run(old, new) == {1: "deleted"}


def test_oracle_parity_random(ray_session):
    rng = np.random.default_rng(89)
    keys = np.arange(200, dtype=np.int64)
    texts = [f"doc {k} body" for k in keys]
    old = pd.DataFrame({"k": keys, "text": texts})
    keep = rng.random(200) > 0.3
    new = old[keep].copy()
    mutate = rng.random(len(new)) > 0.5
    new.loc[mutate, "text"] = new.loc[mutate, "text"] + " v2"
    extra = pd.DataFrame({"k": np.arange(200, 230, dtype=np.int64),
                          "text": [f"fresh {i}" for i in range(30)]})
    new = pd.concat([new, extra], ignore_index=True)

    got = _run(old, new)
    con = duckdb.connect()
    con.register("o0", old)
    con.register("n0", new)
    want = con.execute(oracle_snapshot_diff_sql(
        "SELECT * FROM o0", "SELECT * FROM n0", key_col="k")).df()
    assert got == {int(k): s for k, s in zip(want["key"], want["status"])}
