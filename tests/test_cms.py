"""Count-Min sketch (ops/cms.py)."""

import duckdb
import numpy as np
import pandas as pd

from extract_kit_ray.ops.cms import (cms_estimate, cms_matrix,
                                     cms_probe_counts, oracle_cms_sql)


def _ds(keys):
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame({"k": np.asarray(keys, np.int64)}))


def test_exact_when_wide(ray_session):
    # width >> distinct keys: no collisions, estimates are exact
    keys = np.repeat(np.arange(20, dtype=np.int64), np.arange(1, 21))
    mat = cms_matrix(_ds(keys), key_col="k", width=4096)
    est = cms_estimate(mat, np.arange(20, dtype=np.int64))
    assert est.tolist() == list(range(1, 21))


def test_never_underestimates(ray_session):
    rng = np.random.default_rng(9)
    keys = rng.integers(-500, 500, 5000).astype(np.int64)
    mat = cms_matrix(_ds(keys), key_col="k", width=64)  # force collisions
    probes = np.arange(-500, 500, dtype=np.int64)
    est = cms_estimate(mat, probes)
    true = pd.Series(keys).value_counts()
    truth = np.array([true.get(p, 0) for p in probes], np.int64)
    assert (est >= truth).all()
    assert (est > truth).any()  # collisions actually occurred


def test_merge_is_matrix_sum(ray_session):
    a = np.arange(0, 300, dtype=np.int64) % 37
    b = np.arange(0, 500, dtype=np.int64) % 53
    m_all = cms_matrix(_ds(np.concatenate([a, b])), key_col="k", width=128)
    m_sum = (cms_matrix(_ds(a), key_col="k", width=128)
             + cms_matrix(_ds(b), key_col="k", width=128))
    assert (m_all == m_sum).all()


def test_oracle_parity_with_collisions(ray_session):
    rng = np.random.default_rng(33)
    keys = rng.integers(-10_000, 10_000, 8000).astype(np.int64)
    got = cms_probe_counts(_ds(keys), key_col="k",
                           probes=np.arange(-100, 100, dtype=np.int64),
                           width=64).to_pandas()
    con = duckdb.connect()
    con.register("k0", pd.DataFrame({"k": keys}))
    want = con.execute(oracle_cms_sql(
        "SELECT k FROM k0", key_col="k",
        probes_sql="SELECT CAST(range AS BIGINT) AS k "
                   "FROM range(-100, 100)",
        width=64)).df()
    merged = got.merge(want, left_on="key", right_on="key",
                       suffixes=("_got", "_want"))
    assert len(merged) == 200
    assert (merged["est_n_got"] == merged["est_n_want"]).all()
