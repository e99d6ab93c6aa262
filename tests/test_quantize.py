"""Deterministic float->int quantized norm moments (ops/quantize.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.quantize import (oracle_quantized_norms_sql,
                                          quantized_norm_moments)


def _vec_df(seed=17, n=400, dim=16):
    rng = np.random.default_rng(seed)
    vecs = (rng.standard_normal((n, dim)) * 0.3).astype(np.float32)
    # adversarial values near the rounding boundary
    vecs[0, :] = np.float32(0.0005)
    vecs[1, :] = np.float32(-0.0005)
    vecs[2, :] = np.float32(1.9999999)
    return pd.DataFrame({
        "label": rng.integers(0, 5, n).astype(np.int32),
        "embedding": [v for v in vecs],
    })


def test_oracle_parity(ray_session):
    import ray.data

    df = _vec_df()
    out = quantized_norm_moments(ray.data.from_pandas(df),
                                 group_col="label", vec_col="embedding")
    got = sorted((int(r["label"]), int(r["n_vecs"]), int(r["sum_qnorm2"]),
                  int(r["min_qnorm2"]), int(r["max_qnorm2"]))
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(oracle_quantized_norms_sql(
        "SELECT * FROM t0", group_col="label",
        vec_col="embedding")).df()
    assert got == sorted(
        (int(l), int(n), int(s), int(mn), int(mx)) for l, n, s, mn, mx in
        zip(want["label"], want["n_vecs"], want["sum_qnorm2"],
            want["min_qnorm2"], want["max_qnorm2"]))


def test_quantization_is_floor_half_up():
    import ray.data

    df = pd.DataFrame({
        "label": np.array([0], np.int32),
        "embedding": [np.array([0.0015, -0.0015], np.float32)],
    })
    out = quantized_norm_moments(ray.data.from_pandas(df),
                                 group_col="label", vec_col="embedding")
    [row] = out.take_all()
    # float32(0.0015) ~ 0.001500000013 -> q = 2 (floor(1.5000...+0.5));
    # float32(-0.0015) -> q = floor(-1.0000...) = -2 or -1 depending on
    # the exact double — recompute it the same way instead of hardcoding
    v = np.array([0.0015, -0.0015], np.float32).astype(np.float64)
    q = np.floor(v * 1000 + 0.5).astype(np.int64)
    assert int(row["sum_qnorm2"]) == int((q * q).sum())
