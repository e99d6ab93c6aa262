"""Z-order locality keys (ops/zorder.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from extract_kit_ray.ops.zorder import morton_key, zorder_key_sql, zorder_keys


def test_morton_reference_values():
    # interleave(x=0b11, y=0b01) = y1 x1 y0 x0 = 0 1 1 1
    got = morton_key(np.array([3]), np.array([1]), bits=2)
    assert got[0] == 0b0111
    # x occupies even bits, y odd
    assert morton_key(np.array([1]), np.array([0]), bits=4)[0] == 1
    assert morton_key(np.array([0]), np.array([1]), bits=4)[0] == 2


def test_masking_to_bits():
    assert (morton_key(np.array([0b10101]), np.array([0]), bits=2)[0]
            == morton_key(np.array([0b01]), np.array([0]), bits=2)[0])


def test_locality_monotone_tiles():
    # all points in tile (0..3, 0..3) sort before any in (4..7, 4..7)
    xs, ys = np.meshgrid(np.arange(8), np.arange(8))
    z = morton_key(xs.ravel(), ys.ravel(), bits=3)
    low = z[(xs.ravel() < 4) & (ys.ravel() < 4)]
    high = z[(xs.ravel() >= 4) & (ys.ravel() >= 4)]
    assert low.max() < high.min()


def test_dataset_columns_and_bucket(ray_session):
    import ray.data

    df = pd.DataFrame({"x": [1, 5], "y": [2, 7]})
    out = zorder_keys(ray.data.from_pandas(df), x_col="x", y_col="y",
                      bits=3, bucket_bits=2).take_all()
    for r in out:
        assert r["zbucket"] == r["zkey"] >> 4


def test_param_validation(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"x": [1], "y": [1]}))
    with pytest.raises(ValueError):
        zorder_keys(ds, x_col="x", y_col="y", bits=0)
    with pytest.raises(ValueError):
        zorder_keys(ds, x_col="x", y_col="y", bits=4, bucket_bits=9)


def test_sql_parity_random(ray_session):
    rng = np.random.default_rng(101)
    n = 500
    df = pd.DataFrame({
        "x": rng.integers(0, 1 << 16, n).astype(np.int64),
        "y": rng.integers(0, 1 << 16, n).astype(np.int64),
    })
    import ray.data

    got = sorted(
        (r["x"], r["y"], r["zkey"]) for r in
        zorder_keys(ray.data.from_pandas(df), x_col="x", y_col="y",
                    bits=16).take_all())
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute(
        f"SELECT x, y, {zorder_key_sql('x', 'y', bits=16)} AS z FROM t0"
    ).df()
    assert got == sorted((int(x), int(y), int(z)) for x, y, z in
                         zip(want["x"], want["y"], want["z"]))
