"""broadcast_join unit tests (stages/join.py)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    large = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 2, 9], pa.int64()), "v": pa.array(list("abcdef"))})
    )
    small = rd.from_arrow(
        pa.table({"rk": pa.array([1, 2, 3], pa.int64()), "dim": pa.array(["x", "y", "z"])})
    )
    return large, small


def test_inner_join(sides):
    from pprl_ray.stages.join import broadcast_join

    large, small = sides
    out = broadcast_join(large, small, keys="k", right_keys="rk").to_pandas()
    assert len(out) == 4  # k in {1,2,3}; k=2 twice
    got = dict(zip(out["v"], out["dim"]))
    assert got == {"a": "x", "b": "y", "c": "z", "e": "y"}


def test_left_outer_join(sides):
    from pprl_ray.stages.join import broadcast_join

    large, small = sides
    out = broadcast_join(
        large, small, keys="k", right_keys="rk", join_type="left outer"
    ).to_pandas()
    assert len(out) == 6
    assert out.loc[out["v"] == "f", "dim"].isna().all()


def test_asof_join_backward(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([10, 20, 5, 15, 7], pa.int64()),
        "lv": pa.array(list("abcde")),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "t": pa.array([8, 20, 99], pa.int64()),
        "rv": pa.array(["x", "y", "z"]),
    }))
    out = asof_join(left, right, key_col="k", ts_col="t").to_pandas()
    got = {(r["k"], r["t"]): r["rv_r"] for _, r in out.iterrows()}
    assert got[(1, 10)] == "x"     # latest right t<=10 is 8
    assert got[(1, 20)] == "y"     # exact match allowed
    assert pd.isna(got[(1, 5)])    # nothing at or before 5
    assert pd.isna(got[(2, 15)])   # right t=99 is in the future
    assert pd.isna(got[(3, 7)])    # key absent on right
    assert len(out) == 5


import pandas as pd  # noqa: E402


def test_asof_join_string_keys(ray_session):
    """Operators must partition correctly on non-integer keys."""
    import ray.data as rd

    from pprl_ray.stages.join import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array(["u1", "u2"]), "t": pa.array([10, 10], pa.int64()),
        "lv": pa.array(["a", "b"]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["u1"]), "t": pa.array([5], pa.int64()), "rv": pa.array(["x"]),
    }))
    out = asof_join(left, right, key_col="k", ts_col="t").to_pandas()
    got = dict(zip(out["k"], out["rv_r"]))
    assert got["u1"] == "x" and pd.isna(got["u2"])


def test_interval_join_containment(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import interval_join

    points = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "t": pa.array([5, 15, 40, 7], pa.int64()),
    }))
    intervals = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "start": pa.array([0, 20, 50], pa.int64()),
        "end": pa.array([10, 30, 60], pa.int64()),
        "label": pa.array(["a", "b", "c"]),
    }))
    out = interval_join(points, intervals, key_col="k", ts_col="t").to_pandas()
    got = {(r["k"], r["t"]): r["label_iv"] for _, r in out.iterrows()}
    assert got[(1, 5)] == "a"       # inside [0,10]
    assert pd.isna(got[(1, 15)])    # gap between intervals
    assert pd.isna(got[(1, 40)])    # after last interval's end
    assert pd.isna(got[(2, 7)])     # before key 2's interval
    assert len(out) == 4
