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
