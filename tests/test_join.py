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


def test_broadcast_join_rejects_unsafe_types(sides):
    from pprl_ray.stages.join import broadcast_join

    large, small = sides
    with pytest.raises(ValueError, match="bucket_join"):
        broadcast_join(large, small, keys="k", right_keys="rk", join_type="full outer")


def test_bucket_join_inner_and_outer(sides):
    """Two-large-sides co-partitioned join: results match the broadcast
    join on the same inputs, for every pyarrow join type incl. the ones
    broadcast can't do."""
    from pprl_ray.stages.join import bucket_join

    large, small = sides
    inner = bucket_join(large, small, keys="k", right_keys="rk", partitions=5).to_pandas()
    assert dict(zip(inner["v"], inner["dim"])) == {"a": "x", "b": "y", "c": "z", "e": "y"}

    left = bucket_join(
        large, small, keys="k", right_keys="rk", join_type="left outer", partitions=5
    ).to_pandas()
    assert len(left) == 6
    assert left.loc[left["v"] == "f", "dim"].isna().all()

    full = bucket_join(
        large, small, keys="k", right_keys="rk", join_type="full outer", partitions=5
    ).to_pandas()
    assert len(full) == 6  # 4 matched + k=4,9 unmatched left; no unmatched right
    semi = bucket_join(
        large, small, keys="k", right_keys="rk", join_type="left semi", partitions=5
    ).to_pandas()
    assert sorted(semi["v"]) == ["a", "b", "c", "e"]
    anti = bucket_join(
        large, small, keys="k", right_keys="rk", join_type="left anti", partitions=5
    ).to_pandas()
    assert sorted(anti["v"]) == ["d", "f"]


def test_bucket_join_suffixes_colliding_columns(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import bucket_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array(["a", "b"])}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["x"])}))
    out = bucket_join(left, right, keys="k", partitions=3).to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert out.iloc[0]["v"] == "a" and out.iloc[0]["v_r"] == "x"


def test_bucket_join_multi_key_and_string(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import bucket_join

    left = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y"]), "b": pa.array([1, 2, 1], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "a": pa.array(["x", "y"]), "b": pa.array([2, 1], pa.int64()),
        "rv": pa.array([200, 300], pa.int64()),
    }))
    out = bucket_join(left, right, keys=["a", "b"], partitions=4).to_pandas()
    assert sorted(zip(out["lv"], out["rv"])) == [(20, 200), (30, 300)]


def test_asof_join_int64_keys_above_2_53(ray_session):
    """Epoch-nanosecond int64 keys must compare exactly (no float64
    round-trip): values differing by 1 ns above 2^53 pick the right row."""
    import ray.data as rd

    from pprl_ray.stages.join import asof_join

    base = 1_600_000_000_000_000_000  # ~2^60 epoch ns
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "t": pa.array([base + 2, base + 5], pa.int64()),
        "lv": pa.array(["p", "q"]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "t": pa.array([base + 1, base + 3, base + 6], pa.int64()),
        "rv": pa.array(["r1", "r2", "r3"]),
    }))
    out = asof_join(left, right, key_col="k", ts_col="t").to_pandas()
    got = dict(zip(out["t"], out["rv_r"]))
    # float64 would collapse base+1..base+6 to the same key and mismatch
    assert got[base + 2] == "r1" and got[base + 5] == "r2"
    assert out["t"].dtype == "int64"


def test_bloom_semi_join_exact_and_prefilter_only():
    """A deliberately tiny Bloom forces false positives: exact=True must
    remove every one (equals the true semi-join); exact=False must be a
    superset with NO false negatives."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.stages.join import bloom_semi_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(5000), pa.int64()),
                  "v": pa.array(np.arange(5000) * 2, pa.int64())})
    ).repartition(4)
    keys = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(0, 5000, 50), pa.int64())})
    ).repartition(2)
    true_keys = set(range(0, 5000, 50))

    exact = bloom_semi_join(left, keys, keys="k", bloom_bits=1 << 10, bloom_k=2)
    got = sorted(r["k"] for r in exact.take_all())
    assert got == sorted(true_keys)

    approx = bloom_semi_join(left, keys, keys="k", bloom_bits=1 << 10, bloom_k=2,
                             exact=False)
    approx_keys = {r["k"] for r in approx.take_all()}
    assert true_keys <= approx_keys          # no false negatives, ever
    assert len(approx_keys) > len(true_keys)  # tiny bloom must false-positive


def test_skew_join_matches_bucket_join_and_detects_hot_keys(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pprl_ray.stages.join import bucket_join, detect_hot_keys, skew_join

    def from_df(df, parts=1):
        return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)

    rng = np.random.default_rng(5)
    n = 4000
    # zipf-ish: 40% of left rows hit key 7, rest uniform over 1..500
    keys = np.where(rng.random(n) < 0.4, 7, rng.integers(1, 501, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {"rk": np.arange(0, 600, dtype=np.int64), "rv": np.arange(0, 600) * 10}
    )

    hot = detect_hot_keys(from_df(left, 6), "k", threshold=0.05)
    assert 7 in hot and len(hot) < 20

    for jt in ("inner", "left outer"):
        got = (
            skew_join(
                from_df(left, 6),
                from_df(right, 3),
                keys="k", right_keys="rk", join_type=jt, hot_threshold=0.05,
                partitions=4,
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        ref = (
            bucket_join(
                from_df(left, 6),
                from_df(right, 3),
                keys="k", right_keys="rk", join_type=jt, partitions=4,
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[ref.columns], ref)

    # no hot keys -> pure bucket_join fallback, same result
    uni = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "lv": np.arange(100)})
    got = skew_join(
        from_df(uni), from_df(right), keys="k", right_keys="rk",
        hot_threshold=0.2, partitions=2,
    ).to_pandas()
    assert len(got) == 100

    with pytest.raises(ValueError, match="skew_join supports"):
        skew_join(from_df(uni), from_df(right), keys="k",
                  right_keys="rk", join_type="full outer")
    with pytest.raises(ValueError, match="capacity"):
        detect_hot_keys(from_df(uni), "k", threshold=0.001, capacity=10)
