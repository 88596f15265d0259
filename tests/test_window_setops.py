"""Unit tests for stages/window.py and stages/setops.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        ("u1", base),
        ("u1", base + pd.Timedelta(minutes=10)),   # same session
        ("u1", base + pd.Timedelta(minutes=50)),   # 40min gap -> new session
        ("u2", base + pd.Timedelta(minutes=5)),    # different key
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows]),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    )
    out = sessionize(ds, gap_minutes=30).to_pandas().sort_values(
        ["user_id", "session_start"]
    ).reset_index(drop=True)
    assert len(out) == 3
    u1 = out[out["user_id"] == "u1"]
    assert list(u1["n_events"]) == [2, 1]
    assert u1.iloc[0]["session_end"] == base + pd.Timedelta(minutes=10)


def test_pairwise_jaccard_exact(ray_session):
    import ray.data as rd

    from pprl_ray.stages.setops import pairwise_jaccard

    # A={1,2,3}, B={2,3,4}, C={9}
    rows = [("A", 1), ("A", 2), ("A", 3), ("B", 2), ("B", 3), ("B", 4), ("C", 9)]
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows]),
                "e": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = pairwise_jaccard(ds, "k", "e")
    got = {(r["key_a"], r["key_b"]): r["jaccard"] for _, r in out.iterrows()}
    assert got[("A", "B")] == round(2 / 4, 6)
    assert got[("A", "C")] == 0.0
    assert got[("B", "C")] == 0.0


def test_pairwise_jaccard_beyond_63_keys_disjoint(ray_session):
    """70 disjoint singleton sets exercise the multi-word bitmask path:
    every pairwise Jaccard is exactly 0."""
    import ray.data as rd

    from pprl_ray.stages.setops import pairwise_jaccard

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i}" for i in range(70)]),
                "e": pa.array(list(range(70)), pa.int64()),
            }
        )
    )
    out = pairwise_jaccard(ds, "k", "e")
    assert len(out["jaccard"]) == 70 * 69 // 2
    assert all(j == 0.0 for j in out["jaccard"])


def test_running_aggregate_matches_pandas_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import running_aggregate

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),  # unique -> total order
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    out = (
        running_aggregate(ds, "k", ["ts"], "v", partitions=3)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    ref["running_sum"] = ref.groupby("k")["v"].cumsum()
    ref["row_in_key"] = ref.groupby("k").cumcount() + 1
    pd.testing.assert_frame_equal(
        out[["k", "ts", "v", "running_sum", "row_in_key"]].astype("int64"),
        ref.astype("int64"),
    )


def test_running_aggregate_partition_invariant(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import running_aggregate

    df = pd.DataFrame(
        {"k": [1, 1, 2, 2, 1], "ts": [3, 1, 5, 2, 2], "v": [10, 20, 30, 40, 50]}
    )

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        return (
            running_aggregate(ds, "k", ["ts"], "v", partitions=parts)
            .to_pandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(4))


def test_hop_windows_expansion_and_tumbling_special_case(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import hop_windows

    ts = pd.to_datetime(
        ["2024-01-01 00:00:01", "2024-01-01 00:59:59", "2024-01-01 01:00:00"]
    )
    ds = rd.from_arrow(
        pa.table({"ts": pa.array(ts, pa.timestamp("us")), "x": pa.array([1, 2, 3])})
    )
    out = hop_windows(ds, "ts", length_s=7200, step_s=3600, cols=["x"]).to_pandas()
    # every row lands in exactly length/step = 2 windows
    assert len(out) == 6
    base = int(pd.Timestamp("2024-01-01").timestamp())
    got = set(zip(out["x"], out["window_start"]))
    assert got == {
        (1, base), (1, base - 3600),
        (2, base), (2, base - 3600),
        (3, base + 3600), (3, base),
    }
    # tumbling special case: one window per row, start = floor(t/len)*len
    tum = hop_windows(ds, "ts", length_s=3600, step_s=3600, cols=["x"]).to_pandas()
    assert len(tum) == 3
    assert set(zip(tum["x"], tum["window_start"])) == {
        (1, base), (2, base), (3, base + 3600)
    }
    with pytest.raises(ValueError):
        hop_windows(ds, "ts", length_s=7200, step_s=3500)


def test_weighted_sample_es_deterministic_and_weight_biased(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sample import weighted_sample_es

    n = 2000
    # half the ids carry 50x the weight of the other half
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "w": np.where(np.arange(n) < n // 2, 50.0, 1.0),
        }
    )

    def run(parts):
        return weighted_sample_es(
            rd.from_pandas(df).repartition(parts), "doc_id", "w", k=100
        )

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert len(a) == 100 and a["doc_id"].is_unique
    # heavy ids dominate the sample (P[light sampled this often] ~ 0)
    assert (a["doc_id"] < n // 2).mean() > 0.8

    # non-positive weights fail the task (surfaces as a wrapped RayTaskError)
    with pytest.raises(Exception, match="weights must be positive"):
        weighted_sample_es(
            rd.from_pandas(pd.DataFrame({"doc_id": [1], "w": [0.0]})), "doc_id", "w", 1
        )


def test_token_index_pruned_lookup_equals_full_scan(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.stages.textindex import lookup_postings, write_token_index

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the quick brown fox",
                "quick quick slow",
                "fox and hound",
                "nothing here",
                "the the the",
                "brown fox quick",
            ],
        }
    )
    idx = str(tmp_path / "tok_index")
    write_token_index(rd.from_pandas(docs).repartition(3), idx, partitions=8)
    out = (
        lookup_postings(idx, ["quick", "fox"], partitions=8)
        .to_pandas()
        .sort_values(["token", "doc_id"])
        .reset_index(drop=True)
    )
    # full-scan reference: distinct (token, doc) containment
    ref = []
    for _, r in docs.iterrows():
        for t in ("quick", "fox"):
            if t in r["text"].split(" "):
                ref.append((t, r["doc_id"]))
    ref = pd.DataFrame(sorted(ref), columns=["token", "doc_id"])
    pd.testing.assert_frame_equal(out, ref.astype({"doc_id": "int64"}))

    # postings are distinct even when a token repeats within a doc
    assert ((out["token"] == "quick") & (out["doc_id"] == 1)).sum() == 1

    # pruning: the queried buckets are a strict subset of the index dirs
    import glob

    from pprl_ray.functions.digest import md5_bucket32

    all_buckets = {b.split("=")[-1] for b in glob.glob(f"{idx}/bucket=*")}
    query_buckets = {str(b) for b in md5_bucket32(["quick", "fox"], 8)}
    assert query_buckets < all_buckets or len(all_buckets) <= len(query_buckets)


def test_new_operators_handle_empty_and_degenerate_inputs(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import contamination_pairs
    from pprl_ray.stages.join import skew_join
    from pprl_ray.stages.window import hop_windows, running_aggregate

    empty_events = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "v": pa.array([], pa.int64()),
            }
        )
    )
    assert running_aggregate(empty_events, "k", ["ts"], "v", partitions=2).count() == 0
    assert hop_windows(empty_events, "ts", 7200, 3600).count() == 0

    # skew_join with an empty right side: inner -> empty, left outer -> all
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64()), "lv": pa.array([1, 2, 3], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )
    assert skew_join(left, right, keys="k", right_keys="rk",
                     hot_keys={1}, partitions=2).count() == 0
    lo = skew_join(left, right, keys="k", right_keys="rk", join_type="left outer",
                   hot_keys={1}, partitions=2).to_pandas()
    assert len(lo) == 3 and lo["rv"].isna().all()

    # contamination with zero overlap -> empty pair table
    t = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b c d e f"])})
    )
    e = rd.from_arrow(
        pa.table({"doc_id": pa.array([2], pa.int64()),
                  "text": pa.array(["q r s t u v"])})
    )
    assert contamination_pairs(t, e, shingle_n=5, partitions=2).count() == 0


def test_decayed_sum_exact_and_invariant(ray_session):
    """Decayed sum equals a local float reference within exactness of the
    rational weights, and is bit-identical across block counts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.stages.window import decayed_sum

    n = 3000
    rng = np.random.default_rng(5)
    base = 1_700_000_000_000_000
    ts = base - rng.integers(0, 40 * 86_400_000_000, n)  # up to 40 days old
    vals = np.round(rng.normal(10, 3, n), 3)
    keys = ["k%d" % (i % 3) for i in range(n)]
    t = pa.table(
        {
            "k": pa.array(keys),
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": pa.array(vals, pa.float64()),
        }
    )

    outs = []
    for blocks in (2, 11):
        out = (
            decayed_sum(rd.from_arrow(t).repartition(blocks), "k", "ts", "v", base)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    # local reference: exact same quantisation, float weights
    age = np.minimum((base - ts) // 86_400_000_000, 63)
    vu = np.round(vals * 1e6).astype(np.int64)
    ref = pd.DataFrame({"k": keys, "term": vu * 0.5 ** age.astype(np.float64)})
    ref = ref.groupby("k")["term"].sum() / 1e6
    got = outs[0].set_index("k")["decayed_value"]
    assert np.allclose(got.to_numpy(), ref.to_numpy(), rtol=1e-12)

    # horizon violation raises
    import pytest

    bad = pa.table(
        {
            "k": pa.array(["a"]),
            "ts": pa.array([base + 1], pa.timestamp("us")),
            "v": pa.array([1.0]),
        }
    )
    with pytest.raises(Exception):
        decayed_sum(rd.from_arrow(bad), "k", "ts", "v", base).to_pandas()
