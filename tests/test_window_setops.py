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


def test_pairwise_jaccard_rejects_too_many_keys(ray_session):
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
    with pytest.raises(NotImplementedError, match="63"):
        pairwise_jaccard(ds, "k", "e")
