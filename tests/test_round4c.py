"""Round-4c additions: GramSketch, keep='min' compaction, composite-key
Bloom semi-join, classifier scoring."""

import numpy as np
import pyarrow as pa
import pytest


# --- GramSketch --------------------------------------------------------------


def test_gram_sketch_exact_vs_numpy_and_merge_invariance():
    from pprl_ray.sketches import GramSketch

    rng = np.random.default_rng(7)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = np.floor(x.astype(np.float64) * (1 << 15)).astype(np.int64)

    whole = GramSketch(8)
    whole.update(x.ravel())
    assert np.array_equal(whole.gram_fixed(), q.T @ q)
    assert whole.n == 500

    # merge of arbitrary splits == whole, bit-identical, any order
    for splits, order in [((100, 250), (0, 1, 2)), ((37, 401), (2, 0, 1))]:
        parts = []
        bounds = [0, *splits, 500]
        for a, b in zip(bounds, bounds[1:]):
            sk = GramSketch(8)
            sk.update(x[a:b].ravel())
            parts.append(sk)
        acc = parts[order[0]]
        for i in order[1:]:
            acc = acc.merge(parts[i])
        assert np.array_equal(acc.gram_fixed(), whole.gram_fixed())
        assert np.array_equal(acc.sums, whole.sums) and acc.n == whole.n

    # covariance readout matches numpy within quantisation error (~2^-15)
    cov = whole.covariance()
    ref = np.cov(x.astype(np.float64).T, bias=True)
    assert np.max(np.abs(cov - ref)) < 1e-4

    # serialization round-trip is exact
    back = GramSketch.from_bytes(whole.to_bytes())
    assert np.array_equal(back.gram_fixed(), whole.gram_fixed())
    assert np.array_equal(back.sums, whole.sums)
    assert (back.n, back.dim, back.scale) == (whole.n, whole.dim, whole.scale)


def test_gram_sketch_empty_and_registry():
    from pprl_ray.sketches import SKETCHES, GramSketch

    sk = GramSketch(4)
    sk.update(np.array([]))
    assert sk.n == 0 and np.all(sk.covariance() == 0) and np.all(sk.mean() == 0)
    assert SKETCHES["gram"] is GramSketch


# --- latest_by_key keep='min' -------------------------------------------------


def test_latest_by_key_keep_min(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import latest_by_key

    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 97, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    pdf = tbl.to_pandas()
    want = (
        pdf.sort_values(["k", "ts", "id"])
        .drop_duplicates("k")
        .sort_values("k")
        .reset_index(drop=True)
    )
    for nblocks in (1, 5):
        got = (
            latest_by_key(rd.from_arrow(tbl).repartition(nblocks), "k",
                          ["ts", "id"], partitions=3, keep="min")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert got.equals(want), nblocks

    with pytest.raises(ValueError, match="keep"):
        latest_by_key(rd.from_arrow(tbl), "k", ["ts"], keep="median")


# --- composite / string-key bloom semi-join ------------------------------------


def test_composite_key_hash_properties():
    from pprl_ray.stages.join import _composite_key_hash

    t = pa.table({
        "a": pa.array([1, 2, 1, 2], pa.int64()),
        "b": pa.array(["x", "x", "y", "y"]),
    })
    h_ab = _composite_key_hash(t, ["a", "b"])
    assert h_ab.dtype == np.int64 and len(set(h_ab)) == 4  # distinct pairs differ
    # column order matters: (a, b) != (b, a)
    h_ba = _composite_key_hash(t, ["b", "a"])
    assert not np.array_equal(h_ab, h_ba)
    # deterministic across chunked layouts
    t2 = pa.concat_tables([t.slice(0, 2), t.slice(2, 2)])
    assert np.array_equal(_composite_key_hash(t2, ["a", "b"]), h_ab)


def test_bloom_semi_join_string_and_multi_key(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import bloom_semi_join

    n = 2000
    left = rd.from_arrow(pa.table({
        "g": pa.array([f"g{i % 40}" for i in range(n)]),
        "c": pa.array(np.arange(n) % 7, pa.int64()),
        "v": pa.array(np.arange(n), pa.int64()),
    })).repartition(4)
    keys = rd.from_arrow(pa.table({
        "g": pa.array(["g3", "g3", "g17"]),
        "c": pa.array([0, 5, 2], pa.int64()),
    }))

    got = bloom_semi_join(left, keys, keys=["g", "c"]).to_pandas()
    want = {("g3", 0), ("g3", 5), ("g17", 2)}
    assert set(zip(got["g"], got["c"])) == want
    assert sorted(got["v"]) == sorted(
        i for i in range(n) if (f"g{i % 40}", i % 7) in want
    )

    # single STRING key rides the same folded path
    got_s = bloom_semi_join(
        left, keys.select_columns(["g"]), keys="g"
    ).to_pandas()
    assert set(got_s["g"]) == {"g3", "g17"}

    with pytest.raises(ValueError, match="equal length"):
        bloom_semi_join(left, keys, keys=["g", "c"], right_keys="g")


# --- classifier scoring ---------------------------------------------------------


def test_classifier_score_stage_exact_and_batch_invariant():
    from pprl_ray.stages.text import ClassifierScoreStage

    texts = ["the cat sat", "dog", "a b c d e f", "the the the"]
    t = pa.table({
        "doc_id": pa.array(np.arange(4), pa.int64()),
        "text": pa.array(texts),
    })
    stage = ClassifierScoreStage(buckets=64)
    out = stage(t).to_pandas()

    # hand-check one row against the definition
    from pprl_ray.functions.digest import md5_bucket32

    w = (np.arange(64, dtype=np.int64) * 2654435761) % 1000003 - 501501
    for i, txt in enumerate(texts):
        words = txt.split(" ")
        fx = int(w[md5_bucket32(pa.array(words), 64)].sum())
        assert out.loc[i, "score_fx"] == fx
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "score"] == fx / (1000003.0 * len(words))
        assert bool(out.loc[i, "label"]) == (fx > 0)

    # batch split invariance (scores accumulate per row, exactly)
    parts = [stage(t.slice(0, 2)).to_pandas(), stage(t.slice(2, 2)).to_pandas()]
    import pandas as pd

    assert pd.concat(parts, ignore_index=True).equals(out)

    # custom weights are honoured
    stage2 = ClassifierScoreStage(buckets=64, weights_fx=np.ones(64, np.int64))
    out2 = stage2(t).to_pandas()
    assert (out2["score_fx"] == out2["n_words"]).all()
