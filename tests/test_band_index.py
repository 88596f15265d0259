"""Persisted MinHash band index: incremental near-dedup across corpus
versions (stages/dedup.py write_band_index / incremental_near_dedup)."""

import json

import numpy as np
import pyarrow as pa
import pytest


def _doc(rng, n=60, vocab=200):
    return " ".join(f"t{j}" for j in rng.integers(0, vocab, n))


def _matched_bands(text_a, text_b, k=128, bands=16, shingle_n=3):
    """Ground truth: how many LSH bands two texts share (the same kernels
    the stage uses)."""
    from pprl_ray.sketches.lsh import band_keys, minhash_signatures
    from pprl_ray.stages.dedup import shingle_tokens

    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array([text_a, text_b])})
    sh = shingle_tokens(batch, "text", shingle_n)
    sigs = minhash_signatures(sh, k)
    bk = band_keys(sigs, bands)
    return int((bk[0] == bk[1]).sum())


def test_incremental_near_dedup_across_versions(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.stages.dedup import incremental_near_dedup, write_band_index

    rng = np.random.default_rng(21)
    v1_texts = [_doc(rng) for _ in range(30)]
    v1 = pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array(v1_texts),
    })
    idx = str(tmp_path / "bandidx")
    n_keys = write_band_index(rd.from_arrow(v1).repartition(3), idx)
    meta = json.load(open(tmp_path / "bandidx" / "_meta.json"))
    assert meta["n_keys"] == n_keys > 0

    # v2: an exact copy of a v1 doc, a near-dup of a v1 doc (tail word
    # changed), two identical NEW docs (internal dup), and novel docs
    near = v1_texts[5].rsplit(" ", 1)[0] + " zz"
    novel = [_doc(rng) for _ in range(10)]
    internal = _doc(rng)
    v2_texts = [v1_texts[3], near, internal, internal] + novel
    v2 = pa.table({
        "doc_id": pa.array(range(100, 100 + len(v2_texts)), pa.int64()),
        "text": pa.array(v2_texts),
    })
    kept = incremental_near_dedup(
        rd.from_arrow(v2).repartition(4), idx
    ).to_pandas().sort_values("doc_id")
    kept_ids = list(kept["doc_id"])

    assert 100 not in kept_ids  # exact copy: every band matches
    # near-dup: drop iff its ground-truth matched-band count >= 1
    expect_near_drop = _matched_bands(v1_texts[5], near) >= 1
    assert (101 not in kept_ids) == expect_near_drop
    assert 102 in kept_ids and 103 not in kept_ids  # internal: min id wins
    for i in range(104, 104 + 10):
        assert i in kept_ids  # novel docs survive

    # v3 against the UPDATED index: a copy of a v2 SURVIVOR is dropped
    v3 = pa.table({
        "doc_id": pa.array([500, 501], pa.int64()),
        "text": pa.array([internal, _doc(rng)]),
    })
    kept3 = incremental_near_dedup(rd.from_arrow(v3), idx).to_pandas()
    assert list(kept3["doc_id"]) == [501]
    meta2 = json.load(open(tmp_path / "bandidx" / "_meta.json"))
    assert meta2["n_keys"] > meta["n_keys"]  # grew by the survivors' keys


def test_match_bands_min_gates_weak_matches(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.stages.dedup import incremental_near_dedup, write_band_index

    rng = np.random.default_rng(33)
    base = _doc(rng, n=80)
    v1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array([base])})
    idx = str(tmp_path / "idx2")
    write_band_index(rd.from_arrow(v1), idx, bands=16)

    near = base.rsplit(" ", 1)[0] + " zz"
    m = _matched_bands(base, near)
    assert 0 < m < 16  # a true near-dup: some but not all bands agree
    v2 = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                   "text": pa.array([near, base])})

    # permissive gate drops both; an all-bands gate keeps the near-dup
    kept_loose = incremental_near_dedup(
        rd.from_arrow(v2), idx, match_bands_min=1, update_index=False
    ).to_pandas()
    assert len(kept_loose) == 0  # (empty to_pandas drops schema in ray 2.49)
    kept_strict = incremental_near_dedup(
        rd.from_arrow(v2), idx, match_bands_min=16, update_index=False
    ).to_pandas()
    assert list(kept_strict["doc_id"]) == [10]

    # exact-threshold gate mirrors the ground-truth band count
    kept_at_m = incremental_near_dedup(
        rd.from_arrow(v2), idx, match_bands_min=m, update_index=False
    ).to_pandas()
    assert len(kept_at_m) == 0  # both the near-dup (m bands) and the copy drop
    kept_above_m = incremental_near_dedup(
        rd.from_arrow(v2), idx, match_bands_min=m + 1, update_index=False
    ).to_pandas()
    assert 10 in list(kept_above_m["doc_id"])


def test_band_index_refuses_double_create(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.stages.dedup import write_band_index

    v1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["a b c d e f g h"])})
    idx = str(tmp_path / "idx3")
    write_band_index(rd.from_arrow(v1), idx)
    with pytest.raises(FileExistsError):
        write_band_index(rd.from_arrow(v1), idx)


def test_confirm_set_drops_only_set_identical(ray_session, tmp_path):
    """confirm='set': exact shingle-set duplicates drop; near-identical
    docs survive even when every LSH band collides (the hash-accident
    case a raw signature gate cannot avoid)."""
    import ray.data as rd

    from pprl_ray.stages.dedup import incremental_near_dedup, write_band_index

    rng = np.random.default_rng(55)
    base = _doc(rng, n=80)
    v1 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array([base, _doc(rng)])})
    idx = str(tmp_path / "idxset")
    write_band_index(rd.from_arrow(v1), idx)

    near = base.rsplit(" ", 1)[0] + " zz"   # j < 1: set differs
    internal = _doc(rng)
    v2 = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array([base, near, internal, internal, _doc(rng)]),
    })
    kept = incremental_near_dedup(
        rd.from_arrow(v2).repartition(3), idx,
        match_bands_min=1, confirm="set",
    ).to_pandas()
    # 10 = exact copy of indexed doc -> drop; 11 = near-dup (bands fire,
    # set differs) -> keep; 13 = internal set-dup of 12 -> drop; 14 novel
    assert sorted(kept["doc_id"]) == [11, 12, 14]

    # chained: the updated index now holds v2 survivors' sets
    v3 = pa.table({"doc_id": pa.array([20, 21], pa.int64()),
                   "text": pa.array([internal, near])})
    kept3 = incremental_near_dedup(
        rd.from_arrow(v3), idx, match_bands_min=1, confirm="set",
    ).to_pandas()
    assert len(kept3) == 0  # both now indexed (empty to_pandas drops schema)


def test_confirm_rejects_unknown_mode(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.stages.dedup import incremental_near_dedup, write_band_index

    v1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["a b c d e"])})
    idx = str(tmp_path / "idx4")
    write_band_index(rd.from_arrow(v1), idx)
    with pytest.raises(ValueError, match="confirm"):
        incremental_near_dedup(rd.from_arrow(v1), idx, confirm="exact")
