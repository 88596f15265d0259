"""Round-4 additions: exact n-gram Jaccard pairs, BM25 top-k retrieval,
deterministic hash split."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest


# --- ngram_jaccard_pairs ------------------------------------------------------


def _gram_set(text: str, n: int) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_ngram_jaccard_pairs_exact(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and AGAIN"
    other = "completely different words with nothing shared at all here now"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": other},
    ]
    out = ngram_jaccard_pairs(
        rd.from_items(rows).repartition(3), shingle_n=3, threshold=0.3
    ).to_pandas()
    a, b = _gram_set(base, 3), _gram_set(near, 3)
    expected_j = len(a & b) / len(a | b)
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["n_shared"] == len(a & b)
    assert row["jaccard"] == pytest.approx(expected_j, abs=1e-12)


def test_ngram_jaccard_threshold_and_partitioning_invariance(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import ngram_jaccard_pairs

    rows = [
        {"doc_id": i, "text": f"alpha beta gamma delta epsilon zeta {i}"}
        for i in range(6)
    ]
    # each pair shares the 5-word prefix -> several 3-grams, but differs in
    # the tail; compute once at 1 partition, once at 7 — identical output
    outs = []
    for parts in (1, 7):
        df = ngram_jaccard_pairs(
            rd.from_items(rows).repartition(2), shingle_n=3, threshold=0.1,
            partitions=parts,
        ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert len(outs[0]) == 15  # all C(6,2) pairs clear the 0.1 threshold


def test_ngram_jaccard_max_bucket_drops_ubiquitous(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import ngram_jaccard_pairs

    # one 3-gram shared by ALL docs; with max_bucket=2 it is dropped, so no
    # pair reaches the threshold
    rows = [
        {"doc_id": i, "text": f"shared common prefix u{i} v{i} w{i} x{i}"}
        for i in range(4)
    ]
    out = ngram_jaccard_pairs(
        rd.from_items(rows), shingle_n=3, threshold=0.05, max_bucket=2
    ).to_pandas()
    assert len(out) == 0


# --- bm25_topk ----------------------------------------------------------------


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    words = [d.split(" ") for d in docs]
    n = len(docs)
    avgdl = sum(len(w) for w in words) / n
    scores = []
    for w in words:
        s = 0.0
        for t in terms:
            df = sum(1 for x in words if t in x)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = float(w.count(t))
            s = s + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
        scores.append(s)
    return scores


def test_bm25_topk_matches_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.text import bm25_topk

    docs = [
        "apple banana cherry apple",
        "banana banana durian",
        "cherry apple apple apple banana",
        "durian elderberry fig",
        "apple fig banana cherry durian",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    terms = ["apple", "banana"]
    out = bm25_topk(rd.from_items(rows).repartition(3), terms, k=3)
    ref = _bm25_reference(docs, terms)
    order = sorted(range(len(docs)), key=lambda i: (-ref[i], i))[:3]
    assert list(out["doc_id"]) == order
    assert list(out["rank"]) == [1, 2, 3]
    for _, row in out.iterrows():
        assert row["score"] == pytest.approx(ref[int(row["doc_id"])], abs=1e-12)


def test_bm25_topk_k_exceeds_corpus(ray_session):
    import ray.data as rd

    from pprl_ray.stages.text import bm25_topk

    rows = [{"doc_id": i, "text": "only two docs"} for i in range(2)]
    out = bm25_topk(rd.from_items(rows), ["only"], k=10)
    assert len(out) == 2 and list(out["rank"]) == [1, 2]


# --- hash_split ---------------------------------------------------------------


def _expected_split(doc_id, salt=""):
    h = hashlib.md5((salt + str(doc_id)).encode()).hexdigest()
    b = int(h[:8], 16) % 100
    return "train" if b < 90 else ("val" if b < 95 else "test")


def test_hash_split_deterministic_bands(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sample import hash_split

    rows = [{"doc_id": i} for i in range(200)]
    fr = {"train": 0.90, "val": 0.05, "test": 0.05}
    out = hash_split(rd.from_items(rows).repartition(4), "doc_id", fr).to_pandas()
    got = dict(zip(out["doc_id"], out["split"]))
    assert got == {i: _expected_split(i) for i in range(200)}
    # partitioning-invariant: same assignment at a different partitioning
    out2 = hash_split(rd.from_items(rows).repartition(9), "doc_id", fr).to_pandas()
    assert dict(zip(out2["doc_id"], out2["split"])) == got


def test_hash_split_salt_and_validation(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sample import hash_split

    rows = [{"doc_id": i} for i in range(50)]
    fr = {"train": 0.5, "test": 0.5}
    salted = hash_split(rd.from_items(rows), "doc_id", fr, salt="v2").to_pandas()
    h = hashlib.md5(b"v27").hexdigest()
    want = "train" if int(h[:8], 16) % 100 < 50 else "test"
    assert salted.set_index("doc_id").loc[7, "split"] == want
    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(rd.from_items(rows), "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="whole percent"):
        hash_split(rd.from_items(rows), "doc_id", {"a": 0.505, "b": 0.495})


# --- near_dedup_corpus keep="best" ---------------------------------------------


def test_near_dedup_keep_best(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import near_dedup_corpus

    # component {1,2,3} via chained pairs; doc 2 has the top score; doc 9
    # is a singleton and always survives
    rows = [
        {"doc_id": 1, "text": "a", "score": 5.0},
        {"doc_id": 2, "text": "b", "score": 9.0},
        {"doc_id": 3, "text": "c", "score": 7.0},
        {"doc_id": 9, "text": "d", "score": 1.0},
    ]
    pairs = rd.from_items([{"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3}])
    kept = near_dedup_corpus(
        rd.from_items(rows).repartition(2), keep="best", keep_score_col="score",
        pairs=pairs,
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 9]


def test_near_dedup_keep_best_tiebreak_and_validation(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from pprl_ray.stages.dedup import near_dedup_corpus

    rows = [
        {"doc_id": 4, "text": "x", "score": 3.0},
        {"doc_id": 7, "text": "y", "score": 3.0},
    ]
    pairs = rd.from_items([{"id_a": 4, "id_b": 7}])
    kept = near_dedup_corpus(
        rd.from_items(rows), keep="best", keep_score_col="score", pairs=pairs
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [4]  # equal scores -> min id wins
    with _pytest.raises(ValueError, match="keep_score_col"):
        near_dedup_corpus(rd.from_items(rows), keep="best", pairs=pairs)
    with _pytest.raises(ValueError, match="unknown keep"):
        near_dedup_corpus(rd.from_items(rows), keep="quality", pairs=pairs)


def test_near_dedup_keep_best_bucket_join_path(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import near_dedup_corpus

    rows = [{"doc_id": i, "text": f"t{i}", "score": float(i % 3)} for i in range(12)]
    pairs = rd.from_items([{"id_a": i, "id_b": i + 1} for i in range(0, 12, 2)])
    # force the co-partitioned (non-broadcast) labeled-score path
    kept = near_dedup_corpus(
        rd.from_items(rows), keep="best", keep_score_col="score", pairs=pairs,
        loser_broadcast_max=0, partitions=3,
    ).to_pandas()
    # per pair (i, i+1): score = i%3 vs (i+1)%3 — winner has higher score,
    # except when i%3 == 2 (then i+1 scores 0 and i wins)
    want = sorted(i if i % 3 == 2 else i + 1 for i in range(0, 12, 2))
    assert sorted(kept["doc_id"]) == want
