"""Tests for stages/tokens.py: context-window chunking, vocabulary
pruning, bigram counting — each checked against a row-at-a-time Python
reference on both int32 token lists and word-string lists."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pprl_ray.stages.tokens import (
    bigram_counts,
    chunk_sequences,
    top_k_tokens,
    vocab_prune,
)


def _chunk_ref(lst, seq_len, stride, min_len=1):
    out = []
    i = 0
    for s in range(0, len(lst), stride):
        ch = lst[s : s + seq_len]
        if len(ch) >= min_len:
            out.append((i, ch))
        i += 1
    return out


@pytest.fixture(scope="module")
def int_corpus(ray_session):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        n = int(rng.integers(0, 40))
        rows.append(
            {"doc_id": f"d{i}", "tokens": rng.integers(0, 30, n).astype(np.int32).tolist(),
             "source": "web" if i % 3 else "code"}
        )
    return rows


def test_chunk_sequences_matches_reference(int_corpus):
    ds = rd.from_items(int_corpus).repartition(5)
    for seq_len, stride, min_len in [(8, 8, 1), (8, 4, 1), (16, 16, 5)]:
        got = chunk_sequences(ds, "tokens", seq_len=seq_len, stride=stride,
                              min_len=min_len).to_pandas()
        got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        exp = []
        for r in int_corpus:
            for ci, ch in _chunk_ref(r["tokens"], seq_len, stride, min_len):
                exp.append((r["doc_id"], ci, ch, len(ch), r["source"]))
        exp.sort()
        assert len(got) == len(exp)
        for row, (did, ci, ch, n, src) in zip(got.itertuples(index=False), exp):
            assert row.doc_id == did and row.chunk_idx == ci
            assert list(row.tokens) == ch and row.n_chunk_tok == n
            assert row.source == src


def test_chunk_sequences_partitioning_invariant(int_corpus):
    a = chunk_sequences(rd.from_items(int_corpus).repartition(1), "tokens",
                        seq_len=8, stride=4).to_pandas()
    b = chunk_sequences(rd.from_items(int_corpus).repartition(7), "tokens",
                        seq_len=8, stride=4).to_pandas()
    key = ["doc_id", "chunk_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a["n_chunk_tok"].tolist() == b["n_chunk_tok"].tolist()
    assert [list(x) for x in a["tokens"]] == [list(x) for x in b["tokens"]]


def test_chunk_sequences_string_lists(ray_session):
    t = pa.table({
        "doc_id": ["a", "b", "c"],
        "words": [["x", "y", "z", "w", "v"], [], ["solo"]],
    })
    got = chunk_sequences(rd.from_arrow(t), "words", seq_len=2, stride=2,
                          chunk_col="chunk").to_pandas()
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert [list(c) for c in got["chunk"]] == [["x", "y"], ["z", "w"], ["v"], ["solo"]]
    assert got["doc_id"].tolist() == ["a", "a", "a", "c"]


def test_top_k_and_vocab_prune(int_corpus):
    from collections import Counter

    ds = rd.from_items(int_corpus).repartition(4)
    cnt = Counter(t for r in int_corpus for t in r["tokens"])
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = top_k_tokens(ds, "tokens", k=10, partitions=3)
    assert list(zip(got["token"], got["c"])) == exp

    kept = {t for t, _ in exp}
    pruned = vocab_prune(ds, "tokens", k=10, partitions=3).to_pandas()
    pruned = pruned.set_index("doc_id")
    for r in int_corpus:
        out = list(pruned.loc[r["doc_id"], "tokens"])
        expect = [t if t in kept else -1 for t in r["tokens"]]
        assert out == expect
        assert pruned.loc[r["doc_id"], "n_unk"] == sum(t not in kept for t in r["tokens"])


def test_vocab_prune_string_unk(ray_session):
    t = pa.table({"doc_id": ["a", "b"],
                  "words": [["x", "y", "x", "q"], ["y", "zz"]]})
    out = vocab_prune(rd.from_arrow(t), "words", k=2, partitions=2).to_pandas()
    out = out.set_index("doc_id")
    # counts: x=2, y=2, q=1, zz=1 -> kept {x, y}
    assert list(out.loc["a", "words"]) == ["x", "y", "x", "<unk>"]
    assert list(out.loc["b", "words"]) == ["y", "<unk>"]
    assert out["n_unk"].tolist() in ([1, 1],)


def test_bigram_counts(int_corpus):
    from collections import Counter

    ds = rd.from_items(int_corpus).repartition(4)
    cnt = Counter()
    for r in int_corpus:
        for a, b in zip(r["tokens"], r["tokens"][1:]):
            cnt[(a, b)] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = bigram_counts(ds, "tokens", top_n=25, partitions=3)
    assert [((r.w1, r.w2), r.c) for r in got.itertuples(index=False)] == exp

    # full table path (no top_n): Dataset with exact counts
    full = bigram_counts(ds, "tokens", partitions=3).to_pandas()
    assert len(full) == len(cnt)
    m = {(r.w1, r.w2): r.c for r in full.itertuples(index=False)}
    assert m == dict(cnt)


def test_bigram_counts_no_cross_row_pairs(ray_session):
    t = pa.table({"tokens": [[1, 2], [2, 3]]})
    full = bigram_counts(rd.from_arrow(t), "tokens", partitions=1).to_pandas()
    pairs = {(r.w1, r.w2): r.c for r in full.itertuples(index=False)}
    assert pairs == {(1, 2): 1, (2, 3): 1}  # no (2, 2) straddle pair


# --- duplicate_span_scrub -----------------------------------------------


def _scrub_ref(rows, n):
    """Row-at-a-time reference: remove every word n-gram span whose gram
    occurs more than once corpus-wide (any doc, any position)."""
    from collections import Counter

    grams = Counter()
    for r in rows:
        ws = r["text"].split(" ")
        for p in range(len(ws) - n + 1):
            grams[tuple(ws[p : p + n])] += 1
    out = {}
    for r in rows:
        ws = r["text"].split(" ")
        cov = [False] * len(ws)
        for p in range(len(ws) - n + 1):
            if grams[tuple(ws[p : p + n])] > 1:
                for i in range(p, p + n):
                    cov[i] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        out[r["doc_id"]] = (" ".join(kept), sum(cov))
    return out


@pytest.fixture(scope="module")
def scrub_corpus(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        k = int(rng.integers(2, 25))
        rows.append({"doc_id": i, "text": " ".join(rng.choice(vocab, k))})
    # plant an exact shared 6-word span inside two otherwise-unique docs
    span = "alpha beta gamma delta epsilon zeta"
    rows.append({"doc_id": 100, "text": "unique one " + span + " tail words"})
    rows.append({"doc_id": 101, "text": "other head " + span + " closing bit"})
    # a doc that repeats its own 4-gram (within-doc duplication)
    rows.append({"doc_id": 102, "text": "p q r s junk p q r s more"})
    return rows


def test_duplicate_span_scrub_matches_reference(scrub_corpus):
    from pprl_ray.stages.dedup import duplicate_span_scrub

    for n in (3, 4, 6):
        ref = _scrub_ref(scrub_corpus, n)
        ds = rd.from_items(scrub_corpus).repartition(5)
        got = duplicate_span_scrub(ds, n=n, partitions=3).to_pandas()
        assert len(got) == len(scrub_corpus)
        for r in got.itertuples(index=False):
            exp_text, exp_removed = ref[r.doc_id]
            assert r.text == exp_text, (n, r.doc_id)
            assert r.n_removed == exp_removed


def test_duplicate_span_scrub_planted_span(scrub_corpus):
    from pprl_ray.stages.dedup import duplicate_span_scrub

    ds = rd.from_items(scrub_corpus)
    got = duplicate_span_scrub(ds, n=6, partitions=2).to_pandas().set_index("doc_id")
    # the planted 6-gram disappears from both carriers, context survives
    assert got.loc[100, "text"] == "unique one tail words"
    assert got.loc[101, "text"] == "other head closing bit"
    assert got.loc[100, "n_removed"] == 6
    # within-doc repeat scrubbed at n=4
    got4 = duplicate_span_scrub(ds, n=4, partitions=2).to_pandas().set_index("doc_id")
    assert "p q r s" not in got4.loc[102, "text"]


def test_duplicate_span_scrub_short_docs_pass_through(ray_session):
    from pprl_ray.stages.dedup import duplicate_span_scrub

    rows = [{"doc_id": 0, "text": "a b"}, {"doc_id": 1, "text": "a b"},
            {"doc_id": 2, "text": ""}]
    got = duplicate_span_scrub(rd.from_items(rows), n=3).to_pandas()
    got = got.set_index("doc_id")
    assert got.loc[0, "text"] == "a b" and got.loc[1, "text"] == "a b"
    assert got.loc[2, "text"] == ""
    assert got["n_removed"].tolist() == [0, 0, 0]


# --- temperature_mix ------------------------------------------------------


def test_temperature_mix_rebalances(ray_session):
    from pprl_ray.stages.sample import temperature_mix

    rng = np.random.default_rng(3)
    rows = []
    for i in range(2000):
        g = "big" if i < 1800 else "small"
        rows.append({"doc_id": i, "g": g})
    ds = rd.from_items(rows).repartition(4)
    out = temperature_mix(ds, "g", "doc_id", alpha=0.5, budget_frac=0.5).to_pandas()
    import pandas as pd

    frac = out.groupby("g").size() / pd.Series({"big": 1800, "small": 200})
    # alpha=0.5 with budget 0.5: q_big = sqrt(1800)/(sqrt(1800)+sqrt(200)),
    # keep rate big = 0.5*2000*q_big/1800 ~ 0.417, small ~ 1.25 -> clamp 1.0
    assert frac["small"] == 1.0
    assert 0.35 < frac["big"] < 0.48
    # deterministic: same output under different partitioning
    out2 = temperature_mix(rd.from_items(rows).repartition(9), "g", "doc_id",
                           alpha=0.5, budget_frac=0.5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_temperature_mix_alpha_one_uniform_rate(ray_session):
    from pprl_ray.stages.sample import temperature_mix

    rows = [{"doc_id": i, "g": "a" if i % 4 else "b"} for i in range(400)]
    ds = rd.from_items(rows)
    # alpha=1: q_s = n_s/N -> r_s = budget_frac for every group
    out = temperature_mix(ds, "g", "doc_id", alpha=1.0, budget_frac=0.25).to_pandas()
    assert 0.15 < len(out) / 400 < 0.35
