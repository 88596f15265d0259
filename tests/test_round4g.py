"""Fourth round-4 session: priority-sampling subset-sum sketch."""

import numpy as np
import pytest

from pprl_ray.sketches import PrioritySampleSketch


def _brute_order(keys, weights, seed=0):
    """Reference (s, h, key) order computed independently of the sketch."""
    from pprl_ray.sketches.hashing import hash_ints

    h = np.maximum(hash_ints(keys.astype(np.uint64), seed), np.uint64(1))
    s = h // weights.astype(np.uint64)
    return np.lexsort((keys, h, s)), h


def test_exact_mode_matches_truth():
    keys = np.arange(1, 40, dtype=np.uint64)
    w = (keys % 7 + 1).astype(np.int64)
    src = np.array(["a" if k % 2 else "b" for k in keys], dtype=object)
    sk = PrioritySampleSketch(64)
    sk.update(keys, w, src)
    sums = sk.subset_sums(1_000_000)
    for payload in ("a", "b"):
        mask = src == payload
        assert sums[payload] == (int(mask.sum()), int(w[mask].sum()) * 1_000_000)
    assert sk.threshold() == (0, 1)


def test_estimation_matches_brute_force_definition():
    rng = np.random.default_rng(11)
    keys = rng.choice(1 << 40, size=3000, replace=False).astype(np.uint64)
    w = rng.integers(1, 2049, size=3000).astype(np.int64)
    sk = PrioritySampleSketch(64)
    sk.update(keys, w)
    order, h = _brute_order(keys, w)
    kth = order[64]
    num, den = int(w[kth]) << 64, int(h[kth])
    assert sk.threshold() == (num, den)
    samp_keys, samp_w, _ = sk.sample()
    assert set(samp_keys.tolist()) == set(keys[order[:64]].tolist())
    tau6 = (num * 1_000_000) // den
    expect = sum(
        int(wi) * 1_000_000 if int(wi) * den >= num else tau6
        for wi in w[order[:64]]
    )
    assert sk.estimate_total() == expect


@pytest.mark.parametrize("parts", [1, 3, 7, 16])
def test_merge_is_order_and_partitioning_invariant(parts):
    rng = np.random.default_rng(parts)
    keys = rng.choice(1 << 40, size=2000, replace=False).astype(np.uint64)
    w = rng.integers(1, 300, size=2000).astype(np.int64)
    src = np.array([f"s{k % 5}" for k in range(2000)], dtype=object)

    whole = PrioritySampleSketch(32)
    whole.update(keys, w, src)

    splits = np.array_split(np.arange(2000), parts)
    rng.shuffle(splits)
    partials = []
    for idx in splits:
        p = PrioritySampleSketch(32)
        p.update(keys[idx], w[idx], src[idx])
        partials.append(p)
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.merge(p)
    assert merged.threshold() == whole.threshold()
    assert merged.subset_sums() == whole.subset_sums()
    # serialisation round-trip preserves the estimate
    clone = PrioritySampleSketch.from_bytes(merged.to_bytes())
    assert clone.subset_sums() == whole.subset_sums()


def test_rerun_of_same_key_is_idempotent():
    keys = np.arange(1, 200, dtype=np.uint64)
    w = np.full(199, 5, dtype=np.int64)
    a = PrioritySampleSketch(16)
    a.update(keys, w)
    b = PrioritySampleSketch(16)
    b.update(keys, w)
    b.update(keys[:50], w[:50])  # re-observe a prefix
    a.merge(b)
    c = PrioritySampleSketch(16)
    c.update(keys, w)
    assert a.subset_sums() == c.subset_sums()


def test_subset_sum_accuracy_within_bound():
    """Full-set std error <= W/sqrt(k-1) (DLT Thm 1); assert 4 sigma."""
    rng = np.random.default_rng(7)
    n, k = 20_000, 256
    keys = rng.choice(1 << 50, size=n, replace=False).astype(np.uint64)
    w = rng.integers(1, 2049, size=n).astype(np.int64)
    sk = PrioritySampleSketch(k)
    for idx in np.array_split(np.arange(n), 13):
        sk.update(keys[idx], w[idx])
    total = int(w.sum()) * 1_000_000
    err = abs(sk.estimate_total() - total) / total
    assert err <= 4.0 / np.sqrt(k - 1)


def test_weight_validation():
    sk = PrioritySampleSketch(8)
    with pytest.raises(ValueError):
        sk.update(np.array([1], np.uint64), np.array([0], np.int64))


def _cosine_df(df, parts):
    import ray.data as rd

    from pprl_ray.stages.stats import source_cosine_matrix

    ds = rd.from_pandas(df).repartition(parts)
    out = source_cosine_matrix(ds, group_col="source", partitions=4).to_pandas()
    return out.sort_values(["group_a", "group_b"]).reset_index(drop=True)


def test_source_cosine_matches_brute_force(ray_session):
    import collections

    import pandas as pd

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(300):
        src = f"s{i % 4}"
        words = rng.choice(vocab, size=rng.integers(3, 20))
        rows.append({"source": src, "text": " ".join(words)})
    df = pd.DataFrame(rows)

    counts = {}
    for _, r in df.iterrows():
        c = counts.setdefault(r["source"], collections.Counter())
        c.update(r["text"].split(" "))
    out1 = _cosine_df(df, 1)
    out7 = _cosine_df(df, 7)
    assert out1.equals(out7)  # partitioning-invariant
    for _, r in out1.iterrows():
        ca, cb = counts[r["group_a"]], counts[r["group_b"]]
        dot = sum(ca[w] * cb[w] for w in ca)
        n2a = sum(v * v for v in ca.values())
        n2b = sum(v * v for v in cb.values())
        assert r["dot"] == dot
        assert r["cos2_u"] == 10**9 * dot * dot // (n2a * n2b)


def test_read_filter_pushdown_prunes_rows(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.dataset as pads

    from pprl_ray.stages.partitioning import read_parquet_sized

    df = pd.DataFrame({
        "k": np.arange(1000, dtype=np.int64),
        "tag": ["hot" if i % 10 == 0 else "cold" for i in range(1000)],
    })
    path = str(tmp_path / "t.parquet")
    df.to_parquet(path, index=False)
    ds = read_parquet_sized(path, columns=["k"], filter=pads.field("tag") == "hot")
    out = ds.to_pandas()
    # the predicate is applied inside the scan: only matching rows surface,
    # and the filter column need not be projected
    assert len(out) == 100
    assert sorted(out.columns) == ["k"]
    assert (out["k"].to_numpy() % 10 == 0).all()


def test_priority_sample_nul_payload_roundtrip():
    """Length-prefixed payload serialisation survives NUL bytes and empty
    strings (the old NUL-join silently misaligned every later payload)."""
    from pprl_ray.sketches import PrioritySampleSketch

    sk = PrioritySampleSketch(8)
    payloads = ["a\x00b", "", "plain", "\x00\x00", "tail"]
    sk.update(
        np.arange(5, dtype=np.uint64),
        np.array([3, 1, 4, 1, 5], np.int64),
        payloads,
    )
    clone = PrioritySampleSketch.from_bytes(sk.to_bytes())
    assert list(clone.payloads) == list(sk.payloads)
    assert clone.subset_sums() == sk.subset_sums()


def test_priority_sample_rejects_reweighted_key():
    """A key re-observed with a DIFFERENT weight raises instead of being
    silently double-retained (the dedupe contract is now enforced)."""
    from pprl_ray.sketches import PrioritySampleSketch

    sk = PrioritySampleSketch(8)
    sk.update(np.array([7, 8], np.uint64), np.array([2, 3], np.int64))
    # idempotent re-observation with the SAME weight is fine
    sk.update(np.array([7], np.uint64), np.array([2], np.int64))
    assert len(sk.keys) == 2
    with pytest.raises(ValueError, match="different weight"):
        sk.update(np.array([8], np.uint64), np.array([9], np.int64))


def test_kn_perplexity_matches_hand_model(ray_session):
    """Interpolated KN scoring vs a dict-based reference on a tiny
    corpus, including the fallback branches (unseen bigram, context-less
    prev) that self-scored runs never reach."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.stages.lm import (
        KN_DISCOUNT,
        score_kn_perplexity,
        train_bigram_lm,
    )

    train = ["a b a c a b", "b c b a", "c c a b"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(train)})
    docs = rd.from_arrow(t)
    uni, bi, total = train_bigram_lm(docs)

    # eval docs: "c a" seen; "a a" unseen bigram w/ seen context;
    # trailing-only token as prev ("b" IS a context; use doc "b b")
    ev = ["c a b", "a a c", "b b"]
    et = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                   "text": pa.array(ev)})
    out = score_kn_perplexity(
        rd.from_arrow(et), uni, bi, total
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # dict reference
    toks = [d.split() for d in train]
    unic: dict = {}
    bic: dict = {}
    for ws in toks:
        for w in ws:
            unic[w] = unic.get(w, 0) + 1
        for x, y in zip(ws, ws[1:]):
            bic[(x, y)] = bic.get((x, y), 0) + 1
    tot = sum(unic.values())
    ctxc = {}
    nf = {}
    npred = {}
    for (x, y), c in bic.items():
        ctxc[x] = ctxc.get(x, 0) + c
        nf[x] = nf.get(x, 0) + 1
        npred[y] = npred.get(y, 0) + 1
    B = len(bic)
    D = KN_DISCOUNT

    def lp(prev, tok, start):
        if start:
            return math.log(unic.get(tok, 1) / tot)
        np1 = max(npred.get(tok, 0), 1)
        if (prev, tok) in bic:
            return math.log(
                (bic[(prev, tok)] - D) / ctxc[prev]
                + D * nf[prev] / ctxc[prev] * np1 / B
            )
        if prev in ctxc:
            return math.log(D * nf[prev] / ctxc[prev] * np1 / B)
        return math.log(np1 / B)

    for i, d in enumerate(ev):
        ws = d.split()
        lps = [lp(None, ws[0], True)] + [
            lp(a, b, False) for a, b in zip(ws, ws[1:])
        ]
        want = sum(lps) / len(ws)
        assert out.loc[i, "avg_logp"] == pytest.approx(want, rel=1e-12), d
        assert out.loc[i, "n_tokens"] == len(ws)
