"""Third round-4 session: seeded global shuffle, balanced shards, rolling
window aggregate."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _perm_positions(df, seed, parts):
    import ray.data as rd

    from pprl_ray.stages.sort import seeded_permutation

    ds = rd.from_pandas(df).repartition(parts)
    out = seeded_permutation(ds, "id", seed, partitions=4).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def test_seeded_permutation_matches_numpy_reference(ray_session):
    from pprl_ray.sketches.hashing import hash_ints

    rng = np.random.default_rng(3)
    ids = rng.choice(10_000, size=400, replace=False).astype(np.int64)
    df = pd.DataFrame({"id": ids, "payload": ids * 2})
    out = _perm_positions(df, seed=42, parts=5)

    z = hash_ints(ids.astype(np.uint64), 42)
    order = np.lexsort((ids, z))  # (z, id) ascending, z unsigned
    pos = np.empty(len(ids), dtype=np.int64)
    pos[order] = np.arange(1, len(ids) + 1)
    ref = pd.DataFrame({"id": ids, "pos": pos}).sort_values("id").reset_index(drop=True)
    assert out["pos"].tolist() == ref["pos"].tolist()
    # payload columns ride through
    assert (out["payload"] == out["id"] * 2).all()


def test_seeded_permutation_is_a_permutation_and_partition_invariant(ray_session):
    df = pd.DataFrame({"id": np.arange(300, dtype=np.int64)})
    a = _perm_positions(df, seed=7, parts=1)
    b = _perm_positions(df, seed=7, parts=6)
    assert sorted(a["pos"]) == list(range(1, 301))
    assert a["pos"].tolist() == b["pos"].tolist()
    # a different seed yields a genuinely different order
    c = _perm_positions(df, seed=8, parts=6)
    assert c["pos"].tolist() != a["pos"].tolist()


def test_balanced_shards_round_robin_and_balance(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sort import balanced_shards

    rng = np.random.default_rng(5)
    n, s = 500, 8
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "w": rng.integers(1, 1000, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    out = (
        balanced_shards(ds, "w", "id", num_shards=s, partitions=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    # reference: rank by (w DESC, id), deal round-robin
    order = np.lexsort((df["id"].to_numpy(), -df["w"].to_numpy()))
    shard = np.empty(n, dtype=np.int64)
    shard[order] = np.arange(n) % s
    assert out["shard"].tolist() == shard.tolist()

    # shard sizes differ by at most 1; totals by at most one max weight
    # (desc-sorted round-robin telescoping bound)
    sizes = out.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1
    totals = out.groupby("shard")["w"].sum()
    assert totals.max() - totals.min() <= df["w"].max()


def test_rolling_aggregate_matches_pandas_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import rolling_aggregate

    rng = np.random.default_rng(11)
    n, w = 400, 5
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n).astype(np.int64),
            "ts": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    out = (
        rolling_aggregate(ds, "k", ["ts"], "v", window=w, partitions=3)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    grp = ref.groupby("k", sort=False)
    ref["rolling_sum"] = (
        grp["v"].rolling(w, min_periods=1).sum().reset_index(drop=True).astype(np.int64)
    )
    ref["n_in_window"] = np.minimum(grp.cumcount() + 1, w)
    pd.testing.assert_frame_equal(
        out[["k", "ts", "v", "rolling_sum", "n_in_window"]].astype("int64"),
        ref.astype("int64"),
    )


def test_rolling_aggregate_partition_invariant(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import rolling_aggregate

    df = pd.DataFrame(
        {"k": [1, 1, 2, 2, 1, 1], "ts": [3, 1, 5, 2, 2, 4], "v": [10, 20, 30, 40, 50, 5]}
    )

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        return (
            rolling_aggregate(ds, "k", ["ts"], "v", window=2, partitions=parts)
            .to_pandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(4))


def test_negative_samples_properties(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sort import negative_samples

    ids = np.array([3, 7, 11, 20, 21, 40, 55, 56, 70, 99], dtype=np.int64)
    df = pd.DataFrame({"id": ids})

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        return (
            negative_samples(ds, "id", k=3, seed=5, partitions=3)
            .to_pandas()
            .sort_values(["id", "j"])
            .reset_index(drop=True)
        )

    out = run(2)
    # k rows per id, never self-paired
    assert len(out) == 3 * len(ids)
    assert (out.groupby("id").size() == 3).all()
    assert (out["id"] != out["neg_id"]).all()
    # each offset is a cyclic shift: every id serves as a negative exactly
    # once per j (no popularity bias)
    for j in range(3):
        negs = out.loc[out["j"] == j, "neg_id"]
        assert sorted(negs) == sorted(ids)
    # deterministic across partitionings
    pd.testing.assert_frame_equal(out, run(5))


def test_group_quantiles_exact_matches_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sort import group_quantiles_exact

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 200),
            "v": rng.integers(0, 1000, 200).astype(np.int64),
        }
    )
    qs = [0.25, 0.5, 0.9]
    ds = rd.from_pandas(df).repartition(4)
    out = (
        group_quantiles_exact(ds, "k", "v", qs, partitions=3)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        n = len(vals)
        for q, name in zip(qs, ["q_0_25", "q_0_5", "q_0_9"]):
            # percentile_disc: element at 1-based position ceil(q*n)
            want = vals[max(int(np.ceil(q * n)) - 1, 0)]
            assert row[name] == want, (row["k"], q)


def test_funnel_order_semantics(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import funnel_counts

    # u1 completes A->B->C in order; u2 has C before B (stops at A->B);
    # u3 only A; u4 has B first then A (counts for A only, no B after A... 
    # actually B exists only BEFORE its A -> step2 not matched)
    rows = [
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
        (2, 10, "A"), (2, 15, "C"), (2, 20, "B"),
        (3, 10, "A"),
        (4, 10, "B"), (4, 20, "A"),
    ]
    df = pd.DataFrame(rows, columns=["u", "ts", "t"])
    ds = rd.from_pandas(df).repartition(3)
    out = (
        funnel_counts(ds, "u", "ts", "t", ["A", "B", "C"], partitions=2)
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert out["step_type"].tolist() == ["A", "B", "C"]
    # A: u1,u2,u3,u4; B-after-A: u1,u2; C-after-that-B: u1 only
    assert out["n_keys"].tolist() == [4, 2, 1]


def test_funnel_strictly_after(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import funnel_counts

    # equal timestamps do NOT satisfy "strictly after"
    df = pd.DataFrame([(1, 10, "A"), (1, 10, "B")], columns=["u", "ts", "t"])
    out = (
        funnel_counts(rd.from_pandas(df), "u", "ts", "t", ["A", "B"], partitions=1)
        .to_pandas()
        .sort_values("step")
    )
    assert out["n_keys"].tolist() == [1, 0]


def test_cohort_retention_matches_pandas_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import cohort_retention

    rng = np.random.default_rng(7)
    n = 600
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, n),
            "ts": base + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    out = (
        cohort_retention(ds, "u", "ts", max_offset=7, partitions=3)
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    ref = df.copy()
    ref["day"] = (ref["ts"].astype("int64") // 1000) // 86_400_000_000
    ref = ref[["u", "day"]].drop_duplicates()
    ref["cohort_day"] = ref.groupby("u")["day"].transform("min")
    ref["day_offset"] = ref["day"] - ref["cohort_day"]
    ref = ref[ref["day_offset"] <= 7]
    want = (
        ref.groupby(["cohort_day", "day_offset"], as_index=False)
        .size()
        .rename(columns={"size": "n_active"})
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype("int64"), want.astype("int64"))


def test_crosstab_chi2_exact_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.stats import crosstab_chi2

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "r": rng.choice(["x", "y", "z"], 500, p=[0.5, 0.3, 0.2]),
            "c": rng.choice(["a", "b"], 500, p=[0.6, 0.4]),
        }
    )

    def run(parts):
        ds = rd.from_pandas(df).repartition(parts)
        return (
            crosstab_chi2(ds, "r", "c", partitions=3)
            .to_pandas()
            .sort_values(["r", "c"])
            .reset_index(drop=True)
        )

    out = run(4)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    # exact big-int reference
    counts = df.groupby(["r", "c"]).size()
    total = len(df)
    rm = df.groupby("r").size()
    cm = df.groupby("c").size()
    for _, row in out.iterrows():
        n = int(counts[(row["r"], row["c"])])
        rc = int(rm[row["r"]]) * int(cm[row["c"]])
        assert row["n"] == n
        assert row["expected_u"] == 1_000_000 * rc // total
        d = n * total - rc
        assert row["chi2_contrib_u"] == 1_000_000 * d * d // (rc * total)
    # the summed statistic approximates float chi2 within 1 ULP/cell
    chi2_float = sum(
        (int(counts[(r, c)]) - int(rm[r]) * int(cm[c]) / total) ** 2
        / (int(rm[r]) * int(cm[c]) / total)
        for r, c in counts.index
    )
    assert abs(out["chi2_contrib_u"].sum() / 1e6 - chi2_float) < 1e-4


def test_dup_spans_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from pprl_ray.stages.dedup import dup_spans

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e f g h i j k l",
                "x y a b c d e f g h i z",   # shares the a..i run with doc 1
                "nothing in common with anything else at all here now",
                "a b c d e f g h i j k l",   # exact duplicate of doc 1
                "too short",
            ],
        }
    )
    L = 4

    def run(parts):
        ds = rd.from_pandas(docs).repartition(parts)
        return (
            dup_spans(ds, window=L, partitions=3)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    out = run(3)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    def windows(t):
        w = t.split(" ")
        return [(i, " ".join(w[i : i + L])) for i in range(len(w) - L + 1)]

    ref = {}
    for x, y in itertools.combinations(range(len(docs)), 2):
        matches = [
            (i, j)
            for i, s in windows(docs.text[x])
            for j, t in windows(docs.text[y])
            if s == t
        ]
        if not matches:
            continue
        best = 0
        by_diag = {}
        for i, j in matches:
            by_diag.setdefault(i - j, []).append(i)
        for iis in by_diag.values():
            iis = sorted(iis)
            run_len = 1
            for k in range(1, len(iis)):
                run_len = run_len + 1 if iis[k] == iis[k - 1] + 1 else 1
                best = max(best, run_len)
            best = max(best, run_len, 1)
        ref[(docs.doc_id[x], docs.doc_id[y])] = (len(matches), best + L - 1)

    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert ref[(r.a_id, r.b_id)] == (r.n_windows, r.max_span)


def test_vocab_growth_matches_pandas_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.text import vocab_growth

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(150)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(240),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(1, 12)))
                for _ in range(240)
            ],
        }
    )

    def run(parts):
        ds = rd.from_pandas(docs).repartition(parts)
        return (
            vocab_growth(ds, bucket_size=60, partitions=3)
            .to_pandas()
            .reset_index(drop=True)
        )

    out = run(5)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    seen, rows, ntok, ntyp = set(), [], 0, 0
    for b in range(4):
        for t in docs[(docs.doc_id // 60) == b].text:
            ws = t.split(" ")
            ntok += len(ws)
            for w in ws:
                if w not in seen:
                    seen.add(w)
                    ntyp += 1
        rows.append((b, ntok, ntyp))
    ref = pd.DataFrame(rows, columns=["bucket", "n_tokens", "n_types"]).astype("int64")
    pd.testing.assert_frame_equal(out, ref)


def test_source_tv_distance_exact_reference(ray_session):
    import itertools
    from collections import Counter

    import ray.data as rd

    from pprl_ray.stages.stats import source_tv_distance

    rng = np.random.default_rng(19)
    srcs = ["web", "book", "code"]
    docs = pd.DataFrame(
        {
            "source": rng.choice(srcs, 300, p=[0.5, 0.3, 0.2]),
            "text": [
                " ".join(rng.choice([f"w{i}" for i in range(60)], rng.integers(1, 9)))
                for _ in range(300)
            ],
        }
    )

    def run(parts):
        ds = rd.from_pandas(docs).repartition(parts)
        return (
            source_tv_distance(ds, partitions=3)
            .to_pandas()
            .reset_index(drop=True)
        )

    out = run(4)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    cnt = {s: Counter() for s in srcs}
    for _, r in docs.iterrows():
        cnt[r.source].update(r.text.split(" "))
    tot = {s: sum(cnt[s].values()) for s in srcs}
    for a, b in itertools.combinations(sorted(srcs), 2):
        toks = set(cnt[a]) | set(cnt[b])
        num = sum(abs(cnt[a][t] * tot[b] - cnt[b][t] * tot[a]) for t in toks)
        want = 10**9 * num // (2 * tot[a] * tot[b])
        got = out[(out.group_a == a) & (out.group_b == b)].tv_u.iloc[0]
        assert got == want
    # identical distributions have TV 0; disjoint ones have TV ~ 1
    same = pd.concat([docs.assign(source="p"), docs.assign(source="q")])
    z = source_tv_distance(rd.from_pandas(same), partitions=2).to_pandas()
    assert (z.tv_u == 0).all()


def test_blocking_metrics_matches_bruteforce(ray_session):
    import ray.data as rd

    from pprl_ray.stages.match import blocking_metrics

    ids = np.arange(80)
    left = pd.DataFrame(
        {
            "id": np.tile(ids, 2),
            "block_key": ["k%d" % (i % 8) for i in ids]
            + ["m%d" % (i // 8) for i in ids],
        }
    )
    rk = ["k99" if i % 5 == 0 else "k%d" % (i % 8) for i in ids]
    rm = ["m99" if i % 9 == 0 else "m%d" % (i // 8) for i in ids]
    right = pd.DataFrame({"id": np.tile(ids, 2), "block_key": rk + rm})

    def run(pl_, pr_, parts):
        return blocking_metrics(
            rd.from_pandas(left).repartition(pl_),
            rd.from_pandas(right).repartition(pr_),
            partitions=parts,
        ).to_pandas()

    out = run(3, 2, 3)
    pd.testing.assert_frame_equal(out, run(1, 1, 1))  # partition-invariant

    lk, rkk = {}, {}
    for _, r in left.iterrows():
        lk.setdefault(r.block_key, set()).add(r.id)
    for _, r in right.iterrows():
        rkk.setdefault(r.block_key, set()).add(r.id)
    cand = {
        (a, b)
        for k in set(lk) & set(rkk)
        for a in lk[k]
        for b in rkk[k]
    }
    n_cand = len(cand)
    n_found = sum(1 for a, b in cand if a == b)
    r = out.iloc[0]
    assert (r.n_left, r.n_right, r.n_true) == (80, 80, 80)
    assert r.n_candidates == n_cand and r.n_found == n_found
    assert r.rr_u == 10**9 * (6400 - n_cand) // 6400
    assert r.pc_u == 10**9 * n_found // 80

    # max_block drops oversized blocks from the candidate set
    capped = blocking_metrics(
        rd.from_pandas(left), rd.from_pandas(right), max_block=3, partitions=2
    ).to_pandas().iloc[0]
    assert capped.n_candidates < n_cand


def test_frequent_directions_bound_and_merge(ray_session):
    from pprl_ray.sketches import FrequentDirectionsSketch as FD

    rng = np.random.default_rng(3)
    d, n, ell = 32, 4000, 8
    A = rng.normal(size=(n, 4)) @ rng.normal(size=(4, d)) + 0.05 * rng.normal(
        size=(n, d)
    )
    AtA = A.T @ A

    sk = FD(d, ell)
    sk.update(A.ravel())
    assert np.linalg.norm(AtA - sk.gram(), 2) <= sk.error_bound()

    # mergeable, order-invariant within the bound, counters exact
    parts = np.array_split(A, 7)
    for order in (range(7), reversed(range(7))):
        m = FD(d, ell)
        for i in order:
            p = FD(d, ell)
            p.update(parts[i].ravel())
            m.merge(p)
        assert np.linalg.norm(AtA - m.gram(), 2) <= m.error_bound()
        assert m.n == n
        assert abs(m.fnorm2 - (A * A).sum()) < 1e-6 * (A * A).sum()

    # serialisation roundtrip
    rt = FD.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and np.allclose(rt.gram(), sk.gram())

    # no compaction => exact
    small = rng.normal(size=(2 * ell, d))
    s3 = FD(d, ell)
    s3.update(small.ravel())
    assert np.allclose(s3.gram(), small.T @ small)

    # spectrum readout within bound of the exact eigenvalues
    exact = np.sort(np.linalg.eigvalsh(AtA))[::-1][:4]
    approx = sk.spectrum(4)
    assert np.all(np.abs(exact - approx) <= sk.error_bound() + 1e-9)


def test_fd_sketch_distributed_by_key(ray_session):
    import ray.data as rd

    from pprl_ray.sketches import FrequentDirectionsSketch as FD
    from pprl_ray.state.aggregate import finalize_sketches, sketch_by_key

    rng = np.random.default_rng(9)
    d = 16
    vecs = rng.normal(size=(500, d))
    df = pd.DataFrame({"embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(6)
    merged = sketch_by_key(ds, lambda: FD(d, ell=6), "embedding", None)
    sk = finalize_sketches(merged, FD)[""]
    assert sk.n == 500
    AtA = vecs.T @ vecs
    assert np.linalg.norm(AtA - sk.gram(), 2) <= sk.error_bound()


def test_sliding_theta_union_exact_below_capacity(ray_session):
    # trailing-window union of per-day theta sketches == exact distinct
    from pprl_ray.sketches import ThetaSketch

    rng = np.random.default_rng(23)
    days = [f"2026-01-{d:02d}" for d in range(1, 15)]
    by_day = {d: set(rng.choice(500, rng.integers(5, 60)).tolist()) for d in days}
    sk = {}
    for d, users in by_day.items():
        t = ThetaSketch(4096)
        t.update(np.array(sorted(users), dtype=np.int64))
        sk[d] = t
    for i, d in enumerate(days):
        u = ThetaSketch(4096)
        want = set()
        for j in range(max(0, i - 6), i + 1):
            u.merge(ThetaSketch.from_bytes(sk[days[j]].to_bytes()))
            want |= by_day[days[j]]
        assert int(round(u.estimate())) == len(want)


def test_cuckoo_filter_contract(ray_session):
    from pprl_ray.sketches import CuckooSketch

    rng = np.random.default_rng(0)
    keys = rng.choice(10**9, 20000, replace=False)
    sk = CuckooSketch(1 << 13, 4, 16)  # capacity 32768, load ~0.61
    sk.update(keys)
    assert sk.contains(keys).all()  # no false negatives
    assert sk.count == len(keys)

    absent = np.setdiff1d(rng.choice(10**9, 50000, replace=False), keys)
    assert sk.contains(absent).mean() <= sk.fpr_bound()  # 8 / 2^16

    # exact deletion; kept keys never false-negative afterwards
    dele, kept = keys[::2], keys[1::2]
    assert sk.delete(dele) == len(np.unique(dele))
    assert sk.contains(kept).all()
    assert sk.contains(dele).mean() <= 10 * sk.fpr_bound()  # FP-only now

    # merge = re-insert stored entries; membership of the union preserved
    a, b = CuckooSketch(1 << 13), CuckooSketch(1 << 13)
    a.update(keys[:10000])
    b.update(keys[10000:])
    a.merge(b)
    assert a.contains(keys).all() and a.count == len(keys)

    # order-independent membership (not layout): reversed merge agrees
    c, d = CuckooSketch(1 << 13), CuckooSketch(1 << 13)
    c.update(keys[10000:])
    d.update(keys[:10000])
    c.merge(d)
    assert c.contains(keys).all()

    # serialisation roundtrip (incl. stash + counters)
    rt = CuckooSketch.from_bytes(sk.to_bytes())
    assert (rt.table == sk.table).all() and rt.stash == sk.stash
    assert rt.count == sk.count

    # stash catches overflow beyond max kicks: cram to load factor ~0.97
    tiny = CuckooSketch(1 << 6, 4, 16, max_kicks=20)
    many = rng.choice(10**9, 248, replace=False)
    tiny.update(many)
    assert tiny.contains(many).all()  # stash keeps the contract


def test_window_novelty_matches_bruteforce(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import window_novelty

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e f",               # all novel (first carrier)
                "a b c d x y z w",           # window 'a b c d' is a dup
                "a b c d e f",               # exact copy: 0 novel
                "totally fresh words here",  # all novel
            ],
        }
    )
    L = 4

    def run(parts):
        ds = rd.from_pandas(docs).repartition(parts)
        return (
            window_novelty(ds, window=L, partitions=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(3)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    # brute force
    first = {}
    wins = {}
    for _, r in docs.iterrows():
        w = r.text.split(" ")
        ws = [" ".join(w[i : i + L]) for i in range(len(w) - L + 1)]
        wins[r.doc_id] = ws
        for s in ws:
            first.setdefault(s, r.doc_id)
    for _, r in out.iterrows():
        ws = wins[r.doc_id]
        nd = sum(1 for s in ws if first[s] < r.doc_id)
        assert r.n_windows == len(ws)
        assert r.n_dup == nd
        assert r.novelty_u == 10**6 * (len(ws) - nd) // len(ws)
    assert out.loc[out.doc_id == 3, "novelty_u"].iloc[0] == 0
    assert out.loc[out.doc_id == 1, "novelty_u"].iloc[0] == 10**6


def test_event_transitions_matches_pandas_reference(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import event_transitions

    rng = np.random.default_rng(31)
    n = 600
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 40, n),
            "ts": rng.integers(0, 500, n),  # collisions exercise the tie-break
            "event_type": rng.choice(["view", "click", "buy"], n),
        }
    )

    def run(parts):
        ds = rd.from_pandas(ev).repartition(parts)
        return (
            event_transitions(ds, order_break="event_id", partitions=3)
            .to_pandas()
            .sort_values(["from_type", "to_type"])
            .reset_index(drop=True)
        )

    out = run(4)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    ref = (
        ev.sort_values(["user_id", "ts", "event_id"])
        .assign(nxt=lambda d: d.groupby("user_id")["event_type"].shift(-1))
        .dropna(subset=["nxt"])
        .groupby(["event_type", "nxt"])
        .size()
        .reset_index(name="n")
        .rename(columns={"event_type": "from_type", "nxt": "to_type"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    ref["n"] = ref["n"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)


def test_fs_agreement_counts_matches_pandas(ray_session):
    import pyarrow as pa_
    import ray.data as rd

    from pprl_ray.stages.match import fs_agreement_counts

    def arrow_ds(df, parts):
        return rd.from_arrow(
            pa_.Table.from_pandas(df, preserve_index=False)
        ).repartition(parts)

    rng = np.random.default_rng(8)
    n = 150
    a = pd.DataFrame(
        {
            "id": np.arange(n),
            "name": [f"n{i}" for i in range(n)],
            "seg": rng.choice(["x", "y", "z"], n),
        }
    )
    b = a.copy()
    b["name"] = [f"Q{i}" if i % 7 == 0 else f"n{i}" for i in range(n)]
    b["seg"] = [
        ("x" if s != "x" else "y") if i % 5 == 0 else s
        for i, s in enumerate(a.seg)
    ]
    pairs = pd.DataFrame(
        {
            "a_id": list(range(n)) * 2,
            "b_id": list(range(n)) + [(i + 1) % n for i in range(n)],
            "label": [1] * n + [0] * n,
        }
    )

    def run(parts):
        return (
            fs_agreement_counts(
                arrow_ds(a, 3), arrow_ds(b, 2), arrow_ds(pairs, parts),
                ["name", "seg"], a_id="id", b_id="id", partitions=3,
            )
            .to_pandas()
            .sort_values("attribute")
            .reset_index(drop=True)
        )

    out = run(4)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    m = pairs.merge(a, left_on="a_id", right_on="id").merge(
        b, left_on="b_id", right_on="id", suffixes=("_a", "_b")
    )
    for attr in ["name", "seg"]:
        eq = m[attr + "_a"] == m[attr + "_b"]
        r = out[out.attribute == attr].iloc[0]
        for lab, (cn, ca, cu) in {
            1: ("n_match", "n_match_agree", "m_u"),
            0: ("n_nonmatch", "n_nonmatch_agree", "u_u"),
        }.items():
            sel = m.label == lab
            nn, na = int(sel.sum()), int((eq & sel).sum())
            assert r[cn] == nn and r[ca] == na
            assert r[cu] == 10**6 * na // nn


def test_fuzzy_join_matches_bruteforce(ray_session):
    import pyarrow as pa_
    import ray.data as rd

    from pprl_ray.functions.qgram import tokenize
    from pprl_ray.stages.match import fuzzy_join

    def arrow_ds(df, parts):
        return rd.from_arrow(
            pa_.Table.from_pandas(df, preserve_index=False)
        ).repartition(parts)

    a = pd.DataFrame(
        {"id": [1, 2, 3, 4], "name": ["peter", "sandra", "michael", "anne"]}
    )
    b = pd.DataFrame(
        {"id": [11, 12, 13, 14], "name": ["petra", "sanda", "mike", "annie"]}
    )

    def run(parts):
        return (
            fuzzy_join(arrow_ds(a, 2), arrow_ds(b, parts), "name", "name",
                       threshold=0.3, partitions=3)
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )

    out = run(2)
    pd.testing.assert_frame_equal(out, run(1))  # partition-invariant

    ref = []
    for _, ra in a.iterrows():
        for _, rb in b.iterrows():
            ga, gb = tokenize(ra["name"]), tokenize(rb["name"])
            inter, union = len(ga & gb), len(ga | gb)
            ju = 10**6 * inter // union
            if ju >= 300000:
                ref.append((ra.id, rb.id, inter, ju))
    assert sorted(tuple(r) for r in out.itertuples(index=False)) == sorted(ref)


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    import pyarrow as pa_
    import ray.data as rd

    from pprl_ray.stages.match import sorted_neighborhood_pairs

    rng = np.random.default_rng(2)
    n = 300
    df = pd.DataFrame(
        {
            "id": rng.permutation(n),
            "key": ["k%03d" % rng.integers(0, 90) for _ in range(n)],  # ties
        }
    )

    def run(parts, nparts):
        ds = rd.from_arrow(
            pa_.Table.from_pandas(df, preserve_index=False)
        ).repartition(parts)
        return (
            sorted_neighborhood_pairs(ds, "key", "id", window=4,
                                      partitions=nparts)
            .to_pandas()
            .sort_values(["a_id", "b_id", "gap"])
            .reset_index(drop=True)
        )

    out = run(5, 6)
    pd.testing.assert_frame_equal(out, run(1, 2))  # partition-invariant

    ids = df.sort_values(["key", "id"]).reset_index(drop=True)["id"].to_numpy()
    ref = [
        (ids[i], ids[i + d], d)
        for d in range(1, 4)
        for i in range(len(ids) - d)
    ]
    assert sorted(tuple(r) for r in out.itertuples(index=False)) == sorted(ref)


def test_weighted_quantiles_exact_reference(ray_session):
    import pyarrow as pa_
    import ray.data as rd

    from pprl_ray.stages.sort import weighted_quantiles_exact

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "v": rng.integers(0, 200, n),
            "w": rng.integers(1, 20, n),
        }
    )
    qs = ((1, 4), (1, 2), (3, 4), (9, 10))

    def run(parts, nparts):
        ds = rd.from_arrow(
            pa_.Table.from_pandas(df, preserve_index=False)
        ).repartition(parts)
        return (
            weighted_quantiles_exact(ds, "v", "w", "id", qs,
                                     partitions=nparts)
            .to_pandas()
            .sort_values(["q_num", "q_den"])
            .reset_index(drop=True)
        )

    out = run(5, 4)
    pd.testing.assert_frame_equal(out, run(1, 2))  # partition-invariant

    s = df.sort_values(["v", "id"]).reset_index(drop=True)
    cw = s["w"].cumsum().to_numpy()
    W = int(df["w"].sum())
    for qn, qd in qs:
        t = (qn * W + qd - 1) // qd
        j = int(np.flatnonzero(cw >= t)[0])
        r = out[(out.q_num == qn) & (out.q_den == qd)].iloc[0]
        assert r.value == s["v"].iloc[j]
        assert r.cum_weight == cw[j]
        assert r["rank"] == j + 1
