"""Sketch accuracy (published error bounds), merge order-invariance
properties (FIXTURES.md F5) and serialization round-trips."""

import random

import numpy as np
import pytest

from pprl_ray.sketches import (
    BloomSketch,
    CMSSketch,
    CountSketch,
    DDSketch,
    HistogramSketch,
    HLLSketch,
    KLLSketch,
    KMVSketch,
    MinHashSketch,
    TDigestSketch,
    ThetaSketch,
    band_keys,
    hamming64,
    minhash_signatures,
    simhash64,
)


def _zipf_stream(n, vocab=200_000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).clip(1, vocab)


# --- accuracy bounds --------------------------------------------------------


def test_hll_within_published_bound():
    vals = _zipf_stream(500_000)
    exact = len(np.unique(vals))
    for p in (12, 14):
        sk = HLLSketch(p)
        sk.update(vals)
        rel = abs(sk.estimate() - exact) / exact
        assert rel < 3 * sk.relative_error_bound(), (p, rel)


def test_hll_small_range_linear_counting():
    sk = HLLSketch(14)
    vals = np.arange(100)
    sk.update(vals)
    assert abs(sk.estimate() - 100) < 5


def test_cms_overestimate_bound():
    vals = _zipf_stream(300_000)
    sk = CMSSketch(1 << 15, 5)
    sk.update(vals)
    heavy = np.arange(1, 50)
    est = sk.query(heavy)
    true = np.array([(vals == h).sum() for h in heavy])
    assert (est >= true).all()  # CMS never underestimates
    assert ((est - true) <= sk.epsilon * sk.total).all()


def test_bloom_no_false_negatives_and_fpr():
    vals = np.unique(_zipf_stream(100_000))
    sk = BloomSketch(1 << 20, 4)
    sk.update(vals)
    assert sk.contains(vals).all()  # no false negatives, ever
    absent = np.arange(1_000_000, 1_050_000)
    measured_fpr = sk.contains(absent).mean()
    assert measured_fpr <= 3 * max(sk.fpr(len(vals)), 1e-4)
    rel = abs(sk.estimate_cardinality() - len(vals)) / len(vals)
    assert rel < 0.05


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(7)
    data = rng.lognormal(3.0, 1.0, 200_000)
    sk = TDigestSketch(200)
    for chunk in np.array_split(data, 20):
        sk.update(chunk)
    s = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99, 0.999):
        est = sk.quantile(q)
        true_rank = np.searchsorted(s, est) / len(s)
        tol = 0.005 if 0.1 < q < 0.9 else 0.002  # t-digest is tighter at tails
        assert abs(true_rank - q) < tol, (q, true_rank)


def test_kll_rank_error_bound():
    rng = np.random.default_rng(11)
    data = rng.normal(0, 1, 200_000)
    sk = KLLSketch(200)
    for chunk in np.array_split(data, 37):
        sk.update(chunk)
    s = np.sort(data)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = sk.quantile(q)
        true_rank = np.searchsorted(s, est) / len(s)
        assert abs(true_rank - q) < 0.02, (q, true_rank)  # ~2/k with k=200


def test_minhash_jaccard_estimate():
    a = np.arange(0, 1000)
    b = np.arange(500, 1500)
    sa, sb = MinHashSketch(256), MinHashSketch(256)
    sa.update(a)
    sb.update(b)
    true = 500 / 1500
    assert abs(sa.jaccard(sb) - true) < 0.08  # ~3/sqrt(k)


def test_simhash_similarity_tracks_hamming():
    base = np.arange(1000)
    near = np.concatenate([np.arange(950), np.arange(5000, 5050)])
    far = np.arange(10_000, 11_000)
    s = simhash64([base, near, far])
    d_near = hamming64(s[:1], s[1:2])[0]
    d_far = hamming64(s[:1], s[2:3])[0]
    assert d_near < d_far
    assert d_near <= 12


def test_band_keys_collision():
    sigs = minhash_signatures([np.arange(100), np.arange(100), np.arange(200, 300)], k=128)
    bk = band_keys(sigs, bands=16)
    assert (bk[0] == bk[1]).all()
    assert not (bk[0] == bk[2]).any()


# --- merge properties -------------------------------------------------------


def _partitions(vals, n_parts, seed):
    rng = np.random.default_rng(seed)
    assignment = rng.integers(0, n_parts, len(vals))
    return [vals[assignment == p] for p in range(n_parts)]


@pytest.mark.parametrize("cls,kwargs", [
    (BloomSketch, {"m_bits": 1 << 16, "k": 4}),
    (HLLSketch, {"p": 12}),
    (CMSSketch, {"width": 1 << 12, "depth": 5}),
    (CountSketch, {"width": 1 << 12, "depth": 5}),
    (MinHashSketch, {"k": 128}),
    (ThetaSketch, {"k": 256}),
    (KMVSketch, {"k": 256}),
    (HistogramSketch, {"lo": 0, "hi": 1000, "bins": 32}),
    (DDSketch, {}),
])
def test_exact_merge_order_invariance(cls, kwargs):
    """Bloom/HLL/CMS/MinHash merges must be bit-exact under any merge order
    and any partitioning (the north-rule UDAF contract)."""
    vals = _zipf_stream(50_000)
    parts = _partitions(vals, 8, seed=3)
    results = []
    for order_seed in range(4):
        order = list(range(8))
        random.Random(order_seed).shuffle(order)
        sketches = []
        for p in order:
            sk = cls(**kwargs)
            sk.update(parts[p])
            sketches.append(sk)
        acc = sketches[0]
        for sk in sketches[1:]:
            acc = acc.merge(sk)
        results.append(acc.to_bytes())
    assert all(r == results[0] for r in results[1:])
    # and equals the single-pass sketch
    single = cls(**kwargs)
    single.update(vals)
    assert results[0] == single.to_bytes()


@pytest.mark.parametrize("cls,kwargs,tol", [
    (TDigestSketch, {"compression": 200}, 0.01),
    (KLLSketch, {"k": 200}, 0.025),
])
def test_quantile_merge_order_invariance_within_bound(cls, kwargs, tol):
    """t-digest / KLL merges are order-invariant within the published
    rank-error bound (not bit-exact — documented property)."""
    rng = np.random.default_rng(5)
    vals = rng.lognormal(2, 1, 100_000)
    s = np.sort(vals)
    parts = _partitions(vals, 8, seed=4)
    for order_seed in range(3):
        order = list(range(8))
        random.Random(order_seed).shuffle(order)
        acc = None
        for p in order:
            sk = cls(**kwargs)
            sk.update(parts[p])
            acc = sk if acc is None else acc.merge(sk)
        for q in (0.1, 0.5, 0.9):
            est = acc.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < tol, (order_seed, q, true_rank)


@pytest.mark.parametrize("cls,kwargs", [
    (BloomSketch, {"m_bits": 1 << 14, "k": 3}),
    (HLLSketch, {"p": 10}),
    (CMSSketch, {"width": 256, "depth": 3}),
    (CountSketch, {"width": 256, "depth": 3}),
    (MinHashSketch, {"k": 64}),
    (TDigestSketch, {"compression": 100}),
    (KLLSketch, {"k": 128}),
    (ThetaSketch, {"k": 64}),
    (KMVSketch, {"k": 64}),
    (HistogramSketch, {"lo": 0, "hi": 1000, "bins": 32}),
    (DDSketch, {}),
])
def test_serialization_roundtrip(cls, kwargs):
    sk = cls(**kwargs)
    sk.update(_zipf_stream(5_000))
    data = sk.to_bytes()
    back = cls.from_bytes(data)
    assert back.to_bytes() == data
    # merged-after-roundtrip still works
    other = cls(**kwargs)
    other.update(_zipf_stream(1_000, seed=9))
    back.merge(other)


class TestMGSketch:
    """Misra-Gries heavy hitters: guarantee + bound + mergeability."""

    def test_undercount_bound_and_hitter_guarantee(self):
        import collections

        from pprl_ray.sketches import MGSketch

        rng = np.random.default_rng(3)
        vals = rng.zipf(1.3, 50_000).astype(np.int64) % 5000
        sk = MGSketch(k=128)
        for chunk in np.array_split(vals, 7):
            sk.update(chunk)
        exact = collections.Counter(vals.tolist())
        bound = sk.error_bound
        for v, est in sk.counters.items():
            assert 0 < est <= exact[v]            # never overcounts
            assert exact[v] - est <= bound + 1e-9  # undercount <= N/k
        # every item with true count > N/k must be present
        for v, c in exact.items():
            if c > bound:
                assert v in sk.counters, (v, c, bound)

    def test_merge_preserves_bound_any_order(self):
        import collections

        from pprl_ray.sketches import MGSketch

        rng = np.random.default_rng(4)
        vals = rng.zipf(1.2, 30_000).astype(np.int64) % 2000
        parts = np.array_split(vals, 6)
        for order in ([0, 1, 2, 3, 4, 5], [5, 3, 1, 0, 4, 2]):
            acc = None
            for i in order:
                sk = MGSketch(k=64)
                sk.update(parts[i])
                acc = sk if acc is None else acc.merge(sk)
            exact = collections.Counter(vals.tolist())
            assert acc.total == len(vals)
            bound = acc.error_bound
            for v, est in acc.counters.items():
                assert est <= exact[v] and exact[v] - est <= bound + 1e-9
            for v, c in exact.items():
                if c > bound:
                    assert v in acc.counters

    def test_serialization_roundtrip(self):
        from pprl_ray.sketches import MGSketch

        sk = MGSketch(k=8)
        sk.update(np.array([1, 1, 2, 3, 3, 3], dtype=np.int64))
        rt = MGSketch.from_bytes(sk.to_bytes())
        assert rt.counters == sk.counters and rt.total == sk.total and rt.k == sk.k


def test_sketch_pins_match_live_requery(ray_session, sf001_dir):
    """The pinned sf0.01 VALUES oracles (pprl_ray/golden/sketch_pins.py)
    must equal a live re-run of each sketch query — keeps the pins honest
    after any kernel change (regenerate via scripts/gen_sketch_pins.py)."""
    import __ray_entry__ as e
    from pprl_ray.golden import sketch_pins as sp

    qs = e.queries()
    for name in (
        "hll_distinct_tokens",
        "cms_token_counts",
        "kll_ntok_quantiles",
        "tdigest_ntok_quantiles",
        "bloom_sources",
        "corpus_profile",
        "multimodal_features",
        "audio_features",
        "video_frames",
        "kmeans_clusters",
        "countsketch_token_counts",
    ):
        pin = getattr(sp, f"PIN_{name.upper()}")
        df = qs[name](sf001_dir)
        if not hasattr(df, "itertuples"):
            df = df.to_pandas()
        df = df.sort_values(list(df.columns)[0]).reset_index(drop=True)
        live = [tuple(r) for r in df.itertuples(index=False)]
        assert live == pin, f"{name}: pins stale — regenerate with scripts/gen_sketch_pins.py"


def test_histogram_exact_counts_and_clamps():
    from pprl_ray.sketches import HistogramSketch

    sk = HistogramSketch(lo=0, hi=64, bins=16)
    vals = np.array([-5, 0, 1, 3, 4, 63, 64, 100], dtype=np.int64)
    sk.update(vals)
    assert sk.underflow == 1          # -5
    assert sk.overflow == 2           # 64, 100
    bc = sk.bin_counts()
    assert bc[0] == 3                 # values 0,1,3 land in bin 0 (width 4)
    assert bc[1] == 1                 # 4
    assert bc[15] == 1                # 63
    assert sk.total() == len(vals)
    # exact vs numpy histogram on in-range values
    rng = np.random.default_rng(3)
    big = rng.integers(0, 64, 10_000)
    sk2 = HistogramSketch(0, 64, 16)
    sk2.update(big)
    expected, _ = np.histogram(big, bins=16, range=(0, 64))
    assert np.array_equal(sk2.bin_counts(), expected)


def test_countsketch_unbiased_and_l2_bound():
    from pprl_ray.sketches import CountSketch

    vals = _zipf_stream(300_000)
    sk = CountSketch(1 << 14, 5)
    for chunk in np.array_split(vals, 9):
        sk.update(chunk)
    uq, cnt = np.unique(vals, return_counts=True)
    l2 = float(np.sqrt((cnt.astype(np.float64) ** 2).sum()))
    heavy = uq[np.argsort(-cnt)[:50]]
    est = sk.query(heavy)
    true = cnt[np.argsort(-cnt)[:50]]
    # published bound: |est - f| <= 3*l2/sqrt(width) w.h.p.
    assert (np.abs(est - true) <= sk.l2_error_bound(l2)).all()
    # signed estimates can under- AND over-estimate (unlike CMS)
    errs = est - true
    assert (errs <= 0).any() or (np.abs(errs).max() < 2)


def test_table_profile_stats_and_distinct_modes(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.pipelines.table_profile import table_profile

    n = 3000
    tbl = pa.table(
        {
            "a": pa.array(
                [None if i % 10 == 0 else i % 257 for i in range(n)], pa.int64()
            ),
            "s": pa.array([f"v{i % 41:03d}" if i % 7 else None for i in range(n)]),
        }
    )
    for parts in (1, 6):
        out = table_profile(
            rd.from_arrow(tbl).repartition(parts), ["a", "s"], theta_k=1024
        ).set_index("column")
        a, s = out.loc["a"], out.loc["s"]
        assert a["n_rows"] == n and a["n_nulls"] == n // 10
        assert a["min_num"] == 0.0 and a["max_num"] == 256.0
        assert a["n_distinct"] == 257  # exact: 257 < k
        assert a["min_str"] is None or pd.isna(a["min_str"])
        assert s["n_nulls"] == len([i for i in range(n) if i % 7 == 0])
        assert s["min_str"] == "v000" and s["max_str"] == "v040"
        assert s["n_distinct"] == 41

    # above capacity the estimator takes over within its published bound
    big = pa.table({"x": pa.array(np.arange(20000, dtype=np.int64))})
    est = table_profile(rd.from_arrow(big), ["x"], theta_k=512).iloc[0]["n_distinct"]
    assert abs(est - 20000) / 20000 < 5 / np.sqrt(510)


def test_cms_inner_product_join_size_bound():
    rng = np.random.default_rng(13)
    a = rng.zipf(1.5, 30_000).clip(1, 5000).astype(np.int64)
    b = rng.integers(1, 5001, 20_000).astype(np.int64)
    sa, sb = CMSSketch(1 << 14, 5), CMSSketch(1 << 14, 5)
    sa.update(a)
    sb.update(b)
    ca = np.bincount(a, minlength=5001).astype(np.int64)
    cb = np.bincount(b, minlength=5001).astype(np.int64)
    exact = int((ca * cb).sum())
    est = sa.inner_product(sb)
    assert est >= exact  # never underestimates
    assert est - exact <= sa.epsilon * sa.total * sb.total  # published bound
    # symmetric and merge-compatible
    assert sb.inner_product(sa) == est
    with pytest.raises(AssertionError):
        sa.inner_product(CMSSketch(1 << 10, 5))


class TestKMVSketch:
    """KMV bottom-k distinct sketch (Beyer et al. SIGMOD 2007): exact below
    k, (k-1)/U_(k) estimator within ~1/sqrt(k-2) RSE above it, coordinated-
    sample Jaccard, and bit-parity of the DuckDB splitmix64 oracle replica."""

    def test_exact_below_k(self):
        sk = KMVSketch(k=256)
        vals = np.arange(100, dtype=np.int64)
        sk.update(vals)
        sk.update(vals)  # duplicates must not inflate
        assert sk.estimate_int() == 100

    def test_estimation_error_within_bound(self):
        true_n = 50_000
        rng = np.random.default_rng(11)
        vals = rng.permutation(true_n).astype(np.int64)
        for k in (128, 512):
            sk = KMVSketch(k=k)
            for part in np.array_split(vals, 7):
                sk.update(part)
            rel = abs(sk.estimate() - true_n) / true_n
            assert rel < 4.0 / (k - 2) ** 0.5, (k, rel)

    def test_jaccard_coordinated_sample(self):
        a = np.arange(0, 30_000, dtype=np.int64)
        b = np.arange(15_000, 45_000, dtype=np.int64)  # true J = 1/3
        ska, skb = KMVSketch(k=512), KMVSketch(k=512)
        ska.update(a)
        skb.update(b)
        est = ska.jaccard(skb)
        assert abs(est - 1 / 3) < 0.1
        # identical sets -> exactly 1.0; disjoint small sets -> 0.0
        assert ska.jaccard(ska) == 1.0

    def test_sql_hash_parity(self):
        """The oracle's inlined splitmix64 (32-bit-limb wrapping multiply in
        HUGEINT) must match sketches/hashing.hash_ints bit-for-bit — this is
        what makes kmv_distinct_custkeys a computed (not pinned) oracle."""
        import duckdb

        from pprl_ray.sketches.hashing import hash_ints

        rng = np.random.default_rng(5)
        vals = np.concatenate([
            rng.integers(0, 2**31, 64, dtype=np.int64),
            np.array([0, 1, 2**31 - 1, 2**62], dtype=np.int64),
        ])
        expect = hash_ints(vals)
        rows = ", ".join(f"({int(v)}::HUGEINT)" for v in vals)
        got = duckdb.sql(f"""
            WITH d(v) AS (VALUES {rows}),
            h0 AS (SELECT (v + 11400714819323198485) % 18446744073709551616 AS z, v FROM d),
            h1 AS (SELECT xor(z, z // 1073741824) AS z, v FROM h0),
            h2 AS (SELECT ((z % 4294967296) * 13787848793156543929
                    + (((z // 4294967296) * (13787848793156543929 % 4294967296)) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS z, v FROM h1),
            h3 AS (SELECT xor(z, z // 134217728) AS z, v FROM h2),
            h4 AS (SELECT ((z % 4294967296) * 10723151780598845931
                    + (((z // 4294967296) * (10723151780598845931 % 4294967296)) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS z, v FROM h3)
            SELECT xor(z, z // 2147483648) FROM h4 ORDER BY v
        """).fetchall()
        order = np.argsort(vals, kind="stable")
        for e, (g,) in zip(expect[order], got):
            assert int(e) == int(g)


class TestHLLSparse:
    """Sparse HLL representation: lossless (bit-identical bytes/estimates to
    a dense build), ~25x smaller at low fill, old dense blobs still parse."""

    def test_sparse_dense_bit_identical(self):
        vals = np.arange(500, dtype=np.int64)  # nnz << m/8 at p=14
        sparse_built = HLLSketch(14)
        for part in np.array_split(vals, 9):
            sparse_built.update(part)
        dense_built = HLLSketch(14)
        dense_built.update(np.arange(60_000, dtype=np.int64))  # force dense
        dense_built._dense[:] = 0
        idx, rho = dense_built._hash_rho(np.unique(vals))
        np.maximum.at(dense_built._dense, idx, rho)
        assert dense_built._dense is not None and sparse_built._dense is None
        assert sparse_built.to_bytes() == dense_built.to_bytes()
        assert sparse_built.estimate() == dense_built.estimate()

    def test_sparse_blob_is_small_then_densifies(self):
        sk = HLLSketch(14)
        sk.update(np.arange(200, dtype=np.int64))
        assert len(sk.to_bytes()) < 16 + 5 * 220 + 4
        sk.update(np.arange(200, 60_000, dtype=np.int64))
        assert sk._dense is not None  # crossed m/8 -> densified
        assert len(sk.to_bytes()) == 16 + sk.m

    def test_sparse_merge_matches_single_pass(self):
        vals = _zipf_stream(2_000, vocab=500, seed=3).astype(np.int64)
        parts = _partitions(vals, 6, seed=1)
        acc = None
        for p in parts:
            sk = HLLSketch(12)
            sk.update(p)
            acc = sk if acc is None else acc.merge(sk)
        single = HLLSketch(12)
        single.update(vals)
        assert acc.to_bytes() == single.to_bytes()

    def test_mixed_sparse_dense_merge(self):
        big = HLLSketch(12)
        big.update(np.arange(50_000, dtype=np.int64))
        small = HLLSketch(12)
        small.update(np.arange(50_000, 50_100, dtype=np.int64))
        ref = HLLSketch(12)
        ref.update(np.arange(50_100, dtype=np.int64))
        merged = small.merge(big)  # sparse.merge(dense)
        assert merged.to_bytes() == ref.to_bytes()

    def test_old_dense_format_still_parses(self):
        import struct as _s

        sk = HLLSketch(10)
        sk.update(np.arange(50, dtype=np.int64))
        old = _s.pack("<qq", 10, 0) + sk.registers.tobytes()  # pre-sparse layout
        back = HLLSketch.from_bytes(old)
        assert back.estimate() == sk.estimate()
        assert back.to_bytes() == sk.to_bytes()  # re-canonicalised to sparse


class TestDDSketch:
    """Relative-error quantiles (Masson et al., VLDB 2019) with the exact
    rational gamma=5/4 mapping (sketches/ddsketch.py)."""

    def test_exact_bucket_mapping_matches_definition(self):
        from pprl_ray.sketches.ddsketch import exact_log_buckets

        xs = np.arange(1, 20_001)
        got = exact_log_buckets(xs)
        for x in (1, 2, 5, 124, 125, 126, 19_999):
            i = int(got[x - 1])
            assert 5**i >= x * 4**i, (x, i)
            assert i == 0 or 5 ** (i - 1) < x * 4 ** (i - 1), (x, i)

    def test_relative_error_bound_all_quantiles(self):
        vals = _zipf_stream(200_000)
        sk = DDSketch()
        sk.update(vals)
        alpha = DDSketch.alpha()
        sv = np.sort(vals)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
            true = float(sv[int(np.floor(q * (len(sv) - 1)))])
            est = sk.quantile(q)
            assert abs(est - true) <= alpha * true + 1e-9, (q, est, true)

    def test_rational_rank_matches_float_api(self):
        vals = _zipf_stream(50_000)
        sk = DDSketch()
        sk.update(vals)
        for num, den in ((1, 2), (19, 20), (99, 100), (3, 4)):
            assert sk.quantile_rational(num, den) == sk.quantile(num / den)

    def test_merge_equals_single_pass_bitexact(self):
        vals = _zipf_stream(100_000)
        parts = _partitions(vals, 16, seed=11)
        merged = DDSketch()
        for p in parts:
            other = DDSketch()
            other.update(p)
            merged.merge(other)
        single = DDSketch()
        single.update(vals)
        assert merged.to_bytes() == single.to_bytes()

    def test_collapse_bounds_bins_and_keeps_upper_quantiles(self):
        vals = _zipf_stream(100_000)
        tight = DDSketch(max_bins=16)
        tight.update(vals)
        assert len(tight.counts) <= 16
        loose = DDSketch()
        loose.update(vals)
        # collapse only merges the LOWEST buckets: high quantiles unchanged
        assert tight.quantile(0.99) == loose.quantile(0.99)
        assert tight.n == loose.n

    def test_rejects_nonpositive_and_float(self):
        sk = DDSketch()
        with pytest.raises(ValueError):
            sk.update(np.array([3, 0, 7]))
        with pytest.raises(TypeError):
            sk.update(np.array([1.5, 2.5]))

    def test_weighted_update_equals_repeats(self):
        xs = np.array([3, 17, 17, 900])
        a = DDSketch()
        a.update(np.array([3, 17, 900]), counts=np.array([1, 2, 1]))
        b = DDSketch()
        b.update(xs)
        assert a.to_bytes() == b.to_bytes()


def test_countsketch_ams_f2_and_inner_product():
    """AMS readouts: f2 (self-join size) unbiased within ~2F2/sqrt(width)
    per row; inner_product tracks the exact equi-join size."""
    rng = np.random.default_rng(13)
    a = rng.zipf(1.3, 120_000).clip(1, 50_000)
    b = rng.zipf(1.3, 80_000).clip(1, 50_000)
    ska = CountSketch(width=1 << 14, depth=5)
    skb = CountSketch(width=1 << 14, depth=5)
    for chunk in np.array_split(a, 9):
        ska.update(chunk)
    for chunk in np.array_split(b, 5):
        skb.update(chunk)

    _, fa = np.unique(a, return_counts=True)
    exact_f2 = int((fa.astype(object) ** 2).sum())
    est = ska.f2()
    # median-of-5 rows, per-row std <= sqrt(2)*F2/sqrt(width): allow 6 sigma
    tol = 6 * (2**0.5) * exact_f2 / (1 << 7)
    assert abs(est - exact_f2) <= tol, (est, exact_f2)

    ua, fa = np.unique(a, return_counts=True)
    ub, fb = np.unique(b, return_counts=True)
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    exact_join = int((fa[ia].astype(object) * fb[ib].astype(object)).sum())
    est_join = ska.inner_product(skb)
    l2a = float(np.sqrt((fa.astype(np.float64) ** 2).sum()))
    l2b = float(np.sqrt((fb.astype(np.float64) ** 2).sum()))
    tol_j = 6 * l2a * l2b / (1 << 7)
    assert abs(est_join - exact_join) <= tol_j, (est_join, exact_join)

    # merge-then-read equals single-pass read (exact counter-add merge)
    half1, half2 = a[: len(a) // 2], a[len(a) // 2 :]
    s1 = CountSketch(width=1 << 14, depth=5)
    s2 = CountSketch(width=1 << 14, depth=5)
    s1.update(half1)
    s2.update(half2)
    assert s1.merge(s2).f2() == est


def test_bbit_minhash_tracks_jaccard():
    """b-bit compression keeps the Jaccard estimate within the widened
    variance bound: sd ~ sqrt(j(1-j)/k) / (1-2^-b)."""
    a = np.arange(0, 3000)
    b = np.arange(1000, 4000)  # true J = 2000/4000 = 0.5
    sa, sb = MinHashSketch(256), MinHashSketch(256)
    sa.update(a)
    sb.update(b)
    true = 0.5
    for bits in (4, 8, 16):
        est = sa.bbit_jaccard(sb, b=bits)
        sd = (true * (1 - true) / 256) ** 0.5 / (1 - 2**-bits)
        assert abs(est - true) < 5 * sd, (bits, est)
    # full-width agreement: 64-bit mask degenerates to the plain estimator
    assert abs(sa.bbit_jaccard(sb, b=64) - sa.jaccard(sb)) < 1e-12
    # identical sets -> exactly 1.0 at any width
    assert sa.bbit_jaccard(sa, b=8) == 1.0


def test_weighted_minhash_estimates_weighted_jaccard():
    """Matching-minima fraction tracks sum(min)/sum(max) of the weight
    vectors within the binomial bound sd = sqrt(J(1-J)/k)."""
    from pprl_ray.sketches import WeightedMinHashSketch

    rng = np.random.default_rng(7)
    items = np.arange(2000)
    wa = rng.integers(0, 6, len(items))
    wb = rng.integers(0, 6, len(items))
    true = np.minimum(wa, wb).sum() / np.maximum(wa, wb).sum()
    k = 512
    sa, sb = WeightedMinHashSketch(k), WeightedMinHashSketch(k)
    sa.update(items[wa > 0], wa[wa > 0])
    sb.update(items[wb > 0], wb[wb > 0])
    est = sa.jaccard(sb)
    sd = (true * (1 - true) / k) ** 0.5
    assert abs(est - true) < 5 * sd, (est, true)


def test_weighted_minhash_merge_value_partitioned():
    """Merging partials over disjoint item ranges (the value-partitioned
    topology) is bit-identical to one update with the full table."""
    from pprl_ray.sketches import WeightedMinHashSketch

    items = np.arange(500)
    w = (items % 4) + 1
    whole = WeightedMinHashSketch(64)
    whole.update(items, w)
    parts = [WeightedMinHashSketch(64) for _ in range(4)]
    for p, lo in zip(parts, range(0, 500, 125)):
        sl = slice(lo, lo + 125)
        p.update(items[sl], w[sl])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert (merged.mins == whole.mins).all()
    # round-trip
    back = WeightedMinHashSketch.from_bytes(merged.to_bytes())
    assert (back.mins == merged.mins).all() and back.k == 64


def test_weighted_minhash_weight_semantics():
    """Weight w covers slots (v,1..w): identical vectors -> J == 1.0 at any
    k; doubling every weight keeps containment (slots are prefixes), and
    unit weights degenerate to plain set semantics."""
    from pprl_ray.sketches import WeightedMinHashSketch

    items = np.arange(300)
    a, b = WeightedMinHashSketch(128), WeightedMinHashSketch(128)
    a.update(items, np.full(len(items), 3))
    b.update(items, np.full(len(items), 3))
    assert a.jaccard(b) == 1.0
    # w=1 vs w=2 everywhere: true weighted J = sum(1)/sum(2) = 0.5
    c, d = WeightedMinHashSketch(512), WeightedMinHashSketch(512)
    c.update(items, np.ones(len(items), dtype=np.int64))
    d.update(items, np.full(len(items), 2))
    est = c.jaccard(d)
    assert abs(est - 0.5) < 5 * (0.25 / 512) ** 0.5
    import pytest

    with pytest.raises(ValueError):
        c.update(items[:2], np.array([1, 0]))


def test_srp_cosine_tracks_cosine():
    """cos(pi*(1-match_frac)) tracks true cosine of the weight vectors;
    match_frac concentrates around 1 - theta/pi (binomial sd)."""
    from pprl_ray.sketches import SrpCosineSketch

    rng = np.random.default_rng(11)
    items = np.arange(4000)
    wa = rng.integers(1, 10, len(items))
    wb = (wa + rng.integers(0, 8, len(items))).astype(np.int64)
    cos_true = float(wa @ wb / (np.linalg.norm(wa) * np.linalg.norm(wb)))
    bits = 1024
    sa, sb = SrpCosineSketch(bits), SrpCosineSketch(bits)
    sa.update(items, wa)
    sb.update(items, wb)
    f_true = 1 - np.arccos(cos_true) / np.pi
    sd = (f_true * (1 - f_true) / bits) ** 0.5
    assert abs(sa.match_frac(sb) - f_true) < 5 * sd
    assert abs(sa.cosine(sb) - cos_true) < 0.1
    # orthogonal-ish: disjoint supports -> cosine ~ 0, match ~ 0.5
    sc, sd2 = SrpCosineSketch(bits), SrpCosineSketch(bits)
    sc.update(np.arange(0, 2000))
    sd2.update(np.arange(10000, 12000))
    assert abs(sc.match_frac(sd2) - 0.5) < 5 * (0.25 / bits) ** 0.5


def test_srp_cosine_additive_merge():
    """Merging partials with OVERLAPPING items sums weights exactly — the
    contract WeightedMinHashSketch lacks; update order and batch split are
    irrelevant; serialization round-trips."""
    from pprl_ray.sketches import SrpCosineSketch

    items = np.arange(1000)
    whole = SrpCosineSketch(128)
    whole.update(items, np.full(1000, 3))
    parts = []
    for _ in range(3):  # 3 partials x weight 1 over the SAME items
        p = SrpCosineSketch(128)
        p.update(items)
        parts.append(p)
    merged = parts[0].merge(parts[1]).merge(parts[2])
    assert (merged.acc == whole.acc).all()
    back = SrpCosineSketch.from_bytes(merged.to_bytes())
    assert (back.acc == merged.acc).all() and back.bits == 128
    assert merged.match_frac(whole) == 1.0


class TestSpaceSavingSketch:
    """SpaceSaving: overestimate sandwich + guaranteed-superset + floor
    semantics + PODS-2012 merge, the MG complement."""

    def test_sandwich_bound_and_hitter_guarantee(self):
        import collections

        from pprl_ray.sketches import SpaceSavingSketch

        rng = np.random.default_rng(5)
        vals = rng.zipf(1.3, 50_000).astype(np.int64) % 5000
        sk = SpaceSavingSketch(k=128)
        for chunk in np.array_split(vals, 7):
            sk.update(chunk)
        exact = collections.Counter(vals.tolist())
        bound = sk.error_bound
        for v, (cnt, err) in sk.counters.items():
            assert exact[v] <= cnt            # never undercounts
            assert cnt - err <= exact[v]      # recorded error is honest
            assert err <= bound + 1e-9        # e(x) <= N/k
        # estimate() upper-bounds EVERY item, tracked or not
        for v, c in exact.items():
            assert sk.estimate(v) >= c
            if c > bound:
                assert v in sk.counters, (v, c, bound)

    def test_merge_preserves_bounds_any_order(self):
        import collections

        from pprl_ray.sketches import SpaceSavingSketch

        rng = np.random.default_rng(6)
        vals = rng.zipf(1.2, 30_000).astype(np.int64) % 2000
        parts = np.array_split(vals, 6)
        exact = collections.Counter(vals.tolist())
        for order in ([0, 1, 2, 3, 4, 5], [5, 3, 1, 0, 4, 2]):
            acc = None
            for i in order:
                sk = SpaceSavingSketch(k=64)
                sk.update(parts[i])
                acc = sk if acc is None else acc.merge(sk)
            assert acc.total == len(vals)
            for v, (cnt, err) in acc.counters.items():
                assert exact[v] <= cnt and cnt - err <= exact[v]
            for v, c in exact.items():
                assert acc.estimate(v) >= c

    def test_exact_regime_bit_invariant_merge(self):
        """<= k distinct keys anywhere: counts exact, errors zero, any
        merge tree yields the identical canonical serialisation."""
        from pprl_ray.sketches import SpaceSavingSketch

        rng = np.random.default_rng(7)
        vals = (rng.integers(0, 40, 10_000)).astype(np.int64)
        parts = np.array_split(vals, 5)

        def build(order):
            acc = None
            for i in order:
                sk = SpaceSavingSketch(k=64)
                sk.update(parts[i])
                acc = sk if acc is None else acc.merge(sk)
            return acc

        a = build([0, 1, 2, 3, 4])
        b = build([4, 2, 0, 3, 1])
        assert a.to_bytes() == b.to_bytes()
        import collections

        exact = collections.Counter(vals.tolist())
        assert {v: c for v, (c, e) in a.counters.items()} == dict(exact)
        assert all(e == 0 for _, e in a.counters.values())
        assert a.floor == 0

    def test_serialization_roundtrip(self):
        from pprl_ray.sketches import SpaceSavingSketch

        sk = SpaceSavingSketch(k=4)
        sk.update(np.array([1, 1, 2, 3, 3, 3, 4, 5, 6], dtype=np.int64))
        rt = SpaceSavingSketch.from_bytes(sk.to_bytes())
        assert rt.counters == sk.counters
        assert (rt.total, rt.floor, rt.k) == (sk.total, sk.floor, sk.k)


class TestTupleSketch:
    """Tuple sketch (theta + additive summaries): exact mode, HT estimate
    within bound, exact merge topology-invariance, serialisation."""

    def test_exact_mode_sums_per_distinct_key(self):
        import collections

        from pprl_ray.sketches import TupleSketch

        rng = np.random.default_rng(8)
        keys = rng.integers(0, 30, 500).astype(np.int64)
        pays = rng.integers(1, 9, 500).astype(np.int64)
        sk = TupleSketch(k=64)
        for ch in range(5):
            sk.update(keys[ch * 100:(ch + 1) * 100], pays[ch * 100:(ch + 1) * 100])
        assert sk.is_exact()
        truth = collections.defaultdict(int)
        for k_, p in zip(keys.tolist(), pays.tolist()):
            truth[k_] += p
        assert sk.distinct_estimate_u() == len(truth)
        assert sk.sum_estimate_u() == sum(truth.values())
        # filtered sum is exact in exact mode
        want = sum(v for v in truth.values() if v >= 50)
        assert sk.filtered_sum_u(50) == want

    def test_estimation_mode_within_bound(self):
        from pprl_ray.sketches import TupleSketch

        rng = np.random.default_rng(9)
        n_keys = 20_000
        keys = np.arange(n_keys, dtype=np.int64).repeat(3)
        pays = rng.integers(1, 11, len(keys)).astype(np.int64)
        sk = TupleSketch(k=1024)
        sk.update(keys, pays)
        assert not sk.is_exact()
        true_total = int(pays.sum())
        rel = abs(sk.sum_estimate_u() - true_total) / true_total
        assert rel < 4 * sk.relative_error_bound(), rel
        reld = abs(sk.distinct_estimate_u() - n_keys) / n_keys
        assert reld < 4 * sk.relative_error_bound(), reld

    def test_merge_bit_invariant_any_topology(self):
        from pprl_ray.sketches import TupleSketch

        rng = np.random.default_rng(10)
        keys = rng.integers(0, 5000, 30_000).astype(np.int64)
        pays = rng.integers(1, 7, len(keys)).astype(np.int64)
        chunks = np.array_split(np.arange(len(keys)), 6)

        def build(order, tree=False):
            sks = []
            for i in order:
                sk = TupleSketch(k=256)
                sk.update(keys[chunks[i]], pays[chunks[i]])
                sks.append(sk)
            if tree:  # pairwise tree merge
                while len(sks) > 1:
                    sks = [a.merge(b) for a, b in zip(sks[::2], sks[1::2])] + (
                        [sks[-1]] if len(sks) % 2 else []
                    )
                return sks[0]
            acc = sks[0]
            for s in sks[1:]:
                acc.merge(s)
            return acc

        a = build([0, 1, 2, 3, 4, 5])
        b = build([5, 3, 1, 0, 4, 2])
        c = build([2, 4, 0, 1, 5, 3], tree=True)
        assert a.to_bytes() == b.to_bytes() == c.to_bytes()

    def test_serialization_roundtrip(self):
        from pprl_ray.sketches import TupleSketch

        sk = TupleSketch(k=16)
        sk.update(np.arange(100, dtype=np.int64), np.ones(100, dtype=np.int64))
        rt = TupleSketch.from_bytes(sk.to_bytes())
        assert rt.to_bytes() == sk.to_bytes()
        assert rt.sum_estimate_u() == sk.sum_estimate_u()


class TestREQSketch:
    """Relative-error quantiles (PODS 2021, HRA): exact mode, empirical
    relative-tail-error envelope, merge envelope, determinism."""

    def test_exact_mode_below_capacity(self):
        from pprl_ray.sketches import REQSketch

        rng = np.random.default_rng(11)
        data = rng.normal(0, 1, 150)  # < 2*3*32 level-0 capacity
        sk = REQSketch(k=32)
        sk.update(data)
        assert sk.is_exact()
        sv = np.sort(data)
        for q in (0.1, 0.5, 0.9, 0.99):
            # ceil-rank order statistic, the engine/oracle selection rule
            j = int(np.searchsorted(np.arange(1, 151), q * 150, "left"))
            assert sk.quantile(q) == sv[min(j, 149)]
        x = float(np.median(data))
        assert sk.rank(x) == (data <= x).sum() / 150

    def test_relative_tail_error_envelope(self):
        from pprl_ray.sketches import REQSketch

        rng = np.random.default_rng(12)
        data = rng.zipf(1.5, 200_000).astype(float)
        sk = REQSketch(k=32)
        for ch in np.array_split(data, 37):
            sk.update(ch)
        sv = np.sort(data)
        n = len(data)
        for q, cap in ((0.5, 0.10), (0.9, 0.05), (0.99, 0.05), (0.999, 0.02)):
            x = sv[int(q * n) - 1]
            r = (data <= x).sum() / n
            err = abs(sk.rank(x) - r) / max(1 - r, 1e-12)
            assert err <= cap, (q, err)  # HRA: error relative to tail mass

    def test_merge_envelope_any_order(self):
        from pprl_ray.sketches import REQSketch

        rng = np.random.default_rng(13)
        data = rng.zipf(1.3, 120_000).astype(float)
        parts = np.array_split(data, 8)
        sv = np.sort(data)
        n = len(data)

        def build(order):
            acc = None
            for i in order:
                s = REQSketch(k=32)
                s.update(parts[i])
                acc = s if acc is None else acc.merge(s)
            return acc

        for order in ([0, 1, 2, 3, 4, 5, 6, 7], [7, 5, 3, 1, 0, 2, 4, 6]):
            m = build(order)
            assert m.n == n
            for q, cap in ((0.9, 0.08), (0.99, 0.08), (0.999, 0.05)):
                x = sv[int(q * n) - 1]
                r = (data <= x).sum() / n
                err = abs(m.rank(x) - r) / max(1 - r, 1e-12)
                assert err <= cap, (order, q, err)

    def test_deterministic_and_roundtrip(self):
        from pprl_ray.sketches import REQSketch

        rng = np.random.default_rng(14)
        data = rng.normal(0, 1, 5000)

        def build():
            sk = REQSketch(k=16, seed=5)
            for ch in np.array_split(data, 9):
                sk.update(ch)
            return sk

        a, b = build(), build()
        assert a.to_bytes() == b.to_bytes()  # seeded coin: bit-reproducible
        rt = REQSketch.from_bytes(a.to_bytes())
        assert rt.to_bytes() == a.to_bytes()
        assert rt.quantile(0.97) == a.quantile(0.97)


def test_tuple_intersect_estimates():
    """Coordinated intersection readouts: exact when both exact; within
    the error bound in estimation mode; zero for disjoint key sets."""
    import collections

    from pprl_ray.sketches import TupleSketch

    rng = np.random.default_rng(15)
    # exact mode
    a, b = TupleSketch(k=64), TupleSketch(k=64)
    ka = np.array([1, 2, 3, 4, 5, 2, 3], np.int64)
    pa_ = np.array([10, 20, 30, 40, 50, 2, 3], np.int64)
    kb = np.array([3, 4, 5, 6], np.int64)
    a.update(ka, pa_)
    b.update(kb, np.ones(4, np.int64))
    nd, ns = a.intersect_estimates_u(b)
    truth = collections.defaultdict(int)
    for k_, p in zip(ka.tolist(), pa_.tolist()):
        truth[k_] += p
    assert nd == 3  # keys 3,4,5 shared
    assert ns == truth[3] + truth[4] + truth[5]
    # disjoint
    c = TupleSketch(k=64)
    c.update(np.array([100, 200], np.int64), np.ones(2, np.int64))
    assert a.intersect_estimates_u(c) == (0, 0)
    # estimation mode: overlapping ranges, payload 1..5
    x, y = TupleSketch(k=1024), TupleSketch(k=1024)
    kx = np.arange(0, 30_000, dtype=np.int64)
    ky = np.arange(15_000, 45_000, dtype=np.int64)
    px = (kx % 5 + 1).astype(np.int64)
    x.update(kx, px)
    y.update(ky, np.ones_like(ky))
    nd, ns = x.intersect_estimates_u(y)
    true_nd = 15_000
    true_ns = int(px[15_000:].sum())
    assert abs(nd - true_nd) / true_nd < 4 * x.relative_error_bound()
    assert abs(ns - true_ns) / true_ns < 4 * x.relative_error_bound()
