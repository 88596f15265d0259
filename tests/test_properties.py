"""Hypothesis property tests for the core kernels and sketch merge laws
(SURVEY.md §5: merge order-invariance is the north_rule's named property)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pprl_ray.sketches import BloomSketch, CMSSketch, HLLSketch, KLLSketch

values_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=0, max_size=200),
    min_size=1,
    max_size=8,
)


def _merge_in_order(cls_factory, parts, order):
    acc = None
    for i in order:
        sk = cls_factory()
        sk.update(np.asarray(parts[i], dtype=np.int64))
        acc = sk if acc is None else acc.merge(sk)
    return acc


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_hll_merge_order_invariant_bitexact(parts, rnd):
    order = list(range(len(parts)))
    rnd.shuffle(order)
    a = _merge_in_order(lambda: HLLSketch(10), parts, range(len(parts)))
    b = _merge_in_order(lambda: HLLSketch(10), parts, order)
    assert a.to_bytes() == b.to_bytes()


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_cms_merge_order_invariant_bitexact(parts, rnd):
    order = list(range(len(parts)))
    rnd.shuffle(order)
    a = _merge_in_order(lambda: CMSSketch(1 << 10, 3), parts, range(len(parts)))
    b = _merge_in_order(lambda: CMSSketch(1 << 10, 3), parts, order)
    assert a.to_bytes() == b.to_bytes()


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_bloom_merge_order_invariant_and_idempotent(parts, rnd):
    order = list(range(len(parts)))
    rnd.shuffle(order)
    a = _merge_in_order(lambda: BloomSketch(1 << 12, 3), parts, range(len(parts)))
    b = _merge_in_order(lambda: BloomSketch(1 << 12, 3), parts, order + order)  # idempotent
    assert a.to_bytes() == b.to_bytes()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=20, max_size=500),
    st.randoms(use_true_random=False),
)
def test_kll_merge_rank_error_within_bound(values, rnd):
    """Any partitioning/merge order keeps the median's rank error small."""
    values = np.asarray(values, dtype=np.int64)
    n_parts = rnd.randint(1, 5)
    idx = np.arange(len(values))
    rnd.shuffle(list(idx))
    parts = np.array_split(values, n_parts)
    order = list(range(n_parts))
    rnd.shuffle(order)
    acc = None
    for i in order:
        sk = KLLSketch(200)
        sk.update(parts[i])
        acc = sk if acc is None else acc.merge(sk)
    est = acc.quantile(0.5)
    s = np.sort(values)
    # with ties the estimate's rank is an interval; error is distance to it
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    err = 0.0 if lo <= 0.5 <= hi else min(abs(lo - 0.5), abs(hi - 0.5))
    assert err <= 0.1


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=40), st.integers(min_value=2, max_value=4))
def test_tokenize_set_properties(value, q):
    """Reference tokenize (common.py:9-28): padded q-grams, deduplicated,
    every token has length q, and the set is order-deterministic."""
    from pprl_ray.functions.qgram import tokenize

    toks = tokenize(value, q, "_")
    assert toks == tokenize(value, q, "_")
    assert all(len(t) == q for t in toks)
    pad = "_" * (q - 1)
    padded = pad + value + pad
    assert len(toks) <= max(len(padded) - q + 1, 0) + 1


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_bitvec_base64_roundtrip(data):
    import base64

    assert base64.b64decode(base64.b64encode(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=5, max_size=60,
             unique=True),
    st.lists(st.floats(min_value=0.1, max_value=1e6, allow_nan=False),
             min_size=5, max_size=60),
    st.floats(min_value=0.01, max_value=100.0),
)
def test_es_sample_keys_invariant_under_weight_scaling(ids, weights, c):
    """Efraimidis-Spirakis keys ln(u)/w: multiplying every weight by a
    constant rescales all keys by 1/c, so the top-k ORDER (hence the
    selected sample) is invariant — the property that makes weighted
    sampling well-defined up to weight normalization."""
    from pprl_ray.stages.sample import _es_keys

    n = min(len(ids), len(weights))
    ids_a = np.asarray(ids[:n], dtype=np.int64)
    w = np.asarray(weights[:n], dtype=np.float64)
    k1 = _es_keys(ids_a, w)
    k2 = _es_keys(ids_a, w * c)
    assert (np.argsort(k1, kind="stable") == np.argsort(k2, kind="stable")).all()


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_theta_merge_order_invariant_bitexact(parts, rnd):
    from pprl_ray.sketches import ThetaSketch

    order = list(range(len(parts)))
    rnd.shuffle(order)
    a = _merge_in_order(lambda: ThetaSketch(64), parts, list(range(len(parts))))
    b = _merge_in_order(lambda: ThetaSketch(64), parts, order)
    assert a.to_bytes() == b.to_bytes()


words_texts = st.lists(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        min_size=0, max_size=14,
    ).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=10,
)


@settings(max_examples=40, deadline=None)
@given(words_texts, st.integers(min_value=1, max_value=5))
def test_word_window_hashes_match_bruteforce(texts, L):
    import pyarrow as pa

    from pprl_ray.functions.digest import md5_prefix64
    from pprl_ray.stages.dedup import word_window_hashes

    batch = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = word_window_hashes(batch, "text", "doc_id", L, 7)
    got = list(zip(out["id"].to_pylist(), out["pos"].to_pylist(),
                   out["h"].to_pylist()))

    want = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for p in range(len(w) - L + 1):
            s = " ".join(w[p : p + L])
            want.append((i, p, int(md5_prefix64([s])[0])))
    assert sorted(got) == sorted(want)
    # part column is h % nparts everywhere
    assert all(
        pt == hh % 7
        for pt, hh in zip(out["part"].to_pylist(), out["h"].to_pylist())
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=120),
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=120),
)
def test_tv_distance_identity_symmetry_range(xs, ys):
    # the exact-rational TV arithmetic used by source_tv_distance
    from collections import Counter
    from fractions import Fraction

    def tv(a, b):
        ca, cb = Counter(a), Counter(b)
        na, nb = len(a), len(b)
        num = sum(abs(ca[t] * nb - cb[t] * na) for t in set(ca) | set(cb))
        return Fraction(num, 2 * na * nb)

    assert tv(xs, xs) == 0
    d = tv(xs, ys)
    assert d == tv(ys, xs)
    assert 0 <= d <= 1
    # fixed-point floor used by the operator is within 1 ulp of the rational
    scale = 10**9
    fp = scale * sum(
        abs(Counter(xs)[t] * len(ys) - Counter(ys)[t] * len(xs))
        for t in set(xs) | set(ys)
    ) // (2 * len(xs) * len(ys))
    assert 0 <= d * scale - fp < 1


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_tuple_merge_order_invariant_bitexact(parts, rnd):
    """Tuple sketch: theta canonical form + additive summaries ⇒ exact
    topology invariance, bit-for-bit (payload = value % 7 + 1, so sums
    are non-trivial and key-aligned across orders)."""
    from pprl_ray.sketches import TupleSketch

    def build(order):
        acc = None
        for i in order:
            sk = TupleSketch(k=32)
            v = np.asarray(parts[i], dtype=np.int64)
            sk.update(v, v % 7 + 1)
            acc = sk if acc is None else acc.merge(sk)
        return acc

    order = list(range(len(parts)))
    rnd.shuffle(order)
    assert build(range(len(parts))).to_bytes() == build(order).to_bytes()


@settings(max_examples=40, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_spacesaving_merge_bounds_any_order(parts, rnd):
    """SpaceSaving under arbitrary merge orders: every tracked count
    upper-bounds the true count, count − err lower-bounds it, and
    estimate() upper-bounds EVERY key (the PODS-2012 merge invariants)."""
    import collections

    from pprl_ray.sketches import SpaceSavingSketch

    def build(order):
        acc = None
        for i in order:
            sk = SpaceSavingSketch(k=16)
            sk.update(np.asarray(parts[i], dtype=np.int64))
            acc = sk if acc is None else acc.merge(sk)
        return acc

    order = list(range(len(parts)))
    rnd.shuffle(order)
    exact = collections.Counter(v for p in parts for v in p)
    for acc in (build(range(len(parts))), build(order)):
        assert acc.total == sum(exact.values())
        for v, (cnt, err) in acc.counters.items():
            assert exact[v] <= cnt
            assert cnt - err <= exact[v]
        for v, c in exact.items():
            assert acc.estimate(v) >= c


@settings(max_examples=25, deadline=None)
@given(values_arrays, st.randoms(use_true_random=False))
def test_req_merge_preserves_weight_mass(parts, rnd):
    """REQ under arbitrary merge orders: n is exact, total retained
    weight mass equals n (compaction promotes half the items at double
    weight — mass is conserved), and min/max ranks stay sane."""
    from pprl_ray.sketches import REQSketch

    def build(order):
        acc = None
        for i in order:
            sk = REQSketch(k=8)
            sk.update(np.asarray(parts[i], dtype=np.float64))
            acc = sk if acc is None else acc.merge(sk)
        return acc

    order = list(range(len(parts)))
    rnd.shuffle(order)
    n = sum(len(p) for p in parts)
    for acc in (build(range(len(parts))), build(order)):
        assert acc.n == n
        v, w = acc._weighted_items()
        if n:
            assert float(w.sum()) == float(n)  # exact: weights are 2^lvl ints
            top = max(v for p in parts for v in p)
            assert acc.rank(top) == 1.0  # the maximum is never discarded
