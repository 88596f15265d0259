"""Ray-level sketch aggregation: kernel-in-map_batches equals
kernel-in-process, salted merge equivalence, corpus determinism and the
per-row token-array-equality invariant (BASELINE.json input_hint)."""

import numpy as np
import pytest

from pprl_ray.sketches import CMSSketch, HLLSketch, KLLSketch
from pprl_ray.sources.corpus import derive_corpus, synth_batch, synth_corpus
from pprl_ray.state.aggregate import finalize_sketches, sketch_by_key

pytestmark = pytest.mark.usefixtures("ray_session")


def _exact_corpus(n=2000, seed=42):
    import pyarrow as pa

    batch = synth_batch(pa.table({"id": pa.array(np.arange(n), pa.int64())}), seed=seed)
    return batch


def test_hll_by_source_matches_exact():
    n = 2000
    table = _exact_corpus(n)
    ds = synth_corpus(n, override_num_blocks=8)
    merged = sketch_by_key(ds, lambda: HLLSketch(14), "tokens", "source", batch_size=256)
    sketches = finalize_sketches(merged, HLLSketch)

    # exact distinct per source from the same deterministic table
    sources = np.array(table["source"].to_pylist())
    flat_rows = np.repeat(np.arange(n), table["n_tok"].to_numpy())
    tokens = table["tokens"].combine_chunks().values.to_numpy(zero_copy_only=False)
    for src in np.unique(sources):
        exact = len(np.unique(tokens[sources[flat_rows] == src]))
        est = sketches[src].estimate()
        assert abs(est - exact) / exact < 3 * sketches[src].relative_error_bound(), src


def test_salted_merge_equals_flat_merge():
    n = 1000
    ds = synth_corpus(n, override_num_blocks=8)
    flat = finalize_sketches(
        sketch_by_key(ds, lambda: HLLSketch(12), "tokens", "source", salt=0, batch_size=128),
        HLLSketch,
    )
    ds2 = synth_corpus(n, override_num_blocks=8)
    salted = finalize_sketches(
        sketch_by_key(ds2, lambda: HLLSketch(12), "tokens", "source", salt=4, batch_size=128),
        HLLSketch,
    )
    assert set(flat) == set(salted)
    for k in flat:
        assert flat[k].to_bytes() == salted[k].to_bytes(), k


def test_global_sketch_and_scalar_column():
    n = 1500
    ds = synth_corpus(n, override_num_blocks=4)
    merged = sketch_by_key(ds, lambda: KLLSketch(200), "n_tok", None, batch_size=256)
    sk = finalize_sketches(merged, KLLSketch)[""]
    table = _exact_corpus(n)
    ntok = np.sort(table["n_tok"].to_numpy())
    for q in (0.25, 0.5, 0.9):
        est = sk.quantile(q)
        true_rank = np.searchsorted(ntok, est, side="right") / len(ntok)
        assert abs(true_rank - q) < 0.03, (q, est, true_rank)


def test_cms_in_ray_matches_in_process():
    n = 800
    table = _exact_corpus(n)
    ds = synth_corpus(n, override_num_blocks=4)
    merged = sketch_by_key(ds, lambda: CMSSketch(1 << 14, 5), "tokens", None, batch_size=100)
    ray_sk = finalize_sketches(merged, CMSSketch)[""]

    local = CMSSketch(1 << 14, 5)
    local.update(table["tokens"].combine_chunks().values.to_numpy(zero_copy_only=False))
    assert ray_sk.to_bytes() == local.to_bytes()  # counter-add merge is exact


def test_synth_corpus_deterministic_across_partitionings():
    a = synth_corpus(500, override_num_blocks=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = synth_corpus(500, override_num_blocks=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tok"].tolist() == b["n_tok"].tolist()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(x, y)


def test_derived_corpus_token_array_equality(sf_dir):
    """input_hint invariant: the tokens column read back through the engine
    equals a direct in-process derivation, element for element."""
    import polars as pl
    import pyarrow.parquet as pq

    from pprl_ray.sources.corpus import tokenize_words_batch

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    expected = tokenize_words_batch(docs)

    got = derive_corpus(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = expected.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()
    for x, y in zip(got["tokens"], exp["tokens"]):
        assert np.array_equal(x, y)
    assert (got["n_tok"] == got["tokens"].map(len)).all()


def test_profile_wall_time_unaffected_by_extreme_key_skew(ray_session):
    """Combiner-tree skew-proofness: 99% of rows on ONE hot source key must
    not slow the fused profile (no reducer concentrates per-key fan-in)."""
    import time

    import numpy as np
    import pyarrow as pa

    from pprl_ray.pipelines.profile import corpus_profile, default_specs, finalize_profile
    from pprl_ray.sources.corpus import synth_corpus

    def run(extreme: bool) -> float:
        c = synth_corpus(40_000, override_num_blocks=16)
        if extreme:
            def _skew(b: pa.Table) -> pa.Table:
                n = b.num_rows
                keep = np.random.default_rng(0).random(n) < 0.01
                src = np.where(
                    keep, np.asarray(b["source"].to_pylist(), dtype=object), "web"
                )
                return b.set_column(
                    b.column_names.index("source"), "source", pa.array(src, pa.string())
                )

            c = c.map_batches(_skew, batch_format="pyarrow")
        specs = default_specs(hll_p=10, bloom_bits=1 << 14)
        t0 = time.perf_counter()
        finalize_profile(corpus_profile(c, specs), specs)
        return time.perf_counter() - t0

    run(False)  # warm
    # best-of-3: the shared host's co-tenant bursts can starve one 32-way
    # run without warning (quiet single-core calibration != quiet host)
    balanced = min(run(False) for _ in range(3))
    skewed = min(run(True) for _ in range(3))
    assert skewed < 3.0 * balanced + 1.0, (balanced, skewed)


def test_theta_fused_profile_and_distributed_exactness():
    """Theta in the fused profile pass: the distributed merged sketch must be
    BIT-identical to a single-process sketch over the same corpus (theta's
    exact topology invariance, the strongest form of the UDAF contract), and
    its estimate within the published 1/sqrt(k-2) bound of the true distinct
    count."""
    import pyarrow as pa

    from pprl_ray.pipelines.profile import ProfileSpec, corpus_profile, finalize_profile
    from pprl_ray.sketches import ThetaSketch
    from pprl_ray.sources.corpus import synth_corpus

    n = 4000
    specs = [
        ProfileSpec("theta_tokens", "theta", lambda: ThetaSketch(512), "tokens", "source"),
        ProfileSpec("theta_global", "theta", lambda: ThetaSketch(512), "tokens", None),
    ]
    profile = finalize_profile(corpus_profile(synth_corpus(n, override_num_blocks=8), specs), specs)

    table = _exact_corpus(n)
    sources = np.array(table["source"].to_pylist())
    flat_rows = np.repeat(np.arange(n), table["n_tok"].to_numpy())
    tokens = table["tokens"].combine_chunks().values.to_numpy(zero_copy_only=False)

    glob = ThetaSketch(512)
    glob.update(tokens)
    assert profile[("theta_global", "")].to_bytes() == glob.to_bytes()
    exact_glob = len(np.unique(tokens))
    est = profile[("theta_global", "")].estimate()
    assert abs(est - exact_glob) / exact_glob < 4 * glob.relative_error_bound()

    for src in np.unique(sources):
        single = ThetaSketch(512)
        single.update(tokens[sources[flat_rows] == src])
        assert profile[("theta_tokens", src)].to_bytes() == single.to_bytes(), src


def test_merge_group_is_row_order_independent():
    """The final groupby delivers within-key rows in scheduling-dependent
    order; _merge_group must produce identical bytes for ANY row order
    (regression for a load-dependent t-digest pin flake)."""
    import zlib

    import pandas as pd

    from pprl_ray.sketches import KLLSketch, TDigestSketch
    from pprl_ray.state.aggregate import _merge_group

    rng = np.random.default_rng(2)
    for cls, kwargs in ((TDigestSketch, {}), (KLLSketch, {"k": 64})):
        blobs = []
        for i in range(7):
            sk = cls(**kwargs)
            sk.update(rng.lognormal(2, 1, 500))
            blobs.append(zlib.compress(sk.to_bytes(), 1))
        outs = set()
        for seed in range(5):
            order = np.random.default_rng(seed).permutation(len(blobs))
            df = pd.DataFrame(
                {"key": "k", "blob": [blobs[i] for i in order], "rows": 500}
            )
            outs.add(bytes(_merge_group(df, cls)["blob"].iloc[0]))
        assert len(outs) == 1, cls.__name__


def test_weighted_sketch_by_key_matches_preaggregated(ray_session):
    """The fused count+sketch exchange is bit-identical to aggregating
    counts first and sketching the count table (the two presentations of
    the same final weights), under any block split."""
    import ray.data as rd

    from pprl_ray.sketches import WeightedMinHashSketch
    from pprl_ray.state.aggregate import (
        finalize_sketches,
        weighted_sketch_by_key,
    )

    rng = np.random.default_rng(5)
    n = 4000
    rows = {
        "grp": rng.choice(["a", "b", "c"], n).tolist(),
        "item": rng.integers(0, 300, n).tolist(),
    }
    ds = rd.from_pandas(__import__("pandas").DataFrame(rows)).repartition(7)
    fused = finalize_sketches(
        weighted_sketch_by_key(
            ds, lambda: WeightedMinHashSketch(64), "item", "grp", partitions=5
        ),
        WeightedMinHashSketch,
    )
    # reference: exact pandas count table, one sketch per group
    import pandas as pd

    df = pd.DataFrame(rows)
    counts = df.groupby(["grp", "item"]).size().reset_index(name="n")
    for g, sub in counts.groupby("grp"):
        ref = WeightedMinHashSketch(64)
        ref.update(sub["item"].to_numpy(), sub["n"].to_numpy())
        assert (fused[g].mins == ref.mins).all(), g
