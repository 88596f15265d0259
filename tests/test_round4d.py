"""Round-4d additions: KMV sketch queries, DSIR importance resampling."""

import numpy as np
import pyarrow as pa
import pytest


# --- DSIR feature extraction --------------------------------------------------


def test_feature_buckets_unigram_bigram_no_doc_crossing():
    from pprl_ray.functions.digest import md5_bucket32
    from pprl_ray.stages.dsir import _feature_buckets

    texts = pa.array(["a b c", "d", "e f"])
    occ_uni, uni_doc, occ_bi, bi_doc, n_feat = _feature_buckets(texts, 512)
    # unigrams: a b c | d | e f
    assert list(uni_doc) == [0, 0, 0, 1, 2, 2]
    exp_uni = md5_bucket32(["a", "b", "c", "d", "e", "f"], 512)
    assert list(occ_uni) == list(exp_uni)
    # bigrams: "a b","b c" (doc0), none (doc1), "e f" (doc2) — never "c d"/"d e"
    assert list(bi_doc) == [0, 0, 2]
    exp_bi = md5_bucket32(["a b", "b c", "e f"], 512)
    assert list(occ_bi) == list(exp_bi)
    assert list(n_feat) == [5, 1, 3]  # words + bigrams per doc


def test_dsir_log_ratios_shape_and_sign():
    from pprl_ray.stages.dsir import dsir_log_ratios

    cp = np.array([100, 0, 10], dtype=np.int64)
    cq = np.array([100, 100, 1000], dtype=np.int64)
    lr = dsir_log_ratios(cp, cq)
    assert lr.dtype == np.int64
    # bucket 0: over-represented in target vs raw -> positive
    assert lr[0] > 0
    # bucket 1: absent from target, common in raw -> negative
    assert lr[1] < 0
    # exact definition
    B = 3
    tp, tq = float(cp.sum() + B), float(cq.sum() + B)
    exp0 = np.floor(
        (np.log(101.0) - np.log(tp) - np.log(101.0) + np.log(tq)) * (1 << 20)
    )
    assert lr[0] == int(exp0)


def test_dsir_pin_matches_live_fit(ray_session, sf001_dir):
    """Close the pin loop: the golden lr_fx table (derived via DuckDB by
    scripts/gen_dsir_pins.py) must equal the live Ray fit + quantise."""
    from pprl_ray.golden.dsir_pins import BUCKETS, PIN_DSIR_LR, TARGET_SOURCE
    from pprl_ray.stages.dsir import dsir_fit, dsir_log_ratios

    import ray.data as rd

    docs = rd.read_parquet(f"{sf001_dir}/documents.parquet", columns=["text", "source"])
    fit = dsir_fit(docs, BUCKETS, key_col="source")
    cp = fit.get(TARGET_SOURCE, np.zeros(BUCKETS, dtype=np.int64))
    cq = np.sum(list(fit.values()), axis=0).astype(np.int64)
    lr = dsir_log_ratios(cp, cq)
    assert [(b, int(v)) for b, v in enumerate(lr)] == PIN_DSIR_LR


def test_dsir_select_rank_partitioning_invariant(ray_session):
    """Top-k by (score_fx desc, doc_id asc) must not depend on block
    structure."""
    import ray.data as rd

    from pprl_ray.stages.dsir import DsirScoreStage, dsir_select

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(
                [" ".join(rng.choice(words, rng.integers(3, 12))) for _ in range(300)]
            ),
        }
    )
    lr = rng.integers(-(1 << 20), 1 << 20, 512).astype(np.int64)
    outs = []
    for blocks in (2, 11):
        ds = rd.from_arrow(docs).repartition(blocks)
        scored = ds.map_batches(DsirScoreStage(lr), batch_format="pyarrow")
        outs.append(dsir_select(scored, k=25, mode="rank"))
    assert outs[0].equals(outs[1])


def test_dsir_select_gumbel_deterministic_and_weight_biased(ray_session):
    """Gumbel-top-k resampling: deterministic given a seed, different seeds
    differ, and heavily-up-weighted docs are (near-)always selected."""
    import ray.data as rd

    from pprl_ray.stages.dsir import dsir_select

    n = 400
    scored = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_feat": pa.array(np.full(n, 5, dtype=np.int64)),
            # docs 0-9 get a huge log-weight edge (~+40 nats over the rest)
            "score_fx": pa.array(
                np.where(np.arange(n) < 10, 40 << 20, 0).astype(np.int64)
            ),
        }
    )
    scored = scored.append_column(
        "logw", pa.array(scored["score_fx"].to_numpy() / (1 << 20), pa.float64())
    )
    ds = rd.from_arrow(scored).repartition(4)
    a = dsir_select(ds, k=50, mode="gumbel", seed=7)
    b = dsir_select(rd.from_arrow(scored).repartition(9), k=50, mode="gumbel", seed=7)
    assert a.equals(b)  # deterministic + partitioning-invariant
    c = dsir_select(ds, k=50, mode="gumbel", seed=8)
    assert not a["doc_id"].tolist() == c["doc_id"].tolist()
    # the 10 heavy docs (+40 nats) must all be inside the 50 sampled
    assert set(range(10)) <= set(a["doc_id"].tolist())
    # and the light docs still get sampled (it's a sample, not a top-k)
    assert len(set(a["doc_id"].tolist()) - set(range(10))) == 40


# --- KMV ----------------------------------------------------------------------


def test_kmv_estimation_mode_at_query_shape(ray_session, sf001_dir):
    """kmv_distinct_custkeys runs in ESTIMATION mode (k=64 << distinct
    custkeys per priority) — assert the mode really engages at sf0.001."""
    import duckdb

    from pprl_ray.sketches import KMVSketch

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderpriority, list(DISTINCT o_custkey) FROM "
        f"read_parquet('{sf001_dir}/orders.parquet') GROUP BY 1"
    ).fetchall()
    con.close()
    for prio, keys in rows:
        sk = KMVSketch(k=64)
        sk.update(np.asarray(keys, dtype=np.int64))
        if len(keys) >= 64:
            assert len(sk.hashes) == 64  # estimator path, not exact-count
            rel = abs(sk.estimate() - len(set(keys))) / len(set(keys))
            assert rel < 5.0 / (64 - 2) ** 0.5, (prio, rel)


# --- MomentsSketch -------------------------------------------------------------


class TestMomentsSketch:
    def test_exact_vs_numpy_and_merge_invariance(self):
        from pprl_ray.sketches import MomentsSketch

        rng = np.random.default_rng(2)
        vals = rng.integers(0, 64, 20_000).astype(np.int64)
        parts = np.array_split(vals, 7)
        import random as _r

        blobs = []
        for seed in range(3):
            order = list(range(7))
            _r.Random(seed).shuffle(order)
            acc = MomentsSketch()
            for p in order:
                sk = MomentsSketch()
                sk.update(parts[p])
                acc.merge(sk)
            blobs.append(acc.to_bytes())
        assert blobs[0] == blobs[1] == blobs[2]
        acc = MomentsSketch.from_bytes(blobs[0])
        assert acc.n == len(vals)
        assert acc.mean() == pytest.approx(vals.mean(), rel=0, abs=0)
        assert acc.variance() == pytest.approx(np.var(vals), rel=1e-12)
        x = vals - vals.mean()
        assert acc.skewness() == pytest.approx(
            (x**3).mean() / np.var(vals) ** 1.5, rel=1e-9
        )
        assert acc.kurtosis_excess() == pytest.approx(
            (x**4).mean() / np.var(vals) ** 2 - 3, rel=1e-9
        )

    def test_bigint_no_overflow_cliff(self):
        from pprl_ray.sketches import MomentsSketch

        sk = MomentsSketch()
        big = np.full(1000, 10**6, dtype=np.int64)  # x^4 = 1e24 >> int64
        sk.update(big)
        assert sk.s4 == 1000 * 10**24  # exact big-int, no wraparound
        back = MomentsSketch.from_bytes(sk.to_bytes())
        assert (back.n, back.s1, back.s2, back.s3, back.s4) == (
            sk.n, sk.s1, sk.s2, sk.s3, sk.s4,
        )

    def test_rejects_floats(self):
        from pprl_ray.sketches import MomentsSketch

        with pytest.raises(TypeError):
            MomentsSketch().update(np.array([1.5, 2.5]))

    def test_constant_column_degenerate(self):
        from pprl_ray.sketches import MomentsSketch

        sk = MomentsSketch()
        sk.update(np.full(100, 7, dtype=np.int64))
        assert sk.variance() == 0.0
        assert sk.skewness() == 0.0
        assert sk.kurtosis_excess() == -3.0


# --- collocation lift ----------------------------------------------------------


def test_collocation_lift_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from pprl_ray.stages.text import collocation_lift

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta"]
    # plant a strong collocation: "alpha beta" appears very often
    docs = []
    for _ in range(200):
        toks = list(rng.choice(words, rng.integers(3, 9)))
        if rng.random() < 0.7:
            toks[:2] = ["alpha", "beta"]
        docs.append(" ".join(toks))

    # brute force exact lift
    unis = [w for d in docs for w in d.split(" ")]
    bis = [(a, b) for d in docs
           for a, b in itertools.pairwise(d.split(" "))]
    from collections import Counter

    cu, cb = Counter(unis), Counter(bis)
    nw, nb = len(unis), len(bis)
    exact = sorted(
        (
            (-((c12 * nw * nw * (1 << 20)) // (nb * cu[w1] * cu[w2])), w1, w2)
            for (w1, w2), c12 in cb.items() if c12 >= 5
        ),
    )[:10]
    expect = [(w1, w2, -neg) for neg, w1, w2 in exact]

    for blocks in (2, 7):  # partitioning-invariant
        ds = rd.from_items([{"text": t} for t in docs]).repartition(blocks)
        got = collocation_lift(ds, min_count=5, k=10)
        assert list(zip(got["w1"], got["w2"], got["lift_fx"])) == expect
    # the open-vocabulary bucket-join path must return the identical list
    ds = rd.from_items([{"text": t} for t in docs]).repartition(3)
    got = collocation_lift(ds, min_count=5, k=10, broadcast_max_terms=0)
    assert list(zip(got["w1"], got["w2"], got["lift_fx"])) == expect


# --- corpus drift ---------------------------------------------------------------


def test_corpus_drift_report(ray_session):
    import ray.data as rd

    from pprl_ray.pipelines.drift import corpus_drift

    a = pa.table(
        {
            "doc_id": pa.array(np.arange(8, dtype=np.int64)),
            "text": pa.array(
                ["aa bb cc", "aa bb", "dd ee", "aa cc",
                 "xx yy zz", "xx yy", "xx zz", "yy zz"]
            ),
            "source": pa.array(["s1"] * 4 + ["s2"] * 4),
        }
    )
    # v2: s1 loses doc 3 and the word 'dd' is gone nowhere; s2 unchanged
    b = a.filter(pa.array([True, True, True, False, True, True, True, True]))
    df = corpus_drift(rd.from_arrow(a).repartition(3), rd.from_arrow(b).repartition(2))
    r1 = df[df["source"] == "s1"].iloc[0]
    assert (r1["n_docs_a"], r1["n_docs_b"]) == (4, 3)
    # s1 vocab: a={aa,bb,cc,dd,ee}, b={aa,bb,cc,dd,ee} minus doc3 ('aa cc')
    # -> still {aa,bb,cc,dd,ee}? doc3 = 'aa cc', both appear elsewhere -> J=1
    assert r1["vocab_inter"] == r1["vocab_union"] == 5
    assert r1["vocab_jaccard_fx"] == 1 << 20
    # mean length: a = (3+2+2+2)/4 = 2.25, b = (3+2+2)/3 = 2.3333 -> positive
    assert r1["mean_ntok_delta_fx"] == ((7 * 4 - 9 * 3) << 20) // 12
    r2 = df[df["source"] == "s2"].iloc[0]
    assert r2["mean_ntok_delta_fx"] == 0
    assert r2["vocab_jaccard_fx"] == 1 << 20


def test_signed_floordiv_matches_python_and_sql():
    import duckdb

    from pprl_ray.pipelines.drift import _signed_floordiv

    for num in (-7, -5, -1, 0, 1, 5, 7, -1048577, 1048577):
        got = _signed_floordiv(num, 3)
        sql = duckdb.sql(
            f"SELECT CASE WHEN {num} >= 0 THEN ({num}) // 3 "
            f"ELSE -((-({num})) // 3) END"
        ).fetchone()[0]
        assert got == sql, (num, got, sql)


# --- perceptual hash ------------------------------------------------------------


class TestPerceptualHash:
    def test_dct_matrix_orthonormal(self):
        from pprl_ray.stages.multimodal import _dct_matrix

        d = _dct_matrix(16)
        assert np.allclose(d @ d.T, np.eye(16), atol=1e-12)

    def test_near_far_separation_on_smooth_images(self):
        from pprl_ray.sketches import hamming64
        from pprl_ray.stages.multimodal import PerceptualHashStage, synth_smooth_image

        st = PerceptualHashStage(backend="bmp")
        near, hs = [], []
        for i in range(20):
            g = synth_smooth_image(i)
            g2 = np.clip(g.astype(np.int16) + np.where(
                (np.arange(256).reshape(16, 16) % 97) == 0, 3, 0
            ), 0, 255).astype(np.uint8)
            h1, h2 = st.phash64(g), st.phash64(g2)
            near.append(int(hamming64(
                np.array([h1], np.uint64), np.array([h2], np.uint64))[0]))
            hs.append(h1)
        far = [int(hamming64(np.array([hs[i]], np.uint64),
                             np.array([hs[i + 10]], np.uint64))[0])
               for i in range(10)]
        assert np.median(near) <= 8
        assert min(far) > max(np.percentile(near, 75), 8)

    def test_tiles_tiny_inputs_and_fake_backend(self):
        from pprl_ray.stages.multimodal import PerceptualHashStage

        st = PerceptualHashStage(backend="fake")
        g = np.arange(12, dtype=np.uint8).reshape(3, 4)  # smaller than 8x8
        h = st.phash64(g)
        assert 0 <= h < 1 << 64
        # deterministic
        assert st.phash64(g) == h

    def test_stage_batch_roundtrip(self):
        import pyarrow as pa_

        from pprl_ray.stages.multimodal import (
            PerceptualHashStage, encode_bmp, synth_smooth_image,
        )

        st = PerceptualHashStage(backend="bmp")
        payloads = [
            encode_bmp(np.repeat(synth_smooth_image(i)[:, :, None], 3, axis=2))
            for i in range(5)
        ]
        batch = pa_.table({
            "media_id": pa_.array([f"m{i}" for i in range(5)]),
            "payload": pa_.array(payloads, pa_.large_binary()),
        })
        out = st(batch)
        assert out.column_names == ["media_id", "simhash"]
        assert out.num_rows == 5
        assert len(set(out["simhash"].to_pylist())) == 5


# --- audio fingerprint ----------------------------------------------------------


class TestAudioFingerprint:
    def _clip(self, i, twin=False, n=8192):
        import hashlib

        from pprl_ray.stages.multimodal import encode_wav

        seed = hashlib.sha256(f"t-aud-{i}".encode()).digest()
        f0 = 200 + i * 53
        t = np.arange(n) / 8000.0
        noise = (np.frombuffer((seed * (n // len(seed) + 1))[:n], np.uint8)
                 .astype(np.float64) - 127.5)
        envf = 0.5 + (i % 10) * 0.7
        pcm = (1 + 0.5 * np.sin(2 * np.pi * envf * t)) * (
            6000 * np.sin(2 * np.pi * f0 * t)) + 8 * noise
        if twin:
            pcm = pcm * 1.02
        return encode_wav(np.clip(pcm, -32768, 32767).astype(np.int16))

    def test_words_stable_under_gain_volatile_across_clips(self):
        from pprl_ray.stages.multimodal import AudioFingerprintStage, decode_wav

        st = AudioFingerprintStage(backend="wav")
        for i in range(5):
            a = set(st.frame_words(decode_wav(self._clip(i))[0].astype(np.float64)).tolist())
            b = set(st.frame_words(decode_wav(self._clip(i, True))[0].astype(np.float64)).tolist())
            c = set(st.frame_words(decode_wav(self._clip(i + 5))[0].astype(np.float64)).tolist())
            j_near = len(a & b) / len(a | b)
            j_far = len(a & c) / len(a | c)
            assert j_near > 0.2, (i, j_near)
            assert j_far < j_near, (i, j_near, j_far)

    def test_stage_emits_simhash_and_words(self):
        from pprl_ray.stages.multimodal import AudioFingerprintStage

        st = AudioFingerprintStage(backend="wav")
        batch = pa.table({
            "media_id": pa.array(["x", "y"]),
            "payload": pa.array([self._clip(0), self._clip(1)], pa.large_binary()),
        })
        out = st(batch)
        assert out.column_names == ["media_id", "simhash", "n_frames", "words"]
        assert out["n_frames"].to_pylist() == [(8192 - 256) // 32 + 1 - 1] * 2


def test_array_jaccard_pairs_exact_and_partitioning_invariant(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import array_jaccard_pairs

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        base = rng.integers(0, 10_000, 30).tolist()
        rows.append({"media_id": f"b{i:03d}", "words": base})
        if i < 10:  # twins share 24/30 words -> J = 24/36 = 0.667
            twin = base[:24] + rng.integers(20_000, 30_000, 6).tolist()
            rows.append({"media_id": f"t{i:03d}", "words": twin})
    outs = []
    for blocks in (2, 9):
        ds = rd.from_items(rows).repartition(blocks)
        df = array_jaccard_pairs(ds, "words", k=64, bands=64, min_jaccard=0.5)
        outs.append(df.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = set(zip(outs[0]["id_a"], outs[0]["id_b"]))
    assert got == {(f"b{i:03d}", f"t{i:03d}") for i in range(10)}
    # exact jaccard values survive verification
    assert np.allclose(outs[0]["jaccard"], 24 / 36)


def test_video_fingerprint_trim_and_reorder_semantics():
    from pprl_ray.stages.multimodal import (
        VideoFingerprintStage, encode_y4m, synth_smooth_image,
    )

    st = VideoFingerprintStage(backend="y4m")
    frames = np.stack([synth_smooth_image(100 + k, size=16) for k in range(12)])
    batch = pa.table({
        "media_id": pa.array(["full", "trim", "reorder", "other"]),
        "payload": pa.array(
            [
                encode_y4m(frames),
                encode_y4m(frames[:8]),
                encode_y4m(frames[::-1]),  # reordered: same frame SET
                encode_y4m(np.stack([synth_smooth_image(900 + k, size=16)
                                     for k in range(12)])),
            ],
            pa.large_binary(),
        ),
    })
    out = st(batch)
    words = {i: set(w) for i, w in zip(out["media_id"].to_pylist(),
                                       out["words"].to_pylist())}
    j = lambda a, b: len(words[a] & words[b]) / len(words[a] | words[b])
    assert j("full", "trim") == 8 / 12
    assert j("full", "reorder") == 1.0  # frame order is irrelevant to the bag
    assert j("full", "other") == 0.0
    assert out["n_frames"].to_pylist() == [12, 8, 12, 12]


# --- persisted sketch store -------------------------------------------------------


class TestSketchStore:
    def _mk(self, n, lo, hi, seed):
        import pyarrow as pa_

        rng = np.random.default_rng(seed)
        return pa_.table({
            "grp": pa_.array(rng.choice([f"g{j}" for j in range(12)], n)),
            "val": pa_.array(rng.integers(lo, hi, n).astype(np.int64)),
        })

    def test_refresh_equals_from_scratch_build(self, ray_session, tmp_path):
        import json as _json

        import ray.data as rd

        from pprl_ray.sketches import KMVSketch
        from pprl_ray.state.sketchstore import (
            build_sketch_store, lookup_sketch_store, refresh_sketch_store,
        )

        a, b = self._mk(3000, 0, 5000, 1), self._mk(2500, 2500, 9000, 2)
        fac = lambda: KMVSketch(32)  # noqa: E731

        inc = str(tmp_path / "inc")
        build_sketch_store(rd.from_arrow(a).repartition(3), fac, "val", "grp", inc, buckets=4)
        refresh_sketch_store(rd.from_arrow(b).repartition(5), fac, "val", "grp", inc)

        full = str(tmp_path / "full")
        both = rd.from_arrow(a).union(rd.from_arrow(b))
        build_sketch_store(both, fac, "val", "grp", full, buckets=4)

        mi = _json.load(open(f"{inc}/_manifest.json"))
        mf = _json.load(open(f"{full}/_manifest.json"))
        assert mi["per_bucket"] == mf["per_bucket"]  # bit-identical blobs

        got = lookup_sketch_store(inc, ["g0", "g7"], KMVSketch)
        want = lookup_sketch_store(full, ["g0", "g7"], KMVSketch)
        assert got.keys() == want.keys()
        for k in got:
            assert got[k].to_bytes() == want[k].to_bytes()

    def test_lookup_prunes_and_param_guard(self, ray_session, tmp_path):
        import ray.data as rd

        from pprl_ray.sketches import KMVSketch
        from pprl_ray.state.sketchstore import (
            build_sketch_store, lookup_sketch_store, refresh_sketch_store,
        )

        store = str(tmp_path / "s")
        build_sketch_store(
            rd.from_arrow(self._mk(2000, 0, 4000, 3)),
            lambda: KMVSketch(32), "val", "grp", store, buckets=8,
        )
        got = lookup_sketch_store(store, ["g3"], KMVSketch)
        assert set(got) == {"g3"}
        assert got["g3"].estimate_int() > 0
        # unknown key: empty result, no error
        assert lookup_sketch_store(store, ["nope"], KMVSketch) in ({},) or \
            "nope" not in lookup_sketch_store(store, ["nope"], KMVSketch)
        # refresh with different params must refuse
        with pytest.raises(ValueError, match="different parameters"):
            refresh_sketch_store(
                rd.from_arrow(self._mk(100, 0, 10, 4)),
                lambda: KMVSketch(64), "val", "grp", store,
            )


def test_fused_profile_with_kmv_and_moments(ray_session):
    """KMV and moments ride the fused one-pass profile: results must equal
    standalone sketch_by_key over the same corpus."""
    from pprl_ray.pipelines.profile import (
        ProfileSpec, corpus_profile, finalize_profile,
    )
    from pprl_ray.sketches import KMVSketch, MomentsSketch
    from pprl_ray.sources.corpus import synth_corpus
    from pprl_ray.state.aggregate import finalize_sketches, sketch_by_key

    c = synth_corpus(3000, override_num_blocks=4)
    specs = [
        ProfileSpec("kmv_tokens", "kmv", lambda: KMVSketch(128), "tokens", "source"),
        ProfileSpec("ntok_moments", "moments", MomentsSketch, "n_tok", "source"),
    ]
    fused = finalize_profile(corpus_profile(c, specs), specs)
    kmv_alone = finalize_sketches(
        sketch_by_key(c, lambda: KMVSketch(128), "tokens", "source"), KMVSketch
    )
    mom_alone = finalize_sketches(
        sketch_by_key(c, MomentsSketch, "n_tok", "source"), MomentsSketch
    )
    for (name, key), sk in fused.items():
        if name == "kmv_tokens":
            assert sk.to_bytes() == kmv_alone[key].to_bytes()
        else:
            assert sk.to_bytes() == mom_alone[key].to_bytes()
    assert {k for n, k in fused if n == "kmv_tokens"} == set(kmv_alone)
