"""Checkpoint/resume: kill after K partitions, resume, byte-identical final
sketches; manifests carry lineage + metrics."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pprl_ray.sketches import HLLSketch
from pprl_ray.sources.corpus import synth_batch
from pprl_ray.state.checkpoint import CheckpointedSketchBuild

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture
def corpus_files(tmp_path):
    import numpy as np

    paths = []
    for part in range(4):
        ids = pa.table({"id": pa.array(np.arange(part * 250, (part + 1) * 250), pa.int64())})
        tbl = synth_batch(ids)
        p = str(tmp_path / f"corpus-{part:04d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


def _factory():
    return HLLSketch(12)


def test_resume_is_byte_identical(corpus_files, tmp_path):
    full_dir = str(tmp_path / "ckpt_full")
    res_dir = str(tmp_path / "ckpt_resume")

    full = CheckpointedSketchBuild(full_dir, _factory, "tokens", "source").run(corpus_files)

    # interrupted run: only 2 partitions complete, then "crash"
    interrupted = CheckpointedSketchBuild(res_dir, _factory, "tokens", "source")
    with pytest.raises(RuntimeError, match="still pending"):
        interrupted.run(corpus_files, max_partitions=2)
    assert len(interrupted.completed_partitions(corpus_files)) == 2

    # resume in a fresh object: only the 2 missing partitions are rebuilt
    resumed = CheckpointedSketchBuild(res_dir, _factory, "tokens", "source").run(corpus_files)
    assert set(full) == set(resumed)
    for k in full:
        assert full[k].to_bytes() == resumed[k].to_bytes(), k


def test_manifests_carry_lineage_and_metrics(corpus_files, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    CheckpointedSketchBuild(ckpt, _factory, "tokens", "source").run(corpus_files)
    manifests = sorted(glob.glob(os.path.join(ckpt, "manifests", "*.json")))
    assert len(manifests) == 4
    seen_inputs = set()
    for m in manifests:
        data = json.load(open(m))
        assert data["rows"] == 250
        assert data["values"] > 0
        assert data["values_per_sec"] > 0
        assert os.path.exists(data["input_path"])
        seen_inputs.add(data["input_path"])
    assert seen_inputs == set(corpus_files)


def test_corrupted_partial_is_rebuilt(corpus_files, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    builder = CheckpointedSketchBuild(ckpt, _factory, "tokens", "source")
    full = builder.run(corpus_files)

    # corrupt one partial file; its manifest hash no longer matches
    part = glob.glob(os.path.join(ckpt, "parts", "*.parquet"))[0]
    tbl = pq.read_table(part)
    bad = tbl.set_column(
        tbl.schema.get_field_index("blob"),
        "blob",
        pa.array([b"garbage"] * tbl.num_rows, pa.large_binary()),
    )
    pq.write_table(bad, part)

    fresh = CheckpointedSketchBuild(ckpt, _factory, "tokens", "source")
    assert len(fresh.completed_partitions(corpus_files)) == 3
    again = fresh.run(corpus_files)
    for k in full:
        assert full[k].to_bytes() == again[k].to_bytes()


def test_checkpointed_profile_matches_streaming_profile(ray_session, tmp_path):
    """Fused checkpointed build == streaming corpus_profile, and resume after
    a partial run is byte-identical."""
    from pprl_ray.pipelines.profile import corpus_profile, default_specs, finalize_profile
    from pprl_ray.sources.corpus import synth_corpus
    from pprl_ray.state.checkpoint import CheckpointedProfileBuild
    import glob
    import pytest

    corpus_dir = tmp_path / "corpus"
    synth_corpus(3000, override_num_blocks=4).write_parquet(str(corpus_dir))
    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    specs = default_specs(hll_p=10, bloom_bits=1 << 14)

    import ray.data as rd

    streaming = finalize_profile(
        corpus_profile(rd.read_parquet(str(corpus_dir)), specs), specs
    )

    build = CheckpointedProfileBuild(str(tmp_path / "ckpt"), specs)
    with pytest.raises(RuntimeError, match="pending"):
        build.run(paths, max_partitions=2)  # simulate a killed run
    assert len(build.completed_partitions(paths)) == 2
    resumed = build.run(paths)  # finishes the remaining partitions

    assert set(resumed) == set(streaming)
    # Bloom/HLL/CMS merges are bit-exact under ANY merge topology
    for gk in streaming:
        if gk[0] in ("hll_tokens", "cms_tokens", "bloom_tokens"):
            assert resumed[gk].to_bytes() == streaming[gk].to_bytes(), gk
    # quantile sketches are only bound-stable across topologies; compare
    # their estimates
    for gk in streaming:
        if gk[0] in ("kll_ntok", "tdigest_ntok"):
            a, b = resumed[gk].quantile(0.5), streaming[gk].quantile(0.5)
            assert abs(a - b) / max(b, 1.0) < 0.05, (gk, a, b)

    # resume vs an UNINTERRUPTED checkpointed run (same deterministic
    # partition merge order): byte-identical for every sketch kind
    fresh = CheckpointedProfileBuild(str(tmp_path / "ckpt2"), specs).run(paths)
    for gk in resumed:
        assert fresh[gk].to_bytes() == resumed[gk].to_bytes(), gk


def test_checkpointed_map_write_resumes_byte_identical(ray_session, tmp_path):
    """Resumable sink: interrupted run resumes, skips finished partitions,
    and final outputs are byte-identical to an uninterrupted run."""
    import glob
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    import ray.data as rd

    from pprl_ray.state.checkpoint import CheckpointedMapWrite

    src = tmp_path / "src"
    rd.range(4000).map_batches(
        lambda b: pa.table({"id": b["id"], "v": pa.compute.multiply(b["id"], 3)}),
        batch_format="pyarrow",
    ).repartition(4).write_parquet(str(src))
    paths = sorted(glob.glob(f"{src}/*.parquet"))

    def double(batch: pa.Table) -> pa.Table:
        return batch.append_column("v2", pa.compute.multiply(batch["v"], 2))

    out_a = tmp_path / "out_a"
    w = CheckpointedMapWrite(str(tmp_path / "ck_a"), double)
    with pytest.raises(RuntimeError, match="pending"):
        w.run(paths, str(out_a), max_partitions=2)  # simulated kill
    assert len(w.completed_partitions(paths, str(out_a))) == 2
    stats = w.run(paths, str(out_a))
    assert stats["resumed"] == 2 and stats["partitions"] == 4

    out_b = tmp_path / "out_b"
    CheckpointedMapWrite(str(tmp_path / "ck_b"), double).run(paths, str(out_b))

    def digest(d):
        return {
            f.split("/")[-1]: hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(f"{d}/*.parquet"))
        }

    assert digest(str(out_a)) == digest(str(out_b))
    total = pq.read_table(str(out_a))
    assert total.num_rows == 4000 and "v2" in total.column_names


@pytest.fixture
def doc_files(tmp_path):
    """4 parquet fragments with planted near-duplicates across fragments."""
    import numpy as np

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    paths = []
    docs = []
    for i in range(40):
        text = " ".join(rng.choice(words, 60))
        docs.append({"doc_id": i, "text": text})
        if i < 6:  # near-dup lands in a LATER fragment than its original
            mutated = text.split()
            mutated[7] = "changed"
            docs.append({"doc_id": i + 1000, "text": " ".join(mutated)})
    for part in range(4):
        chunk = docs[part::4]
        p = str(tmp_path / f"docs-{part:04d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d["doc_id"] for d in chunk], pa.int64()),
                    "text": pa.array([d["text"] for d in chunk], pa.string()),
                }
            ),
            p,
        )
        paths.append(p)
    return paths


def test_checkpointed_minhash_dedup_resumes_byte_identical(doc_files, tmp_path):
    """Kill after 2 signature partitions, resume; kill again after 5 bands,
    resume — the final pair table is byte-identical to an uninterrupted
    run, and every planted cross-fragment near-dup is found."""
    from pprl_ray.state.checkpoint import CheckpointedMinhashDedup

    kw = dict(threshold=0.7, bands=8, k=64)
    full = CheckpointedMinhashDedup(str(tmp_path / "ck_full"), **kw).run(doc_files)

    resumed_dir = str(tmp_path / "ck_resume")
    with pytest.raises(RuntimeError, match="signature partitions still pending"):
        CheckpointedMinhashDedup(resumed_dir, **kw).run(doc_files, max_stage_a=2)
    with pytest.raises(RuntimeError, match="band partitions still pending"):
        CheckpointedMinhashDedup(resumed_dir, **kw).run(doc_files, max_bands=5)
    resumed = CheckpointedMinhashDedup(resumed_dir, **kw).run(doc_files)

    assert full.equals(resumed)  # byte-identical pair table
    found = set(zip(full["id_a"].to_pylist(), full["id_b"].to_pylist()))
    for i in range(6):
        assert (i, i + 1000) in found, (i, found)

    # lineage: band manifests record the signature files they read
    m = json.load(open(os.path.join(resumed_dir, "manifests", "band-000.json")))
    assert len(m["sig_files"]) == 4 and m["output_sha256"]


def test_checkpointed_blocked_match_resumes_and_matches_live(doc_files, tmp_path):
    """Blocked-match checkpoints: resume is byte-identical, and the result
    equals the live match_blocked pipeline on the same masked inputs."""
    import base64

    import numpy as np
    import ray.data as rd

    from pprl_ray.config import MatchConfig
    from pprl_ray.stages.match import match_blocked
    from pprl_ray.state.checkpoint import CheckpointedBlockedMatch

    rng = np.random.default_rng(13)
    base_vecs = (rng.random((30, 1024)) < 0.3).astype(np.uint8)

    def b64(bits):
        return base64.b64encode(np.packbits(bits, bitorder="big").tobytes()).decode()

    dom_rows = [{"id": f"d{i:02d}", "value": b64(base_vecs[i])} for i in range(30)]
    # range: 10 exact copies + 20 random
    rng_vecs = base_vecs.copy()
    rng_vecs[10:] = (rng.random((20, 1024)) < 0.3).astype(np.uint8)
    rng_rows = [{"id": f"r{i:02d}", "value": b64(rng_vecs[i])} for i in range(30)]

    dpaths, rpaths = [], []
    for part in range(2):
        dp = str(tmp_path / f"dom-{part}.parquet")
        rp = str(tmp_path / f"rng-{part}.parquet")
        pq.write_table(pa.Table.from_pylist(dom_rows[part::2]), dp)
        pq.write_table(pa.Table.from_pylist(rng_rows[part::2]), rp)
        dpaths.append(dp)
        rpaths.append(rp)

    kw = dict(measure="dice", threshold=0.95, bands=16)
    full = CheckpointedBlockedMatch(str(tmp_path / "cm_full"), **kw).run(dpaths, rpaths)

    res_dir = str(tmp_path / "cm_res")
    with pytest.raises(RuntimeError, match="pending"):
        CheckpointedBlockedMatch(res_dir, **kw).run(dpaths, rpaths, max_stage_a=1)
    resumed = CheckpointedBlockedMatch(res_dir, **kw).run(dpaths, rpaths)
    assert full.equals(resumed)

    # parity with the live distributed operator
    live = match_blocked(
        rd.from_items(dom_rows), rd.from_items(rng_rows),
        MatchConfig("dice", 0.95, "crosswise"), bands=16, partitions=4,
    ).to_pandas()
    key = lambda t: sorted(zip(t["domain_id"], t["range_id"], np.round(t["similarity"], 12)))
    ck = full.to_pandas()
    assert key(ck) == key(live)
    pairs = set(zip(ck["domain_id"], ck["range_id"]))
    for i in range(10):
        assert (f"d{i:02d}", f"r{i:02d}") in pairs

    with pytest.raises(ValueError, match="share input files"):
        CheckpointedBlockedMatch(str(tmp_path / "cm_x"), **kw).run(dpaths, dpaths)


def test_checkpointed_kmeans_resume_byte_identical(ray_session, tmp_path):
    """Kill-and-resume mid-fit: the resumed centroids must equal an
    uninterrupted run byte-for-byte; lineage mismatch invalidates."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pprl_ray.state.checkpoint import CheckpointedKMeans

    rng = np.random.default_rng(7)
    pts = rng.normal(0, 10, (400, 6))
    src = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                "embedding": pa.array(list(pts), pa.list_(pa.float64())),
            }
        ),
        str(src),
    )

    def ds():
        return rd.read_parquet(str(src), override_num_blocks=4)

    straight = CheckpointedKMeans(str(tmp_path / "a"), k=4, iters=6).fit(ds(), "emb")

    # interrupted: run only 2 iterations, then resume to 6
    interrupted = CheckpointedKMeans(str(tmp_path / "b"), k=4, iters=2)
    interrupted.fit(ds(), "emb")
    resumed = CheckpointedKMeans(str(tmp_path / "b"), k=4, iters=6).fit(ds(), "emb")
    assert resumed.tobytes() == straight.tobytes()

    # manifests carry lineage + wall metrics
    m = json.loads((tmp_path / "b" / "iters" / "iter-0003.json").read_text())
    assert m["input"] == "emb" and m["k"] == 4 and m["wall_sec"] >= 0

    # corrupting a payload invalidates that iteration -> recomputed, same bytes
    p = tmp_path / "b" / "iters" / "iter-0006.npy"
    p.write_bytes(b"junk")
    again = CheckpointedKMeans(str(tmp_path / "b"), k=4, iters=6).fit(ds(), "emb")
    assert again.tobytes() == straight.tobytes()

    # different lineage tag -> nothing reused (fresh init saved at iter 0)
    fresh = CheckpointedKMeans(str(tmp_path / "b"), k=4, iters=6).fit(ds(), "other")
    assert fresh.tobytes() == straight.tobytes()  # same data, same result


def test_checkpointed_index_build_resume_and_invalidation(ray_session, tmp_path):
    """Partial build -> resume -> identical postings to the live one-shot
    index; corrupted bucket file invalidates only its fragment."""
    import glob
    import json

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pprl_ray.stages.textindex import lookup_postings, write_token_index
    from pprl_ray.state.checkpoint import CheckpointedIndexBuild

    rng = np.random.default_rng(8)
    words = [f"w{i:02d}" for i in range(40)]
    frags = []
    n = 0
    for f in range(3):
        texts = [
            " ".join(rng.choice(words, rng.integers(3, 9)))
            for _ in range(50)
        ]
        path = tmp_path / f"frag{f}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n, n + 50), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            str(path),
        )
        frags.append(str(path))
        n += 50

    ck = CheckpointedIndexBuild(str(tmp_path / "ck"), partitions=8)
    r1 = ck.run(frags, max_partitions=1)
    assert r1["built"] == 1 and len(ck.completed_partitions(frags)) == 1
    r2 = ck.run(frags)
    assert r2["built"] == 2 and r2["skipped"] == 1

    # postings equal the live single-shot index for a few tokens
    live_dir = str(tmp_path / "live_idx")
    docs = rd.read_parquet(frags)
    write_token_index(docs, live_dir, partitions=8)
    for toks in (["w00", "w13"], ["w39"]):
        a = (
            lookup_postings(ck.index_dir, toks, partitions=8)
            .to_pandas().sort_values(["token", "doc_id"]).reset_index(drop=True)
        )
        b = (
            lookup_postings(live_dir, toks, partitions=8)
            .to_pandas().sort_values(["token", "doc_id"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    # corrupt one bucket file of one fragment -> only that fragment rebuilds
    frag_pid_files = glob.glob(f"{ck.index_dir}/bucket=*/*.parquet")
    victim = frag_pid_files[0]
    open(victim, "wb").write(b"junk")
    assert len(ck.completed_partitions(frags)) == 2
    r3 = ck.run(frags)
    assert r3["built"] == 1 and r3["skipped"] == 2
    assert len(ck.completed_partitions(frags)) == 3


def test_cc_round_checkpoint_resume_identical(ray_session, tmp_path):
    """Distributed connected-components: kill after round 1, resume from
    the persisted round (not round 0), final labels identical to an
    uninterrupted run; stale lineage never pollutes a changed input."""
    import numpy as np
    import ray.data as rd

    from pprl_ray.stages import dedup as dd
    from pprl_ray.stages.dedup import connected_components_collapse

    # chain graph (0-1, 1-2, ..., 39-40) needs several min-label rounds
    n = 40
    a = np.arange(n, dtype=np.int64)
    pairs_tbl = pa.table({"id_a": pa.array(a), "id_b": pa.array(a + 1)})

    def _mk():
        return rd.from_arrow(pairs_tbl)

    def _sorted(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    full = _sorted(connected_components_collapse(_mk(), local_threshold=0, partitions=4))
    full_rounds = dd.last_cc_rounds
    assert full_rounds > 2  # the chain actually exercises multiple rounds
    assert (full["rep_id"] == 0).all()

    ck = str(tmp_path / "cc_ckpt")
    # "killed" run: only one distributed round executes, rounds 0-1 persist
    connected_components_collapse(_mk(), local_threshold=0, partitions=4,
                                  max_rounds=1, checkpoint_dir=ck)
    manifests = sorted(glob.glob(os.path.join(ck, "rounds", "*.json")))
    assert [os.path.basename(m) for m in manifests] == [
        "round-0000.json", "round-0001.json"]

    resumed = _sorted(connected_components_collapse(
        _mk(), local_threshold=0, partitions=4, checkpoint_dir=ck))
    assert dd.last_cc_rounds == full_rounds - 1  # round 1 was NOT re-run
    assert resumed.equals(full)

    # resuming a CONVERGED checkpoint executes zero rounds
    again = _sorted(connected_components_collapse(
        _mk(), local_threshold=0, partitions=4, checkpoint_dir=ck))
    assert dd.last_cc_rounds == 0
    assert again.equals(full)
    with open(sorted(glob.glob(os.path.join(ck, "rounds", "*.json")))[-1]) as f:
        m = json.load(f)
    assert m["changed"] == 0 and {"pairs_fp", "n_pairs", "wall_sec"} <= set(m)

    # a different pair table with the same checkpoint dir must NOT resume
    other = pa.table({"id_a": pa.array(a + 500), "id_b": pa.array(a + 501)})
    fresh = _sorted(connected_components_collapse(
        rd.from_arrow(other), local_threshold=0, partitions=4, checkpoint_dir=ck))
    assert dd.last_cc_rounds > 0
    assert (fresh["rep_id"] == 500).all()


def test_resume_byte_identical_round5_sketches(corpus_files, tmp_path):
    """The checkpoint scaffolding is registry-generic: the round-5
    single-column sketches (SpaceSaving, REQ) resume byte-identically
    through the same per-partition build/kill/resume path as HLL.
    (TupleSketch needs a payload column; its resumability rests on the
    bit-invariant merges property-tested in test_properties.py.)"""
    from pprl_ray.sketches import REQSketch, SpaceSavingSketch

    factories = {
        "spacesaving": lambda: SpaceSavingSketch(k=64),
        "req": lambda: REQSketch(k=16, seed=3),
    }
    for name, factory in factories.items():
        full = CheckpointedSketchBuild(
            str(tmp_path / f"full_{name}"), factory, "tokens", "source"
        ).run(corpus_files)
        interrupted = CheckpointedSketchBuild(
            str(tmp_path / f"res_{name}"), factory, "tokens", "source"
        )
        with pytest.raises(RuntimeError, match="still pending"):
            interrupted.run(corpus_files, max_partitions=2)
        resumed = CheckpointedSketchBuild(
            str(tmp_path / f"res_{name}"), factory, "tokens", "source"
        ).run(corpus_files)
        assert set(full) == set(resumed)
        for k in full:
            assert full[k].to_bytes() == resumed[k].to_bytes(), (name, k)
