"""End-to-end corpus preparation (pipelines/prepare.py): composition
consistency against the individual stages, per-stage checkpoint/resume,
and the CLI subcommand."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(n=120, seed=9):
    """Deterministic corpus with planted exact dups, a repetitious doc,
    short docs and near-dup pairs."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(n):
        words = [vocab[j] for j in rng.integers(0, len(vocab), 60)]
        texts.append(" ".join(words))
        ids.append(i)
    # exact duplicates of doc 0
    texts += [texts[0]] * 3
    ids += [n, n + 1, n + 2]
    # a repetitious doc (fails dup_word_ratio) and a short doc
    texts += ["spam " * 80, "too short"]
    ids += [n + 3, n + 4]
    # a near-duplicate of doc 1 (same text plus a tail word)
    texts += [texts[1] + " extra"]
    ids += [n + 5]
    n_chars = [len(t) for t in texts]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def _eval_slice(tbl, k=5):
    texts = [" ".join(t.split(" ")[:20]) for t in tbl["text"].to_pylist()[:k]]
    return pa.table(
        {
            "doc_id": pa.array([700000 + i for i in range(k)], pa.int64()),
            "text": pa.array(texts),
        }
    )


def test_prepare_matches_individually_chained_stages(ray_session):
    import ray.data as rd

    from pprl_ray.pipelines.prepare import prepare_corpus
    from pprl_ray.stages.dedup import (
        contamination_pairs,
        exact_dedup,
        near_dedup_corpus,
        ngram_jaccard_pairs,
    )
    from pprl_ray.stages.text import repetition_batch

    tbl = _corpus()
    ev = _eval_slice(tbl)
    docs = rd.from_arrow(tbl).repartition(4)

    kept, rep = prepare_corpus(
        docs, rd.from_arrow(ev), min_words=30, max_words=1000,
        shingle_n=4, jaccard_threshold=0.5, keep="best",
        keep_score_col="n_chars", contam_n=5,
    )
    kept_ids = sorted(kept.to_pandas()["doc_id"])

    # replay stage by stage with the standalone operators
    import pyarrow.compute as pc

    s1 = exact_dedup(rd.from_arrow(tbl).repartition(4))

    def _quality(batch):
        sig = repetition_batch(batch)
        keep = pc.and_(
            pc.and_(pc.greater_equal(sig["n_words"], 30),
                    pc.less_equal(sig["n_words"], 1000)),
            pc.and_(pc.less(sig["dup_word_ratio"], 0.6),
                    pc.less(sig["top_word_frac"], 0.2)),
        )
        return pa.table({"doc_id": sig["doc_id"].filter(keep)})

    q_ids = set(s1.map_batches(_quality, batch_format="pyarrow")
                .to_pandas()["doc_id"])
    s2_tbl = tbl.filter(pc.is_in(tbl["doc_id"], pa.array(sorted(q_ids), pa.int64())))
    s2 = rd.from_arrow(s2_tbl).repartition(4)
    pairs = ngram_jaccard_pairs(s2, shingle_n=4, threshold=0.5).map_batches(
        lambda b: pa.table({"id_a": pc.cast(b["doc_a"], pa.int64()),
                            "id_b": pc.cast(b["doc_b"], pa.int64())}),
        batch_format="pyarrow",
    )
    s3 = near_dedup_corpus(s2, keep="best", keep_score_col="n_chars", pairs=pairs)
    s3_ids = set(s3.to_pandas()["doc_id"])
    s3_tbl = tbl.filter(pc.is_in(tbl["doc_id"], pa.array(sorted(s3_ids), pa.int64())))
    contam = contamination_pairs(
        rd.from_arrow(s3_tbl).repartition(4), rd.from_arrow(ev), shingle_n=5
    ).to_pandas()
    bad = set(contam["train_id"])
    want_ids = sorted(s3_ids - bad)

    assert kept_ids == want_ids
    # report arithmetic is internally consistent and matches the replay
    assert rep["docs_out"].iloc[-1] == len(want_ids)
    assert (rep["docs_in"] - rep["dropped"] == rep["docs_out"]).all()
    assert rep["docs_out"].iloc[0] == s1.count()
    assert rep["docs_out"].iloc[1] == len(q_ids)
    assert rep["docs_out"].iloc[2] == len(s3_ids)


def test_prepare_checkpoint_resume_is_bit_identical_and_skips(ray_session, tmp_path):
    import ray.data as rd

    from pprl_ray.pipelines.prepare import prepare_corpus

    tbl = _corpus(80, seed=3)
    ev = _eval_slice(tbl)
    ckpt = str(tmp_path / "prep")

    def _run():
        return prepare_corpus(
            rd.from_arrow(tbl).repartition(3), rd.from_arrow(ev),
            keep="best", keep_score_col="n_chars",
            checkpoint_dir=ckpt, input_tag="t1",
        )

    kept1, rep1 = _run()
    ids1 = sorted(kept1.to_pandas()["doc_id"])
    # all four stage manifests exist, written manifest-last
    for stage in ("exact_dedup", "quality", "near_dedup", "decontaminate"):
        man = json.load(open(tmp_path / "prep" / stage / "_manifest.json"))
        assert man["input_tag"] == "t1"
        assert man["n_losers"] == int(
            rep1.loc[rep1["stage"] == stage, "dropped"].iloc[0]
        )

    kept2, rep2 = _run()
    ids2 = sorted(kept2.to_pandas()["doc_id"])
    assert ids1 == ids2
    assert rep1[["docs_in", "docs_out", "dropped"]].equals(
        rep2[["docs_in", "docs_out", "dropped"]]
    )

    # a different input tag invalidates the manifests -> recompute, same data
    kept3, rep3 = prepare_corpus(
        rd.from_arrow(tbl).repartition(3), rd.from_arrow(ev),
        keep="best", keep_score_col="n_chars",
        checkpoint_dir=ckpt, input_tag="t2",
    )
    assert sorted(kept3.to_pandas()["doc_id"]) == ids1
    man = json.load(open(tmp_path / "prep" / "quality" / "_manifest.json"))
    assert man["input_tag"] == "t2"


def test_prepare_without_eval_reports_zero_drop_stage(ray_session):
    import ray.data as rd

    from pprl_ray.pipelines.prepare import prepare_corpus

    tbl = _corpus(60, seed=5)
    kept, rep = prepare_corpus(
        rd.from_arrow(tbl), None, keep="min_id",
    )
    assert list(rep["stage"]) == [
        "exact_dedup", "quality", "near_dedup", "decontaminate"
    ]
    last = rep.iloc[-1]
    assert last["dropped"] == 0 and last["docs_in"] == last["docs_out"]
    assert kept.count() == last["docs_out"]


def test_cli_prepare_smoke(ray_session, tmp_path, capsys):
    from pprl_ray.cli import main

    tbl = _corpus(60, seed=7)
    ev = _eval_slice(tbl, 3)
    pq.write_table(tbl, str(tmp_path / "docs.parquet"))
    pq.write_table(ev, str(tmp_path / "eval.parquet"))
    main([
        "prepare", "--input", str(tmp_path / "docs.parquet"),
        "--eval-input", str(tmp_path / "eval.parquet"),
        "--keep", "best", "--score-column", "n_chars",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--output", str(tmp_path / "out"),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["command"] == "prepare"
    assert [s["stage"] for s in out["stages"]] == [
        "exact_dedup", "quality", "near_dedup", "decontaminate"
    ]
    assert out["rows"] == out["stages"][-1]["docs_out"]
    kept = pq.read_table(str(tmp_path / "out"))
    assert kept.num_rows == out["rows"]
    # --keep best without --score-column is refused
    with pytest.raises(SystemExit):
        main(["prepare", "--input", str(tmp_path / "docs.parquet"),
              "--keep", "best", "--output", str(tmp_path / "out2")])


def test_cli_sketch_store_build_refresh_lookup(ray_session, tmp_path, capsys):
    """CLI round-trip: build on half the rows, refresh with the other
    half, lookup equals a one-shot build over everything (associativity
    surfaced through the CLI)."""
    from pprl_ray.cli import main

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, 2000).astype(np.int64)
    keys = [f"s{i % 4}" for i in range(2000)]
    tbl = pa.table({"source": pa.array(keys), "doc_id": pa.array(vals)})
    pq.write_table(tbl.slice(0, 1000), str(tmp_path / "a.parquet"))
    pq.write_table(tbl.slice(1000), str(tmp_path / "b.parquet"))
    pq.write_table(tbl, str(tmp_path / "all.parquet"))

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    main(["sketch-store", "--mode", "build", "--store-dir", inc,
          "--sketch", "kmv", "--param", "64", "--buckets", "4",
          "--input", str(tmp_path / "a.parquet")])
    main(["sketch-store", "--mode", "refresh", "--store-dir", inc,
          "--sketch", "kmv", "--param", "64",
          "--input", str(tmp_path / "b.parquet")])
    main(["sketch-store", "--mode", "build", "--store-dir", full,
          "--sketch", "kmv", "--param", "64", "--buckets", "4",
          "--input", str(tmp_path / "all.parquet")])
    main(["sketch-store", "--mode", "lookup", "--store-dir", inc,
          "--sketch", "kmv", "--keys", "s0,s1,s2,s3"])
    main(["sketch-store", "--mode", "lookup", "--store-dir", full,
          "--sketch", "kmv", "--keys", "s0,s1,s2,s3"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[1]["mode"] == "refresh" and lines[1]["keys"] == 4
    look_inc, look_full = lines[3], lines[4]
    assert look_inc["estimates"] == look_full["estimates"]
    assert set(look_inc["estimates"]) == {"s0", "s1", "s2", "s3"}
    # param mismatch on refresh is refused
    with pytest.raises(ValueError, match="different parameters"):
        main(["sketch-store", "--mode", "refresh", "--store-dir", inc,
              "--sketch", "kmv", "--param", "128",
              "--input", str(tmp_path / "b.parquet")])


def test_prepare_fuses_dedup_and_quality_scans(ray_session):
    """Stages 1+2 share ONE corpus scan: with no checkpoint, the input
    text is read exactly once before the near-dup stage. Counted via an
    actor-backed tap on the input dataset (each full-pipeline execution
    re-runs the tap once over every row)."""
    import ray
    import ray.data as rd

    from pprl_ray.pipelines.prepare import prepare_corpus

    @ray.remote
    class Tap:
        def __init__(self):
            self.rows = 0

        def add(self, n):
            self.rows += n

        def total(self):
            return self.rows

    tap = Tap.remote()
    tbl = _corpus(40)
    n_rows = tbl.num_rows

    def _count(batch: pa.Table) -> pa.Table:
        ray.get(tap.add.remote(batch.num_rows))
        return batch

    docs = rd.from_arrow(tbl).map_batches(_count, batch_format="pyarrow")

    # run ONLY stages 1+2 (skip near-dup/contamination: threshold 1.01
    # can never fire, but its pair scan would still read the corpus)
    surv, report = prepare_corpus(
        docs, eval_ds=None, min_words=30, max_words=1000,
        jaccard_threshold=1.01, partitions=4,
    )
    n_out = surv.count()
    scans = ray.get(tap.total.remote()) / n_rows
    # docs.count() + fused stage-1/2 scan + the near-dup pair scan over
    # survivors + the final count() = 4 full passes; before the fusion
    # the quality stage added a fifth
    assert scans <= 4.0, scans
    assert report.loc[report["stage"] == "exact_dedup", "dropped"].iloc[0] == 3
    assert report.loc[report["stage"] == "quality", "dropped"].iloc[0] >= 2
    assert n_out == report["docs_out"].iloc[-1]
