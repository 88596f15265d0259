"""Round-4 regression tests: advisor findings + judge asks.

Covers: contamination short-doc n-gram semantics, skew_join suffix parity
with bucket_join on colliding schemas, weighted-sample canonical tie-break,
CLI index --index-dir honoring, CLI incremental-dedup founding-run
self-dedup, open-vocab TF-IDF join path, vectorised fp_md5 parity.
"""

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# --- contamination / shingle drop_short -------------------------------------


def test_shingle_tokens_drop_short():
    from pprl_ray.stages.dedup import shingle_tokens

    batch = pa.table({"text": ["one two", "a b c d e f", "", "x y z"]})
    default = shingle_tokens(batch, "text", 5)
    dropped = shingle_tokens(batch, "text", 5, drop_short=True)
    # default: short rows emit ONE pseudo-shingle
    assert [len(s) for s in default] == [1, 2, 1, 1]
    # drop_short: docs under n words have NO n-grams
    assert [len(s) for s in dropped] == [0, 2, 0, 0]
    # long rows identical in both modes
    assert np.array_equal(default[1], dropped[1])


def test_contamination_short_docs_emit_nothing(ray_session):
    import ray.data as rd

    from pprl_ray.stages.dedup import contamination_pairs

    shared = "alpha beta gamma delta epsilon zeta"
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["tiny doc", shared + " trailer", "unrelated words entirely here now"],
    }))
    ev = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": ["tiny doc", "prefix " + shared],
    }))
    got = contamination_pairs(train, ev, shingle_n=5, partitions=4).take_all()
    pairs = {(r["eval_id"], r["train_id"]) for r in got}
    # the identical 2-word docs share NO 5-gram -> no (10, 1) pair
    assert (10, 1) not in pairs
    # the genuine 5-gram overlap is still found
    assert (11, 2) in pairs


# --- skew_join suffix parity -------------------------------------------------


def test_skew_join_colliding_schema_matches_bucket_join(ray_session):
    import ray.data as rd

    from pprl_ray.stages.join import bucket_join, skew_join

    n = 400
    left = rd.from_arrow(pa.table({
        "k": pa.array([7] * (n // 2) + list(range(n // 2)), pa.int64()),
        "payload": pa.array([f"L{i}" for i in range(n)]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(list(range(0, n // 2)) + [7], pa.int64()),
        "payload": pa.array([f"R{i}" for i in range(n // 2 + 1)]),
    }))

    def _norm(rows):
        return sorted((r["k"], r["payload"], r["payload_r"]) for r in rows)

    want = _norm(bucket_join(left, right, keys="k", partitions=4).take_all())
    got = _norm(
        skew_join(left, right, keys="k", hot_keys={7}, partitions=4).take_all()
    )
    assert got == want
    # and via detection (key 7 is half the table)
    got2 = _norm(
        skew_join(left, right, keys="k", hot_threshold=0.2, partitions=4).take_all()
    )
    assert got2 == want


# --- weighted sample canonical tie-break -------------------------------------


def test_canon_top_tie_break_id_asc():
    from pprl_ray.stages.sample import _canon_top

    key = np.array([1.0, 5.0, 5.0, 3.0])
    ids = np.array([40, 30, 10, 20], dtype=np.int64)
    take = _canon_top(key, ids, 2)
    # ties on key=5.0 resolve id ASC: id 10 (idx 2) before id 30 (idx 1)
    assert list(take) == [2, 1]
    # a reversed stable argsort would have returned [1, 2]


def test_weighted_sample_partitioning_invariant(ray_session):
    import ray.data as rd

    from pprl_ray.stages.sample import weighted_sample_es

    t = pa.table({
        "id": pa.array([f"d{i}" for i in range(300)]),
        "w": pa.array(np.linspace(1.0, 3.0, 300)),
    })
    a = weighted_sample_es(rd.from_arrow(t), "id", "w", 17)
    b = weighted_sample_es(rd.from_arrow(t).repartition(13), "id", "w", 17)
    assert a["id"].tolist() == b["id"].tolist()


# --- CLI fixes ----------------------------------------------------------------


def test_cli_incremental_founding_run_self_dedups(ray_session, tmp_path, capsys):
    from pprl_ray.cli import main

    docs = tmp_path / "docs.parquet"
    texts = ["dup text"] * 5 + [f"unique {i}" for i in range(10)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }),
        str(docs),
    )
    main(["dedup", "--method", "incremental", "--input", str(docs),
          "--id-column", "doc_id", "--index-dir", str(tmp_path / "idx"),
          "--output", str(tmp_path / "v1")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 11  # 10 unique + ONE survivor of the 5 dups
    kept = pq.read_table(str(tmp_path / "v1"))
    kept_texts = kept["text"].to_pylist()
    assert kept_texts.count("dup text") == 1
    # min-id winner kept
    ids_of_dup = [i for i, t in zip(kept["doc_id"].to_pylist(), kept_texts)
                  if t == "dup text"]
    assert ids_of_dup == [0]


def test_cli_index_checkpoint_honors_index_dir(ray_session, tmp_path, capsys):
    from pprl_ray.cli import main

    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"alpha token{i % 3}" for i in range(20)]),
        }),
        str(docs),
    )
    idx = tmp_path / "myindex"
    main(["index", "--input", str(docs), "--index-dir", str(idx),
          "--checkpoint-dir", str(tmp_path / "ckpt"), "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index_dir"] == str(idx)
    assert any(p.name.startswith("bucket=") for p in idx.iterdir())
    # lookup against the SAME --index-dir the user specified finds postings
    main(["index", "--index-dir", str(idx), "--lookup", "alpha",
          "--partitions", "4", "--output", str(tmp_path / "hits")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["postings"] == 20


# --- open-vocab TF-IDF join path ----------------------------------------------


def test_tfidf_join_path_matches_broadcast(ray_session):
    import ray.data as rd

    from pprl_ray.stages.text import tfidf_top_terms

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(120)
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    n_docs = len(texts)

    def _norm(rows):
        return sorted((r["doc_id"], r["top_term"], r["tfidf"]) for r in rows)

    broad = _norm(tfidf_top_terms(rd.from_arrow(t), n_docs).take_all())
    joined = _norm(
        tfidf_top_terms(rd.from_arrow(t), n_docs, partitions=4,
                        broadcast_max_terms=0).take_all()
    )
    assert joined == broad
    assert len(broad) == n_docs


# --- vectorised fp_md5 ---------------------------------------------------------


def test_fingerprint_md5_parity_with_hashlib():
    from pprl_ray.stages.text import fingerprint_batch

    texts = ["Hello World", "", "Ünïcødé TEXT", "a b c", None]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    out = fingerprint_batch(batch)
    got = out["fp_md5"].to_pylist()
    want = [hashlib.md5((t or "").lower().encode()).hexdigest() for t in texts]
    assert got == want


# --- gecko-parity generator ----------------------------------------------------


def _gecko_fixture_csvs(tmp_path):
    import csv

    fn_gender = tmp_path / "given-name-gender.csv"
    with open(fn_gender, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["given_name", "gender", "count"])
        w.writerows([["anna", "f", 700], ["jonas", "m", 200], ["kim", "x", 100]])
    ln = tmp_path / "last-name.csv"
    with open(ln, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["last_name", "count"])
        w.writerows([["mueller", 500], ["schmidt", 300], ["weber", 200]])
    return str(fn_gender), str(ln)


def _gecko_config(tmp_path, count=2000, seed=727):
    fn_gender, ln = _gecko_fixture_csvs(tmp_path)
    return {
        "seed": seed,
        "count": count,
        "generators": [
            {
                "attribute_names": ["given_name", "gender"],
                "function_name": "from_multicolumn_frequency_table",
                "args": {"csv_file_path": fn_gender,
                         "value_columns": ["given_name", "gender"],
                         "freq_column": "count"},
            },
            {
                "attribute_names": ["last_name"],
                "function_name": "from_frequency_table",
                "args": {"csv_file_path": ln, "value_column": "last_name",
                         "freq_column": "count"},
            },
            {
                "attribute_names": ["age"],
                "function_name": "from_uniform_distribution",
                "args": {"low": 18, "high": 90, "precision": 0},
            },
        ],
    }


def test_gecko_generator_deterministic_and_weighted(ray_session, tmp_path):
    from pprl_ray.sources.generate import gecko_generated_entities, is_gecko_config

    cfg = _gecko_config(tmp_path)
    assert is_gecko_config(cfg)
    a = gecko_generated_entities(cfg).to_pandas().sort_values("id").reset_index(drop=True)
    b = gecko_generated_entities(cfg).to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)  # bit-identical across runs
    assert list(a.columns) == ["id", "given_name", "gender", "last_name", "age"]
    assert len(a) == 2000
    # joint draw preserves cross-column correlation exactly
    pairs = set(zip(a["given_name"], a["gender"]))
    assert pairs <= {("anna", "f"), ("jonas", "m"), ("kim", "x")}
    # weighted marginals: anna ~70% of draws (binomial 3-sigma ~ 3%)
    frac = (a["given_name"] == "anna").mean()
    assert 0.64 < frac < 0.76
    # distribution args respected
    ages = a["age"].astype(int)
    assert ages.min() >= 18 and ages.max() <= 90
    # different seed -> different table
    c = gecko_generated_entities(_gecko_config(tmp_path, seed=1)).to_pandas()
    assert not a["last_name"].equals(c.sort_values("id")["last_name"].reset_index(drop=True))


def test_gecko_generator_invalid_function(tmp_path):
    from pprl_ray.sources.generate import gecko_generated_entities

    cfg = _gecko_config(tmp_path)
    cfg["generators"][0]["function_name"] = "from_nowhere"
    with pytest.raises(ValueError, match="invalid gecko function"):
        gecko_generated_entities(cfg)


def test_cli_estimate_gecko_workflow(ray_session, tmp_path, capsys):
    """Reference test_cli.py:423-480 workflow shape: gecko config ->
    generated corpus -> estimate -> WeightedAttributeConfig JSON."""
    from pprl_ray.cli import main

    cfg = _gecko_config(tmp_path, count=500)
    cfg_path = tmp_path / "gecko-config.json"
    cfg_path.write_text(json.dumps(cfg))

    out = tmp_path / "gen.parquet"
    main(["generate", "--generator-config", str(cfg_path), "--output", str(out)])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 500

    weights = tmp_path / "weights.json"
    main(["estimate", "--generator-config", str(cfg_path), "--output", str(weights)])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["attributes"] == 4
    cfgs = json.loads(weights.read_text())
    names = {c["attribute_name"] for c in cfgs}
    assert names == {"given_name", "gender", "last_name", "age"}
    for c in cfgs:
        assert c["weight"] > 0 and c["average_token_count"] > 0


# --- >63-key pairwise_jaccard --------------------------------------------------


def test_pairwise_jaccard_beyond_63_keys(ray_session):
    """The multi-word bitmask path: 80 keys, ground truth via brute force."""
    import itertools

    import ray.data as rd

    from pprl_ray.stages.setops import pairwise_jaccard

    rng = np.random.default_rng(5)
    n_keys = 80
    sets = {f"s{i:02d}": set(rng.choice(200, size=rng.integers(5, 40),
                                        replace=False).tolist())
            for i in range(n_keys)}
    rows_k, rows_e = [], []
    for key, els in sets.items():
        for e in els:
            rows_k.append(key)
            rows_e.append(int(e))
    ds = rd.from_arrow(pa.table({
        "source": pa.array(rows_k), "element": pa.array(rows_e, pa.int64())
    }))
    got = pairwise_jaccard(ds, "source", "element", partitions=4)
    got_map = {(a, b): j for a, b, j in
               zip(got["key_a"], got["key_b"], got["jaccard"])}
    names = sorted(sets)
    assert len(got_map) == n_keys * (n_keys - 1) // 2
    for a, b in itertools.islice(itertools.combinations(names, 2), 0, None, 37):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert got_map[(a, b)] == round(inter / union, 6), (a, b)


# --- bigram LM perplexity ------------------------------------------------------


def test_lm_perplexity_matches_reference(ray_session):
    """Distributed train + score equals a sequential python stupid-backoff
    reference; partition count does not change the model; min_count pruning
    reroutes pruned bigrams through the backoff branch."""
    import math
    from collections import Counter

    import ray.data as rd

    from pprl_ray.stages.lm import ALPHA, score_perplexity, train_bigram_lm

    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
        "one two three four five",
        "the cat sat on the mat again",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }))

    unic, bic = Counter(), Counter()
    for d in docs:
        ws = d.split(" ")
        unic.update(ws)
        bic.update(zip(ws, ws[1:]))
    total_ref = sum(unic.values())

    def _ref_avg(d, bi_counts):
        ws = d.split(" ")
        lps = []
        for j, w in enumerate(ws):
            if j == 0:
                lps.append(math.log(unic[w] / total_ref))
            elif (ws[j - 1], w) in bi_counts:
                lps.append(math.log(bi_counts[(ws[j - 1], w)] / unic[ws[j - 1]]))
            else:
                lps.append(math.log(ALPHA * max(unic[w], 1) / total_ref))
        return sum(lps) / len(lps)

    for parts in (1, 3):
        uni, bi, total = train_bigram_lm(ds, partitions=parts)
        assert total == total_ref
        out = score_perplexity(ds, uni, bi, total).to_pandas().sort_values("doc_id")
        for i, d in enumerate(docs):
            want = _ref_avg(d, bic)
            got = out[out.doc_id == i].iloc[0]
            assert abs(got.avg_logp - want) < 1e-12, (parts, i)
            assert abs(got.perplexity - math.exp(-want)) < 1e-9

    # min_count=2 prunes singleton bigrams -> pruned pairs take the backoff
    uni, bi, total = train_bigram_lm(ds, partitions=2, min_count=2)
    kept = {(r["w1"], r["w2"]): r["cnt"] for r in bi.take_all()}
    assert kept and all(c >= 2 for c in kept.values())
    out = score_perplexity(ds, uni, bi, total).to_pandas().sort_values("doc_id")
    for i, d in enumerate(docs):
        want = _ref_avg(d, kept)
        assert abs(out[out.doc_id == i].iloc[0].avg_logp - want) < 1e-12, i


# --- repetition signals + latest_by_key -----------------------------------------


def test_repetition_signals_reference(ray_session):
    from pprl_ray.stages.text import repetition_batch

    texts = [
        "a a a a",                      # dup ratio 0.75, top word 1.0, top bigram 1.0
        "one two three four",           # all distinct
        "x y x y x",                    # top bigram (x,y) 2/4
        "solo",                         # single word, no bigrams
    ]
    batch = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(texts)})
    out = repetition_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_word_ratio"] == 0.75
    assert out.loc[0, "top_word_frac"] == 1.0
    assert out.loc[0, "top_bigram_frac"] == 1.0
    assert out.loc[1, "dup_word_ratio"] == 0.0
    assert abs(out.loc[1, "top_bigram_frac"] - 1 / 3) < 1e-12  # 3 bigrams, each once
    assert out.loc[2, "top_bigram_frac"] == 0.5
    assert out.loc[3, "n_words"] == 1 and out.loc[3, "top_bigram_frac"] == 0.0


def test_latest_by_key_partition_invariant(ray_session):
    import ray.data as rd

    from pprl_ray.stages.window import latest_by_key

    rng = np.random.default_rng(9)
    n = 5000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 200, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.standard_normal(n)),
    })
    pdf = tbl.to_pandas()
    want = (
        pdf.sort_values(["k", "ts", "id"], ascending=[True, False, False])
        .drop_duplicates("k")
        .sort_values("k")
        .reset_index(drop=True)
    )
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        got = (
            latest_by_key(ds, "k", ["ts", "id"], partitions=3)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert got.equals(want), nblocks
