"""End-to-end CLI tests (`python -m pprl_ray.cli ...` semantics via main()).

Mirrors the reference's CLI integration tests
(`/root/reference/packages/pprl_client/tests/test_cli.py:74-200`: CSV/file
in -> file out, row counts and headers), minus the HTTP service hop.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pprl_ray.cli import main, mask_config_from_request, transform_kwargs_from_request

MASK_REQUEST = {
    "config": {
        "token_size": 2,
        "hash": {"function": {"algorithms": ["sha1"], "key": None}, "strategy": {"name": "double_hash"}},
        "prepend_attribute_name": True,
        "filter": {"type": "clk", "filter_size": 512, "hash_values": 5},
        "padding": "_",
        "hardeners": [{"name": "balance"}],
    },
    "attributes": [],
}

TRANSFORM_REQUEST = {
    "config": {"empty_value": "skip"},
    "attribute_transformers": [],
    "global_transformers": {"before": [{"name": "normalization"}], "after": []},
}


@pytest.fixture()
def entities_file(tmp_path):
    path = tmp_path / "entities.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([str(i) for i in range(20)], pa.string()),
                "name": pa.array([f"  Person-{i} É " for i in range(20)], pa.string()),
            }
        ),
        path,
    )
    return str(path)


def _run(capsys, argv):
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_transform_mask_match(ray_session, tmp_path, entities_file, capsys):
    cfg_t = tmp_path / "t.json"
    cfg_t.write_text(json.dumps(TRANSFORM_REQUEST))
    cfg_m = tmp_path / "m.json"
    cfg_m.write_text(json.dumps(MASK_REQUEST))

    r = _run(capsys, [
        "transform", "--input", entities_file, "--config", str(cfg_t),
        "--output", str(tmp_path / "transformed"),
    ])
    assert r["rows"] == 20
    # normalization applied: lowercase, accents stripped
    t = pq.read_table(str(tmp_path / "transformed"))
    assert all(v == v.strip().lower() for v in t["name"].to_pylist())

    r = _run(capsys, [
        "mask", "--input", str(tmp_path / "transformed"), "--config", str(cfg_m),
        "--output", str(tmp_path / "masked"),
    ])
    assert r["rows"] == 20
    m = pq.read_table(str(tmp_path / "masked"))
    assert m.column_names == ["id", "value"]
    # balance hardener doubles 512 -> 1024 bits = 128 bytes -> 172 b64 chars
    assert all(len(v) == 172 for v in m["value"].to_pylist())

    r = _run(capsys, [
        "match", "--inputs", str(tmp_path / "masked"), str(tmp_path / "masked"),
        "--output", str(tmp_path / "matches"), "--threshold", "1.0",
    ])
    # crosswise self-match at threshold 1: every entity matches itself
    assert r["pairs"] >= 20


def test_cli_profile_and_dedup(ray_session, tmp_path, capsys):
    import ray.data as rd

    from pprl_ray.sources.corpus import synth_corpus

    corpus_dir = tmp_path / "corpus"
    synth_corpus(2000, override_num_blocks=4).write_parquet(str(corpus_dir))

    r = _run(capsys, ["profile", "--input", str(corpus_dir)])
    est = r["estimates"]
    assert "hll_tokens[web]" in est and est["hll_tokens[web]"] > 0
    assert "kll_ntok" in est and est["kll_ntok"]["0.5"] > 0

    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
                "text": pa.array(["x y z", "x y z", "p q r", "s t u"], pa.string()),
            }
        ),
        docs,
    )
    r = _run(capsys, [
        "dedup", "--input", str(docs), "--output", str(tmp_path / "dd"),
        "--method", "exact", "--id-column", "doc_id",
    ])
    assert r["rows"] == 3  # "a"/"b" collapse to one


def test_cli_checkpointed_profile_resumes(ray_session, tmp_path, capsys):
    from pprl_ray.sources.corpus import synth_corpus

    corpus_dir = tmp_path / "corpus"
    synth_corpus(2000, override_num_blocks=4).write_parquet(str(corpus_dir))

    r1 = _run(capsys, [
        "checkpointed-profile", "--input", str(corpus_dir),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert r1["resumed"] == 0 and r1["partitions"] == 4
    r2 = _run(capsys, [
        "checkpointed-profile", "--input", str(corpus_dir),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert r2["resumed"] == 4
    assert r1["estimates"] == r2["estimates"]  # byte-identical resume


def test_config_adapters_reference_shapes():
    cfg = mask_config_from_request(MASK_REQUEST)
    assert cfg.filter.filter_size == 512 and cfg.hash.strategy == "double_hash"
    assert cfg.hardeners == ({"name": "balance"},)
    kw = transform_kwargs_from_request(TRANSFORM_REQUEST)
    assert kw["empty_value"] == "skip"
    assert kw["global_before"] == [{"name": "normalization"}]


def test_estimate_matches_direct_computation(ray_session, tmp_path, capsys):
    """estimate pipeline == straight per-row recomputation of the reference
    stats (lib.py:103-130 semantics: avg token-set size, Shannon entropy of
    global token counts)."""
    import collections
    import math

    import numpy as np
    import ray.data as rd

    from pprl_ray.functions.qgram import tokenize
    from pprl_ray.pipelines.estimate import estimate_attribute_weights

    vals = [f"Person-{i % 7}" for i in range(40)]
    tbl = pa.table(
        {
            "id": pa.array([str(i) for i in range(40)], pa.string()),
            "name": pa.array(vals, pa.string()),
        }
    )
    ds = rd.from_arrow(tbl)
    [cfg] = estimate_attribute_weights(ds, id_column="id")

    sizes = []
    counter = collections.Counter()
    for v in vals:
        toks = tokenize(v, 2, "_")
        sizes.append(len(toks))
        counter.update(toks)
    total = sum(counter.values())
    entropy = -sum((c / total) * math.log2(c / total) for c in counter.values())

    assert cfg["attribute_name"] == "name"
    assert cfg["average_token_count"] == round(float(np.mean(sizes)), 6)
    assert cfg["weight"] == round(entropy, 6)


def test_cli_csv_round_trip(ray_session, tmp_path, entities_file, capsys):
    """Reference-style CSV workflow: mask -> CSV dir -> match reads the CSV
    dir back (the reference's bit-vector CSV edge format, cli.py:77-153)."""
    cfg_m = tmp_path / "m.json"
    cfg_m.write_text(json.dumps(MASK_REQUEST))

    r = _run(capsys, [
        "mask", "--input", entities_file, "--config", str(cfg_m),
        "--output", str(tmp_path / "masked_csv"), "--format", "csv",
    ])
    assert r["rows"] == 20
    import glob

    assert glob.glob(f"{tmp_path}/masked_csv/*.csv")

    r = _run(capsys, [
        "match", "--inputs", str(tmp_path / "masked_csv"), str(tmp_path / "masked_csv"),
        "--output", str(tmp_path / "matches_csv"), "--threshold", "1.0", "--format", "csv",
    ])
    assert r["pairs"] >= 20


def test_generator_config_driven_generate_and_estimate(ray_session, tmp_path, capsys):
    """Reference `pprl estimate faker CONFIG OUT` parity: a
    FakerGeneratorConfig-shaped JSON drives generation by function-name
    strings, and the estimate flow produces a WeightedAttributeConfig list."""
    import json

    from pprl_ray.cli import main
    from pprl_ray.sources.generate import generated_entities

    cfg = {
        "seed": 727,
        "count": 200,
        "generators": [
            {"function_name": "first_name", "attribute_name": "firstName"},
            {"function_name": "last_name", "attribute_name": "lastName"},
            {"function_name": "date_of_birth", "attribute_name": "dob",
             "args": {"minimum_age": 18, "maximum_age": 90}},
            {"function_name": "random_element", "attribute_name": "gender",
             "args": {"elements": ["f", "m", "x"]}},
        ],
    }
    cfg_path = tmp_path / "gen.json"
    cfg_path.write_text(json.dumps(cfg))

    # determinism: same config -> identical table under different parallelism
    a = generated_entities(cfg).to_pandas().sort_values("id").reset_index(drop=True)
    b = generated_entities(cfg).to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    assert list(a.columns) == ["id", "firstName", "lastName", "dob", "gender"]
    assert set(a["gender"]) <= {"f", "m", "x"}
    years = a["dob"].str.slice(0, 4).astype(int)
    assert years.between(2024 - 90, 2024 - 18).all()

    out = tmp_path / "entities.parquet"
    main(["generate", "--generator-config", str(cfg_path), "--output", str(out)])
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 200

    weights = tmp_path / "weights.json"
    main(["estimate", "--generator-config", str(cfg_path), "--output", str(weights)])
    configs = json.loads(weights.read_text())
    assert sorted(c["attribute_name"] for c in configs) == ["dob", "firstName", "gender", "lastName"]
    for c in configs:
        assert c["weight"] > 0 and c["average_token_count"] > 0


def test_generator_config_invalid_function_name():
    import pytest as _pytest

    from pprl_ray.sources.generate import generated_entities

    with _pytest.raises(ValueError, match="invalid faker function: `?shoe_size"):
        generated_entities({"seed": 1, "count": 5, "generators": [
            {"function_name": "shoe_size", "attribute_name": "x"}]})


def test_cli_sort_scrub_semantic_incremental(ray_session, tmp_path, capsys):
    import numpy as np

    # corpus with plantable PII + sortable lengths
    docs = tmp_path / "docs.parquet"
    n = 200
    rng = np.random.default_rng(3)
    texts = [
        ("word " * int(rng.integers(1, 30))).strip()
        + (" mail me@x.org" if i % 4 == 0 else "")
        for i in range(n)
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}),
        str(docs),
    )

    main(["sort", "--input", str(docs), "--by", "doc_id",
          "--output", str(tmp_path / "sorted"), "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n
    assert (tmp_path / "sorted").is_dir()

    main(["scrub", "--input", str(docs), "--text-column", "text",
          "--output", str(tmp_path / "scrubbed")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n
    scrubbed = pq.read_table(str(tmp_path / "scrubbed"))
    assert sum(1 for t in scrubbed["text"].to_pylist() if "<EMAIL>" in t) == n // 4

    # incremental dedup: first run creates the index, second dedupes
    main(["dedup", "--method", "incremental", "--input", str(docs),
          "--id-column", "doc_id", "--index-dir", str(tmp_path / "idx"),
          "--output", str(tmp_path / "v1")])
    capsys.readouterr()
    v2 = tmp_path / "v2.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1000, 1000 + n), pa.int64()),
                "text": pa.array(texts[: n // 2] + [f"fresh {i}" for i in range(n // 2)]),
            }
        ),
        str(v2),
    )
    main(["dedup", "--method", "incremental", "--input", str(v2),
          "--id-column", "doc_id", "--index-dir", str(tmp_path / "idx"),
          "--output", str(tmp_path / "v2_kept")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n // 2  # only the fresh docs survive

    # semantic dedup over a small embedding table with planted duplicates
    emb = tmp_path / "emb.parquet"
    base = rng.normal(0, 1, (100, 8))
    pts = np.concatenate([base, base[:5] + 1e-9])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(pts)), pa.int64()),
                "embedding": pa.array(list(pts), pa.list_(pa.float64())),
            }
        ),
        str(emb),
    )
    main(["semantic-dedup", "--input", str(emb), "--id-column", "vec_id",
          "--clusters", "4", "--threshold", "0.9999",
          "--output", str(tmp_path / "pairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] >= 5
    pairs = pq.read_table(str(tmp_path / "pairs"))
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert {(i, 100 + i) for i in range(5)} <= got


def test_cli_index_and_sample(ray_session, tmp_path, capsys):
    import numpy as np

    n = 60
    docs = tmp_path / "docs.parquet"
    texts = [f"alpha beta gamma{' delta' if i % 3 == 0 else ''}" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "weight": pa.array(np.linspace(1.0, 60.0, n)),
            }
        ),
        str(docs),
    )

    idx = tmp_path / "tok_index"
    main(["index", "--input", str(docs), "--index-dir", str(idx),
          "--partitions", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "build" and idx.is_dir()

    main(["index", "--index-dir", str(idx), "--lookup", "delta", "gamma",
          "--output", str(tmp_path / "postings"), "--partitions", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # gamma in all docs, delta in every 3rd
    assert out["postings"] == n + n // 3

    main(["sample", "--input", str(docs), "--id-column", "doc_id",
          "--weight-column", "weight", "-k", "10",
          "--output", str(tmp_path / "sampled")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 10


def test_cli_table_profile(ray_session, tmp_path, capsys):
    docs = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(50), pa.int64()),
                "source": pa.array([f"s{i % 4}" for i in range(50)]),
            }
        ),
        str(docs),
    )
    main(["table-profile", "--input", str(docs), "--columns", "doc_id", "source",
          "--output", str(tmp_path / "prof.csv"), "--format", "csv"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    import pandas as pd

    prof = pd.read_csv(tmp_path / "prof.csv").set_index("column")
    assert prof.loc["doc_id"]["n_distinct"] == 50
    assert prof.loc["source"]["n_distinct"] == 4


def test_cli_decontaminate(ray_session, tmp_path, capsys):
    train = tmp_path / "train.parquet"
    evals = tmp_path / "eval.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["one two three four five six seven eight nine ten",
                     "totally unrelated content in this training row here ok"]
                ),
            }
        ),
        str(train),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([9], pa.int64()),
                "text": pa.array(
                    ["one two three four five six seven eight plus tail"]
                ),
            }
        ),
        str(evals),
    )
    main(["decontaminate", "--input", str(train), "--eval-input", str(evals),
          "--shingle-n", "8", "--output", str(tmp_path / "pairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] == 1  # the single shared 8-gram pair


def test_cli_index_checkpointed_build(ray_session, tmp_path, capsys):
    frag_dir = tmp_path / "frags"
    frag_dir.mkdir()
    for f in range(2):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(f * 10, f * 10 + 10), pa.int64()),
                    "text": pa.array(["alpha beta"] * 10),
                }
            ),
            str(frag_dir / f"part{f}.parquet"),
        )
    ck = tmp_path / "ck"
    main(["index", "--input", str(frag_dir), "--index-dir", str(ck / "index"),
          "--checkpoint-dir", str(ck), "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "checkpointed-build" and out["built"] == 2

    # rerun: everything skips
    main(["index", "--input", str(frag_dir), "--index-dir", str(ck / "index"),
          "--checkpoint-dir", str(ck), "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["built"] == 0 and out["skipped"] == 2

    # the checkpointed tree serves lookups
    main(["index", "--index-dir", out["index_dir"], "--lookup", "alpha",
          "--output", str(tmp_path / "hits"), "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["postings"] == 20


def test_cli_jsonl_round_trip(ray_session, tmp_path, entities_file, capsys):
    """JSONL workflow: transform writes a JSONL dir, mask reads it back —
    the line-delimited-JSON interchange most corpus releases ship as."""
    import glob

    cfg_t = tmp_path / "t.json"
    cfg_t.write_text(json.dumps(TRANSFORM_REQUEST))
    r = _run(capsys, [
        "transform", "--input", entities_file, "--config", str(cfg_t),
        "--output", str(tmp_path / "tx_jsonl"), "--format", "jsonl",
    ])
    assert r["rows"] == 20
    files = glob.glob(f"{tmp_path}/tx_jsonl/*.json*")
    assert files
    # every line parses as a JSON object carrying the entity columns
    line = open(files[0]).readline()
    row = json.loads(line)
    assert "id" in row

    cfg_m = tmp_path / "m.json"
    cfg_m.write_text(json.dumps(MASK_REQUEST))
    r = _run(capsys, [
        "mask", "--input", str(tmp_path / "tx_jsonl"), "--config", str(cfg_m),
        "--output", str(tmp_path / "masked_from_jsonl"),
    ])
    assert r["rows"] == 20


def test_cli_quality_modes(ray_session, tmp_path, capsys):
    """quality subcommand: signals, gopher filter, lm scoring — and the
    filter actually drops rows while lm emits one score row per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            " ".join(["tok%d" % (i * 37 % 53) for i in range(60)]),
            " ".join(["a"] * 40),                     # degenerate repeat
            "short doc",                              # under min words
            " ".join(["w%d" % (i % 29) for i in range(45)]),
            " ".join(["x%d" % (i % 31) for i in range(80)]),
            " ".join(["b b c d e f g h i j"] * 5),
        ]),
    })
    inp = tmp_path / "docs.parquet"
    pq.write_table(docs, str(inp))

    r = _run(capsys, ["quality", "--input", str(inp),
                      "--output", str(tmp_path / "sig")])
    assert r["rows"] == 6
    sig = pq.read_table(str(tmp_path / "sig"))
    assert {"dup_word_ratio", "top_word_frac", "top_bigram_frac"} <= set(
        sig.column_names)

    r = _run(capsys, ["quality", "--method", "gopher", "--input", str(inp),
                      "--output", str(tmp_path / "kept")])
    kept = pq.read_table(str(tmp_path / "kept"))
    assert 0 < kept.num_rows < 6  # filtered, but not everything
    kept_ids = set(kept["doc_id"].to_pylist())
    assert 1 not in kept_ids and 2 not in kept_ids  # repeat + short dropped

    r = _run(capsys, ["quality", "--method", "lm", "--input", str(inp),
                      "--output", str(tmp_path / "ppl")])
    ppl = pq.read_table(str(tmp_path / "ppl"))
    assert ppl.num_rows == 6 and "perplexity" in ppl.column_names
    # repetitive text scores far more predictable than the rare-word doc
    pdf = ppl.to_pandas().set_index("doc_id")
    assert pdf.loc[1, "perplexity"] < pdf.loc[0, "perplexity"]
    assert pdf["perplexity"].idxmax() == 2  # rare-bigram short doc

    r = _run(capsys, ["quality", "--method", "kn", "--input", str(inp),
                      "--output", str(tmp_path / "kn")])
    kn = pq.read_table(str(tmp_path / "kn"))
    assert kn.num_rows == 6 and "perplexity" in kn.column_names
    kdf = kn.to_pandas().set_index("doc_id")
    # KN preserves the predictability ordering of the repetitive doc
    assert kdf.loc[1, "perplexity"] < kdf.loc[0, "perplexity"]
    assert (kdf["perplexity"] > 0).all()


def test_cli_split_search_ngram_near(ray_session, tmp_path, capsys):
    docs = tmp_path / "docs.parquet"
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 0
        "totally different words in this document here now",
        "alpha beta unrelated tail words here again now",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(docs),
    )

    main(["split", "--input", str(docs), "--id-column", "doc_id",
          "--fractions", "train=0.5,test=0.5",
          "--output", str(tmp_path / "splits")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 4
    tagged = pq.read_table(str(tmp_path / "splits"))
    assert set(tagged["split"].to_pylist()) <= {"train", "test"}

    main(["search", "--input", str(docs), "--id-column", "doc_id",
          "--terms", "alpha", "beta", "-k", "3",
          "--output", str(tmp_path / "hits")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 3
    hits = pq.read_table(str(tmp_path / "hits"))
    assert hits.column_names == ["doc_id", "score", "rank"]

    main(["dedup", "--method", "ngram", "--input", str(docs),
          "--id-column", "doc_id", "--shingle-n", "3", "--threshold", "0.4",
          "--output", str(tmp_path / "pairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    pairs = pq.read_table(str(tmp_path / "pairs"))
    assert out["rows"] == 1
    assert pairs["doc_a"].to_pylist() == [0] and pairs["doc_b"].to_pylist() == [1]

    main(["dedup", "--method", "near", "--keep", "best",
          "--score-column", "n_chars", "--threshold", "0.4",
          "--input", str(docs), "--id-column", "doc_id",
          "--output", str(tmp_path / "kept")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = pq.read_table(str(tmp_path / "kept"))
    # docs 0/1 are near-dups; both have 47 chars -> tie, min id 0 survives
    assert sorted(kept["doc_id"].to_pylist()) == [0, 2, 3]

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="score-column"):
        main(["dedup", "--method", "near", "--keep", "best",
              "--input", str(docs), "--id-column", "doc_id",
              "--output", str(tmp_path / "x")])


def test_cli_chunk_mix_spans(ray_session, tmp_path, capsys):
    texts = [
        "a b c d e f g h i j",
        "k l m n o p",
        "one two three dup dup dup dup one two three",  # self-repeating
    ]
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts),
                "grp": pa.array(["big", "big", "small"]),
            }
        ),
        str(docs),
    )

    main(["chunk", "--input", str(docs), "--seq-len", "4", "--output",
          str(tmp_path / "chunks")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 10 words -> 3 windows, 6 -> 2, 10 -> 3
    assert out["rows"] == 8
    t = pq.read_table(str(tmp_path / "chunks"))
    assert "chunk_idx" in t.column_names and "text" in t.column_names

    main(["dedup", "--method", "spans", "--span-n", "2", "--input", str(docs),
          "--id-column", "doc_id", "--output", str(tmp_path / "scrubbed")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 3
    s = pq.read_table(str(tmp_path / "scrubbed")).to_pandas().set_index("doc_id")
    # "dup dup" repeats -> all dup-covered spans removed from doc 2;
    # "one two"/"two three" repeat within the doc as well
    assert "dup" not in s.loc[2, "text"]
    assert s.loc[0, "n_removed"] == 0

    main(["mix", "--input", str(docs), "--id-column", "doc_id",
          "--group-column", "grp", "--alpha", "0.5", "--budget", "1.0",
          "--output", str(tmp_path / "mixed")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 1 <= out["rows"] <= 3


def test_cli_dsir_and_collocate(ray_session, tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(4)
    sci = ["quantum flux entangles the qubit lattice",
           "flux lattice coherence drives quantum gates"]
    web = ["buy cheap pills online now best deal",
           "celebrity gossip news today click here now"]
    raw_rows, target_rows = [], []
    for i in range(120):
        base = sci[i % 2] if i < 20 else web[i % 2]
        raw_rows.append({"doc_id": i, "text": base})
    for i in range(40):
        target_rows.append({"doc_id": 1000 + i, "text": sci[i % 2]})
    pq.write_table(pa.Table.from_pylist(raw_rows), str(tmp_path / "raw.parquet"))
    pq.write_table(pa.Table.from_pylist(target_rows), str(tmp_path / "tgt.parquet"))

    main(["dsir", "--input", str(tmp_path / "raw.parquet"),
          "--target-input", str(tmp_path / "tgt.parquet"),
          "-k", "20", "--output", str(tmp_path / "sel")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 20
    sel = pq.read_table(str(tmp_path / "sel"))
    # the 20 science docs out-rank the 100 web docs
    assert sorted(sel["doc_id"].to_pylist()) == list(range(20))

    main(["collocate", "--input", str(tmp_path / "raw.parquet"),
          "--min-count", "5", "-k", "5", "--output", str(tmp_path / "coll")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 5
    coll = pq.read_table(str(tmp_path / "coll"))
    lifts = coll["lift_fx"].to_pylist()
    assert lifts == sorted(lifts, reverse=True)
    # rarity wins: the rare science-doc pairs (always co-occurring, low
    # unigram counts) out-lift the common web pairs
    pairs = set(zip(coll["w1"].to_pylist(), coll["w2"].to_pylist()))
    assert ("coherence", "drives") in pairs


def test_cli_media_dedup_all_types(ray_session, tmp_path, capsys):
    import numpy as np

    from pprl_ray.stages.multimodal import (
        encode_bmp, encode_wav, encode_y4m, synth_smooth_image,
    )

    # image: 10 smooth BMPs + 3 perturbed twins
    rows = []
    for i in range(10):
        g = synth_smooth_image(i)
        rows.append({"media_id": f"m{i}", "payload": encode_bmp(np.repeat(g[:, :, None], 3, 2))})
        if i < 3:
            g2 = np.clip(g.astype(np.int16) + 2, 0, 255).astype(np.uint8)
            rows.append({"media_id": f"t{i}", "payload": encode_bmp(np.repeat(g2[:, :, None], 3, 2))})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "img.parquet"))
    main(["media-dedup", "--type", "image", "--input", str(tmp_path / "img.parquet"),
          "--output", str(tmp_path / "imgpairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = pq.read_table(str(tmp_path / "imgpairs"))
    pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    assert {("m0", "t0"), ("m1", "t1"), ("m2", "t2")} <= pairs

    # video: 6 clips + 2 trims
    rows = []
    for i in range(6):
        frames = np.stack([synth_smooth_image(i * 50 + k) for k in range(10)])
        rows.append({"media_id": f"v{i}", "payload": encode_y4m(frames)})
        if i < 2:
            rows.append({"media_id": f"w{i}", "payload": encode_y4m(frames[:7])})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "vid.parquet"))
    main(["media-dedup", "--type", "video", "--input", str(tmp_path / "vid.parquet"),
          "--min-jaccard", "0.5", "--output", str(tmp_path / "vidpairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = pq.read_table(str(tmp_path / "vidpairs"))
    pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    assert pairs == {("v0", "w0"), ("v1", "w1")}

    # audio: 5 clips + 2 gain twins
    rows = []
    n = 8192
    t = np.arange(n) / 8000.0
    for i in range(5):
        pcm = (1 + 0.5 * np.sin(2 * np.pi * (0.5 + i) * t)) * 6000 * np.sin(
            2 * np.pi * (300 + i * 61) * t)
        rows.append({"media_id": f"a{i}",
                     "payload": encode_wav(np.clip(pcm, -32768, 32767).astype(np.int16))})
        if i < 2:
            rows.append({"media_id": f"b{i}",
                         "payload": encode_wav(np.clip(pcm * 1.02, -32768, 32767).astype(np.int16))})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "aud.parquet"))
    main(["media-dedup", "--type", "audio", "--input", str(tmp_path / "aud.parquet"),
          "--min-jaccard", "0.2", "--output", str(tmp_path / "audpairs")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = pq.read_table(str(tmp_path / "audpairs"))
    pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    assert {("a0", "b0"), ("a1", "b1")} <= pairs


def test_cli_dedup_lines_and_incremental_near(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pprl_ray.cli import main

    rng = np.random.default_rng(11)

    def doc(n=40):
        return " ".join(f"t{j}" for j in rng.integers(0, 150, n))

    # lines: two docs share a boilerplate line; later occurrence dropped
    docs = tmp_path / "ld.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["boiler plate\nalpha", "boiler plate\nbeta"]),
            }
        ),
        str(docs),
    )
    main(["dedup", "--method", "lines", "--input", str(docs),
          "--id-column", "doc_id", "--output", str(tmp_path / "ld_out")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    got = pq.read_table(str(tmp_path / "ld_out")).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["text"]) == ["boiler plate\nalpha", "beta"]
    assert list(got["n_dropped"]) == [0, 1]

    # incremental-near: founding run self-near-dedupes + builds the band
    # index; second run drops exact copies of v1 docs under confirm=set
    v1_texts = [doc() for _ in range(12)]
    v1 = tmp_path / "v1.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(12), pa.int64()),
                  "text": pa.array(v1_texts + [])}),
        str(v1),
    )
    idx = tmp_path / "bandidx"
    main(["dedup", "--method", "incremental-near", "--input", str(v1),
          "--id-column", "doc_id", "--index-dir", str(idx),
          "--output", str(tmp_path / "nv1")])
    lines = capsys.readouterr().out.strip().splitlines()
    created = json.loads(lines[0])
    assert created["band_index_created"] == str(idx)
    v2 = tmp_path / "v2.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(100, 104), pa.int64()),
                "text": pa.array([v1_texts[0], v1_texts[3], doc(), doc()]),
            }
        ),
        str(v2),
    )
    main(["dedup", "--method", "incremental-near", "--input", str(v2),
          "--id-column", "doc_id", "--index-dir", str(idx),
          "--confirm", "set", "--output", str(tmp_path / "nv2")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    kept = pq.read_table(str(tmp_path / "nv2")).to_pandas()
    assert sorted(kept["doc_id"]) == [102, 103]


def test_cli_stratified_split_and_group_cap(ray_session, tmp_path, capsys):
    docs = tmp_path / "d.parquet"
    n = 400
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array(["s%d" % (i % 4) for i in range(n)]),
            }
        ),
        str(docs),
    )

    main(["split", "--input", str(docs), "--id-column", "doc_id",
          "--stratified", "--group-column", "source",
          "--fractions", "train=0.9,val=0.05,test=0.05",
          "--output", str(tmp_path / "strat")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n
    tagged = pq.read_table(str(tmp_path / "strat")).to_pandas()
    counts = tagged.groupby(["source", "split"]).size().unstack(fill_value=0)
    assert (counts["train"] == 90).all()  # EXACT per group, not expected
    assert (counts["val"] == 5).all()
    assert (counts["test"] == 5).all()

    main(["sample", "--input", str(docs), "--id-column", "doc_id",
          "--per-group", "--group-column", "source", "-k", "7",
          "--output", str(tmp_path / "capped")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "cap-per-group"
    capped = pq.read_table(str(tmp_path / "capped")).to_pandas()
    assert (capped.groupby("source").size() == 7).all()


def test_cli_stats_and_span_pairs(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(4)
    src = tmp_path / "docs.parquet"
    pd.DataFrame(
        {
            "id": np.arange(120),
            "lang": rng.choice(["en", "de", "fr"], 120),
            "source": rng.choice(["web", "book"], 120),
            "text": [
                " ".join(rng.choice([f"w{i}" for i in range(40)], rng.integers(3, 15)))
                for _ in range(120)
            ],
        }
    ).to_parquet(src)

    chi2_out = tmp_path / "chi2"
    main(["stats", "--mode", "chi2", "--input", str(src),
          "--output", str(chi2_out), "--row-column", "lang",
          "--col-column", "source"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "chi2" and rep["rows"] == 6
    got = pq.read_table(str(chi2_out)).to_pandas()
    assert set(got.columns) == {"lang", "source", "n", "expected_u",
                                "chi2_contrib_u"}
    assert got["n"].sum() == 120

    tv_out = tmp_path / "tv"
    main(["stats", "--mode", "tv", "--input", str(src),
          "--output", str(tv_out), "--group-column", "source"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "tv" and rep["rows"] == 1
    tv = pq.read_table(str(tv_out)).to_pandas()
    assert 0 <= tv["tv_u"].iloc[0] <= 10**6

    pairs_out = tmp_path / "pairs"
    main(["dedup", "--method", "span-pairs", "--span-n", "3",
          "--input", str(src), "--output", str(pairs_out),
          "--id-column", "id"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    pairs = pq.read_table(str(pairs_out)).to_pandas()
    assert rep["rows"] == len(pairs)
    assert set(pairs.columns) == {"a_id", "b_id", "n_windows", "max_span"}
    assert (pairs["a_id"] < pairs["b_id"]).all()
    assert (pairs["max_span"] >= 3).all()


def test_cli_link_fuzzy_join(ray_session, tmp_path, capsys):
    import pandas as pd

    left = tmp_path / "left.parquet"
    right = tmp_path / "right.parquet"
    pd.DataFrame({"id": [1, 2, 3], "name": ["peter", "sandra", "anne"]}).to_parquet(left)
    pd.DataFrame({"id": [11, 12, 13], "name": ["petra", "sanda", "annie"]}).to_parquet(right)
    out = tmp_path / "links"
    main(["link", "--input", str(left), "--right", str(right),
          "--column", "name", "--threshold", "0.3", "--output", str(out)])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    links = pq.read_table(str(out)).to_pandas()
    assert rep["rows"] == len(links) > 0
    assert set(links.columns) == {"a_id", "b_id", "n_shared", "jaccard_u"}
    assert (links["jaccard_u"] >= 300000).all()


def test_cli_lineage_rollup(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd

    # build a checkpointed profile so real manifests exist, then roll up
    src = tmp_path / "corpus"
    src.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        pd.DataFrame(
            {
                "doc_id": [f"d{i}_{j}" for j in range(40)],
                "tokens": [rng.integers(0, 99, 8).tolist() for _ in range(40)],
                "n_tok": [8] * 40,
                "source": ["web"] * 40,
            }
        ).to_parquet(src / f"part{i}.parquet")
    ck = tmp_path / "ck"
    main(["checkpointed-profile", "--input", str(src),
          "--checkpoint-dir", str(ck)])
    capsys.readouterr()
    main(["lineage", "--checkpoint-dir", str(ck), "--verbose"])
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    rollup = lines[-1]
    assert rollup["command"] == "lineage"
    assert rollup["manifests"] >= 3
    assert rollup["rows"] >= 120
    per_part = [x for x in lines[:-1] if "partition_id" in x]
    assert len(per_part) >= 3
    assert all("blob_sha256" in m for m in per_part)
