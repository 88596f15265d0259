"""``ray job submit``-able CLI entry points.

Mirrors the reference CLI surface (`/root/reference/packages/pprl_client/
pprl_client/cli.py`: ``pprl transform | mask | match | estimate``) as Ray
Data pipelines, plus the sketch/dedup commands this engine adds. Config
files use the REFERENCE's JSON request shapes (``BaseMaskRequest`` /
``BaseTransformRequest``, `pprl_model/mask.py:159-168`,
`pprl_model/transform.py:85-99`) so existing configs port unchanged.

Usage (cluster):
    ray job submit --working-dir . -- python -m pprl_ray.cli profile \
        --input /data/corpus --output /data/profile
Local runs auto-initialise Ray (guarded — the driver harness owns the
session when one exists).

Inputs may be Parquet (dir or file) or CSV; outputs are partitioned Parquet
(one file per block — resumable sinks write per-partition, never one giant
file).
"""

from __future__ import annotations

import argparse
import json

from .config import (
    AttributeConfig,
    AttributeSalt,
    CLKFilter,
    CLKRBFFilter,
    HashConfig,
    HashFunctionConfig,
    MaskConfig,
    MatchConfig,
    RBFFilter,
)

__all__ = ["main", "mask_config_from_request", "transform_kwargs_from_request"]


# --------------------------------------------------------------------------
# config adapters: reference JSON request shapes -> our dataclasses


def mask_config_from_request(req: dict) -> MaskConfig:
    """``BaseMaskRequest`` JSON (config + attributes) -> MaskConfig."""
    c = req["config"]
    f = c["filter"]
    ftype = f.get("type", "clk")
    if ftype == "clk":
        filt = CLKFilter(filter_size=f["filter_size"], hash_values=f["hash_values"])
    elif ftype == "rbf":
        filt = RBFFilter(hash_values=f["hash_values"], seed=f["seed"])
    elif ftype == "clkrbf":
        filt = CLKRBFFilter(hash_values=f["hash_values"])
    else:
        raise ValueError(f"unknown filter type {ftype!r}")

    attrs = []
    for a in req.get("attributes", []):
        salt = None
        if a.get("salt"):
            salt = AttributeSalt(value=a["salt"].get("value"), attribute=a["salt"].get("attribute"))
        attrs.append(
            AttributeConfig(
                attribute_name=a["attribute_name"],
                salt=salt,
                weight=a.get("weight"),
                average_token_count=a.get("average_token_count"),
            )
        )

    strategy = c["hash"]["strategy"]
    return MaskConfig(
        token_size=c["token_size"],
        hash=HashConfig(
            function=HashFunctionConfig(
                algorithms=tuple(c["hash"]["function"]["algorithms"]),
                key=c["hash"]["function"].get("key"),
            ),
            strategy=strategy["name"] if isinstance(strategy, dict) else strategy,
        ),
        filter=filt,
        prepend_attribute_name=c.get("prepend_attribute_name", True),
        padding=c.get("padding", ""),
        hardeners=tuple(c.get("hardeners", [])),
        attributes=tuple(attrs),
    )


def transform_kwargs_from_request(req: dict) -> dict:
    """``BaseTransformRequest`` JSON -> transform_entities kwargs."""
    at = {
        a["attribute_name"]: a["transformers"] for a in req.get("attribute_transformers", [])
    }
    g = req.get("global_transformers", {})
    return dict(
        attribute_transformers=at or None,
        global_before=g.get("before") or None,
        global_after=g.get("after") or None,
        empty_value=req.get("config", {}).get("empty_value", "error"),
    )


# --------------------------------------------------------------------------
# IO helpers


def _init_ray() -> bool:
    """Init Ray if nobody owns a session yet; returns True if WE own it
    (and should shut it down) — never tear down a caller's session."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return True


def _read(path: str, columns: list[str] | None = None):
    """Read a parquet/CSV/JSONL file or directory (format sniffed from the
    extension of the path or, for directories, of the contained files)."""
    import glob
    import os

    import ray.data as rd

    def _dir_has(ext: str) -> bool:
        return (os.path.isdir(path)
                and not glob.glob(f"{path}/*.parquet")
                and bool(glob.glob(f"{path}/*{ext}")))

    if path.endswith(".csv") or _dir_has(".csv"):
        ds = rd.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    if path.endswith((".jsonl", ".json")) or _dir_has(".jsonl") or _dir_has(".json"):
        ds = rd.read_json(path)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns)


def _write(ds, path: str, fmt: str = "parquet") -> int:
    ds = ds.materialize()
    if fmt == "csv":
        ds.write_csv(path)
    elif fmt in ("jsonl", "json"):
        ds.write_json(path)
    else:
        ds.write_parquet(path)
    return ds.count()


# --------------------------------------------------------------------------
# subcommands


def cmd_transform(args) -> None:
    from .stages.mask import transform_entities

    req = json.load(open(args.config))
    ds = _read(args.input)
    out = transform_entities(ds, id_column=args.id_column, **transform_kwargs_from_request(req))
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "transform", "rows": n, "output": args.output}))


def cmd_mask(args) -> None:
    from .stages.mask import mask_entities

    req = json.load(open(args.config))
    config = mask_config_from_request(req)

    if getattr(args, "checkpoint_dir", None):
        # resumable partitioned sink: one output file per input fragment,
        # manifest-last lineage; a rerun skips completed partitions
        import glob
        import os

        from .stages.mask import EncodeStage
        from .state.checkpoint import CheckpointedMapWrite

        paths = (
            sorted(glob.glob(f"{args.input}/*.parquet"))
            if os.path.isdir(args.input)
            else [args.input]
        )
        stage = EncodeStage(config, id_column=args.id_column)
        stats = CheckpointedMapWrite(args.checkpoint_dir, stage).run(paths, args.output)
        print(json.dumps({"command": "mask", **stats, "output": args.output}))
        return

    ds = _read(args.input)
    out = mask_entities(ds, config, id_column=args.id_column)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "mask", "rows": n, "output": args.output}))


def cmd_match(args) -> None:
    import pyarrow as pa

    from .stages.match import match_many, match_pairwise

    config = MatchConfig(measure=args.measure, threshold=args.threshold, method=args.method)
    datasets = [_read(p) for p in args.inputs]
    if args.method == "pairwise":
        pair_results = {
            (i, j): match_pairwise(datasets[i], datasets[j], config)
            for i in range(len(datasets))
            for j in range(i + 1, len(datasets))
        }
    else:
        pair_results = match_many(datasets, config)

    # one output per file pair, labelled like the reference match CSV
    # (domain_file / range_file columns, cli.py:202-245)
    total = 0
    for (i, j), ds in pair_results.items():
        labelled = ds.map_batches(
            lambda b, i=i, j=j: b.append_column(
                "domain_file", pa.array([args.inputs[i]] * b.num_rows, pa.string())
            ).append_column("range_file", pa.array([args.inputs[j]] * b.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        total += _write(labelled, f"{args.output}/pair_{i}_{j}", args.format)
    print(json.dumps({"command": "match", "pairs": total, "output": args.output}))


def cmd_profile(args) -> None:
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .pipelines.profile import corpus_profile, default_specs, finalize_profile

    specs = default_specs(
        hll_p=args.hll_p,
        cms_width=args.cms_width,
        cms_depth=args.cms_depth,
        kll_k=args.kll_k,
        bloom_bits=args.bloom_bits,
    )
    corpus = _read(args.input, columns=["tokens", "n_tok", "source"])
    merged = corpus_profile(corpus, specs)
    profile = finalize_profile(merged, specs)

    if args.output:
        rows = {
            "sketch": [],
            "key": [],
            "blob": [],
        }
        for (name, key), sk in sorted(profile.items()):
            rows["sketch"].append(name)
            rows["key"].append(key)
            rows["blob"].append(zlib.compress(sk.to_bytes(), 1))
        import os

        os.makedirs(args.output, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "sketch": pa.array(rows["sketch"], pa.string()),
                    "key": pa.array(rows["key"], pa.string()),
                    "blob": pa.array(rows["blob"], pa.large_binary()),
                }
            ),
            f"{args.output}/profile.parquet",
        )

    report = {}
    for (name, key), sk in sorted(profile.items()):
        label = f"{name}[{key}]" if key else name
        if hasattr(sk, "estimate"):
            report[label] = round(sk.estimate(), 2)
        elif hasattr(sk, "quantile"):
            report[label] = {q: round(float(sk.quantile(q)), 2) for q in (0.25, 0.5, 0.75, 0.99)}
        elif hasattr(sk, "estimate_cardinality"):
            report[label] = round(sk.estimate_cardinality(), 2)
        elif hasattr(sk, "total"):
            report[label] = int(sk.total)
    print(json.dumps({"command": "profile", "estimates": report, "output": args.output}))


def cmd_dedup(args) -> None:
    from .stages.dedup import exact_dedup, minhash_dedup_pairs, simhash_candidates, simhash_fingerprints

    ds = _read(args.input)
    if args.method == "exact":
        out = exact_dedup(ds, id_col=args.id_column, text_col=args.text_column)
    elif args.method == "incremental":
        import os

        from .stages.dedup import incremental_exact_dedup, write_hash_index

        if not args.index_dir:
            raise SystemExit("--method incremental requires --index-dir")
        if not os.path.exists(os.path.join(args.index_dir, "_meta.json")):
            # founding run: SELF-dedup the corpus before indexing/writing —
            # otherwise internal duplicates survive in the output even
            # though their hashes are collapsed in the index
            kept = exact_dedup(ds, id_col=args.id_column,
                               text_col=args.text_column).materialize()
            n = write_hash_index(kept, args.index_dir, id_col=args.id_column,
                                 text_col=args.text_column)
            print(json.dumps({"command": "dedup", "index_created": args.index_dir,
                              "n_hashes": n}))
            out = kept
        else:
            out = incremental_exact_dedup(ds, args.index_dir, id_col=args.id_column,
                                          text_col=args.text_column)
    elif args.method == "minhash":
        out = minhash_dedup_pairs(
            ds, text_col=args.text_column, id_col=args.id_column, threshold=args.threshold
        )
    elif args.method == "simhash":
        fp = simhash_fingerprints(ds, text_col=args.text_column, id_col=args.id_column)
        out = simhash_candidates(fp, id_col=args.id_column, max_hamming=args.max_hamming)
    elif args.method == "ngram":
        from .stages.dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(ds, text_col=args.text_column,
                                  id_col=args.id_column, shingle_n=args.shingle_n,
                                  threshold=args.threshold)
    elif args.method == "near":
        from .stages.dedup import near_dedup_corpus

        if args.keep == "best" and not args.score_column:
            raise SystemExit("--keep best requires --score-column")
        out = near_dedup_corpus(ds, text_col=args.text_column,
                                id_col=args.id_column, threshold=args.threshold,
                                keep=args.keep, keep_score_col=args.score_column)
    elif args.method == "spans":
        from .stages.dedup import duplicate_span_scrub

        out = duplicate_span_scrub(ds, text_col=args.text_column,
                                   id_col=args.id_column, n=args.span_n)
    elif args.method == "span-pairs":
        from .stages.dedup import dup_spans

        out = dup_spans(ds, text_col=args.text_column,
                        id_col=args.id_column, window=args.span_n)
    elif args.method == "lines":
        from .stages.dedup import line_dedup

        out = line_dedup(ds, text_col=args.text_column, id_col=args.id_column,
                         sep=args.line_sep, words_per_line=args.words_per_line)
    elif args.method == "incremental-near":
        import os

        from .stages.dedup import (incremental_near_dedup, near_dedup_corpus,
                                   write_band_index)

        if not args.index_dir:
            raise SystemExit("--method incremental-near requires --index-dir")
        if not os.path.exists(os.path.join(args.index_dir, "_meta.json")):
            # founding run: near-dedup the corpus itself (exact-verified,
            # in-version) before indexing — same reasoning as incremental
            kept = near_dedup_corpus(ds, text_col=args.text_column,
                                     id_col=args.id_column,
                                     threshold=args.threshold).materialize()
            n = write_band_index(kept, args.index_dir, id_col=args.id_column,
                                 text_col=args.text_column)
            print(json.dumps({"command": "dedup",
                              "band_index_created": args.index_dir,
                              "n_band_keys": n}))
            out = kept
        else:
            out = incremental_near_dedup(
                ds, args.index_dir, id_col=args.id_column,
                text_col=args.text_column,
                match_bands_min=args.match_bands_min, confirm=args.confirm)
    else:
        raise ValueError(args.method)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "dedup", "method": args.method, "rows": n, "output": args.output}))


def cmd_chunk(args) -> None:
    """Context-window chunking of a list column (or of whitespace words
    derived from --text-column) into seq_len/stride windows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.tokens import chunk_sequences

    ds = _read(args.input)
    list_col = args.list_column
    if list_col is None:
        import polars as pl

        def _split(batch: pa.Table) -> pa.Table:
            ws = pl.DataFrame(
                {"ws": pl.from_arrow(batch[args.text_column].combine_chunks())
                 .str.split(" ")}
            ).to_arrow()["ws"]
            return batch.drop_columns([args.text_column]).append_column("ws", ws)

        ds = ds.map_batches(_split, batch_format="pyarrow")
        list_col = "ws"
    out = chunk_sequences(ds, list_col, seq_len=args.seq_len,
                          stride=args.stride or args.seq_len,
                          min_len=args.min_len)
    if args.list_column is None:

        def _join(batch: pa.Table) -> pa.Table:
            txt = pc.binary_join(batch["ws"], pa.scalar(" ", pa.large_string()))
            return batch.drop_columns(["ws"]).append_column(
                args.text_column, pc.cast(txt, pa.string())
            )

        out = out.map_batches(_join, batch_format="pyarrow")
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "chunk", "seq_len": args.seq_len, "rows": n,
                      "output": args.output}))


def cmd_mix(args) -> None:
    from .stages.sample import temperature_mix

    ds = _read(args.input)
    out = temperature_mix(ds, group_col=args.group_column, id_col=args.id_column,
                          alpha=args.alpha, budget_frac=args.budget)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "mix", "alpha": args.alpha, "rows": n,
                      "output": args.output}))


def cmd_split(args) -> None:
    from .stages.sample import hash_split, stratified_split_exact

    fractions = {}
    for part in args.fractions.split(","):
        name, _, frac = part.partition("=")
        fractions[name.strip()] = float(frac)
    ds = _read(args.input)
    if args.stratified:
        if args.salt:
            raise SystemExit("--salt applies to the hash split only")
        out = stratified_split_exact(ds, args.group_column, args.id_column,
                                     fractions)
    else:
        out = hash_split(ds, args.id_column, fractions, salt=args.salt)
    if args.partition_output:
        out.write_parquet(args.output, partition_cols=["split"])
        n = out.count()
    else:
        n = _write(out, args.output, args.format)
    print(json.dumps({"command": "split", "fractions": fractions, "rows": n,
                      "output": args.output}))


def cmd_search(args) -> None:
    from .stages.text import bm25_topk

    ds = _read(args.input)
    out = bm25_topk(ds, args.terms, text_col=args.text_column,
                    id_col=args.id_column, k=args.k, k1=args.k1, b=args.b)
    import ray.data as rd

    n = _write(rd.from_pandas(out), args.output, args.format)
    print(json.dumps({"command": "search", "terms": args.terms, "rows": n,
                      "output": args.output}))


def cmd_sort(args) -> None:
    from .stages.sort import range_partitioned_sort

    ds = _read(args.input)
    out = range_partitioned_sort(ds, args.by, partitions=args.partitions).materialize()
    out.write_parquet(args.output, partition_cols=["bucket"])
    print(json.dumps({"command": "sort", "by": args.by, "rows": out.count(),
                      "output": args.output}))


def cmd_scrub(args) -> None:
    from .stages.text import PiiScrubStage

    ds = _read(args.input)
    out = ds.map_batches(
        PiiScrubStage(text_col=args.text_column), batch_format="pyarrow"
    )
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "scrub", "rows": n, "output": args.output}))


def cmd_quality(args) -> None:
    """Corpus quality pass: emit per-doc signals, apply the Gopher filter,
    or score LM perplexity — the three quality modes a training-data
    pipeline composes (signals -> filter -> LM buckets)."""
    import pyarrow.compute as pc

    from .stages.text import repetition_batch

    ds = _read(args.input)
    if args.method == "signals":
        out = ds.map_batches(
            lambda b: repetition_batch(b, text_col=args.text_column),
            batch_format="pyarrow",
        )
    elif args.method == "gopher":
        lo, hi = args.min_words, args.max_words
        dup, topw = args.max_dup_ratio, args.max_top_word_frac

        def _filter(batch):
            sig = repetition_batch(batch, text_col=args.text_column)
            keep = pc.and_(
                pc.and_(pc.greater_equal(sig["n_words"], lo),
                        pc.less_equal(sig["n_words"], hi)),
                pc.and_(pc.less(sig["dup_word_ratio"], dup),
                        pc.less(sig["top_word_frac"], topw)),
            )
            return batch.filter(keep)

        out = ds.map_batches(_filter, batch_format="pyarrow")
    else:  # lm / kn
        from .stages.lm import (
            score_kn_perplexity,
            score_perplexity,
            train_bigram_lm,
        )

        uni, bi, total = train_bigram_lm(ds, text_col=args.text_column,
                                         min_count=args.min_count)
        scorer = score_kn_perplexity if args.method == "kn" else score_perplexity
        out = scorer(ds, uni, bi, total, text_col=args.text_column,
                     id_col=args.id_column)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "quality", "method": args.method, "rows": n,
                      "output": args.output}))


def cmd_semantic_dedup(args) -> None:
    from .stages.cluster import kmeans_fit, semantic_dedup_pairs

    ds = _read(args.input)
    cents = kmeans_fit(ds, k=args.clusters, vec_col=args.vector_column,
                       id_col=args.id_column, iters=args.iters)
    pairs = semantic_dedup_pairs(ds, cents, threshold=args.threshold,
                                 vec_col=args.vector_column, id_col=args.id_column)
    n = _write(pairs, args.output, args.format)
    print(json.dumps({"command": "semantic-dedup", "clusters": args.clusters,
                      "pairs": n, "output": args.output}))


def cmd_index(args) -> None:
    """Build a persisted inverted token index, or query one (the lookup
    reads only the md5-bucket partitions the query tokens hash to)."""
    from .stages.textindex import lookup_postings, write_token_index

    if args.lookup:
        if not args.output:
            raise SystemExit("index --lookup requires --output")
        out = lookup_postings(args.index_dir, args.lookup,
                              id_col=args.id_column, partitions=args.partitions)
        n = _write(out, args.output, args.format)
        print(json.dumps({"command": "index", "mode": "lookup",
                          "tokens": args.lookup, "postings": n,
                          "output": args.output}))
    elif args.checkpoint_dir:
        # resumable build: one idempotent task per input fragment, manifest-
        # last lineage; a rerun skips completed fragments
        import glob
        import os

        from .state.checkpoint import CheckpointedIndexBuild

        if not args.input:
            raise SystemExit("index build mode requires --input")
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet"))) or [args.input]
        ck = CheckpointedIndexBuild(args.checkpoint_dir,
                                    text_col=args.text_column,
                                    id_col=args.id_column,
                                    partitions=args.partitions,
                                    index_dir=args.index_dir)
        res = ck.run(paths)
        print(json.dumps({"command": "index", "mode": "checkpointed-build", **res}))
    else:
        if not args.input:
            raise SystemExit("index build mode requires --input")
        ds = _read(args.input, columns=[args.id_column, args.text_column])
        write_token_index(ds, args.index_dir, text_col=args.text_column,
                          id_col=args.id_column, partitions=args.partitions)
        print(json.dumps({"command": "index", "mode": "build",
                          "index_dir": args.index_dir,
                          "partitions": args.partitions}))


def cmd_sample(args) -> None:
    """Deterministic weighted sample (Efraimidis–Spirakis, md5-keyed), or —
    with --per-group — a uniform ≤k-per-group cap (domain balancing)."""
    import ray.data as rd

    from .stages.sample import cap_per_group, weighted_sample_es

    ds = _read(args.input)
    if args.per_group:
        out = cap_per_group(ds, group_col=args.group_column,
                            id_col=args.id_column, k=args.k)
        n = _write(out, args.output, args.format)
        print(json.dumps({"command": "sample", "mode": "cap-per-group",
                          "k": args.k, "rows": n, "output": args.output}))
        return
    if not args.weight_column:
        raise SystemExit("--weight-column is required without --per-group")
    df = weighted_sample_es(ds, id_col=args.id_column,
                            weight_col=args.weight_column, k=args.k)
    n = _write(rd.from_pandas(df), args.output, args.format)
    print(json.dumps({"command": "sample", "k": args.k, "rows": n,
                      "output": args.output}))


def cmd_dsir(args) -> None:
    """DSIR importance selection: fit hashed-n-gram distributions over the
    target and raw corpora, score every raw doc, keep the top-k (rank) or
    a Gumbel resample (stages/dsir.py)."""
    import ray.data as rd

    from .stages.dsir import DsirScoreStage, dsir_fit, dsir_log_ratios, dsir_select

    raw = _read(args.input, columns=[args.id_column, args.text_column])
    target = _read(args.target_input, columns=[args.text_column])
    cq = dsir_fit(raw, args.buckets, text_col=args.text_column)
    cp = dsir_fit(target, args.buckets, text_col=args.text_column)
    lr_fx = dsir_log_ratios(cp, cq)
    scored = raw.map_batches(
        DsirScoreStage(lr_fx, text_col=args.text_column, id_col=args.id_column),
        batch_format="pyarrow",
    )
    df = dsir_select(scored, k=args.k, mode=args.mode, seed=args.seed)
    n = _write(rd.from_pandas(df), args.output, args.format)
    print(json.dumps({"command": "dsir", "mode": args.mode, "k": args.k,
                      "buckets": args.buckets, "rows": n, "output": args.output}))


def cmd_collocate(args) -> None:
    """Top-k collocations by exact integer PMI lift (stages/text.py)."""
    import ray.data as rd

    from .stages.text import collocation_lift

    ds = _read(args.input, columns=[args.text_column])
    df = collocation_lift(ds, text_col=args.text_column,
                          min_count=args.min_count, k=args.k)
    n = _write(rd.from_pandas(df), args.output, args.format)
    print(json.dumps({"command": "collocate", "k": args.k,
                      "min_count": args.min_count, "rows": n,
                      "output": args.output}))


def cmd_lineage(args) -> None:
    """Print a checkpoint directory's per-partition lineage + throughput
    metrics (the manifest-last records every checkpointed stage writes):
    one JSON line per partition manifest plus a rollup."""
    import glob
    import os

    pats = [os.path.join(args.checkpoint_dir, "**", "*.json"),
            os.path.join(args.checkpoint_dir, "*.json")]
    seen = sorted({f for pat in pats for f in glob.glob(pat, recursive=True)
                   if not f.endswith(".tmp")})
    rows = 0
    values = 0
    wall = 0.0
    n = 0
    for f in seen:
        try:
            with open(f) as fh:
                m = json.load(fh)
        except (json.JSONDecodeError, OSError):
            print(json.dumps({"manifest": f, "error": "unreadable"}))
            continue
        if args.verbose:
            print(json.dumps({"manifest": os.path.relpath(f, args.checkpoint_dir), **m}))
        if isinstance(m, dict):
            n += 1
            rows += int(m.get("rows", 0) or 0)
            values += int(m.get("values", m.get("n_values", 0)) or 0)
            wall += float(m.get("wall_sec", 0) or 0)
    print(json.dumps({"command": "lineage", "checkpoint_dir": args.checkpoint_dir,
                      "manifests": n, "rows": rows, "values": values,
                      "wall_sec_total": round(wall, 4)}))


def cmd_link(args) -> None:
    """Raw-string q-gram similarity join (stages/match.py fuzzy_join)."""
    from .stages.match import fuzzy_join

    rc = args.right_column or args.column
    rid = args.right_id_column or args.id_column
    a = _read(args.input, columns=[args.id_column, args.column])
    b = _read(args.right, columns=[rid, rc])
    out = fuzzy_join(a, b, args.column, rc,
                     a_id=args.id_column, b_id=rid,
                     q=args.q, threshold=args.threshold)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "link", "rows": n, "q": args.q,
                      "threshold": args.threshold, "output": args.output}))


def cmd_stats(args) -> None:
    """Exact fixed-point statistics (stages/stats.py): chi-square
    cross-tab or pairwise total-variation distance."""
    ds = _read(args.input)
    if args.mode == "chi2":
        from .stages.stats import crosstab_chi2

        out = crosstab_chi2(ds, args.row_column, args.col_column,
                            scale=args.scale)
    else:
        from .stages.stats import source_tv_distance

        out = source_tv_distance(ds, group_col=args.group_column,
                                 text_col=args.text_column, scale=args.scale)
    n = _write(out, args.output, args.format)
    print(json.dumps({"command": "stats", "mode": args.mode, "rows": n,
                      "scale": args.scale, "output": args.output}))


def cmd_media_dedup(args) -> None:
    """Near-dup pairs over a media payload table: image (DCT pHash +
    banded Hamming), audio (Haitsma-Kalker frame words + array Jaccard),
    or video (per-frame pHash bags + array Jaccard)."""
    import ray.data as rd

    from .stages.dedup import array_jaccard_pairs, simhash_candidates
    from .stages.multimodal import (
        AudioFingerprintStage,
        PerceptualHashStage,
        VideoFingerprintStage,
    )

    ds = _read(args.input, columns=[args.id_column, args.payload_column])
    stage = {
        "image": (PerceptualHashStage, {"backend": args.backend or "bmp"}),
        "audio": (AudioFingerprintStage, {"backend": args.backend or "wav"}),
        "video": (VideoFingerprintStage, {"backend": args.backend or "y4m"}),
    }[args.type]
    cls, kw = stage
    kw.update({"payload_col": args.payload_column, "id_col": args.id_column})
    fps = ds.map_batches(
        cls, fn_constructor_kwargs=kw, batch_format="pyarrow",
        batch_size=64, concurrency=2,
    )
    if args.type == "image":
        pairs = simhash_candidates(
            fps, id_col=args.id_column,
            max_hamming=args.max_hamming, bands=8,
        )
        n = _write(pairs, args.output, args.format)
    else:
        df = array_jaccard_pairs(
            fps.select_columns([args.id_column, "words"]), "words",
            id_col=args.id_column, min_jaccard=args.min_jaccard,
        ).to_pandas()
        n = _write(rd.from_pandas(df), args.output, args.format)
    print(json.dumps({"command": "media-dedup", "type": args.type,
                      "pairs": n, "output": args.output}))


def cmd_sketch_store(args) -> None:
    """Persisted per-key sketch store (state/sketchstore.py): build a
    bucket-partitioned store from a parquet input, refresh it with a new
    corpus version (only the touched buckets are read back and rewritten;
    the result is bit-identical to a from-scratch build over the union),
    or look up per-key estimates with partition-pruned reads."""
    from .sketches import HLLSketch, KMVSketch, ThetaSketch
    from .state.sketchstore import (
        build_sketch_store,
        lookup_sketch_store,
        refresh_sketch_store,
    )

    cls = {"kmv": KMVSketch, "hll": HLLSketch, "theta": ThetaSketch}[args.sketch]
    fac = (lambda: cls(args.param)) if args.param is not None else cls

    if args.mode == "lookup":
        if not args.keys:
            raise SystemExit("--mode lookup requires --keys")
        out = lookup_sketch_store(args.store_dir, args.keys.split(","), cls)
        print(json.dumps({
            "command": "sketch-store", "mode": "lookup", "store": args.store_dir,
            "estimates": {k: round(sk.estimate(), 1)
                          for k, sk in sorted(out.items())},
        }))
        return
    if not args.input:
        raise SystemExit(f"--mode {args.mode} requires --input")
    ds = _read(args.input, columns=[args.key_column, args.value_column])
    if args.mode == "build":
        man = build_sketch_store(ds, fac, args.value_column, args.key_column,
                                 args.store_dir, buckets=args.buckets)
    else:
        man = refresh_sketch_store(ds, fac, args.value_column, args.key_column,
                                   args.store_dir)
    print(json.dumps({
        "command": "sketch-store", "mode": args.mode, "store": args.store_dir,
        "sketch": man["sketch"], "buckets": man["buckets"],
        "keys": sum(b["rows"] for b in man["per_bucket"].values()),
    }))


def cmd_prepare(args) -> None:
    """End-to-end corpus preparation (pipelines/prepare.py): exact dedup ->
    Gopher quality -> n-gram-Jaccard near-dup removal -> decontamination,
    per-stage metrics on stderr-free stdout JSON, optional per-stage
    loser-id checkpointing for resume."""
    from .pipelines.prepare import prepare_corpus

    cols = [args.id_column, args.text_column]
    if args.keep == "best" and args.score_column:
        cols.append(args.score_column)
    docs = _read(args.input, columns=cols)
    evals = (
        _read(args.eval_input, columns=[args.id_column, args.text_column])
        if args.eval_input else None
    )
    if args.keep == "best" and not args.score_column:
        raise SystemExit("--keep best requires --score-column")
    kept, report = prepare_corpus(
        docs, evals, id_col=args.id_column, text_col=args.text_column,
        min_words=args.min_words, max_words=args.max_words,
        shingle_n=args.shingle_n, jaccard_threshold=args.threshold,
        keep=args.keep, keep_score_col=args.score_column,
        contam_n=args.contam_n, checkpoint_dir=args.checkpoint_dir,
        input_tag=args.input,
    )
    n = _write(kept, args.output, args.format)
    print(json.dumps({"command": "prepare", "rows": n, "output": args.output,
                      "stages": report.to_dict(orient="records")}))


def cmd_decontaminate(args) -> None:
    """Train/eval n-gram overlap pairs (benchmark-contamination check)."""
    from .stages.dedup import contamination_pairs

    train = _read(args.input, columns=[args.id_column, args.text_column])
    evals = _read(args.eval_input, columns=[args.id_column, args.text_column])
    pairs = contamination_pairs(
        train, evals, text_col=args.text_column, id_col=args.id_column,
        shingle_n=args.shingle_n,
    )
    n = _write(pairs, args.output, args.format)
    print(json.dumps({"command": "decontaminate", "shingle_n": args.shingle_n,
                      "pairs": n, "output": args.output}))


def cmd_table_profile(args) -> None:
    """One-pass column profiler: counts, nulls, extrema, theta-distinct."""
    ds = _read(args.input, columns=args.columns)
    from .pipelines.table_profile import table_profile

    df = table_profile(ds, args.columns, theta_k=args.theta_k)
    df.to_parquet(args.output) if args.format == "parquet" else df.to_csv(
        args.output, index=False
    )
    print(json.dumps({"command": "table-profile", "columns": args.columns,
                      "rows": len(df), "output": args.output}))


def cmd_generate(args) -> None:
    """Deterministic synthetic entities -> Parquet. With --generator-config,
    a reference-style FakerGeneratorConfig JSON (`pprl_client/model.py:6-20`)
    or GeckoGeneratorConfig JSON (`pprl_client/model.py:23-31`, detected by
    per-generator ``attribute_names`` lists) drives the
    function-name-by-string registry (sources/generate.py); otherwise the
    fixed person schema (sources/corpus.py synth_entities)."""
    if args.generator_config:
        from .sources.generate import gecko_generated_entities, generated_entities, is_gecko_config

        config = json.load(open(args.generator_config))
        ds = gecko_generated_entities(config) if is_gecko_config(config) else generated_entities(config)
    else:
        from .sources.corpus import synth_entities

        ds = synth_entities(args.n, seed=args.seed)
    n = _write(ds, args.output, args.format)
    print(json.dumps({"command": "generate", "rows": n, "output": args.output}))


def cmd_estimate(args) -> None:
    """Reference `pprl estimate` parity: per-attribute (entropy weight,
    average token count) -> WeightedAttributeConfig JSON, after an optional
    transform (default: normalization before, skip empties — the reference
    default, cli.py:372-378)."""
    from .pipelines.estimate import estimate_attribute_weights
    from .stages.mask import transform_entities

    if args.generator_config:
        # reference `pprl estimate faker|gecko CONFIG OUT` flow: generate
        # the estimation corpus from the config instead of reading a table
        # (gecko = frequency-table-driven, reference cli.py:428-495)
        from .sources.generate import gecko_generated_entities, generated_entities, is_gecko_config

        config = json.load(open(args.generator_config))
        ds = gecko_generated_entities(config) if is_gecko_config(config) else generated_entities(config)
    elif args.input:
        ds = _read(args.input)
    else:
        raise SystemExit("estimate requires --input or --generator-config")
    if args.transform_config:
        req = json.load(open(args.transform_config))
        kw = transform_kwargs_from_request(req)
    else:
        kw = dict(global_before=[{"name": "normalization"}], empty_value="skip")
    ds = transform_entities(ds, id_column=args.id_column, **kw)
    configs = estimate_attribute_weights(
        ds, id_column=args.id_column, token_size=args.token_size, padding=args.padding
    )
    with open(args.output, "w") as f:
        json.dump(configs, f, indent=2)
    print(json.dumps({"command": "estimate", "attributes": len(configs), "output": args.output}))


def cmd_checkpointed_profile(args) -> None:
    """Resumable per-partition FUSED profile build (north_rule checkpoint
    path): all five sketch kinds per partition, manifest-last lineage,
    byte-identical resume."""
    import glob

    from .pipelines.profile import default_specs
    from .state.checkpoint import CheckpointedProfileBuild

    paths = sorted(glob.glob(f"{args.input}/*.parquet"))
    build = CheckpointedProfileBuild(args.checkpoint_dir, default_specs(hll_p=args.hll_p))
    done_before = len(build.completed_partitions(paths))
    profile = build.run(paths)
    report = {}
    for (name, key), sk in sorted(profile.items()):
        label = f"{name}[{key}]" if key else name
        if hasattr(sk, "estimate"):
            report[label] = round(sk.estimate(), 2)
        elif hasattr(sk, "quantile"):
            report[label] = round(float(sk.quantile(0.5)), 2)
        elif hasattr(sk, "bits_set"):
            report[label] = sk.bits_set()
        else:
            report[label] = int(sk.total)
    print(json.dumps({
        "command": "checkpointed-profile",
        "partitions": len(paths),
        "resumed": done_before,
        "estimates": report,
    }))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="pprl-ray", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, output=True):
        sp.add_argument("--input", required=True)
        if output:
            sp.add_argument("--output", required=True)
        sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
        sp.add_argument("--id-column", default="id")

    sp = sub.add_parser("transform", help="string-transform entity attributes")
    common(sp)
    sp.add_argument("--config", required=True, help="BaseTransformRequest JSON")
    sp.set_defaults(fn=cmd_transform)

    sp = sub.add_parser("mask", help="encode entities into CLK/RBF/CLKRBF bit vectors")
    common(sp)
    sp.add_argument("--config", required=True, help="BaseMaskRequest JSON")
    sp.add_argument("--checkpoint-dir", default=None,
                    help="resumable partitioned sink: per-input-fragment outputs + manifests")
    sp.set_defaults(fn=cmd_mask)

    sp = sub.add_parser("match", help="match >= 2 bit-vector tables pairwise/crosswise")
    sp.add_argument("--inputs", nargs="+", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--measure", choices=("dice", "cosine", "jaccard"), default="dice")
    sp.add_argument("--threshold", type=float, default=0.8)
    sp.add_argument("--method", choices=("crosswise", "pairwise"), default="crosswise")
    sp.set_defaults(fn=cmd_match)

    sp = sub.add_parser("profile", help="one-pass corpus sketch profile (HLL/CMS/KLL/t-digest/Bloom)")
    sp.add_argument("--input", required=True, help="tokenized-corpus parquet (input_hint schema)")
    sp.add_argument("--output", default=None, help="optional dir for the merged sketch table")
    sp.add_argument("--hll-p", type=int, default=14)
    sp.add_argument("--cms-width", type=int, default=1 << 16)
    sp.add_argument("--cms-depth", type=int, default=5)
    sp.add_argument("--kll-k", type=int, default=200)
    sp.add_argument("--bloom-bits", type=int, default=1 << 20)
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("dedup",
                        help="exact / minhash / simhash / ngram / near / spans "
                             "/ lines / incremental / incremental-near dedup")
    common(sp)
    sp.add_argument("--method",
                    choices=("exact", "minhash", "simhash", "incremental",
                             "ngram", "near", "spans", "span-pairs", "lines",
                             "incremental-near"),
                    default="exact")
    sp.add_argument("--line-sep", default="\n",
                    help="lines: line separator for corpus-wide line dedup")
    sp.add_argument("--words-per-line", type=int, default=None,
                    help="lines: chunk into fixed word windows instead of "
                         "splitting on --line-sep")
    sp.add_argument("--match-bands-min", type=int, default=1,
                    help="incremental-near: LSH bands that must match to drop")
    sp.add_argument("--confirm", choices=("none", "set"), default="none",
                    help="incremental-near: intersect the band gate with the "
                         "exact set-hash tier")
    sp.add_argument("--span-n", type=int, default=50,
                    help="spans / span-pairs: word n-gram window size")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--threshold", type=float, default=0.8)
    sp.add_argument("--max-hamming", type=int, default=3)
    sp.add_argument("--shingle-n", type=int, default=4,
                    help="ngram: word n-gram size for exact Jaccard pairs")
    sp.add_argument("--keep", choices=("min_id", "best"), default="min_id",
                    help="near: survivor per duplicate component")
    sp.add_argument("--score-column", default=None,
                    help="near --keep best: keep the component member "
                         "maximizing this column")
    sp.add_argument("--index-dir", default=None,
                    help="incremental: persistent hash index (created on first run)")
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser("chunk", help="LM context-window chunking (seq_len/stride)")
    common(sp)
    sp.add_argument("--text-column", default="text",
                    help="whitespace-word source when --list-column is unset")
    sp.add_argument("--list-column", default=None,
                    help="chunk an existing list column (e.g. tokens) instead")
    sp.add_argument("--seq-len", type=int, default=2048)
    sp.add_argument("--stride", type=int, default=None,
                    help="window stride (default: seq_len, disjoint windows)")
    sp.add_argument("--min-len", type=int, default=1)
    sp.set_defaults(fn=cmd_chunk)

    sp = sub.add_parser("mix", help="temperature-balanced group mixing (n^alpha)")
    common(sp)
    sp.add_argument("--group-column", default="source")
    sp.add_argument("--alpha", type=float, default=0.5)
    sp.add_argument("--budget", type=float, default=0.5,
                    help="target kept fraction of the corpus")
    sp.set_defaults(fn=cmd_mix)

    sp = sub.add_parser("split", help="deterministic md5 train/val/test split")
    common(sp)
    sp.add_argument("--fractions", default="train=0.9,val=0.05,test=0.05",
                    help='comma list "name=frac,..." summing to 1.0 '
                         "(whole percents)")
    sp.add_argument("--salt", default="", help="rotate assignments without "
                                               "touching ids")
    sp.add_argument("--partition-output", action="store_true",
                    help="write parquet partitioned by split= directories")
    sp.add_argument("--stratified", action="store_true",
                    help="EXACT per-group proportions (distributed order "
                         "statistics) instead of in-expectation hash bands")
    sp.add_argument("--group-column", default="source")
    sp.set_defaults(fn=cmd_split)

    sp = sub.add_parser("search", help="BM25 top-k retrieval for a fixed query")
    common(sp)
    sp.add_argument("--terms", nargs="+", required=True)
    sp.add_argument("--text-column", default="text")
    sp.add_argument("-k", type=int, default=10)
    sp.add_argument("--k1", type=float, default=1.2)
    sp.add_argument("--b", type=float, default=0.75)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("sort", help="KLL range-partitioned global sort to bucketed parquet")
    common(sp)
    sp.add_argument("--by", required=True, help="sort column")
    sp.add_argument("--partitions", type=int, default=None)
    sp.set_defaults(fn=cmd_sort)

    sp = sub.add_parser("scrub", help="PII redaction (emails/phones/IPv4) over a text column")
    common(sp)
    sp.add_argument("--text-column", default="text")
    sp.set_defaults(fn=cmd_scrub)

    sp = sub.add_parser("quality", help="repetition signals / Gopher filter / LM perplexity")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--method", choices=("signals", "gopher", "lm", "kn"),
                    default="signals")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--min-words", type=int, default=30)
    sp.add_argument("--max-words", type=int, default=100_000)
    sp.add_argument("--max-dup-ratio", type=float, default=0.6)
    sp.add_argument("--max-top-word-frac", type=float, default=0.2)
    sp.add_argument("--min-count", type=int, default=1)
    sp.set_defaults(fn=cmd_quality)

    sp = sub.add_parser("semantic-dedup",
                        help="k-means cluster + within-cluster cosine near-dup pairs")
    common(sp)
    sp.add_argument("--vector-column", default="embedding")
    sp.add_argument("--clusters", type=int, default=64)
    sp.add_argument("--iters", type=int, default=10)
    sp.add_argument("--threshold", type=float, default=0.95)
    sp.set_defaults(fn=cmd_semantic_dedup)

    sp = sub.add_parser("index",
                        help="build / query a persisted inverted token index")
    sp.add_argument("--input", default=None,
                    help="documents table (build mode)")
    sp.add_argument("--index-dir", required=True)
    sp.add_argument("--lookup", nargs="+", default=None,
                    help="tokens to look up (omit to build)")
    sp.add_argument("--output", default=None,
                    help="postings output (lookup mode)")
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--checkpoint-dir", default=None,
                    help="resumable build: per-fragment manifests; the index "
                         "lands in <checkpoint-dir>/index")
    sp.set_defaults(fn=cmd_index)

    sp = sub.add_parser("sample",
                        help="deterministic weighted sample without replacement")
    common(sp)
    sp.add_argument("--weight-column", default=None)
    sp.add_argument("-k", type=int, default=100)
    sp.add_argument("--per-group", action="store_true",
                    help="keep <= k rows PER GROUP (uniform by splitmix64 "
                         "rank) instead of a global weighted sample")
    sp.add_argument("--group-column", default="source")
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("dsir",
                        help="DSIR importance selection against a target corpus")
    sp.add_argument("--input", required=True, help="raw corpus to select from")
    sp.add_argument("--target-input", required=True, help="target-distribution corpus")
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--buckets", type=int, default=512)
    sp.add_argument("-k", type=int, default=1000)
    sp.add_argument("--mode", choices=("rank", "gumbel"), default="rank")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_dsir)

    sp = sub.add_parser("lineage",
                        help="print per-partition lineage/throughput manifests "
                             "of a checkpoint dir")
    sp.add_argument("--checkpoint-dir", required=True)
    sp.add_argument("--verbose", action="store_true",
                    help="print every partition manifest, not just the rollup")
    sp.set_defaults(fn=cmd_lineage)

    sp = sub.add_parser("link",
                        help="raw-string q-gram similarity join of two tables")
    common(sp)
    sp.add_argument("--right", required=True, help="right-side input path")
    sp.add_argument("--column", required=True, help="left join string column")
    sp.add_argument("--right-column", default=None,
                    help="right join string column (default: --column)")
    sp.add_argument("--right-id-column", default=None,
                    help="right id column (default: --id-column)")
    sp.add_argument("--q", type=int, default=2, help="q-gram size")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.set_defaults(fn=cmd_link)

    sp = sub.add_parser("stats",
                        help="exact fixed-point stats: chi2 cross-tab / "
                             "total-variation drift")
    common(sp)
    sp.add_argument("--mode", choices=("chi2", "tv"), required=True)
    sp.add_argument("--row-column", default="lang",
                    help="chi2: row category column")
    sp.add_argument("--col-column", default="source",
                    help="chi2: column category column")
    sp.add_argument("--group-column", default="source",
                    help="tv: distribution grouping column")
    sp.add_argument("--text-column", default="text",
                    help="tv: tokenized-by-whitespace text column")
    sp.add_argument("--scale", type=int, default=1_000_000,
                    help="fixed-point output scale")
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("collocate",
                        help="top-k word collocations by exact integer PMI lift")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--min-count", type=int, default=5)
    sp.add_argument("-k", type=int, default=50)
    sp.set_defaults(fn=cmd_collocate)

    sp = sub.add_parser("media-dedup",
                        help="image/audio/video near-dup pairs over payload columns")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--type", choices=("image", "audio", "video"), required=True)
    sp.add_argument("--id-column", default="media_id")
    sp.add_argument("--payload-column", default="payload")
    sp.add_argument("--backend", default=None,
                    help="codec backend (default: the pure-numpy bmp/wav/y4m)")
    sp.add_argument("--max-hamming", type=int, default=8, help="image mode")
    sp.add_argument("--min-jaccard", type=float, default=0.2, help="audio/video modes")
    sp.set_defaults(fn=cmd_media_dedup)

    sp = sub.add_parser("sketch-store",
                        help="build / incrementally refresh / look up a "
                             "persisted per-key sketch store")
    sp.add_argument("--mode", choices=("build", "refresh", "lookup"),
                    required=True)
    sp.add_argument("--store-dir", required=True)
    sp.add_argument("--sketch", choices=("kmv", "hll", "theta"), default="kmv")
    sp.add_argument("--param", type=int, default=None,
                    help="sketch size parameter (kmv/theta k, hll p); "
                         "default: the class default — refresh must match "
                         "the build")
    sp.add_argument("--input", default=None, help="build/refresh: parquet input")
    sp.add_argument("--key-column", default="source")
    sp.add_argument("--value-column", default="doc_id")
    sp.add_argument("--buckets", type=int, default=32, help="build only")
    sp.add_argument("--keys", default=None,
                    help="lookup: comma-separated keys")
    sp.set_defaults(fn=cmd_sketch_store)

    sp = sub.add_parser("prepare",
                        help="exact dedup -> quality -> near-dup -> "
                             "decontaminate, with per-stage metrics")
    sp.add_argument("--input", required=True, help="raw corpus")
    sp.add_argument("--eval-input", default=None,
                    help="eval/benchmark corpus for decontamination "
                         "(stage skipped when omitted)")
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--min-words", type=int, default=30)
    sp.add_argument("--max-words", type=int, default=1000)
    sp.add_argument("--shingle-n", type=int, default=4,
                    help="near-dup word n-gram size")
    sp.add_argument("--threshold", type=float, default=0.5,
                    help="near-dup Jaccard threshold")
    sp.add_argument("--keep", choices=("min_id", "best"), default="min_id",
                    help="near-dup survivor policy")
    sp.add_argument("--score-column", default=None,
                    help="--keep best: column whose max wins")
    sp.add_argument("--contam-n", type=int, default=5,
                    help="decontamination word n-gram size")
    sp.add_argument("--checkpoint-dir", default=None,
                    help="persist per-stage loser ids; resume skips "
                         "stages whose manifest matches")
    sp.set_defaults(fn=cmd_prepare)

    sp = sub.add_parser("decontaminate",
                        help="train/eval word n-gram overlap pairs")
    sp.add_argument("--input", required=True, help="train corpus")
    sp.add_argument("--eval-input", required=True, help="eval/benchmark corpus")
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--text-column", default="text")
    sp.add_argument("--shingle-n", type=int, default=8)
    sp.set_defaults(fn=cmd_decontaminate)

    sp = sub.add_parser("table-profile",
                        help="one-pass per-column stats (nulls/extrema/distinct)")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.add_argument("--columns", nargs="+", required=True)
    sp.add_argument("--theta-k", type=int, default=65536)
    sp.set_defaults(fn=cmd_table_profile)

    sp = sub.add_parser("generate", help="deterministic synthetic entities")
    sp.add_argument("-n", type=int, default=1000)
    sp.add_argument("--seed", type=int, default=727)
    sp.add_argument("--generator-config", default=None,
                    help="FakerGeneratorConfig JSON (function-name-by-string generators)")
    sp.add_argument("--output", required=True)
    sp.add_argument("--format", choices=("parquet", "csv", "jsonl"), default="parquet")
    sp.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("estimate", help="per-attribute weight estimation (entropy + avg tokens)")
    sp.add_argument("--input", default=None)
    sp.add_argument("--generator-config", default=None,
                    help="generate the estimation corpus from a FakerGeneratorConfig JSON")
    sp.add_argument("--output", required=True, help="WeightedAttributeConfig JSON file")
    sp.add_argument("--id-column", default="id")
    sp.add_argument("--transform-config", default=None, help="BaseTransformRequest JSON")
    sp.add_argument("--token-size", type=int, default=2)
    sp.add_argument("--padding", default="_")
    sp.set_defaults(fn=cmd_estimate)

    sp = sub.add_parser("checkpointed-profile", help="resumable per-partition HLL build")
    sp.add_argument("--input", required=True)
    sp.add_argument("--checkpoint-dir", required=True)
    sp.add_argument("--hll-p", type=int, default=14)
    sp.set_defaults(fn=cmd_checkpointed_profile)

    args = p.parse_args(argv)
    owns_session = _init_ray()
    try:
        args.fn(args)
    finally:
        if owns_session:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    main()
