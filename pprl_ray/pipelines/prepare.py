"""End-to-end training-corpus preparation: the canonical raw-crawl ->
training-ready composition, built from the engine's existing stages:

1. **exact dedup** — keep the min-id copy per distinct content
   (the ``stages/dedup.exact_dup_losers`` plan; only (hash128, id) rows
   shuffle);
2. **quality filter** — Gopher-style repetition rules (Rae et al. 2021,
   Appendix A): word-count band, duplicate-word ratio, top-word share
   (``stages/text.repetition_batch``; streaming, no shuffle). Stages 1+2
   FUSE into a single corpus scan: one pass emits the slim
   (id, hash128, bad-quality) table, stage 2's losers are the bad ids
   among stage 1's survivors (quality signals are per-doc, so the
   reordering is equivalence-preserving);
3. **near-dup removal** — exact word n-gram Jaccard pairs
   (``stages/dedup.ngram_jaccard_pairs``) -> connected components -> one
   survivor per component under the ``keep`` policy ("best" keeps the
   highest-``keep_score_col`` member, production's
   keep-the-highest-quality-copy rule);
4. **decontamination** — drop every surviving train doc that shares a
   word ``contam_n``-gram with the eval corpus
   (``stages/dedup.contamination_pairs``, the GPT-3/C4-appendix recipe).

Scale shape: the corpus text NEVER shuffles and is never materialized
between stages. Each stage computes only a slim LOSER-ID Dataset over the
current survivor view; survivors are the original stream behind an
accumulated anti-filter (broadcast id set under ``loser_broadcast_max``,
co-partitioned left-anti bucket join above it —
``stages/dedup.anti_filter_ids``). Stage N's scan re-applies the earlier
cheap anti-filters instead of writing an intermediate corpus — at 100 TB,
re-scanning through a Bloom-cheap filter beats rewriting the corpus three
times.

Metrics + lineage: the report records per stage docs_in / docs_out /
dropped and wall seconds. With ``checkpoint_dir`` each stage's loser ids
persist under ``<dir>/<stage>/`` with a manifest (written LAST, the
state/checkpoint.py convention) pinning the input tag, the stage
parameters and the loser count — a resumed run skips every stage whose
manifest matches and recomputes only the rest, the per-stage-resumable
contract the north rule asks for.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["prepare_corpus"]


def _load_or_compute_losers(checkpoint_dir: str | None, stage: str,
                            input_tag: str, params: dict[str, Any],
                            id_col: str, compute):
    """Per-stage loser-id checkpoint: reuse the persisted ids when the
    manifest matches (input tag + parameters), else compute, persist
    (ids first, manifest LAST) and return. Returns a materialized
    Dataset of loser ids."""
    import ray.data as rd

    if checkpoint_dir is None:
        return compute().materialize()

    out = os.path.join(checkpoint_dir, stage)
    man_path = os.path.join(out, "_manifest.json")
    lineage = {"input_tag": input_tag, "params": params}
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if all(man.get(k) == v for k, v in lineage.items()):
            if man["n_losers"] == 0:
                return rd.from_arrow(
                    pa.table({id_col: pa.array([], pa.int64())})
                )
            return rd.read_parquet(os.path.join(out, "ids")).materialize()

    losers = compute().materialize()
    n = losers.count()
    ids_dir = os.path.join(out, "ids")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    if n > 0:
        losers.write_parquet(ids_dir)
    with open(man_path, "w") as f:
        json.dump({**lineage, "stage": stage, "n_losers": int(n)}, f, indent=1)
    return losers


def prepare_corpus(docs, eval_ds=None, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 30, max_words: int = 1000,
                   dup_word_max: float = 0.6, top_word_max: float = 0.2,
                   shingle_n: int = 4, jaccard_threshold: float = 0.5,
                   keep: str = "best", keep_score_col: str | None = "n_chars",
                   contam_n: int = 5,
                   partitions: int | None = None,
                   loser_broadcast_max: int = 5_000_000,
                   checkpoint_dir: str | None = None,
                   input_tag: str = "corpus"):
    """Run the four-stage preparation over ``docs`` and return
    ``(survivors_ds, report_df)``.

    ``docs`` must carry ``id_col``, ``text_col`` and (for
    ``keep="best"``) ``keep_score_col``. ``eval_ds`` enables the
    decontamination stage (skipped when None, reported with 0 drops).
    The report has one row per stage: ``(stage_idx, stage, docs_in,
    docs_out, dropped, wall_s)`` — everything except ``wall_s`` is a
    deterministic pure function of the inputs (driver-oracle-able)."""
    from ..stages.dedup import (
        anti_filter_ids,
        contamination_pairs,
        content_hash128,
        near_dup_losers,
        ngram_jaccard_pairs,
    )
    from ..stages.partitioning import auto_partitions, compact_blocks
    from ..stages.text import repetition_batch

    surv = docs
    n_curr = docs.count()
    report: list[dict[str, Any]] = []
    hash_parts = partitions if partitions is not None else auto_partitions(docs)

    def _run_stage(idx: int, name: str, params: dict[str, Any], compute):
        nonlocal surv, n_curr
        t0 = time.perf_counter()
        losers = _load_or_compute_losers(
            checkpoint_dir, name, input_tag, params, id_col, compute
        )
        surv_next, n_lost = anti_filter_ids(
            surv, losers, id_col, loser_broadcast_max, partitions
        )
        report.append(
            {
                "stage_idx": idx,
                "stage": name,
                "docs_in": n_curr,
                "docs_out": n_curr - n_lost,
                "dropped": n_lost,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
        surv = surv_next
        n_curr -= n_lost
        return losers

    def _bad_quality(batch: pa.Table) -> pa.ChunkedArray:
        """Gopher failure mask for one batch (pure per-doc signals)."""
        sig = repetition_batch(batch, text_col)
        return pc.invert(
            pc.and_(
                pc.and_(
                    pc.greater_equal(sig["n_words"], min_words),
                    pc.less_equal(sig["n_words"], max_words),
                ),
                pc.and_(
                    pc.less(sig["dup_word_ratio"], dup_word_max),
                    pc.less(sig["top_word_frac"], top_word_max),
                ),
            )
        )

    # Stages 1+2 FUSE into one corpus scan: the exact-dedup content hash
    # and the Gopher quality mask are both pure per-batch functions of
    # the text, so one pass emits the slim (id, h1, h2, bad) table. The
    # quality signals are per-doc, so computing them before the dedup
    # anti-filter is equivalence-preserving: stage-2 losers = bad ids
    # minus stage-1 losers. `shared` carries the fused scan's products
    # across the two _load_or_compute_losers calls; when stage 1 is
    # satisfied from its checkpoint the scan never ran, and stage 2
    # falls back to its own (survivor-scoped) quality pass.
    shared: dict[str, Any] = {}

    def _stage1_losers():
        def _slim(batch: pa.Table) -> pa.Table:
            h1, h2 = content_hash128(batch, text_col)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "h1": pa.array(h1.astype(np.int64), pa.int64()),
                    "h2": pa.array(h2.astype(np.int64), pa.int64()),
                    "part": pa.array((h1 % np.uint64(hash_parts)).astype(np.int32)),
                    "bad": _bad_quality(batch),
                }
            )

        slim = compact_blocks(
            surv.map_batches(_slim, batch_format="pyarrow").materialize()
        )
        shared["bad_ids"] = slim.map_batches(
            lambda t: t.filter(t["bad"]).select([id_col]),
            batch_format="pyarrow",
        ).materialize()

        def _losers(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(id_col)
            dup = g.duplicated(subset=["h1", "h2"], keep="first")
            return g.loc[dup, [id_col]]

        return slim.groupby("part").map_groups(_losers, batch_format="pandas")

    stage1_losers = _run_stage(1, "exact_dedup", {}, _stage1_losers)

    def _quality_losers():
        if "bad_ids" in shared:  # fused scan ran: restrict to survivors
            kept, _ = anti_filter_ids(
                shared["bad_ids"], stage1_losers, id_col,
                loser_broadcast_max, partitions,
            )
            return kept
        # stage 1 came from its checkpoint — scan the current survivors
        return surv.map_batches(
            lambda batch: pa.table(
                {id_col: batch[id_col].filter(_bad_quality(batch))}
            ),
            batch_format="pyarrow",
        )

    _run_stage(
        2, "quality",
        {"min_words": min_words, "max_words": max_words,
         "dup_word_max": dup_word_max, "top_word_max": top_word_max},
        _quality_losers,
    )

    def _neardup_losers():
        pairs = ngram_jaccard_pairs(
            surv, text_col, id_col, shingle_n=shingle_n,
            threshold=jaccard_threshold, partitions=partitions,
        ).map_batches(
            lambda b: pa.table(
                {
                    "id_a": pc.cast(b["doc_a"], pa.int64()),
                    "id_b": pc.cast(b["doc_b"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        return near_dup_losers(
            surv, pairs=pairs, id_col=id_col, partitions=partitions,
            keep=keep, keep_score_col=keep_score_col,
            loser_broadcast_max=loser_broadcast_max,
        )

    _run_stage(
        3, "near_dedup",
        {"shingle_n": shingle_n, "jaccard_threshold": jaccard_threshold,
         "keep": keep, "keep_score_col": keep_score_col},
        _neardup_losers,
    )

    if eval_ds is not None:
        def _contam_losers():
            pairs = contamination_pairs(
                surv, eval_ds, text_col, id_col, shingle_n=contam_n,
                partitions=partitions,
            )
            # a train doc contaminated by several eval docs appears once
            # per pair: per-batch distinct, then one slim grouped first so
            # the loser count equals dropped docs
            ids = pairs.map_batches(
                lambda b: pa.table({id_col: pc.unique(b["train_id"])}),
                batch_format="pyarrow",
            )
            return ids.groupby(id_col).map_groups(
                lambda g: g.head(1), batch_format="pandas"
            )

        _run_stage(4, "decontaminate", {"contam_n": contam_n}, _contam_losers)
    else:
        report.append(
            {
                "stage_idx": 4, "stage": "decontaminate",
                "docs_in": n_curr, "docs_out": n_curr, "dropped": 0,
                "wall_s": 0.0,
            }
        )

    return surv, pd.DataFrame(report)
