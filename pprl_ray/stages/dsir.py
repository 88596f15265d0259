"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) over hashed n-gram features, Ray-Data-native.

Pipeline shape (one fit pass + one scoring pass, both streaming):

1. FIT: hash every unigram and space-joined bigram of the target set and of
   the raw corpus into ``buckets`` md5 buckets and count occurrences per
   bucket — a :class:`~pprl_ray.sketches.histogram.HistogramSketch`
   ``(0, B, B)`` per-block partial (identity binning → EXACT counts,
   counter-add merge), reduced through ``sketch_by_key``'s combiner tree.
   The corpus text never shuffles; only B-long int64 vectors move.
2. MODEL: the importance log-ratio per bucket, add-1 smoothed,
   ``lr = ln((cp_b+1)/(Tp+B)) − ln((cq_b+1)/(Tq+B))``, quantised to int64
   fixed-point ``lr_fx = floor(lr · 2^20)`` on the driver (B values).
3. SCORE: an actor-pool ``map_batches`` stage with the ``lr_fx`` table
   built once per actor (broadcast-once model state). A document's
   importance log-weight is the SUM of ``lr_fx`` over its feature
   occurrences — pure int64 accumulation, so the distributed result is
   bit-identical to single-machine and the whole scoring pass is
   replicable in SQL (md5 bucketing + integer sum; the fitted ``lr_fx``
   table rides along as a pinned model, exactly like a trained
   classifier's weights).
4. SELECT: ``mode="rank"`` takes the top-k documents by
   ``(score_fx DESC, doc_id ASC)`` — deterministic, SQL-oracled;
   ``mode="gumbel"`` adds doc-seeded Gumbel noise to the log-weights
   (the paper's sampling-without-replacement semantics), deterministic
   given ``seed`` but float-ordered, so it is pytest-gated instead.

At 100 TB: the fit reduces to 2·B int64s regardless of corpus size, the
model broadcast is ``ray.put`` once per actor, scoring is embarrassingly
parallel, and the top-k select ships k rows per block to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "BucketizeStage",
    "DsirScoreStage",
    "dsir_fit",
    "dsir_log_ratios",
    "dsir_select",
]

_FX_SCALE = 1 << 20


def _feature_buckets(texts: pa.Array, buckets: int):
    """Per-occurrence md5 bucket ids of unigram + bigram features, plus the
    per-document feature counts. md5 is computed per DISTINCT feature in
    the batch (dictionary-encode first), not per occurrence."""
    from ..functions.digest import md5_bucket32

    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.values.slice(offsets[0], offsets[-1] - offsets[0])
    off0 = offsets - offsets[0]
    n_words = off0[1:] - off0[:-1]

    dic = flat.dictionary_encode()
    uni_codes = dic.indices.to_numpy(zero_copy_only=False)
    uni_buckets = md5_bucket32(dic.dictionary, buckets)
    occ_uni = uni_buckets[uni_codes]

    # bigrams: adjacent word pairs that do not cross a document boundary
    n_flat = len(flat)
    if n_flat >= 2:
        pair_ok = np.ones(n_flat - 1, dtype=bool)
        pair_ok[off0[1:-1] - 1] = False  # last word of each doc has no successor
        bi = pc.binary_join_element_wise(
            flat.slice(0, n_flat - 1), flat.slice(1, n_flat - 1), " "
        )
        bi = bi.filter(pa.array(pair_ok))
        bdic = bi.dictionary_encode()
        bi_codes = bdic.indices.to_numpy(zero_copy_only=False)
        bi_buckets = md5_bucket32(bdic.dictionary, buckets)
        occ_bi = bi_buckets[bi_codes]
        n_bi = np.maximum(n_words - 1, 0)
        bi_doc = np.repeat(np.arange(len(n_words)), n_bi)
    else:
        occ_bi = np.empty(0, dtype=np.int64)
        bi_doc = np.empty(0, dtype=np.int64)
        n_bi = np.zeros(len(n_words), dtype=np.int64)

    uni_doc = np.repeat(np.arange(len(n_words)), n_words)
    return occ_uni, uni_doc, occ_bi, bi_doc, n_words + n_bi


class BucketizeStage:
    """documents batch -> flat {bucket:int32} table of feature occurrences
    (the fit pass input for ``sketch_by_key`` + ``HistogramSketch``)."""

    def __init__(self, buckets: int = 512, text_col: str = "text",
                 key_col: str | None = None):
        self.buckets = int(buckets)
        self.text_col = text_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        occ_uni, uni_doc, occ_bi, bi_doc, _ = _feature_buckets(
            batch[self.text_col].combine_chunks(), self.buckets
        )
        all_occ = np.concatenate([occ_uni, occ_bi])
        cols = {"bucket": pa.array(all_occ.astype(np.int32), pa.int32())}
        if self.key_col is not None:
            keys = batch[self.key_col].combine_chunks()
            occ_doc = np.concatenate([uni_doc, bi_doc])
            cols[self.key_col] = keys.take(pa.array(occ_doc))
        return pa.table(cols)


def dsir_fit(ds, buckets: int = 512, text_col: str = "text",
             key_col: str | None = None):
    """One streaming pass -> exact per-bucket feature counts.

    ``key_col=None``: int64[B] global counts. With a key column: {key ->
    int64[B]} — one scan fits target and raw distributions together when
    the target set is a key value (e.g. a source)."""
    from ..sketches import HistogramSketch
    from ..state.aggregate import finalize_sketches, sketch_by_key

    flat = ds.map_batches(
        BucketizeStage(buckets, text_col, key_col), batch_format="pyarrow"
    )
    merged = sketch_by_key(
        flat, lambda: HistogramSketch(0, buckets, buckets), "bucket", key_col
    )
    sketches = finalize_sketches(merged, HistogramSketch)
    if key_col is None:
        return sketches[""].bin_counts().astype(np.int64)
    return {k: sk.bin_counts().astype(np.int64) for k, sk in sketches.items()}


def dsir_log_ratios(cp: np.ndarray, cq: np.ndarray, scale: int = _FX_SCALE) -> np.ndarray:
    """Add-1-smoothed importance log-ratios, int64 fixed-point.

    ``floor((ln(cp_b+1) − ln(Tp+B) − ln(cq_b+1) + ln(Tq+B)) · scale)`` —
    the ln() runs once per bucket on the driver; everything downstream is
    integer, so scoring is bit-reproducible and SQL-replicable."""
    B = len(cp)
    assert len(cq) == B
    tp, tq = float(cp.sum() + B), float(cq.sum() + B)
    lr = np.log(cp + 1.0) - np.log(tp) - np.log(cq + 1.0) + np.log(tq)
    return np.floor(lr * scale).astype(np.int64)


class DsirScoreStage:
    """Scoring pass: per-document importance log-weight as exact int64
    ``score_fx = Σ lr_fx[bucket(feature occurrence)]``. The model table is
    held per actor (``__init__``), never re-shipped per batch."""

    def __init__(self, lr_fx: np.ndarray, text_col: str = "text", id_col: str = "doc_id"):
        self.lr_fx = np.ascontiguousarray(lr_fx, dtype=np.int64)
        self.buckets = len(self.lr_fx)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        occ_uni, uni_doc, occ_bi, bi_doc, n_feat = _feature_buckets(
            batch[self.text_col].combine_chunks(), self.buckets
        )
        n_docs = batch.num_rows
        score_fx = np.zeros(n_docs, dtype=np.int64)
        np.add.at(score_fx, uni_doc, self.lr_fx[occ_uni])
        if len(occ_bi):
            np.add.at(score_fx, bi_doc, self.lr_fx[occ_bi])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_feat": pa.array(n_feat.astype(np.int64), pa.int64()),
                "score_fx": pa.array(score_fx, pa.int64()),
                "logw": pa.array(score_fx.astype(np.float64) / _FX_SCALE, pa.float64()),
            }
        )


def dsir_select(scored_ds, k: int, mode: str = "rank", seed: int = 0):
    """Select k documents by importance weight.

    ``rank``: deterministic top-k by ``(score_fx DESC, doc_id ASC)`` —
    per-block local top-k, then one driver merge of k rows per block.
    ``gumbel``: importance RESAMPLING without replacement via the
    Gumbel-top-k trick — key = logw + Gumbel(u) with u derived from
    md5(doc_id) (deterministic given ``seed``, float-ordered)."""
    import pandas as pd

    from ..functions.digest import md5_bucket32

    def _local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        fx = batch["score_fx"].to_numpy(zero_copy_only=False)
        if mode == "rank":
            key = fx.astype(np.float64)
        elif mode == "gumbel":
            u31 = md5_bucket32(
                [f"{seed}:{d}" for d in ids], 1 << 31
            ).astype(np.float64)
            u = (u31 + 0.5) / float(1 << 31)  # (0,1), never 0 or 1
            key = fx.astype(np.float64) / _FX_SCALE - np.log(-np.log(u))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        order = np.lexsort((ids, -key))[:k]  # (key desc, doc_id asc)
        return batch.take(pa.array(order))

    parts = scored_ds.map_batches(_local_topk, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    if mode == "gumbel":
        u31 = md5_bucket32(
            [f"{seed}:{d}" for d in df["doc_id"]], 1 << 31
        ).astype(np.float64)
        u = (u31 + 0.5) / float(1 << 31)
        df["_key"] = df["score_fx"].to_numpy().astype(np.float64) / _FX_SCALE - np.log(
            -np.log(u)
        )
    else:
        df["_key"] = df["score_fx"].astype(np.float64)
    df = df.sort_values(["_key", "doc_id"], ascending=[False, True], kind="mergesort")
    return df.head(k).drop(columns="_key").reset_index(drop=True)
