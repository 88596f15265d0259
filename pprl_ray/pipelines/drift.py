"""Corpus drift report: sketch-diff two corpus versions per group key.

The canonical "did my ingest change the data?" pipeline over two Parquet
corpora (v1, v2): per source, compare

- document counts and length moments (exact — MomentsSketch integer sums;
  the mean shift is an exact fixed-point integer, no float-sum hazards),
- vocabulary overlap via coordinated KMV bottom-k sketches over
  md5-hashed words (EXACT set intersection/union below sketch capacity;
  above it, the coordinated-sample estimate — the same fixed hash on both
  sides is what makes the two sketches comparable at all).

Each side is two streaming scans (flat word-id rows → per-key KMV; n_tok
→ per-key moments) through ``sketch_by_key``'s combiner tree; only sketch
blobs shuffle, and the report is one row per group key. At 10^12-sequence
scale the four scans can be fused into two (emit both partials from one
pass) — kept separate here for clarity since the scan is column-pruned
and cheap relative to the sketch work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["corpus_drift"]

_FX = 1 << 20


def _word_id_rows(ds, text_col: str, key_col: str):
    """(key, wid:int64) flat word-occurrence rows; wid = first 8 md5 hex
    chars of the word as an integer (the stock SQL-replicable hash)."""

    def _flat(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.digest import md5_bucket32

        lists = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.values.slice(offsets[0], offsets[-1] - offsets[0])
        n_words = (offsets[1:] - offsets[:-1])
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        wid = md5_bucket32(dic.dictionary, 1 << 32)[codes]
        keys = batch[key_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(batch.num_rows), n_words))
        )
        return pa.table({key_col: keys, "wid": pa.array(wid, pa.int64())})

    return ds.map_batches(_flat, batch_format="pyarrow")


def _ntok_rows(ds, text_col: str, key_col: str):
    def _n(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.list_value_length(pc.split_pattern(batch[text_col], " "))
        return pa.table(
            {key_col: batch[key_col], "n_tok": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(_n, batch_format="pyarrow")


def _side_sketches(ds, text_col: str, key_col: str, kmv_k: int):
    from ..sketches import KMVSketch, MomentsSketch
    from ..state.aggregate import finalize_sketches, sketch_by_key

    vocab = finalize_sketches(
        sketch_by_key(
            _word_id_rows(ds, text_col, key_col), lambda: KMVSketch(kmv_k),
            "wid", key_col,
        ),
        KMVSketch,
    )
    moments = finalize_sketches(
        sketch_by_key(
            _ntok_rows(ds, text_col, key_col), MomentsSketch, "n_tok", key_col
        ),
        MomentsSketch,
    )
    return vocab, moments


def _signed_floordiv(num: int, den: int) -> int:
    """floor(|num|/den) with the sign re-applied — identical in Python and
    DuckDB (// floors toward -inf in Python but truncates in some SQL
    engines; sign-splitting sidesteps the disagreement)."""
    mag = abs(num) // den
    return mag if num >= 0 else -mag


def corpus_drift(a_ds, b_ds, text_col: str = "text", key_col: str = "source",
                 kmv_k: int = 4096):
    """One report row per key: doc counts, exact fixed-point mean-length
    shift, and vocabulary intersection/union/Jaccard (exact below
    ``kmv_k`` distinct words per key; coordinated-sample estimate above)."""
    import pandas as pd

    va, ma = _side_sketches(a_ds, text_col, key_col, kmv_k)
    vb, mb = _side_sketches(b_ds, text_col, key_col, kmv_k)

    rows = []
    for key in sorted(set(va) | set(vb)):
        ska, skb = va.get(key), vb.get(key)
        moa, mob = ma.get(key), mb.get(key)
        n_a = moa.n if moa else 0
        n_b = mob.n if mob else 0
        if ska is not None and skb is not None:
            union = np.union1d(ska.hashes, skb.hashes)[: ska.k]
            both = np.intersect1d(ska.hashes, skb.hashes, assume_unique=True)
            inter = int(np.isin(union, both, assume_unique=True).sum())
            u_cnt = int(len(union))
        else:
            inter, u_cnt = 0, int(len((ska or skb).hashes))
        if n_a and n_b:
            mean_delta_fx = _signed_floordiv(
                (mob.s1 * n_a - moa.s1 * n_b) * _FX, n_a * n_b
            )
        else:
            mean_delta_fx = 0
        rows.append(
            {
                key_col: key,
                "n_docs_a": np.int64(n_a),
                "n_docs_b": np.int64(n_b),
                "vocab_inter": np.int64(inter),
                "vocab_union": np.int64(u_cnt),
                "vocab_jaccard_fx": np.int64((inter * _FX) // u_cnt if u_cnt else 0),
                "mean_ntok_delta_fx": np.int64(mean_delta_fx),
            }
        )
    return pd.DataFrame(rows)
