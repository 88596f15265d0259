"""Corpus drift report: sketch-diff two corpus versions per group key.

The canonical "did my ingest change the data?" pipeline over two Parquet
corpora (v1, v2): per source, compare

- document counts and length moments (exact — MomentsSketch integer sums;
  the mean shift is an exact fixed-point integer, no float-sum hazards),
- vocabulary overlap via coordinated KMV bottom-k sketches over
  md5-hashed words (EXACT set intersection/union below sketch capacity;
  above it, the coordinated-sample estimate — the same fixed hash on both
  sides is what makes the two sketches comparable at all).

Each side is ONE fused streaming scan (pipelines/profile.py): a prep map
derives the word-id list and n_tok from a single split, then KMV and
moments partials ride the same corpus_profile pass — only tiny sketch
blobs move through the combiner tree, and the report is one row per
group key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["corpus_drift"]

_FX = 1 << 20


def _wid_ntok(ds, text_col: str, key_col: str):
    """Per doc: wid list<int64> (word-id = first 8 md5 hex chars of the
    word as an integer — the stock SQL-replicable hash) + n_tok. One
    split_pattern serves both derived columns."""

    def _prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.digest import md5_bucket32

        lists = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.values.slice(offsets[0], offsets[-1] - offsets[0])
        n_words = offsets[1:] - offsets[:-1]
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        wid = md5_bucket32(dic.dictionary, 1 << 32)[codes]
        wid_list = pa.ListArray.from_arrays(
            pa.array(offsets - offsets[0], pa.int32()),
            pa.array(wid, pa.int64()),
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "wid": wid_list,
                "n_tok": pa.array(n_words, pa.int64()),
            }
        )

    return ds.map_batches(_prep, batch_format="pyarrow")


def _side_sketches(ds, text_col: str, key_col: str, kmv_k: int):
    """ONE fused scan per corpus version: the KMV vocabulary sketch and the
    length moments ride the same corpus_profile pass (shared flatten +
    key-encode; only tiny partial rows move)."""
    from ..sketches import KMVSketch, MomentsSketch
    from .profile import ProfileSpec, corpus_profile, finalize_profile

    specs = [
        ProfileSpec("vocab", "kmv", lambda: KMVSketch(kmv_k), "wid", key_col),
        ProfileSpec("moments", "moments", MomentsSketch, "n_tok", key_col),
    ]
    fused = finalize_profile(
        corpus_profile(_wid_ntok(ds, text_col, key_col), specs), specs
    )
    vocab = {k: sk for (name, k), sk in fused.items() if name == "vocab"}
    moments = {k: sk for (name, k), sk in fused.items() if name == "moments"}
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
