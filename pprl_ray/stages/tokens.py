"""Token-array operators for LM training pipelines: context-window
chunking, vocabulary truncation, and n-gram (bigram) counting — the three
preprocessing steps between a tokenized corpus (BASELINE ``input_hint``
schema, ``tokens:list<int32>``) and an actual training run.

All three operate on ANY Arrow list column (int32 token ids or word
strings — the oracle queries use word lists so DuckDB can replicate the
semantics exactly). All hot paths are offsets-math over the flat value
buffer — zero per-row Python.

Scale shapes:
- :func:`chunk_sequences` is embarrassingly parallel (per-batch, no
  shuffle); output rows ≈ total_tokens/stride regardless of document
  skew, so block sizes stay balanced even when one doc is 1000× longer.
- :func:`top_k_tokens` / :func:`bigram_counts` shuffle only slim
  ``(token, partial_count)`` rows after a map-side combine; since each
  distinct token lives wholly in one hash partition, the global top-k is
  exactly the top-k of the union of per-partition top-k's — the driver
  merges ``partitions × k`` rows, never the vocabulary.
- :func:`vocab_prune` broadcasts the kept vocabulary (bounded at k
  entries by construction) and remaps each batch locally — corpus never
  shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_sequences", "top_k_tokens", "vocab_prune", "bigram_counts"]


def _list_view(col: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(absolute offsets, flat values) of a list/large_list array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy().astype(np.int64)
    return offs, col.values


def chunk_sequences(ds, list_col: str = "tokens", seq_len: int = 2048,
                    stride: int | None = None, min_len: int = 1,
                    chunk_col: str | None = None):
    """Split each row's token list into fixed-length context windows —
    the standard LM-training chunking step (window starts at
    ``0, stride, 2·stride, …`` while < len; window ``i`` covers
    ``[i·stride, i·stride + seq_len)`` clipped to the row; windows
    shorter than ``min_len`` are dropped).

    ``stride < seq_len`` gives overlapping windows (sliding-window
    perplexity eval); ``stride == seq_len`` (default) gives disjoint
    packing. Emits one row per chunk: all non-list input columns
    replicated, plus ``chunk_idx:int64``, the chunked list column
    (named ``chunk_col`` or ``{list_col}``), and ``n_chunk_tok:int64``.

    Per batch this is five numpy index computations and two ``pc.take``
    gathers over the flat value buffer — no per-row Python, no shuffle.
    """
    stride = stride or seq_len
    if stride <= 0 or seq_len <= 0:
        raise ValueError("seq_len and stride must be positive")
    out_name = chunk_col or list_col

    def _chunk(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        offs, values = _list_view(col)
        lo, hi = offs[:-1], offs[1:]
        lens = hi - lo
        n_rows = len(lens)
        n_chunks = np.where(lens > 0, (np.maximum(lens - 1, 0) // stride) + 1, 0)
        row_of = np.repeat(np.arange(n_rows), n_chunks)
        chunk_base = np.concatenate([[0], np.cumsum(n_chunks)])
        cidx = np.arange(int(n_chunks.sum()), dtype=np.int64) - chunk_base[row_of]
        starts = cidx * stride
        clen = np.minimum(seq_len, lens[row_of] - starts)
        keep = clen >= min_len
        row_of, cidx, starts, clen = row_of[keep], cidx[keep], starts[keep], clen[keep]

        out_off = np.concatenate([[0], np.cumsum(clen)])
        total = int(out_off[-1])
        chunk_of = np.repeat(np.arange(len(clen)), clen)
        pos = np.arange(total, dtype=np.int64) - out_off[chunk_of]
        idx = lo[row_of][chunk_of] + starts[chunk_of] + pos
        flat = values.take(pa.array(idx, pa.int64())) if total else values.slice(0, 0)
        chunks = pa.ListArray.from_arrays(pa.array(out_off, pa.int32())
                                          if total < 2**31 else pa.array(out_off),
                                          flat)
        cols = {}
        take_idx = pa.array(row_of, pa.int64())
        for name in batch.column_names:
            if name != list_col:
                cols[name] = pc.take(batch[name], take_idx)
        cols["chunk_idx"] = pa.array(cidx, pa.int64())
        cols[out_name] = chunks
        cols["n_chunk_tok"] = pa.array(clen.astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(_chunk, batch_format="pyarrow")


def _partial_token_counts(batch: pa.Table, list_col: str, partitions: int) -> pa.Table:
    import polars as pl

    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pl.from_arrow(col.values if not isinstance(col.values, pa.ChunkedArray)
                         else col.values.combine_chunks())
    counts = pl.DataFrame({"token": flat}).group_by("token").len(name="c")
    h = counts["token"].hash(seed=83).to_numpy()
    return counts.with_columns(
        pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
    ).to_arrow()


def top_k_tokens(ds, list_col: str = "tokens", k: int = 50_000,
                 partitions: int | None = None):
    """Exact global top-k ``(token, c)`` by frequency (ties: token asc),
    as a pandas DataFrame in canonical (c desc, token asc) order.

    Map-side combine (per-batch distinct counts) → slim hash-partitioned
    sum → per-partition top-k. A token's full count lands in exactly one
    partition, so merging the ``partitions × k`` per-partition winners on
    the driver is exact — the vocabulary itself never materializes.
    """
    import pandas as pd

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False, sort=False)["c"].sum()
        agg = agg.sort_values(["c", "token"], ascending=[False, True], kind="mergesort")
        return agg.head(k)

    cand = (
        ds.map_batches(lambda b: _partial_token_counts(b, list_col, partitions),
                       batch_format="pyarrow")
        .groupby("part")
        .map_groups(_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(["c", "token"], ascending=[False, True], kind="mergesort")
    return cand.head(k).reset_index(drop=True)[["token", "c"]]


def vocab_prune(ds, list_col: str = "tokens", k: int = 50_000, unk=None,
                partitions: int | None = None):
    """Truncate the vocabulary to the top-k most frequent tokens and remap
    every out-of-vocabulary token to ``unk`` (default: ``"<unk>"`` for
    string lists, ``-1`` for integer lists) — the classic closed-vocab
    step before count-based LM training.

    Two passes: :func:`top_k_tokens` (slim shuffle), then a broadcast
    remap — the kept vocabulary is ≤ k entries by construction, shipped
    once via ``ray.put`` and read zero-copy in every map task; the corpus
    itself never shuffles. Adds ``n_unk:int64`` (OOV tokens per row).
    """
    import polars as pl
    import ray

    vocab = top_k_tokens(ds, list_col=list_col, k=k, partitions=partitions)
    vocab_ref = ray.put(vocab["token"].to_numpy())

    def _remap(batch: pa.Table) -> pa.Table:
        kept = pl.Series("v", ray.get(vocab_ref))
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy().astype(np.int64)
        values = col.values
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        flat = pl.from_arrow(values)
        fill = unk
        if fill is None:
            fill = "<unk>" if flat.dtype == pl.String else -1
        in_vocab = flat.is_in(kept)
        remapped = (
            pl.DataFrame({"t": flat, "m": in_vocab})
            .select(pl.when(pl.col("m")).then(pl.col("t"))
                    .otherwise(pl.lit(fill)).alias("t"))["t"]
            .to_arrow()
            .cast(values.type)
        )
        # per-row OOV count: reduce the miss mask over each row's slice
        miss = (~in_vocab.to_numpy()).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(miss)])
        n_unk = csum[offs[1:] - offs[0]] - csum[offs[:-1] - offs[0]]
        out = pa.ListArray.from_arrays(
            pa.array(offs - offs[0], pa.int32()) if offs[-1] - offs[0] < 2**31
            else pa.array(offs - offs[0]), remapped
        )
        i = batch.column_names.index(list_col)
        return batch.set_column(i, list_col, out).append_column(
            "n_unk", pa.array(n_unk, pa.int64())
        )

    return ds.map_batches(_remap, batch_format="pyarrow")


def bigram_counts(ds, list_col: str = "tokens", top_n: int | None = None,
                  partitions: int | None = None):
    """Corpus-wide adjacent-pair (bigram) counts over a list column — the
    count-collection pass of n-gram LM estimation (Brants et al. 2007
    "Large Language Models in Machine Translation" does exactly this
    shape at web scale).

    Per batch: one boundary-masked shift over the flat value buffer gives
    every within-row adjacent pair; a local combine reduces them to
    distinct ``(w1, w2, partial c)`` rows before the hash-partitioned sum
    (slim shuffle — pairs, not the corpus). With ``top_n`` the result is
    the exact global top-n (c desc, w1 asc, w2 asc) via per-partition
    top-n merging (each pair lives in one partition), returned as pandas;
    without it, the full count table is returned as a Dataset.
    """
    import pandas as pd
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        offs, values = _list_view(col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        flat = pl.from_arrow(values)
        total = len(flat)
        if total < 2:
            t = pa.table({"w1": values.slice(0, 0), "w2": values.slice(0, 0),
                          "c": pa.array([], pa.uint32()),
                          "part": pa.array([], pa.int32())})
            return t
        # drop pairs that straddle a row boundary
        starts = np.zeros(total, bool)
        starts[offs[:-1] - offs[0]] = True
        keep = ~starts[1:]
        pairs = pl.DataFrame({"w1": flat.slice(0, total - 1), "w2": flat.slice(1)})
        counts = pairs.filter(pl.Series(keep)).group_by(["w1", "w2"]).len(name="c")
        h = counts.select(pl.struct(["w1", "w2"]).hash(seed=83).alias("h"))["h"].to_numpy()
        return counts.with_columns(
            pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
        ).to_arrow()

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["w1", "w2"], as_index=False, sort=False)["c"].sum()
        if top_n is not None:
            agg = agg.sort_values(["c", "w1", "w2"],
                                  ascending=[False, True, True], kind="mergesort")
            return agg.head(top_n)
        return agg

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum, batch_format="pandas")
    )
    if top_n is None:
        return out
    cand = out.to_pandas().sort_values(
        ["c", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
    )
    return cand.head(top_n).reset_index(drop=True)[["w1", "w2", "c"]]
