"""Persisted inverted token index with partition-pruned lookups.

The text-search sibling of the persisted IVF index (``ann.py``): the
posting table ``(token, doc_id)`` is written to Parquet PARTITIONED BY a
deterministic md5 bucket of the token, so a lookup for q query tokens
reads ONLY the ≤q bucket directories from storage — pruning at the read,
the 100-TB-correct shape (a full-scan grep of the corpus per query is the
wrong plan at scale; building the index is one corpus pass).

Bucketing uses the md5 content-hash primitive (``functions/digest.py``)
rather than a session-local hash so the bucket of a token is stable
across runs, engines, and index versions — lookups against an old index
never mis-prune, and the whole path is replicable in stock SQL.

Postings are DISTINCT (token, doc_id) pairs — per-batch dedup before the
write keeps repeated words from inflating the index; the per-bucket
parquet files are additionally sorted by token so row-group statistics
let readers skip non-matching row groups within a bucket.

Reference parity: none (the reference has no retrieval surface); part of
the training-data pipeline extension surface (corpus search / contains-
token filters without full scans).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from ..functions.digest import md5_bucket32

__all__ = ["write_token_index", "lookup_postings"]


def write_token_index(docs_ds, index_dir: str, text_col: str = "text",
                      id_col: str = "doc_id", partitions: int = 32):
    """One corpus pass: split ``text_col`` on spaces, emit distinct
    ``(token, doc_id)`` postings bucketed by ``md5(token) % partitions``,
    write Parquet partitioned by bucket. Returns the index dir."""

    def _postings(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([id_col, text_col]))
        posts = (
            df.with_columns(pl.col(text_col).str.split(" ").alias("token"))
            .explode("token")
            .filter(pl.col("token").str.len_chars() > 0)
            .select([pl.col("token"), pl.col(id_col)])
            .unique()
            .sort(["token", id_col])
        )
        tbl = posts.to_arrow()
        bucket = md5_bucket32(tbl["token"], partitions)
        return pa.table(
            {
                "token": tbl["token"].cast(pa.string()),
                id_col: tbl[id_col],
                "bucket": pa.array(bucket.astype(np.int32)),
            }
        )

    docs_ds.map_batches(_postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return index_dir


def lookup_postings(index_dir: str, tokens, id_col: str = "doc_id",
                    partitions: int = 32):
    """Read ONLY the bucket partitions the query tokens hash to and filter
    to exact token matches. Returns a ``(token, doc_id)`` Dataset."""
    import pyarrow.compute as pc
    import ray.data as rd

    tokens = list(tokens)
    buckets = sorted(set(int(b) for b in md5_bucket32(tokens, partitions)))
    paths = [
        p
        for b in buckets
        for p in sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    token_set = pa.array(tokens, pa.string())
    pruned = rd.read_parquet(paths, columns=["token", id_col])
    return pruned.map_batches(
        lambda t: t.filter(pc.is_in(t["token"], value_set=token_set)),
        batch_format="pyarrow",
    )
