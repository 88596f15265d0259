"""Deduplication operators for training-data pipelines (not in the reference —
required extensions; algorithms from public literature, see
``pprl_ray/sketches/lsh.py`` citations).

All flavours follow one scale shape:

1. a vectorised ``map_batches`` stage derives a compact *key* per row
   (content hash / minhash band keys / simhash prefix bands),
2. a ``groupby`` moves only (key, doc_id, small-payload) rows,
3. per-group work is bounded (bucket-local pairs), never all-pairs global.

Exact dedup keeps the smallest doc_id per content hash. Near-dup operators
emit candidate/verified pair tables; cluster collapse is a short iterative
min-label propagation (shuffle per round, O(log n) rounds) — no driver-side
union-find over unbounded pair sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash_strings
from ..sketches.lsh import band_keys, hamming64, minhash_signatures, simhash64

__all__ = [
    "add_content_hash",
    "exact_dedup",
    "write_hash_index",
    "incremental_exact_dedup",
    "shingle_tokens",
    "shingle_docs",
    "minhash_candidates",
    "verify_jaccard_pairs",
    "minhash_dedup_pairs",
    "simhash_fingerprints",
    "simhash_candidates",
    "connected_components_collapse",
    "contamination_pairs",
    "dup_spans",
    "word_window_hashes",
    "window_novelty",
    "ngram_jaccard_pairs",
    "near_dedup_corpus",
]


# --- exact -----------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    """md5 hex of the raw text — a stable, SQL-reproducible exact-dup key
    (DuckDB ``md5(text)``), computed vectorised (functions/digest.py). For
    the dedup hot path use :func:`content_hash128` (xxhash, another ~5x)."""
    from ..functions.digest import md5_hex

    return batch.append_column(out_col, md5_hex(batch[text_col]))


def content_hash128(batch: pa.Table, text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit vectorised content hashes (xxhash via polars,
    distinct seeds) — a 128-bit exact-dup key with collision probability
    ~n²/2^129, computed with zero per-row Python."""
    import polars as pl

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pl.from_arrow(col).fill_null("")
    h1 = s.hash(seed=101).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=211).to_numpy().astype(np.uint64)
    return h1, h2


def anti_filter_ids(ds, losers, id_col: str = "doc_id",
                    loser_broadcast_max: int = 5_000_000,
                    partitions: int | None = None):
    """Stream ``ds`` through a loser-id anti-filter — the shared survivor-
    selection tail of :func:`exact_dedup`, :func:`near_dedup_corpus` and
    ``pipelines/prepare.py``. Losers are the minority, so their id set
    broadcasts (``ray.put`` once, zero-copy object-store read per task)
    when under ``loser_broadcast_max``; beyond that the filter falls back
    to a co-partitioned left-anti bucket join (one shuffle of the data,
    no driver materialization). Returns ``(filtered_ds, n_losers)``."""
    import pyarrow.compute as pc

    from .partitioning import auto_partitions

    losers = losers.materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return ds, 0
    if n_losers <= loser_broadcast_max:
        import ray

        loser_tbl = pa.concat_tables(
            [b for b in losers.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
        )
        ref = ray.put(loser_tbl[id_col].combine_chunks())

        def _anti(batch: pa.Table) -> pa.Table:
            bad = ray.get(ref)  # zero-copy local object-store read
            return batch.filter(
                pc.invert(pc.is_in(pc.cast(batch[id_col], bad.type), value_set=bad))
            )

        return ds.map_batches(_anti, batch_format="pyarrow"), n_losers
    from .join import bucket_join

    if partitions is None:
        partitions = auto_partitions(ds)
    return (
        bucket_join(ds, losers, keys=id_col, join_type="left anti",
                    partitions=partitions),
        n_losers,
    )


def exact_dup_losers(ds, id_col: str = "doc_id", text_col: str = "text",
                     partitions: int | None = None):
    """Slim loser-id Dataset for exact content dedup: every row except the
    smallest id per distinct content. The full-text column NEVER
    shuffles — only slim (hash128, id) rows move through the groupby
    (equal hashes co-locate, so picking winners within a partition group
    is exact, via one vectorised pandas drop_duplicates per group)."""
    from .partitioning import auto_partitions, compact_blocks

    if partitions is None:
        partitions = auto_partitions(ds)

    def _slim(batch: pa.Table) -> pa.Table:
        h1, h2 = content_hash128(batch, text_col)
        return pa.table(
            {
                id_col: batch[id_col],
                "h1": pa.array(h1.astype(np.int64), pa.int64()),
                "h2": pa.array(h2.astype(np.int64), pa.int64()),
                "part": pa.array((h1 % np.uint64(partitions)).astype(np.int32)),
            }
        )

    # materialize + compact the slim table: its groupby otherwise inherits
    # the input's block count and pays per-block shuffle scheduling
    slim = compact_blocks(ds.map_batches(_slim, batch_format="pyarrow").materialize())

    def _losers(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        dup = g.duplicated(subset=["h1", "h2"], keep="first")
        return g.loc[dup, [id_col]]

    return slim.groupby("part").map_groups(_losers, batch_format="pandas")


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                partitions: int | None = None, loser_broadcast_max: int = 5_000_000):
    """Keep the row with the smallest id per distinct content:
    :func:`exact_dup_losers` -> :func:`anti_filter_ids` (see each for the
    scale shape)."""
    losers = exact_dup_losers(ds, id_col, text_col, partitions)
    out, _ = anti_filter_ids(ds, losers, id_col, loser_broadcast_max, partitions)
    return out


# --- incremental (corpus-version) dedup --------------------------------------
#
# The 100-TB training-data shape: corpus v2 arrives months after v1 was
# deduped; re-hashing v1 per run is wasted work. Instead v1's 128-bit
# content hashes persist as a bucket-partitioned parquet index
# (``index_dir/bucket=<h1 % buckets>/``). A new corpus dedupes against the
# index by reading ONLY the matching bucket directory per task (the
# partition-pruned-read trick from ann.py's persisted IVF index) — the new
# corpus's text never shuffles, only slim (h1, h2, id) rows do, and the
# index grows by appending the kept rows' hashes (resumable state across
# corpus versions; no rewrite).


def _hash_index_meta_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_meta.json")


def _slim_hash_batch(batch: pa.Table, id_col: str, text_col: str, buckets: int) -> pa.Table:
    h1, h2 = content_hash128(batch, text_col)
    return pa.table(
        {
            id_col: batch[id_col],
            "h1": pa.array(h1.astype(np.int64), pa.int64()),
            "h2": pa.array(h2.astype(np.int64), pa.int64()),
            "bucket": pa.array((h1 % np.uint64(buckets)).astype(np.int32)),
        }
    )


def write_hash_index(ds, index_dir: str, id_col: str = "doc_id",
                     text_col: str = "text", buckets: int = 64) -> int:
    """Create a persistent content-hash index from a (deduped) corpus:
    distinct (h1, h2) per bucket, written ``partition_cols=["bucket"]`` so
    later lookups read one bucket directory each. A ``_meta.json`` at the
    index root pins the bucket count and hash scheme (validated on reuse —
    a mismatched modulus would silently miss every duplicate). Returns the
    number of indexed hashes."""
    import json
    import os

    import pyarrow.dataset as pads

    meta_path = _hash_index_meta_path(index_dir)
    if os.path.exists(meta_path):
        raise FileExistsError(f"hash index already exists at {index_dir}")
    slim = ds.map_batches(
        lambda b: _slim_hash_batch(b, id_col, text_col, buckets),
        batch_format="pyarrow",
    )

    def _distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=["h1", "h2"])[["h1", "h2", "bucket"]]

    distinct = slim.groupby("bucket").map_groups(_distinct, batch_format="pandas")
    distinct.write_parquet(index_dir, partition_cols=["bucket"])
    n = sum(
        pads.dataset(os.path.join(index_dir, d)).count_rows()
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
    )
    with open(meta_path, "w") as f:
        json.dump({"buckets": buckets, "hash": "xxhash64 seeds 101/211", "n_hashes": n}, f)
    return n


def incremental_exact_dedup(new_ds, index_dir: str, id_col: str = "doc_id",
                            text_col: str = "text", update_index: bool = True,
                            loser_broadcast_max: int = 5_000_000):
    """Dedup a NEW corpus against a persisted hash index (and against
    itself, min-id-first), without touching the old corpus: per bucket
    group, read only ``index_dir/bucket=<b>/`` and anti-join the slim hash
    rows. ``update_index=True`` appends the kept rows' hashes so the next
    corpus version dedupes against v1 ∪ v2. Returns the kept Dataset
    (original columns, text never shuffled)."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    with open(_hash_index_meta_path(index_dir)) as f:
        meta = json.load(f)
    buckets = int(meta["buckets"])

    from .partitioning import compact_blocks

    slim = compact_blocks(
        new_ds.map_batches(
            lambda b: _slim_hash_batch(b, id_col, text_col, buckets),
            batch_format="pyarrow",
        ).materialize()
    )

    def _losers(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        g = group.sort_values(id_col)
        internal_dup = g.duplicated(subset=["h1", "h2"], keep="first")
        bucket_dir = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(bucket_dir):
            idx = pads.dataset(bucket_dir).to_table(columns=["h1", "h2"]).to_pandas()
            seen = pd.MultiIndex.from_frame(idx)
            in_index = pd.MultiIndex.from_frame(g[["h1", "h2"]]).isin(seen)
        else:
            in_index = np.zeros(len(g), dtype=bool)
        return g.loc[internal_dup.to_numpy() | in_index, [id_col]]

    losers = slim.groupby("bucket").map_groups(_losers, batch_format="pandas").materialize()
    n_losers = losers.count()
    broadcast = 0 < n_losers <= loser_broadcast_max
    if broadcast:
        loser_tbl = pa.concat_tables(
            [t for t in losers.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
        )
        ref = ray.put(loser_tbl[id_col].combine_chunks())

        def _anti(batch: pa.Table) -> pa.Table:
            bad = ray.get(ref)
            return batch.filter(pc.invert(pc.is_in(batch[id_col], value_set=bad)))

    if n_losers == 0:
        kept = new_ds
        kept_slim = slim
    elif broadcast:
        kept = new_ds.map_batches(_anti, batch_format="pyarrow")
        kept_slim = slim.map_batches(_anti, batch_format="pyarrow")
    else:
        from .join import bucket_join

        kept = bucket_join(new_ds, losers, keys=id_col, join_type="left anti")
        kept_slim = bucket_join(slim, losers, keys=id_col, join_type="left anti")

    if update_index:
        # the append reuses the slim hash table (already materialized), NOT
        # the kept corpus — the text column is never re-scanned or copied
        appended = kept_slim.map_batches(
            lambda b: b.select(["h1", "h2", "bucket"]), batch_format="pyarrow"
        ).materialize()
        appended.write_parquet(index_dir, partition_cols=["bucket"])  # append-only
        meta["n_hashes"] = int(meta.get("n_hashes", 0)) + appended.count()
        with open(_hash_index_meta_path(index_dir), "w") as f:
            json.dump(meta, f)
    return kept


def _band_index_meta_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_meta.json")


def _set_hashes(shingles: list[np.ndarray]) -> np.ndarray:
    """Order-independent 64-bit hash of each row's (already de-duplicated)
    shingle SET: XOR of per-element splitmix64 values, folded with the set
    size. Equal sets <=> equal hashes modulo ~2^-64 accidents — the exact
    CONFIRM tier of the band index (near-identical docs, which defeat
    any signature-equality test with probability ~jaccard^k, share no
    structure under XOR-of-hashes)."""
    from ..sketches.hashing import splitmix64

    lens = np.array([len(s) for s in shingles], dtype=np.int64)
    flat = (np.concatenate(shingles) if len(shingles) and lens.sum()
            else np.empty(0, dtype=np.uint64))
    offs = np.concatenate([[0], np.cumsum(lens)])
    out = np.zeros(len(lens), dtype=np.uint64)
    nz = lens > 0
    if flat.size:
        el = splitmix64(flat ^ np.uint64(0xA5A5_5A5A_DEAD_BEEF))
        # reduceat over nonzero-row starts only: zero-length rows own no
        # elements, so each segment ends exactly at the next nonzero start
        out[nz] = np.bitwise_xor.reduceat(el, offs[:-1][nz])
    with np.errstate(over="ignore"):
        out ^= splitmix64(lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return out


def _band_rows(ds, text_col: str, id_col: str, k: int, bands: int,
               shingle_n: int, buckets: int):
    """Slim per-doc index rows, ``bands`` per doc: (id, band, band_key,
    bucket, set_hash, sbucket). ``bucket = band_key % buckets`` and
    ``sbucket = set_hash % buckets`` (uint64 views, so routing is
    sign-stable) drive partition-pruned index reads; ``set_hash`` is the
    row's shingle-set hash (:func:`_set_hashes`), replicated across the
    doc's band rows so ONE exchange feeds both index tiers (the ``band ==
    0`` slice is exactly one row per doc)."""
    from ..sketches.lsh import band_keys, minhash_signatures

    def _emit(batch: pa.Table) -> pa.Table:
        if "shingles" in batch.column_names:
            shingles = [
                np.frombuffer(b, dtype=np.uint64) for b in batch["shingles"].to_pylist()
            ]
        else:
            shingles = shingle_tokens(batch, text_col, shingle_n)
        sigs = minhash_signatures(shingles, k)
        bkeys = band_keys(sigs, bands)  # (rows, bands)
        shash = _set_hashes(shingles)
        n = len(shingles)
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        rep = np.repeat(np.arange(n), bands)
        band_idx = np.tile(np.arange(bands), n)
        bk = bkeys[rep, band_idx].astype(np.uint64)
        sh = shash[rep]
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(rep, pa.int64())),
                "band": pa.array(band_idx, pa.int32()),
                "band_key": pa.array(bk.astype(np.int64), pa.int64()),
                "bucket": pa.array((bk % np.uint64(buckets)).astype(np.int32)),
                "set_hash": pa.array(sh.astype(np.int64), pa.int64()),
                "sbucket": pa.array((sh % np.uint64(buckets)).astype(np.int32)),
            }
        )

    return ds.map_batches(_emit, batch_format="pyarrow")


def _read_bucket(index_dir: str, tier: str, b: int, columns: list[str]):
    """One pruned index read: tier subdir, single bucket partition.
    Returns a pandas frame (empty when the partition doesn't exist)."""
    import os

    import pyarrow.dataset as pads

    d = os.path.join(index_dir, tier, f"{'bucket' if tier == 'bands' else 'sbucket'}={b}")
    if not os.path.isdir(d):
        return pd.DataFrame({c: [] for c in columns})
    return pads.dataset(d).to_table(columns=columns).to_pandas()


def _band0(batch: pa.Table) -> pa.Table:
    """One row per doc from a replicated band-rows table (vectorised)."""
    return batch.filter(pc.equal(batch["band"], 0))


def write_band_index(ds, index_dir: str, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 128, bands: int = 16,
                     shingle_n: int = 3, buckets: int = 64) -> int:
    """Create a persistent two-tier MinHash index from a (near-deduped)
    corpus — the near-duplicate analog of :func:`write_hash_index`:

    - ``bands/`` — DISTINCT ``(band, band_key)`` rows partitioned by
      ``band_key % buckets``: the LSH PROBE tier (per-band match
      probability ~ jaccard^(k/bands));
    - ``sets/`` — DISTINCT shingle-set hashes partitioned by ``set_hash %
      buckets``: the exact CONFIRM tier (equal hash <=> equal shingle
      set, hash-accident-free unlike any signature-equality test).

    A later incremental run reads only the bucket directories its new
    docs hash to. The index stores no doc ids, no text and no
    signatures — its size is O(distinct band keys + distinct sets), ~
    ``bands + 1`` small rows per indexed doc. ``_meta.json`` pins (k,
    bands, shingle_n, buckets): a mismatched parameterisation would
    silently miss every near-duplicate, so reuse reads the parameters
    from the meta rather than trusting the caller. Returns the number of
    indexed band keys."""
    import json
    import os

    import pyarrow.dataset as pads

    meta_path = _band_index_meta_path(index_dir)
    if os.path.exists(meta_path):
        raise FileExistsError(f"band index already exists at {index_dir}")
    rows = _band_rows(ds, text_col, id_col, k, bands, shingle_n, buckets)

    def _distinct_bands(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=["band", "band_key"])[
            ["band", "band_key", "bucket"]
        ]

    def _distinct_sets(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=["set_hash"])[["set_hash", "sbucket"]]

    rows = rows.materialize()
    rows.groupby("bucket").map_groups(
        _distinct_bands, batch_format="pandas"
    ).write_parquet(os.path.join(index_dir, "bands"), partition_cols=["bucket"])
    rows.map_batches(_band0, batch_format="pyarrow").groupby("sbucket").map_groups(
        _distinct_sets, batch_format="pandas"
    ).write_parquet(os.path.join(index_dir, "sets"), partition_cols=["sbucket"])

    def _tier_count(tier: str) -> int:
        root = os.path.join(index_dir, tier)
        return sum(
            pads.dataset(os.path.join(root, d)).count_rows()
            for d in os.listdir(root)
        )

    n_keys, n_sets = _tier_count("bands"), _tier_count("sets")
    with open(meta_path, "w") as f:
        json.dump({"k": k, "bands": bands, "shingle_n": shingle_n,
                   "buckets": buckets, "n_keys": n_keys, "n_sets": n_sets,
                   "scheme": "splitmix64 shingles / lsh band keys / xor set hash v2"}, f)
    return n_keys


def incremental_near_dedup(new_ds, index_dir: str, id_col: str = "doc_id",
                           text_col: str = "text", match_bands_min: int = 1,
                           confirm: str = "none", update_index: bool = True,
                           loser_broadcast_max: int = 5_000_000):
    """Near-dedup a NEW corpus version against a persisted band index (and
    against itself, min-id-first) without touching the old corpus: per
    bucket group, read only ``<index>/bands/bucket=<b>/`` and count each
    new doc's matched bands; docs matching in at least ``match_bands_min``
    bands (the standard LSH OR-construction at 1; raise toward ``bands``
    for precision) are dropped. ``update_index=True`` appends the
    survivors' band keys and set hashes so the next version dedupes
    against v1 ∪ v2 — append cost is proportional to the new version,
    never the corpus.

    ``confirm="set"`` intersects the band gate with the exact CONFIRM
    tier: a doc drops only when it passed the band gate AND its
    shingle-set hash matches an indexed (or earlier-in-version) set. That
    drops exactly the set-identical docs — near-identical docs survive
    regardless of signature accidents (any signature-equality gate
    wrongly drops a jaccard-j near-dup with probability ~j^k, which is
    ~20% at j=0.99, k=128) — while still exercising the banded probe
    path end-to-end. ``confirm="none"`` is the production LSH gate:
    collisions are the same candidate semantics as
    :func:`minhash_candidates`; exact Jaccard verification against the
    OLD corpus would need its shingles, which the index deliberately does
    not store — run :func:`near_dedup_corpus` for in-version exact
    verification.

    Returns the kept Dataset (original columns; text never shuffled)."""
    import json

    from .partitioning import compact_blocks

    if confirm not in ("none", "set"):
        raise ValueError(f"confirm must be 'none' or 'set', got {confirm!r}")
    with open(_band_index_meta_path(index_dir)) as f:
        meta = json.load(f)
    k, bands = int(meta["k"]), int(meta["bands"])
    shingle_n, buckets = int(meta["shingle_n"]), int(meta["buckets"])

    slim = compact_blocks(
        _band_rows(new_ds, text_col, id_col, k, bands, shingle_n, buckets)
        .materialize()
    )

    # ONE tier-tagged probe exchange: band rows keyed by ``bucket``
    # (tier 0) and — with confirm="set" — the per-doc set rows keyed by
    # ``sbucket`` (tier 1) ride the SAME groupby; each partition group
    # reads both of its index-tier directories once and emits slim hit
    # rows, then ONE id-keyed reduce applies the band gate and the set
    # confirm together. This halves the stage count of the previous
    # two-probe/two-reduce topology — the exchanges are all slim, so at
    # bench scale fixed per-stage latency dominated this operator.
    def _make_tiered(with_sets: bool):
        def _tiered(batch: pa.Table) -> pa.Table:
            a = pa.table(
                {
                    id_col: batch[id_col],
                    "band": batch["band"],
                    "key": batch["band_key"],
                    "part": batch["bucket"],
                    "tier": pa.array(np.zeros(batch.num_rows, np.int8)),
                }
            )
            if not with_sets:
                return a
            b0 = _band0(batch)
            b = pa.table(
                {
                    id_col: b0[id_col],
                    "band": pa.array(np.zeros(b0.num_rows, np.int32), pa.int32()),
                    "key": b0["set_hash"],
                    "part": b0["sbucket"],
                    "tier": pa.array(np.ones(b0.num_rows, np.int8)),
                }
            )
            return pa.concat_tables([a, b])

        return _tiered

    def _probe(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["part"].iloc[0])
        out = []
        g0 = group[group["tier"] == 0].sort_values(id_col)
        if len(g0):
            idx = _read_bucket(index_dir, "bands", b, ["band", "band_key"])
            if len(idx):
                seen = pd.MultiIndex.from_frame(idx)
                in_index = pd.MultiIndex.from_arrays(
                    [g0["band"], g0["key"]]).isin(seen)
            else:
                in_index = np.zeros(len(g0), dtype=bool)
            internal = g0.duplicated(subset=["band", "key"], keep="first").to_numpy()
            out.append(g0.loc[in_index | internal, [id_col, "band", "tier"]])
        g1 = group[group["tier"] == 1].sort_values(id_col)
        if len(g1):
            idx = _read_bucket(index_dir, "sets", b, ["set_hash"])
            in_index = g1["key"].isin(idx["set_hash"]).to_numpy() \
                if len(idx) else np.zeros(len(g1), dtype=bool)
            internal = g1.duplicated(subset=["key"], keep="first").to_numpy()
            out.append(g1.loc[in_index | internal, [id_col, "band", "tier"]])
        if not out:
            return group.iloc[0:0][[id_col, "band", "tier"]]
        return pd.concat(out)

    hits = slim.map_batches(
        _make_tiered(confirm == "set"), batch_format="pyarrow"
    ).groupby("part").map_groups(_probe, batch_format="pandas")

    # the id-keyed reduce runs per PARTITION group (ids co-locate via an
    # id-hash column) with vectorised pandas groupbys inside — not one
    # Python call per id
    def _gpart(batch: pa.Table) -> pa.Table:
        import polars as pl

        hp = pl.from_arrow(batch[id_col].combine_chunks()).hash(seed=37).to_numpy()
        return batch.append_column(
            "gpart", pa.array((hp % np.uint64(buckets)).astype(np.int32))
        )

    def _gate(group: pd.DataFrame) -> pd.DataFrame:
        g0 = group[group["tier"] == 0]
        n = g0.groupby(id_col, sort=False)["band"].nunique()
        losers_idx = n[n >= match_bands_min].index
        if confirm == "set":
            losers_idx = losers_idx.intersection(
                pd.Index(group.loc[group["tier"] == 1, id_col].unique())
            )
        return losers_idx.to_frame(index=False, name=id_col)

    losers = hits.map_batches(_gpart, batch_format="pyarrow").groupby(
        "gpart"
    ).map_groups(_gate, batch_format="pandas")

    kept, n_losers = anti_filter_ids(new_ds, losers, id_col,
                                     loser_broadcast_max)

    if update_index:
        import os

        if n_losers:
            kept_rows, _ = anti_filter_ids(slim, losers, id_col,
                                           loser_broadcast_max)
        else:
            kept_rows = slim

        # BOTH tiers' fresh keys come out of ONE partition-grouped reduce
        # (the same tier-tagged exchange as the probe), then split into the
        # two partitioned tier directories from the materialized result
        def _append_both(group: pd.DataFrame) -> pd.DataFrame:
            b = int(group["part"].iloc[0])
            out = []
            g0 = group[group["tier"] == 0]
            if len(g0):
                fresh = g0.drop_duplicates(subset=["band", "key"])[
                    ["band", "key", "part", "tier"]
                ]
                idx = _read_bucket(index_dir, "bands", b, ["band", "band_key"])
                if len(idx):
                    seen = pd.MultiIndex.from_frame(idx)
                    fresh = fresh.loc[
                        ~pd.MultiIndex.from_arrays(
                            [fresh["band"], fresh["key"]]).isin(seen)
                    ]
                out.append(fresh)
            g1 = group[group["tier"] == 1]
            if len(g1):
                fresh = g1.drop_duplicates(subset=["key"])[
                    ["band", "key", "part", "tier"]
                ]
                idx = _read_bucket(index_dir, "sets", b, ["set_hash"])
                if len(idx):
                    fresh = fresh.loc[~fresh["key"].isin(idx["set_hash"])]
                out.append(fresh)
            if not out:
                return group.iloc[0:0][["band", "key", "part", "tier"]]
            return pd.concat(out)

        fresh = kept_rows.map_batches(
            _make_tiered(True), batch_format="pyarrow"
        ).groupby("part").map_groups(
            _append_both, batch_format="pandas"
        ).materialize()

        def _split(tier: int, names: dict[str, str]):
            def _f(batch: pa.Table) -> pa.Table:
                t = batch.filter(pc.equal(batch["tier"], tier))
                return pa.table({new: t[old] for old, new in names.items()})

            return _f

        new_bands = fresh.map_batches(
            _split(0, {"band": "band", "key": "band_key", "part": "bucket"}),
            batch_format="pyarrow",
        ).materialize()
        new_sets = fresh.map_batches(
            _split(1, {"key": "set_hash", "part": "sbucket"}),
            batch_format="pyarrow",
        ).materialize()
        nb, ns = new_bands.count(), new_sets.count()
        if nb:
            new_bands.write_parquet(os.path.join(index_dir, "bands"),
                                    partition_cols=["bucket"])
        if ns:
            new_sets.write_parquet(os.path.join(index_dir, "sets"),
                                   partition_cols=["sbucket"])
        meta["n_keys"] = int(meta.get("n_keys", 0)) + int(nb)
        meta["n_sets"] = int(meta.get("n_sets", 0)) + int(ns)
        with open(_band_index_meta_path(index_dir), "w") as f:
            json.dump(meta, f)
    return kept


def _dedupe_pair_rows(pairs_ds, value_col: str | None, partitions: int,
                      value_agg: str = "max"):
    """Collapse duplicate (id_a, id_b) rows with ONE vectorised pandas
    groupby per hash partition (equal pairs co-locate). ``value_col`` keeps
    the ``value_agg`` of that column; None keeps bare pairs."""
    import polars as pl

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("part", pa.array([], pa.int32()))
        df = pl.DataFrame(
            {
                "a": pl.from_arrow(batch["id_a"].combine_chunks()),
                "b": pl.from_arrow(batch["id_b"].combine_chunks()),
            }
        )
        h = df.hash_rows(seed=31).to_numpy()
        return batch.append_column(
            "part", pa.array((h % np.uint64(partitions)).astype(np.int32))
        )

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        if value_col is None:
            return group.drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b"]]
        return group.groupby(["id_a", "id_b"], as_index=False)[value_col].agg(value_agg)

    return (
        pairs_ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_dedup, batch_format="pandas")
    )


# --- minhash / LSH ---------------------------------------------------------


def shingle_tokens(batch: pa.Table, text_col: str = "text", n: int = 3,
                   drop_short: bool = False) -> list[np.ndarray]:
    """Word n-gram shingle hashes per row — fully vectorised.

    One polars pass hashes every word occurrence; shingle hashes are a
    rolling splitmix64 combination of ``n`` consecutive word hashes with
    row-boundary masking, deduplicated per row via one lexsort. No Python
    loop over rows or words; equality of shingle hash <=> equality of the
    underlying word n-gram (modulo 64-bit collisions), which is all
    Jaccard/minhash need.

    Rows with fewer than ``n`` words normally emit ONE pseudo-shingle (the
    combined hash of all their words) so short docs still participate in
    near-dup detection. ``drop_short=True`` emits NOTHING for such rows —
    the standard n-gram semantics (a doc under ``n`` words has no n-grams),
    required by decontamination where a shared pseudo-shingle between two
    short docs is not a contamination signal."""
    import polars as pl

    from ..sketches.hashing import splitmix64

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = pl.from_arrow(col).fill_null("")
    words = texts.str.split(" ")
    lengths = words.list.len().to_numpy().astype(np.int64)
    n_rows = len(lengths)
    flat_hashes = words.explode().hash(seed=41).to_numpy().astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    total = int(offsets[-1])
    if total == 0:
        if drop_short and n > 1:
            return [np.empty(0, dtype=np.uint64)] * n_rows
        return [np.unique(hash_strings([""]))] * n_rows

    # polars explode of an empty list yields one null row — lengths==0 rows
    # still occupy one slot; normalise by treating them as a single "" word
    if len(flat_hashes) != total:
        lengths = np.maximum(lengths, 1)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        total = int(offsets[-1])

    row_of = np.repeat(np.arange(n_rows), lengths)
    # rolling combine of n consecutive word hashes (within-row positions);
    # positions shifted past a row's end contribute 0, so a short row's
    # combined hash depends ONLY on its own words — identical short docs get
    # identical shingle hashes regardless of batch neighbors
    C = np.uint64(0x9E3779B97F4A7C15)
    comb = flat_hashes.copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            shifted = np.zeros_like(flat_hashes)
            if j < total:  # keep the *C fold even when the whole batch is
                # shorter than n, so hashes stay batch-size-invariant
                same_row = row_of[j:] == row_of[: total - j]
                shifted[: total - j][same_row] = flat_hashes[j:][same_row]
            comb = comb * C + shifted
        sh = splitmix64(comb)
    # valid shingle start positions: i + n - 1 stays inside the row
    pos_in_row = np.arange(total) - offsets[row_of]
    valid = pos_in_row + (n - 1) < lengths[row_of]
    # short rows (< n words) keep exactly their first position: the combined
    # hash of all their words (+ zero padding) stands in for the joined text
    first_pos = pos_in_row == 0
    short = lengths[row_of] < n
    keep = valid if drop_short else (valid | (short & first_pos))

    rows_kept = row_of[keep]
    hashes_kept = sh[keep]
    # per-row dedup: one lexsort, drop consecutive duplicates within a row
    order = np.lexsort((hashes_kept, rows_kept))
    r_sorted = rows_kept[order]
    h_sorted = hashes_kept[order]
    dup = np.zeros(len(order), dtype=bool)
    if len(order) > 1:
        dup[1:] = (r_sorted[1:] == r_sorted[:-1]) & (h_sorted[1:] == h_sorted[:-1])
    r_final = r_sorted[~dup]
    h_final = h_sorted[~dup]
    counts = np.bincount(r_final, minlength=n_rows)
    ends = np.cumsum(counts)
    starts = ends - counts
    return [h_final[starts[i] : ends[i]] for i in range(n_rows)]


def shingle_docs(ds, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 3):
    """One shingling pass: (id, shingles) with the hash set serialized as a
    binary column. Compute ONCE and reuse for both LSH banding and exact
    Jaccard verification — shingling is the dominant per-doc cost."""

    def _stage(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "shingles": pa.array(
                    [sh.tobytes() for sh in shingle_tokens(batch, text_col, shingle_n)],
                    pa.large_binary(),
                ),
            }
        )

    return ds.map_batches(_stage, batch_format="pyarrow")


class _MinHashStage:
    """Per-row minhash signature + exploded (band, band_key) rows.

    Input batches may carry either a raw ``text`` column (shingled here) or
    a precomputed ``shingles`` binary column (from :func:`shingle_docs`).

    ``with_signature=False`` (the scale default) omits the k*8-byte
    signature from the exploded rows: the bands-fold replication would
    otherwise dominate shuffle volume (k=128, bands=16 -> 16 KiB per doc
    vs ~30 bytes for the keys alone), and exact verification recomputes
    similarity from shingles anyway."""

    def __init__(self, text_col: str, id_col: str, k: int, bands: int, shingle_n: int,
                 with_signature: bool = False):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.bands = bands
        self.shingle_n = shingle_n
        self.with_signature = with_signature

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "shingles" in batch.column_names:
            shingles = [
                np.frombuffer(b, dtype=np.uint64) for b in batch["shingles"].to_pylist()
            ]
        else:
            shingles = shingle_tokens(batch, self.text_col, self.shingle_n)
        sigs = minhash_signatures(shingles, self.k)
        bkeys = band_keys(sigs, self.bands)  # (rows, bands)
        n = len(shingles)
        ids = batch[self.id_col].combine_chunks() if isinstance(
            batch[self.id_col], pa.ChunkedArray) else batch[self.id_col]
        rep_ids = np.repeat(np.arange(n), self.bands)
        band_idx = np.tile(np.arange(self.bands), n)
        import pyarrow.compute as pc

        cols = {
            self.id_col: pc.take(ids, pa.array(rep_ids, pa.int64())),
            "band": pa.array(band_idx, pa.int32()),
            "band_key": pa.array(bkeys[rep_ids, band_idx].astype(np.int64), pa.int64()),
        }
        if self.with_signature:
            cols["signature"] = pa.array(
                [sigs[i].astype(np.int64).tobytes() for i in rep_ids], pa.large_binary()
            )
        return pa.table(cols)


def minhash_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 128, bands: int = 16, shingle_n: int = 3,
                       max_bucket: int = 200, partitions: int | None = None,
                       with_estimates: bool = False, dedupe_pairs: bool = True):
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Emits (id_a, id_b) with id_a < id_b (plus ``est_jaccard`` — the
    signature agreement fraction — when ``with_estimates=True``),
    deduplicated across bands. ``max_bucket`` caps quadratic blowup in
    degenerate buckets (no silent unbounded work).

    Scale shape: only ~30-byte (id, band, band_key) rows shuffle (the k*8-B
    signatures stay out of the exchange unless estimates are requested);
    bucket pairing is a vectorised pandas join per (band, band_key %
    partitions) reduce group, so per-group Python overhead is
    O(bands*partitions), not O(buckets)."""
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = max(8, auto_partitions(ds) // bands)
    stage = _MinHashStage(
        text_col=text_col, id_col=id_col, k=k, bands=bands, shingle_n=shingle_n,
        with_signature=with_estimates,
    )
    # stateless kernel: plain task pool (no actor startup latency)
    exploded = ds.map_batches(stage, batch_format="pyarrow")

    def _band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        # cap degenerate buckets (documented truncation, no silent O(n^2))
        g = g[g.groupby("band_key").cumcount() < max_bucket].reset_index(drop=True)
        # empty outputs keep the id dtype (empty object frames become
        # null-typed Arrow columns that poison downstream schema unification)
        empty_cols = {
            "id_a": pd.Series(dtype=g[id_col].dtype),
            "id_b": pd.Series(dtype=g[id_col].dtype),
        }
        if with_estimates:
            empty_cols["est_jaccard"] = pd.Series(dtype=np.float64)
        if len(g) < 2:
            return pd.DataFrame(empty_cols)
        idx = np.arange(len(g))
        left = pd.DataFrame({"band_key": g["band_key"].to_numpy(), "i": idx})
        m = left.merge(left.rename(columns={"i": "j"}), on="band_key")
        m = m[m["i"] < m["j"]]
        if len(m) == 0:
            return pd.DataFrame(empty_cols)
        i, j = m["i"].to_numpy(), m["j"].to_numpy()
        ids = g[id_col].to_numpy()
        # g sorted by id => i < j implies id_a < id_b
        out = {"id_a": ids[i], "id_b": ids[j]}
        if with_estimates:
            sig_mat = np.frombuffer(b"".join(g["signature"]), dtype=np.int64).reshape(len(g), -1)
            out["est_jaccard"] = (sig_mat[i] == sig_mat[j]).mean(axis=1)
        return pd.DataFrame(out)

    # Partition buckets into (band, band_key % partitions) reduce groups:
    # pairing stays exact (a pair shares its full band_key, hence its
    # partition) while reducer work per group is ~1/partitions of a band —
    # one-group-per-band would bottleneck a single reducer at corpus scale.
    def _add_part(batch: pa.Table) -> pa.Table:
        part = batch["band_key"].to_numpy() % np.int64(partitions)
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    parted = exploded.map_batches(_add_part, batch_format="pyarrow")
    pairs = parted.groupby(["band", "part"]).map_groups(_band_pairs, batch_format="pandas")

    if not dedupe_pairs:
        # caller dedupes (e.g. verify_jaccard_pairs' buckets absorb band
        # dups) — skipping the reduce saves a whole shuffle
        return pairs

    # a pair found in multiple bands appears once per band — keep one via
    # the partitioned-vectorized reduce (a native aggregate here pays
    # per-DISTINCT-group Python over O(pairs) groups)
    return _dedupe_pair_rows(
        pairs, "est_jaccard" if with_estimates else None, partitions
    )


def verify_jaccard_pairs(pairs_ds, docs_ds, text_col: str = "text", id_col: str = "doc_id",
                         shingle_n: int = 3, threshold: float = 0.8,
                         partitions: int | None = None):
    """Exact n-gram Jaccard verification of candidate pairs, fully
    distributed — nothing materializes on the driver.

    Scale shape: shingle blobs are delivered to the pairs through ONE
    co-partitioned hash-bucket join keyed by doc id (the corpus-sized
    shingle table crosses the exchange exactly once; each candidate pair
    requests its two blobs). The (pair, blob) rows — candidates ≪ corpus
    by LSH construction — then co-partition by pair key, where one
    vectorised pandas merge aligns the two halves and a bounded numpy
    intersect per pair computes exact Jaccard.

    ``pairs_ds`` may contain duplicate rows per pair (e.g. one per matching
    LSH band): all copies of a pair hash to the same verify bucket, where
    one vectorised drop_duplicates absorbs them — cheaper than a dedicated
    global pair-dedup shuffle.

    Pairs referencing a doc id ABSENT from ``docs_ds`` are DROPPED (the
    blob-delivery join is inner): a pair with no shingle blob has no
    defined Jaccard here, and in the LSH pipeline candidates are generated
    from the same shingled corpus so the case cannot arise. Callers feeding
    externally-sourced pairs who want the old emit-0.0 semantics should
    pre-filter or union the missing pairs back with ``jaccard=0.0``."""
    import polars as pl
    import pyarrow.compute as pc

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = max(auto_partitions(pairs_ds), auto_partitions(docs_ds))

    if "shingles" in docs_ds.schema().names:
        shingled = docs_ds
    else:
        shingled = shingle_docs(docs_ds, text_col, id_col, shingle_n)
    id_type = shingled.schema().base_schema.field(id_col).type

    def _bucket1(col) -> pa.Array:
        if hasattr(col, "combine_chunks"):
            col = col.combine_chunks()
        h = pl.from_arrow(col).hash(seed=83).to_numpy()
        return pa.array((h % np.uint64(partitions)).astype(np.int32))

    def _bucket2(tbl: pa.Table) -> pa.Array:
        df = pl.DataFrame(
            {c: pl.from_arrow(tbl[c].combine_chunks()) for c in ("id_a", "id_b")}
        )
        h = df.hash_rows(seed=83).to_numpy()
        return pa.array((h % np.uint64(partitions)).astype(np.int32))

    def _prov(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pa.table(
            {
                "key": batch[id_col],
                "sh": batch["shingles"],
                "id_a": pa.nulls(n, id_type),
                "id_b": pa.nulls(n, id_type),
                "half": pa.nulls(n, pa.int8()),
            }
        )
        return t.append_column("part", _bucket1(t["key"])).append_column(
            "__side", pa.array(np.ones(n, np.int8))
        )

    def _req(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch["id_a"], id_type)
        b = pc.cast(batch["id_b"], id_type)
        n = batch.num_rows
        halves = []
        for key, half in ((a, 0), (b, 1)):
            halves.append(
                pa.table(
                    {
                        "key": key,
                        "sh": pa.nulls(n, pa.large_binary()),
                        "id_a": a,
                        "id_b": b,
                        "half": pa.array(np.full(n, half, np.int8)),
                    }
                )
            )
        t = pa.concat_tables(halves).combine_chunks()
        # batch-local dedup of band-duplicate pairs: keeps duplicate blob
        # payloads out of the second shuffle (remaining cross-batch dups
        # are absorbed in the verify bucket)
        mask = ~pd.DataFrame(
            {"a": t["id_a"].to_pandas(), "b": t["id_b"].to_pandas(), "h": t["half"].to_pandas()}
        ).duplicated().to_numpy()
        t = t.filter(pa.array(mask))
        return t.append_column("part", _bucket1(t["key"])).append_column(
            "__side", pa.array(np.zeros(t.num_rows, np.int8))
        )

    req_schema = pa.schema(
        [("key", id_type), ("id_a", id_type), ("id_b", id_type), ("half", pa.int8())]
    )
    prov_schema = pa.schema([("key", id_type), ("sh", pa.large_binary())])

    def _deliver(group: pa.Table) -> pa.Table:
        side = group["__side"]
        # explicit casts: a group whose side is empty can arrive with
        # null-typed padding columns, which Acero joins reject
        req = group.filter(pc.equal(side, 0)).select(
            ["key", "id_a", "id_b", "half"]
        ).cast(req_schema)
        prov = group.filter(pc.equal(side, 1)).select(["key", "sh"]).cast(prov_schema)
        j = req.join(prov, keys="key", join_type="inner")
        out = pa.table(
            {"id_a": j["id_a"], "id_b": j["id_b"], "half": j["half"], "sh": j["sh"]}
        )
        return out.append_column("part2", _bucket2(out))

    delivered = (
        shingled.map_batches(_prov, batch_format="pyarrow")
        .union(pairs_ds.map_batches(_req, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_deliver, batch_format="pyarrow")
    )

    def _verify(group: pd.DataFrame) -> pd.DataFrame:
        dedup = group.drop_duplicates(subset=["id_a", "id_b", "half"])
        ha = dedup[dedup["half"] == 0][["id_a", "id_b", "sh"]]
        hb = dedup[dedup["half"] == 1][["id_a", "id_b", "sh"]]
        m = ha.merge(hb, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=group["id_a"].dtype),
                    "id_b": pd.Series(dtype=group["id_b"].dtype),
                    "jaccard": pd.Series(dtype=np.float64),
                }
            )
        sims = np.empty(len(m), np.float64)
        for i, (ba, bb) in enumerate(zip(m["sh_a"], m["sh_b"])):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            sims[i] = inter / union if union else 1.0
        out = m[["id_a", "id_b"]].copy()
        out["jaccard"] = sims
        return out[out["jaccard"] >= threshold]

    return delivered.groupby("part2").map_groups(_verify, batch_format="pandas")


def minhash_dedup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, persist: str = "memory",
                        persist_path: str | None = None, **kwargs):
    """Candidates -> exact verification, one call. The shingled (id,
    shingles) table feeds BOTH the LSH banding and the verification join;
    ``persist`` picks how it is shared — the table is comparable in bytes
    to the corpus itself, so the right mode is a function of scale:

    - ``"memory"`` (default): shingle once, ``materialize()`` into the
      object store. Fastest at bench scale; at 100 TB this is an
      object-store-resident copy of the corpus -> spill pressure.
    - ``"parquet"``: shingle once, ``write_parquet`` the table (to
      ``persist_path`` or a fresh temp dir), read it back for both
      consumers. One extra disk round-trip, zero object-store residency —
      the 100-TB mode. The directory is the caller's to clean up / reuse
      as a checkpoint.
    - ``"recompute"``: no sharing — the lazy shingle pipeline runs once
      per consumer (twice total). No storage cost at all; right when
      shingling is cheaper than the I/O of persisting.

    Materialized intermediates are block-compacted: shuffle operators pay
    per-block scheduling overhead, and the upstream read splits small
    inputs into hundreds of tiny blocks."""
    from .partitioning import compact_blocks

    shingle_n = kwargs.get("shingle_n", 3)
    lazy = shingle_docs(ds, text_col, id_col, shingle_n)
    if persist == "memory":
        shingled = compact_blocks(lazy.materialize())
        band_input = verify_input = shingled
    elif persist == "parquet":
        import tempfile

        import ray.data as rd

        path = persist_path or tempfile.mkdtemp(prefix="minhash_shingles_")
        lazy.write_parquet(path)
        band_input = verify_input = rd.read_parquet(path)
    elif persist == "recompute":
        band_input = lazy
        verify_input = shingle_docs(ds, text_col, id_col, shingle_n)
    else:
        raise ValueError(f"persist must be memory|parquet|recompute, got {persist!r}")
    kwargs.setdefault("dedupe_pairs", False)  # verify's buckets absorb band dups
    cands = compact_blocks(
        minhash_candidates(band_input, text_col, id_col, **kwargs).materialize()
    )
    return verify_jaccard_pairs(cands, verify_input, text_col, id_col,
                                shingle_n, threshold)


# --- simhash ---------------------------------------------------------------


def simhash_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 2):
    """(id, simhash int64) fingerprints."""

    def _stage(batch: pa.Table) -> pa.Table:
        shingles = shingle_tokens(batch, text_col, shingle_n)
        fp = simhash64(shingles)
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(fp.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_stage, batch_format="pyarrow")


def simhash_candidates(fp_ds, id_col: str = "doc_id", max_hamming: int = 3, max_bucket: int = 500,
                       bands: int = 4, partitions: int | None = None):
    """Near-dup candidates by band blocking over the 64-bit simhash: two
    fingerprints within Hamming distance ``bands - 1`` share at least one of
    the ``bands`` equal-width bands (pigeonhole).

    Scale notes: wider bands (fewer of them) give more selective buckets —
    ``bands=4`` (16-bit keys) is the scale-safe default with a ≤3 guarantee;
    ``bands=8`` (8-bit keys, ≤7 guarantee) only suits modest corpora because
    there are just 256 distinct buckets per band. For higher distances at
    scale use the rotate-and-sort scheme of Manku et al. (WWW 2007).
    Buckets reduce in ``(band, band_key % partitions)`` groups — one
    vectorised pandas self-merge + Hamming pass per group, so per-group
    Python overhead is O(bands * partitions), not O(buckets)."""
    assert 64 % bands == 0
    width = 64 // bands
    key_mask = np.uint64((1 << width) - 1)
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = max(8, auto_partitions(fp_ds) // bands)

    def _explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fp = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(fp)
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        rep = np.repeat(np.arange(n), bands)
        band = np.tile(np.arange(bands), n)
        keys = (fp[rep] >> (band.astype(np.uint64) * np.uint64(width))) & key_mask
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(rep, pa.int64())),
                "band": pa.array(band, pa.int32()),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "simhash": pa.array(fp[rep].astype(np.int64), pa.int64()),
            }
        )

    exploded = fp_ds.map_batches(_explode, batch_format="pyarrow")

    def _add_part(batch: pa.Table) -> pa.Table:
        part = batch["band_key"].to_numpy() % np.int64(partitions)
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    parted = exploded.map_batches(_add_part, batch_format="pyarrow")

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        g = g[g.groupby("band_key").cumcount() < max_bucket].reset_index(drop=True)
        empty = {
            "id_a": pd.Series(dtype=g[id_col].dtype),
            "id_b": pd.Series(dtype=g[id_col].dtype),
            "hamming": pd.Series(dtype=np.int64),
        }
        if len(g) < 2:
            return pd.DataFrame(empty)
        idx = np.arange(len(g))
        left = pd.DataFrame({"band_key": g["band_key"].to_numpy(), "i": idx})
        m = left.merge(left.rename(columns={"i": "j"}), on="band_key")
        m = m[m["i"] < m["j"]]
        if len(m) == 0:
            return pd.DataFrame(empty)
        i, j = m["i"].to_numpy(), m["j"].to_numpy()
        fps = g["simhash"].to_numpy().astype(np.uint64)
        d = hamming64(fps[i], fps[j])
        keep = d <= max_hamming
        ids = g[id_col].to_numpy()
        return pd.DataFrame(
            {"id_a": ids[i[keep]], "id_b": ids[j[keep]], "hamming": d[keep]}
        )

    pairs = parted.groupby(["band", "part"]).map_groups(_pairs, batch_format="pandas")
    return _dedupe_pair_rows(pairs, "hamming", partitions, value_agg="min")


# --- cluster collapse ------------------------------------------------------


# introspection aid for benchmarks/tests: number of distributed rounds the
# last connected_components_collapse call executed (including the final
# converged-verification round)
last_cc_rounds = 0


def _local_cc_batch(batch: pa.Table) -> pa.Table:
    """Single-task vectorized union-find over a complete (id_a, id_b) edge
    list: numpy min-label iteration with pointer jumping, O(log n) passes
    at C speed. Labels compare by node VALUE (dictionary codes are ranked
    through a sort of the distinct nodes) so rep_id is the smallest id in
    each component — identical semantics to the distributed rounds."""
    import pyarrow.compute as pc

    both = pa.chunked_array([batch["id_a"], batch["id_b"]]).combine_chunks()
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary
    n = len(uniq)
    order = pc.array_sort_indices(uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    ne = batch.num_rows
    ea, eb = rank[codes[:ne]], rank[codes[ne:]]
    sorted_vals = pc.take(uniq, pa.array(order))
    lbl = np.arange(n, dtype=np.int64)
    while True:
        prev = lbl.copy()
        np.minimum.at(lbl, ea, lbl[eb])
        np.minimum.at(lbl, eb, lbl[ea])
        lbl = lbl[lbl]  # pointer jump: collapses chains in O(log n) passes
        if np.array_equal(lbl, prev):
            break
    return pa.table(
        {"doc_id": sorted_vals, "rep_id": pc.take(sorted_vals, pa.array(lbl))}
    )


def connected_components_collapse(
    pairs_ds,
    max_rounds: int = 30,
    partitions: int | None = None,
    local_threshold: int = 2_000_000,
    checkpoint_dir: str | None = None,
):
    """Min-label connected components over a pair table: returns
    (doc_id, rep_id) where rep_id is the smallest id in each component.

    Hybrid execution (the small-side guard pattern, like a broadcast
    join): the pair table is the CONTRACTED graph — candidate duplicate
    pairs, not the corpus — so it is normally orders of magnitude smaller
    than the input. When it holds <= ``local_threshold`` pairs, the
    compact (id_a, id_b) list is coalesced into ONE worker task and
    collapsed by a vectorized numpy union-find (``_local_cc_batch``,
    milliseconds for millions of edges); ~10 all-to-all barriers become a
    single coalesce. Even at 100 TB, a 0.1 % dup rate yields ~1e8 pairs
    (a few GB) — one worker's memory — so the default threshold is
    conservative; pass ``local_threshold=0`` to force the distributed
    path, which stays the unbounded-scale guarantee.

    Distributed path: each round, every node's candidate labels are (a)
    its own label, (b) its neighbors' labels — looked up through the
    static edge table — and (c) its label's label (pointer jumping, which
    collapses long chains in O(log diameter) rounds); the new label is
    the min. Neighbor propagation makes min labels travel AGAINST pointer
    direction too (pure pointer jumping is wrong on e.g. a star 1-6, 5-6:
    node 5 never learns 1).

    Scale shape of the distributed path: per round, ONE co-partitioned
    hash-bucket lookup join (union shuffle of compact (key, node) /
    (key, label) rows, vectorized ``pyarrow.Table.join`` per bucket) plus
    ONE partitioned-vectorized min/max reduce (hash(node) % partitions ->
    a single pandas groupby per partition group — native aggregates would
    pay ~0.3 ms of Python per DISTINCT node). Nothing materializes on the
    driver; per-round cost is O(edges + nodes) shuffled bytes.

    ``checkpoint_dir``: persist the label table after every distributed
    round (``state.checkpoint.CCRoundCheckpoint``); a killed collapse
    re-run with the same pair table and checkpoint_dir resumes from the
    last completed round instead of round 0. Lineage is an
    order/partitioning-invariant fingerprint of the pair table (xor of
    64-bit row hashes + row count + partitions), so a changed input
    invalidates stale rounds. The local path finishes in one task and
    ignores ``checkpoint_dir``."""
    global last_cc_rounds
    import time as _time

    import pyarrow.compute as pc

    from .partitioning import auto_partitions

    pairs_compact = pairs_ds.map_batches(
        lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
    ).materialize()
    n_pairs = pairs_compact.count()
    if n_pairs <= local_threshold:
        last_cc_rounds = 0
        return pairs_compact.repartition(1).map_batches(
            _local_cc_batch, batch_size=None, batch_format="pyarrow"
        )

    if partitions is None:
        partitions = auto_partitions(pairs_compact)

    ckpt, lineage, resume_manifest = None, None, None
    if checkpoint_dir is not None:
        from ..state.checkpoint import CCRoundCheckpoint

        def _fp_block(batch: pa.Table) -> pa.Table:
            import polars as pl

            h = pl.from_arrow(
                pa.table(
                    {
                        "a": batch["id_a"].combine_chunks(),
                        "b": batch["id_b"].combine_chunks(),
                    }
                )
            ).hash_rows(seed=31).to_numpy()
            x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
            return pa.table(
                {"fp": pa.array([int(np.uint64(x)) & ((1 << 63) - 1)], pa.int64())}
            )

        fp = 0
        for r in pairs_compact.map_batches(_fp_block, batch_format="pyarrow").take_all():
            fp ^= r["fp"]
        lineage = {"pairs_fp": fp, "n_pairs": n_pairs, "partitions": partitions}
        ckpt = CCRoundCheckpoint(checkpoint_dir)
        resume_manifest = ckpt.last_valid_round(lineage, max_rounds)

    from .partitioning import compact_blocks as _compact

    def _edges(batch: pa.Table) -> pa.Table:
        a, b = batch["id_a"], batch["id_b"]
        return pa.concat_tables(
            [pa.table({"node": a, "peer": b}), pa.table({"node": b, "peer": a})]
        ).combine_chunks()

    # static bidirectional edge table, reused every round
    edges = _compact(pairs_compact.map_batches(_edges, batch_format="pyarrow").materialize())

    def _bucket_of(col, parts: int) -> pa.Array:
        import polars as pl

        if hasattr(col, "combine_chunks"):
            col = col.combine_chunks()
        h = pl.from_arrow(col).hash(seed=89).to_numpy()
        return pa.array((h % np.uint64(parts)).astype(np.int32))

    def _init_min(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("node", as_index=False)["peer"].min()
        g["rep"] = np.minimum(g["peer"], g["node"])
        return g[["node", "rep"]]

    def _final(lbl_ds):
        return lbl_ds.map_batches(
            lambda b: pa.table({"doc_id": b["node"], "rep_id": b["rep"]}),
            batch_format="pyarrow",
        )

    if resume_manifest is not None:
        labels = _compact(ckpt.load_round(resume_manifest["round"]))
        if resume_manifest.get("changed") == 0:
            last_cc_rounds = 0  # already converged — nothing executed here
            return _final(labels)
        start_round = resume_manifest["round"] + 1
    else:
        t0 = _time.perf_counter()
        labels = _compact(
            edges.map_batches(
                lambda b: b.append_column("part", _bucket_of(b["node"], partitions)),
                batch_format="pyarrow",
            )
            .groupby("part")
            .map_groups(_init_min, batch_format="pandas")
            .materialize()
        )
        if ckpt is not None:
            ckpt.save_round(0, labels, lineage, changed=-1,
                            wall=_time.perf_counter() - t0)
        start_round = 1

    def _requests(batch: pa.Table) -> pa.Table:
        # lookup requests: key -> deliver label(key) to tgt.
        # edge rows ask for label(peer) on behalf of node; label rows ask
        # for label(rep) on behalf of node (pointer jump).
        if "peer" in batch.column_names:
            t = pa.table({"key": batch["peer"], "tgt": batch["node"]})
        else:
            t = pa.table({"key": batch["rep"], "tgt": batch["node"]})
        return (
            t.append_column("val", pa.nulls(t.num_rows, t["key"].type))
            .append_column("part", _bucket_of(t["key"], partitions))
            .append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))
        )

    def _providers(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": batch["node"],
                "tgt": pa.nulls(batch.num_rows, batch["node"].type),
                "val": batch["rep"],
            }
        )
        return t.append_column("part", _bucket_of(t["key"], partitions)).append_column(
            "__side", pa.array(np.ones(t.num_rows, np.int8))
        )

    def _resolve(group: pa.Table) -> pa.Table:
        side = group["__side"]
        req = group.filter(pc.equal(side, 0)).select(["key", "tgt"])
        prov = group.filter(pc.equal(side, 1)).select(["key", "val"])
        j = req.join(prov, keys="key", join_type="inner")
        return pa.table({"node": j["tgt"], "cand": j["val"]})

    last_cc_rounds = 0
    for rnd in range(start_round, max_rounds + 1):
        t0 = _time.perf_counter()
        lookups = (
            edges.map_batches(_requests, batch_format="pyarrow")
            .union(labels.map_batches(_requests, batch_format="pyarrow"))
            .union(labels.map_batches(_providers, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(_resolve, batch_format="pyarrow")
        )
        # candidates: looked-up labels (old=null) + each node's own label
        # (old=rep, so Max(old) recovers the previous label per node)
        cands = lookups.map_batches(
            lambda b: b.append_column("old", pa.nulls(b.num_rows, b["cand"].type)),
            batch_format="pyarrow",
        ).union(
            labels.map_batches(
                lambda b: pa.table({"node": b["node"], "cand": b["rep"], "old": b["rep"]}),
                batch_format="pyarrow",
            )
        )
        # ONE materialize per round: the reduced table serves as the next
        # round's label table directly (_requests/_providers project the
        # spare `old` column away); the changed-count is a cheap second
        # pass over the cached blocks
        def _min_max(group: pd.DataFrame) -> pd.DataFrame:
            rep = group.groupby("node", as_index=False)["cand"].min().rename(
                columns={"cand": "rep"}
            )
            # old is null on lookup rows; every node has exactly one
            # non-null self row (pandas max chokes on None-mixed objects)
            old = (
                group.dropna(subset=["old"])
                .groupby("node", as_index=False)["old"]
                .max()
            )
            return rep.merge(old, on="node")

        new_labels = _compact(
            cands.map_batches(
                lambda b: b.append_column("part", _bucket_of(b["node"], partitions)),
                batch_format="pyarrow",
            )
            .groupby("part")
            .map_groups(_min_max, batch_format="pandas")
            .materialize()
        )
        changed = new_labels.map_batches(
            lambda b: pa.table(
                {"c": pc.cast(pc.less(b["rep"], b["old"]), pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        last_cc_rounds += 1
        if ckpt is not None:
            ckpt.save_round(rnd, labels, lineage, changed=int(changed),
                            wall=_time.perf_counter() - t0)
        if not changed:
            break
    return _final(labels)


# --- train/eval decontamination ---------------------------------------------


def contamination_pairs(train_ds, eval_ds, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 5,
                        partitions: int | None = None, max_bucket: int = 1024):
    """Train/eval overlap detection (decontamination): every
    ``(eval_id, train_id)`` pair sharing at least one word ``shingle_n``-gram,
    with the count of distinct shared shingles — the standard n-gram
    contamination check run before training on a corpus that might contain
    benchmark text (public recipe; e.g. the GPT-3/C4 appendix
    decontamination procedure).

    Scale shape: both sides shingle ONCE (the vectorised
    :func:`shingle_tokens` kernel); only slim ``(shingle_hash, id, side)``
    rows shuffle — the text never moves. Shingles co-locate by hash, each
    partition does one vectorised pandas merge (eval x train per shingle),
    and per-pair counts reduce in a second slim partitioned pass. Shingles
    present in more than ``max_bucket`` train docs are dropped (a boiler-
    plate n-gram shared by thousands of documents is not a contamination
    signal, and the cap bounds the per-shingle cross product) — raise
    ``shingle_n`` rather than ``max_bucket`` if that triggers.

    Returns a Dataset ``(eval_id, train_id, n_shared)``. Exact modulo
    64-bit shingle-hash collisions (same caveat as minhash verification).
    """
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = max(auto_partitions(train_ds), auto_partitions(eval_ds))

    def _emit(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            # drop_short: docs under shingle_n words have NO n-grams — the
            # pseudo-shingle used by near-dup would report two short docs as
            # "sharing an n-gram", which is not a contamination signal
            shingles = shingle_tokens(batch, text_col, shingle_n, drop_short=True)
            ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            lens = np.array([len(s) for s in shingles], dtype=np.int64)
            h = (np.concatenate(shingles) if len(shingles) else
                 np.empty(0, dtype=np.uint64))
            return pa.table(
                {
                    "h": pa.array(h, pa.uint64()),
                    "id": pa.array(np.repeat(ids, lens), pa.int64()),
                    "side": pa.array(
                        np.full(int(lens.sum()), side, dtype=np.int8), pa.int8()
                    ),
                    "part": pa.array(
                        (h % np.uint64(partitions)).astype(np.int32), pa.int32()
                    ),
                }
            )

        return _f

    both = train_ds.map_batches(_emit(0), batch_format="pyarrow").union(
        eval_ds.map_batches(_emit(1), batch_format="pyarrow")
    )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        ev = group[group["side"] == 1]
        tr = group[group["side"] == 0]
        if ev.empty or tr.empty:
            return pd.DataFrame({"eval_id": [], "train_id": [], "n": []}).astype(
                {"eval_id": "int64", "train_id": "int64", "n": "int64"}
            )
        # drop ubiquitous shingles before the per-shingle cross product
        counts = tr.groupby("h")["id"].size()
        tr = tr[tr["h"].map(counts) <= max_bucket]
        m = ev.merge(tr, on="h", suffixes=("_e", "_t"))
        out = (
            m.groupby(["id_e", "id_t"], sort=False).size().reset_index(name="n")
        )
        return out.rename(columns={"id_e": "eval_id", "id_t": "train_id"}).astype(
            {"eval_id": "int64", "train_id": "int64", "n": "int64"}
        )

    partials = both.groupby("part").map_groups(_match, batch_format="pandas")

    # a pair's shingles span partitions -> one more slim reduce keyed by pair
    def _pair_part(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame(
            {
                "eval_id": pl.from_arrow(batch["eval_id"].combine_chunks()),
                "train_id": pl.from_arrow(batch["train_id"].combine_chunks()),
            }
        )
        hp = (df.hash_rows(seed=83).to_numpy() % np.uint64(partitions)).astype(np.int32)
        return batch.append_column("ppart", pa.array(hp))

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["eval_id", "train_id"], sort=False)["n"]
            .sum()
            .reset_index(name="n_shared")
        )
        return out.astype({"eval_id": "int64", "train_id": "int64", "n_shared": "int64"})

    return (
        partials.map_batches(_pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(_sum, batch_format="pandas")
    )


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 4, threshold: float = 0.5,
                        partitions: int | None = None, max_bucket: int = 1024):
    """EXACT word n-gram Jaccard near-duplicate pairs: every ``(a, b)``
    with ``|A ∩ B| / |A ∪ B| >= threshold`` over the docs' distinct
    ``shingle_n``-gram sets — the deterministic ground-truth variant of
    MinHash near-dup (no signature approximation, no banding misses),
    affordable whenever shingle buckets are bounded.

    Scale shape: one vectorised shingle pass (:func:`shingle_tokens`,
    standard n-gram semantics — docs under ``shingle_n`` words emit
    nothing); only slim ``(shingle_hash, id, nsh)`` rows enter the ONE
    hash-partitioned shuffle, where ``nsh`` is the doc's distinct-shingle
    count RIDDEN ALONG with every row so pair Jaccards never need a
    size join (union = nsh_a + nsh_b - inter). Each partition drops
    ubiquitous shingles (> ``max_bucket`` docs — boilerplate n-grams are
    not a near-dup signal and the cap bounds the per-shingle cross
    product), self-joins by shingle, and pre-reduces pair counts; a
    second slim pair-keyed reduce sums the per-partition partials and
    computes the exact Jaccard. Text never moves.

    Returns a Dataset ``(doc_a, doc_b, n_shared, jaccard)``. Exact modulo
    64-bit shingle-hash collisions (same caveat as minhash verification).
    """
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _emit(batch: pa.Table) -> pa.Table:
        shingles = shingle_tokens(batch, text_col, shingle_n, drop_short=True)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        lens = np.array([len(s) for s in shingles], dtype=np.int64)
        h = (np.concatenate(shingles) if len(shingles) else
             np.empty(0, dtype=np.uint64))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "id": pa.array(np.repeat(ids, lens), pa.int64()),
                "nsh": pa.array(np.repeat(lens, lens), pa.int64()),
                "part": pa.array(
                    (h % np.uint64(partitions)).astype(np.int32), pa.int32()
                ),
            }
        )

    emitted = ds.map_batches(_emit, batch_format="pyarrow")

    def _match(group: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(group).select(["h", "id", "nsh"])
        ok = df.group_by("h").len(name="c").filter(pl.col("c") <= max_bucket)
        df = df.join(ok.select("h"), on="h", how="semi")
        m = df.join(df, on="h", suffix="_b").filter(pl.col("id") < pl.col("id_b"))
        out = (
            m.group_by(["id", "id_b"])
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("nsh").first().alias("nsh_a"),
                pl.col("nsh_b").first().alias("nsh_b"),
            )
            .rename({"id": "doc_a", "id_b": "doc_b"})
        )
        return out.to_arrow()

    partials = emitted.groupby("part").map_groups(_match, batch_format="pyarrow")

    # a pair's shared shingles span partitions -> one more slim pair-keyed
    # reduce, then the exact Jaccard from the global intersection count
    def _pair_part(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).select(["doc_a", "doc_b"])
        hp = (df.hash_rows(seed=83).to_numpy() % np.uint64(partitions)).astype(np.int32)
        return batch.append_column("ppart", pa.array(hp))

    def _finish(group: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(group)
            .group_by(["doc_a", "doc_b"])
            .agg(
                pl.col("n").sum().alias("n_shared"),
                pl.col("nsh_a").first(),
                pl.col("nsh_b").first(),
            )
            .with_columns(
                (
                    pl.col("n_shared").cast(pl.Float64)
                    / (pl.col("nsh_a") + pl.col("nsh_b") - pl.col("n_shared"))
                ).alias("jaccard")
            )
            .filter(pl.col("jaccard") >= threshold)
            .select(["doc_a", "doc_b", "n_shared", "jaccard"])
        )
        return out.to_arrow()

    return (
        partials.map_batches(_pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(_finish, batch_format="pyarrow")
    )


# --- end-to-end near-dup corpus dedup ----------------------------------------


def _keep_best_losers(ds, labels, id_col: str, score_col: str,
                      broadcast_max: int, partitions: int):
    """Losers under the keep-BEST policy: every labeled component member
    except the ``(score desc, id asc)`` argmax of its component — the
    keep-the-highest-quality-copy rule production dedup uses (score =
    quality signal / negated perplexity / length) instead of min-id.

    Scale shape: labeled docs are the minority, so their ``(id, score)``
    rows are extracted by streaming the corpus through a labeled-id semi
    filter (broadcast set under ``broadcast_max``, co-partitioned semi
    bucket join above it); winners are picked per component in ONE slim
    hash(rep_id)-partitioned pass with a vectorised in-partition argmax —
    components never cross partitions, text never moves."""
    import pyarrow.compute as pc
    import ray

    labels = labels.materialize()
    n_labeled = labels.count()

    def _slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch[id_col], pa.int64()),
                "score": pc.cast(batch[score_col], pa.float64()),
            }
        )

    if n_labeled <= broadcast_max:
        # labeled-id set assembled in a WORKER from the labels blocks
        def _ids(*tables):
            return pa.concat_tables(
                [t.select(["doc_id"]) for t in tables]
            )["doc_id"].combine_chunks()

        ref = ray.remote(num_cpus=1)(_ids).remote(*labels.to_arrow_refs())

        def _semi(batch: pa.Table) -> pa.Table:
            keep_ids = ray.get(ref)
            mask = pc.is_in(pc.cast(batch[id_col], keep_ids.type), value_set=keep_ids)
            return _slim(batch.filter(mask))

        scores = ds.map_batches(_semi, batch_format="pyarrow")
    else:
        from .join import bucket_join

        scores = bucket_join(
            ds.map_batches(_slim, batch_format="pyarrow"),
            labels.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow"),
            keys="doc_id", join_type="left semi", partitions=partitions,
        )

    from .join import bucket_join

    joined = bucket_join(labels, scores, keys="doc_id", partitions=partitions)

    def _part(batch: pa.Table) -> pa.Table:
        rep = batch["rep_id"].combine_chunks().to_numpy(zero_copy_only=False)
        p = (rep.astype(np.uint64) % np.uint64(partitions)).astype(np.int32)
        return batch.append_column("cpart", pa.array(p))

    def _losers(group: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(group).select(["rep_id", "doc_id", "score"])
        winners = (
            df.sort(["rep_id", "score", "doc_id"], descending=[False, True, False])
            .group_by("rep_id", maintain_order=True)
            .first()
        )
        out = df.join(
            winners.select(["rep_id", "doc_id"]), on=["rep_id", "doc_id"], how="anti"
        )
        return out.select(["doc_id"]).rename({"doc_id": id_col}).to_arrow()

    return (
        joined.map_batches(_part, batch_format="pyarrow")
        .groupby("cpart")
        .map_groups(_losers, batch_format="pyarrow")
    )


def near_dedup_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.8, persist: str = "memory",
                      partitions: int | None = None,
                      loser_broadcast_max: int = 5_000_000,
                      cc_checkpoint_dir: str | None = None,
                      keep: str = "min_id", keep_score_col: str | None = None,
                      pairs=None, **kwargs):
    """The full near-duplicate REMOVAL pipeline in one call: MinHash+LSH
    candidates -> exact Jaccard verification (:func:`minhash_dedup_pairs`)
    -> connected-component collapse (:func:`connected_components_collapse`)
    -> one survivor per component, everything else filtered out of the
    ORIGINAL dataset.

    ``keep`` picks the survivor: ``"min_id"`` (default — the component
    representative) or ``"best"`` — the member maximising
    ``(keep_score_col desc, id asc)``, the keep-the-highest-quality-copy
    policy (see :func:`_keep_best_losers` for its scale shape).

    ``pairs``: optional pre-computed duplicate-pair Dataset with columns
    ``(id_a, id_b)`` — plug in ANY candidate generator
    (:func:`ngram_jaccard_pairs` for exact ground truth,
    :func:`simhash_candidates`, :func:`embedding_near_dup_pairs` for
    semantic pairs) in place of the default MinHash+LSH path.

    Scale shape is the union of its parts: text shuffles only inside the
    shingle/verify machinery (per ``persist`` mode), the component collapse
    touches only the pair table, and survivors are selected by streaming
    the original corpus through a loser anti-filter (losers are the
    minority; above ``loser_broadcast_max`` the filter falls back to the
    co-partitioned left-anti bucket join, same as :func:`exact_dedup`).

    Returns the deduplicated Dataset (all original columns)."""
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    losers = near_dup_losers(
        ds, pairs=pairs, text_col=text_col, id_col=id_col, threshold=threshold,
        persist=persist, partitions=partitions, keep=keep,
        keep_score_col=keep_score_col, cc_checkpoint_dir=cc_checkpoint_dir,
        loser_broadcast_max=loser_broadcast_max, **kwargs,
    )
    out, _ = anti_filter_ids(ds, losers, id_col, loser_broadcast_max, partitions)
    return out


def near_dup_losers(ds, pairs=None, text_col: str = "text",
                    id_col: str = "doc_id", threshold: float = 0.8,
                    persist: str = "memory", partitions: int | None = None,
                    keep: str = "min_id", keep_score_col: str | None = None,
                    cc_checkpoint_dir: str | None = None,
                    loser_broadcast_max: int = 5_000_000, **kwargs):
    """Slim loser-id Dataset of :func:`near_dedup_corpus` (same arguments):
    candidate pairs -> connected components -> everything except the
    survivor of each component, under the chosen ``keep`` policy."""
    import pyarrow.compute as pc

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    if pairs is None:
        pairs = minhash_dedup_pairs(ds, text_col, id_col, threshold,
                                    persist=persist, **kwargs)
    labels = connected_components_collapse(pairs, partitions=partitions,
                                           checkpoint_dir=cc_checkpoint_dir)
    if labels.schema() is None:  # zero candidate pairs → no components
        import ray.data as rd

        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
    if keep == "best":
        if keep_score_col is None:
            raise ValueError('keep="best" requires keep_score_col')
        return _keep_best_losers(ds, labels, id_col, keep_score_col,
                                 loser_broadcast_max, partitions)
    if keep == "min_id":
        return labels.map_batches(
            lambda b: pa.table(
                {id_col: b["doc_id"].filter(pc.not_equal(b["doc_id"], b["rep_id"]))}
            ),
            batch_format="pyarrow",
        )
    raise ValueError(f"unknown keep policy {keep!r}")


# --- exact-substring span scrub ---------------------------------------------


def _positional_gram_hashes(batch: pa.Table, text_col: str, n: int):
    """Rolling 64-bit hash of EVERY word ``n``-gram occurrence in a batch
    (same combine as :func:`shingle_tokens`, but positions kept and NOT
    deduplicated — span removal needs within-doc repeats too). Returns
    ``(hashes, row_idx, pos)`` with ``pos`` the 0-based start-word index;
    rows under ``n`` words emit nothing (no n-grams)."""
    import polars as pl

    from ..sketches.hashing import splitmix64

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pl.from_arrow(col).fill_null("").str.split(" ")
    lengths = words.list.len().to_numpy().astype(np.int64)
    n_rows = len(lengths)
    flat_hashes = words.explode().hash(seed=41).to_numpy().astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    total = int(offsets[-1])
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.int64))
    if total == 0:
        return empty
    if len(flat_hashes) != total:  # explode() null slots for empty lists
        lengths = np.maximum(lengths, 1)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        total = int(offsets[-1])
    row_of = np.repeat(np.arange(n_rows), lengths)
    C = np.uint64(0x9E3779B97F4A7C15)
    comb = flat_hashes.copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            shifted = np.zeros_like(flat_hashes)
            if j < total:  # keep the *C fold even when the whole batch is
                # shorter than n, so hashes stay batch-size-invariant
                same_row = row_of[j:] == row_of[: total - j]
                shifted[: total - j][same_row] = flat_hashes[j:][same_row]
            comb = comb * C + shifted
        sh = splitmix64(comb)
    pos_in_row = np.arange(total) - offsets[row_of]
    valid = pos_in_row + (n - 1) < lengths[row_of]
    return sh[valid], row_of[valid], pos_in_row[valid]


def duplicate_span_scrub(ds, text_col: str = "text", id_col: str = "doc_id",
                         n: int = 50, partitions: int | None = None):
    """Exact-substring deduplication by SPAN REMOVAL (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    word-level): any word ``n``-gram occurring more than once in the
    corpus — in another doc or at another position of the same doc — has
    all its occurrences' word spans ``[p, p+n)`` removed; the surviving
    words (original order) are re-joined. Unlike whole-doc dedup this
    cuts boilerplate out of otherwise-unique documents.

    Scale shape (two slim exchanges, text moves ONCE):
    1. per-batch positional gram hashes (vectorised rolling combine) →
       slim ``(h, id, pos)`` rows, hash-partitioned; per-hash-partition
       occurrence count; hashes with count > 1 emit their ``(id, pos)``
       occurrences — output bounded by duplicated occurrences;
    2. one doc-keyed exchange of (docs ∪ covered-position rows): equal
       ids co-locate, so each group scrubs locally — interval-union
       coverage via a +1/−1 delta array + prefix sum over flat word
       coordinates, one take + binary_join rebuilds the text. Docs
       without covered spans pass through unchanged.

    Returns ``(id, text, n_removed:int64)`` with ``text`` scrubbed (empty
    string when fully covered). Exact modulo 64-bit gram-hash collisions
    (same caveat as minhash verification). Docs under ``n`` words have no
    n-grams and always pass through.
    """
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _emit(batch: pa.Table) -> pa.Table:
        h, row_idx, pos = _positional_gram_hashes(batch, text_col, n)
        ids = batch[id_col].combine_chunks()
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "id": pc.take(ids, pa.array(row_idx, pa.int64())),
                "pos": pa.array(pos, pa.int64()),
                "part": pa.array((h % np.uint64(partitions)).astype(np.int32)),
            }
        )

    grams = ds.map_batches(_emit, batch_format="pyarrow")

    def _dups(group: pd.DataFrame) -> pd.DataFrame:
        c = group.groupby("h")["pos"].transform("size")
        out = group.loc[c > 1, ["id", "pos"]]
        return out

    covered = grams.groupby("part").map_groups(_dups, batch_format="pandas")

    # ONE doc-keyed exchange: doc rows (id, text, pos=null) union covered
    # rows (id, text=null, pos). Equal ids share a dpart group, so the
    # scrub is local to each group — no pyarrow join (which rejects
    # list-typed payloads), and the text moves exactly once.
    schema = ds.schema().base_schema
    id_type = schema.field(id_col).type
    text_type = schema.field(text_col).type

    def _dpart(ids: pa.Array) -> pa.Array:
        hp = pl.from_arrow(ids).hash(seed=29).to_numpy()
        return pa.array((hp % np.uint64(partitions)).astype(np.int32))

    def _tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        return pa.table(
            {
                id_col: ids,
                text_col: batch[text_col],
                "pos": pa.nulls(batch.num_rows, pa.int64()),
                "dpart": _dpart(ids),
            }
        )

    def _tag_cov(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["id"].combine_chunks(), id_type)
        return pa.table(
            {
                id_col: ids,
                text_col: pa.nulls(batch.num_rows, text_type),
                "pos": pc.cast(batch["pos"], pa.int64()),
                "dpart": _dpart(ids),
            }
        )

    both = (
        ds.map_batches(lambda b: _tag_docs(b.select([id_col, text_col])),
                       batch_format="pyarrow")
        .union(covered.map_batches(_tag_cov, batch_format="pyarrow"))
    )

    def _scrub_group(group: pa.Table) -> pa.Table:
        is_cov = pc.is_valid(group["pos"])
        docs = group.filter(pc.invert(is_cov))
        cov = group.filter(is_cov)
        words = pl.from_arrow(
            docs[text_col].combine_chunks()
        ).fill_null("").str.split(" ")
        lens = words.list.len().to_numpy().astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        total = int(offs[-1])
        # locate each covered (id, pos) row's doc (ids unique per corpus)
        doc_ids = docs[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        cov_ids = cov[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(doc_ids, kind="mergesort")
        row_idx = order[np.searchsorted(doc_ids[order], cov_ids)] if len(cov_ids) \
            else np.empty(0, np.int64)
        pos = cov["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        # interval union via +1/-1 deltas in FLAT word coordinates
        delta = np.zeros(total + 1, np.int64)
        a = offs[row_idx] + pos
        np.add.at(delta, a, 1)
        np.add.at(delta, a + n, -1)  # p+n <= len(doc) by construction
        keep_flat = np.cumsum(delta[:-1]) == 0
        flat_words = words.explode()
        if len(flat_words) != total:  # explode() null slot for empty lists
            keep_flat = np.ones(len(flat_words), bool)
            total = len(flat_words)
            lens = np.maximum(lens, 1)
            offs = np.concatenate([[0], np.cumsum(lens)])
        if total:
            # offs[:-1] < total always (str.split yields >= 1 token/row),
            # so reduceat's trailing-index quirk can't trigger
            kept_counts = np.add.reduceat(keep_flat.astype(np.int64), offs[:-1])
        else:
            kept_counts = np.zeros(len(lens), np.int64)
        flat_arr = flat_words.to_arrow()
        if isinstance(flat_arr, pa.ChunkedArray):
            flat_arr = flat_arr.combine_chunks()
        kept_words = flat_arr.take(pa.array(np.flatnonzero(keep_flat), pa.int64()))
        new_off = np.concatenate([[0], np.cumsum(kept_counts)])
        out_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()) if new_off[-1] < 2**31
            else pa.array(new_off), kept_words
        )
        texts = pc.binary_join(out_lists, pa.scalar(" ", flat_arr.type))
        return pa.table(
            {
                id_col: docs[id_col],
                text_col: pc.cast(texts, pa.string()),
                "n_removed": pa.array(lens - kept_counts, pa.int64()),
            }
        )

    return both.groupby("dpart").map_groups(_scrub_group, batch_format="pyarrow")


def _line_long(texts, sep: str, words_per_line: int | None):
    """Long-form lines for a batch's text column: ``(row_idx, line_no,
    lines)`` numpy/polars arrays. ``words_per_line`` set → fixed word
    windows stand in for lines (corpora without newline structure);
    otherwise split on ``sep``. Vectorised (one polars split/explode, no
    Python loop over rows)."""
    import polars as pl

    texts = texts.fill_null("")
    if words_per_line is None:
        lines = texts.str.split(sep)
        lens = lines.list.len().to_numpy().astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        row_idx = np.repeat(np.arange(len(lens)), lens)
        line_no = np.arange(int(offs[-1])) - offs[row_idx]
        return row_idx, line_no, lines.explode()
    words = texts.str.split(" ")
    lens = words.list.len().to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    row_idx = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(int(offs[-1])) - offs[row_idx]
    grouped = (
        pl.DataFrame(
            {
                "r": row_idx,
                "ln": pos // max(words_per_line, 1),
                "w": words.explode(),
            }
        )
        .group_by(["r", "ln"], maintain_order=True)
        .agg(pl.col("w").str.join(" "))
    )
    return (
        grouped["r"].to_numpy().astype(np.int64),
        grouped["ln"].to_numpy().astype(np.int64),
        grouped["w"],
    )


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
               sep: str = "\n", words_per_line: int | None = None,
               partitions: int | None = None):
    """Corpus-wide LINE deduplication (the CCNet / RefinedWeb pre-filter:
    Wenzek et al. 2020 §3.1, Penedo et al. 2023): every line keeps only
    its globally FIRST occurrence — ordered by ``(doc_id, line_no)`` —
    and every other occurrence (in other docs or later in the same doc)
    is removed; surviving lines re-join with ``sep``. This strips
    boilerplate headers/footers/navigation shared across pages without
    dropping whole documents. ``words_per_line`` chunks each doc into
    fixed word windows when the corpus has no newline structure.

    Scale shape (two slim exchanges; the text moves ONCE):
    1. per-batch line split (vectorised) → slim ``(h1, h2, id, line_no)``
       rows, hash-partitioned by the 128-bit line hash; occurrences of a
       line co-locate, so each partition picks the global winner with one
       vectorised sort + cumcount — losers ``(id, line_no)`` emit;
    2. one doc-keyed exchange of (docs ∪ loser rows) — equal ids share a
       group, each group re-splits its docs locally (recompute beats
       shuffling line text, the same trade as minhash's ``recompute``
       shingle mode) and drops flagged line slots via flat-coordinate
       masking + one take + binary_join.

    Returns ``(id, text, n_dropped:int64)`` — ``text`` with duplicated
    lines removed (empty string when every line was a dup). Exact modulo
    128-bit line-hash collisions."""
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _emit(batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch[text_col].combine_chunks())
        row_idx, line_no, lines = _line_long(texts, sep, words_per_line)
        h1 = lines.hash(seed=67).to_numpy().astype(np.uint64)
        h2 = lines.hash(seed=131).to_numpy().astype(np.uint64)
        ids = batch[id_col].combine_chunks()
        return pa.table(
            {
                "h1": pa.array(h1, pa.uint64()),
                "h2": pa.array(h2, pa.uint64()),
                "id": pc.take(ids, pa.array(row_idx, pa.int64())),
                "line_no": pa.array(line_no, pa.int64()),
                "part": pa.array((h1 % np.uint64(partitions)).astype(np.int32)),
            }
        )

    slim = ds.map_batches(_emit, batch_format="pyarrow")

    def _losers(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["id", "line_no"], kind="mergesort")
        dup = g.groupby(["h1", "h2"], sort=False).cumcount() > 0
        return g.loc[dup.to_numpy(), ["id", "line_no"]]

    losers = slim.groupby("part").map_groups(_losers, batch_format="pandas")

    # ONE doc-keyed exchange: docs (id, text, line_no=null) ∪ losers
    # (id, text=null, line_no) — the duplicate_span_scrub group topology.
    schema = ds.schema().base_schema
    id_type = schema.field(id_col).type
    text_type = schema.field(text_col).type

    def _dpart(ids: pa.Array) -> pa.Array:
        hp = pl.from_arrow(ids).hash(seed=29).to_numpy()
        return pa.array((hp % np.uint64(partitions)).astype(np.int32))

    def _tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        return pa.table(
            {
                id_col: ids,
                text_col: batch[text_col],
                "line_no": pa.nulls(batch.num_rows, pa.int64()),
                "dpart": _dpart(ids),
            }
        )

    def _tag_losers(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["id"].combine_chunks(), id_type)
        return pa.table(
            {
                id_col: ids,
                text_col: pa.nulls(batch.num_rows, text_type),
                "line_no": pc.cast(batch["line_no"], pa.int64()),
                "dpart": _dpart(ids),
            }
        )

    both = (
        ds.map_batches(lambda b: _tag_docs(b.select([id_col, text_col])),
                       batch_format="pyarrow")
        .union(losers.map_batches(_tag_losers, batch_format="pyarrow"))
    )
    def _rebuild(group: pa.Table) -> pa.Table:
        is_loser = pc.is_valid(group["line_no"])
        docs = group.filter(pc.invert(is_loser))
        drop = group.filter(is_loser)
        texts = pl.from_arrow(docs[text_col].combine_chunks())
        row_idx, line_no, lines = _line_long(texts, sep, words_per_line)
        lens = np.bincount(row_idx, minlength=docs.num_rows).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        doc_ids = docs[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        d_ids = drop[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(doc_ids, kind="mergesort")
        d_rows = order[np.searchsorted(doc_ids[order], d_ids)] if len(d_ids) \
            else np.empty(0, np.int64)
        d_ln = drop["line_no"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep_flat = np.ones(int(offs[-1]), bool)
        keep_flat[offs[d_rows] + d_ln] = False
        kept_counts = (
            np.add.reduceat(keep_flat.astype(np.int64), offs[:-1])
            if offs[-1] else np.zeros(len(lens), np.int64)
        )
        kept_counts[lens == 0] = 0  # degenerate guard (split yields >= 1)
        flat_arr = lines.to_arrow()
        if isinstance(flat_arr, pa.ChunkedArray):
            flat_arr = flat_arr.combine_chunks()
        kept = flat_arr.take(pa.array(np.flatnonzero(keep_flat), pa.int64()))
        new_off = np.concatenate([[0], np.cumsum(kept_counts)])
        out_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()) if new_off[-1] < 2**31
            else pa.array(new_off), kept
        )
        joined = pc.binary_join(out_lists, pa.scalar(sep, flat_arr.type))
        return pa.table(
            {
                id_col: docs[id_col],
                text_col: pc.cast(joined, pa.string()),
                "n_dropped": pa.array(lens - kept_counts, pa.int64()),
            }
        )

    return both.groupby("dpart").map_groups(_rebuild, batch_format="pyarrow")


def array_jaccard_pairs(ds, arr_col: str, id_col: str = "media_id", k: int = 64,
                        bands: int = 64, min_jaccard: float = 0.1,
                        partitions: int | None = None, max_bucket: int = 500,
                        seed: int = 0):
    """Near-dup pairs over a SMALL integer-array column (audio fingerprint
    words, quantization codes, feature ids): per-row MinHash signatures →
    band blocking → EXACT Jaccard verify inside the bucket.

    Unlike the text pipeline (minhash_dedup_pairs — shingle tables rival
    the corpus in bytes, so they persist out-of-band), the arrays here are
    a few hundred ints per row, so they RIDE the exchange and verification
    needs no second join. ``bands=64`` with ``k=64`` is one hash per band
    (r=1): collision probability per band equals the Jaccard itself, so
    even J≈0.1 pairs are caught with prob 1−(1−J)^64 ≈ 0.999 while
    unrelated rows (J≈0) only ever collide on equal hash values. Use
    fewer, wider bands for high-threshold matching at bigger scale."""
    import pandas as pd

    from ..sketches import band_keys, minhash_signatures
    from .partitioning import auto_partitions

    assert 64 % bands == 0 or k % bands == 0
    if partitions is None:
        partitions = max(8, (auto_partitions(ds) or 32) // 4)

    def _explode(batch: pa.Table) -> pa.Table:
        col = batch[arr_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arrays = [np.asarray(a, dtype=np.int64) for a in col.to_pylist()]
        sigs = minhash_signatures(arrays, k=k, seed=seed)
        bk = band_keys(sigs, bands=bands)
        n = len(arrays)
        rep = np.repeat(np.arange(n), bands)
        band = np.tile(np.arange(bands), n)
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(rep, pa.int64())),
                "band": pa.array(band, pa.int32()),
                "band_key": pa.array(bk.reshape(-1).astype(np.int64), pa.int64()),
                "part": pa.array(
                    (bk.reshape(-1) % np.uint64(partitions)).astype(np.int32),
                    pa.int32(),
                ),
                arr_col: col.take(pa.array(rep, pa.int64())),
            }
        )

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        g = g[g.groupby("band_key").cumcount() < max_bucket].reset_index(drop=True)
        empty = {
            "id_a": pd.Series(dtype=g[id_col].dtype),
            "id_b": pd.Series(dtype=g[id_col].dtype),
            "jaccard": pd.Series(dtype=np.float64),
        }
        if len(g) < 2:
            return pd.DataFrame(empty)
        idx = np.arange(len(g))
        left = pd.DataFrame({"band_key": g["band_key"].to_numpy(), "i": idx})
        m = left.merge(left.rename(columns={"i": "j"}), on="band_key")
        m = m[m["i"] < m["j"]]
        if len(m) == 0:
            return pd.DataFrame(empty)
        sets = [frozenset(a) for a in g[arr_col]]
        ids = g[id_col].to_numpy()
        rows_a, rows_b, js = [], [], []
        seen = set()
        for i, j in zip(m["i"].to_numpy(), m["j"].to_numpy()):
            if ids[i] == ids[j] or (ids[i], ids[j]) in seen:
                continue
            seen.add((ids[i], ids[j]))
            a, b = sets[i], sets[j]
            union = len(a | b)
            jac = len(a & b) / union if union else 0.0
            if jac >= min_jaccard:
                rows_a.append(ids[i])
                rows_b.append(ids[j])
                js.append(jac)
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "jaccard": js})

    pairs = (
        exploded.groupby(["band", "part"])
        .map_groups(_pairs, batch_format="pandas")
    )
    return _dedupe_pair_rows(pairs, "jaccard", partitions, value_agg="max")


# --- exact substring-duplication spans --------------------------------------


def word_window_hashes(batch: pa.Table, text_col: str, id_col: str,
                       L: int, nparts: int) -> pa.Table:
    """Per-batch kernel shared by :func:`dup_spans` and
    :func:`window_novelty`: every L-word window of every row as a slim
    ``(h, id, pos, part)`` table. Window strings are TRANSIENT char slices
    of the original text (never shipped); ``h`` is
    :func:`~pprl_ray.functions.digest.md5_prefix64` of the window text, so
    equality is content-exact and SQL-recomputable; ``part = h % nparts``.
    Fully vectorised (one polars split + numpy offset arithmetic + one
    expression slice; no Python loop over rows or words)."""
    import polars as pl

    from ..functions.digest import md5_prefix64

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = pl.Series("t", pl.from_arrow(col)).fill_null("")
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    words = texts.str.split(" ")
    nwords = words.list.len().to_numpy().astype(np.int64)
    # per-word char lengths, flat (explode of an all-empty batch is
    # handled by the nwin==0 early-exit below)
    wl = words.explode().str.len_chars().fill_null(0).to_numpy().astype(np.int64)
    n_rows = len(nwords)
    nwin = np.maximum(nwords - L + 1, 0)
    total_win = int(nwin.sum())
    if total_win == 0:
        return pa.table({
            "h": pa.array([], pa.uint64()), "id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int32()), "part": pa.array([], pa.int32()),
        })
    if len(wl) != int(nwords.sum()):  # polars explode: empty list -> one null row
        nwords = np.maximum(nwords, 1)
    off = np.concatenate([[0], np.cumsum(nwords)])  # word-index row offsets
    # char start of each word within its row: global cumsum of (len+1)
    # separators, rebased per row
    gstart = np.concatenate([[0], np.cumsum(wl + 1)[:-1]])
    gstart = gstart - np.repeat(gstart[off[:-1]], nwords)
    win_row = np.repeat(np.arange(n_rows), nwin)
    woff = np.concatenate([[0], np.cumsum(nwin)])
    win_pos = (np.arange(total_win) - np.repeat(woff[:-1], nwin)).astype(np.int64)
    first = off[win_row] + win_pos          # flat idx of window's first word
    last = first + L - 1                    # flat idx of its last word
    c_off = gstart[first]
    c_len = gstart[last] + wl[last] - c_off
    # transient window strings: char slices of the (replicated) text
    wtab = pl.DataFrame({
        "t": texts.gather(win_row), "o": c_off, "l": c_len,
    }).select(pl.col("t").str.slice(pl.col("o"), pl.col("l")).alias("s"))
    h = md5_prefix64(wtab["s"].to_arrow())
    return pa.table({
        "h": pa.array(h, pa.uint64()),
        "id": pa.array(ids[win_row], pa.int64()),
        "pos": pa.array(win_pos.astype(np.int32), pa.int32()),
        "part": pa.array((h % np.uint64(nparts)).astype(np.int32), pa.int32()),
    })


def dup_spans(ds, text_col: str = "text", id_col: str = "doc_id",
              window: int = 8, max_docs: int = 256, pos_cap: int = 8,
              partitions: int | None = None):
    """Exact substring-duplication detection: every doc pair sharing at
    least one ``window``-word run, with adjacent shared windows merged into
    maximal spans — the document-pair readout of the exact-substring dedup
    recipe (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": duplicated token runs, not whole-document hashes, are
    the unit of web-corpus duplication). Per pair it reports how many
    ``window``-word windows match and the longest merged span in words.

    Keys are the first 64 bits of ``md5`` of the window TEXT
    (:func:`~pprl_ray.functions.digest.md5_prefix64`), so equality is
    content-exact (2^-64 collisions) and any SQL engine can recompute the
    key — the whole operator is DuckDB-oracle-able end to end.

    Scale shape: one vectorised pass turns each doc into slim
    ``(h, id, pos)`` rows — window strings are transient per batch char
    slices of the original text (never shipped); the exchange carries 16
    bytes per window. Two bounded reduces follow: (1) group by key hash —
    windows in more than ``max_docs`` docs are dropped (boilerplate is not
    a duplication signal and the cap bounds the per-key cross product),
    and a doc contributes at most ``pos_cap`` positions per distinct
    window (repeated-window pathologies); (2) group by pair — merge the
    pair's matches into maximal diagonal runs (vectorised islands over
    ``ia - ib``). The corpus text never shuffles.

    Returns ``(a_id, b_id, n_windows, max_span)`` with ``a_id < b_id``;
    ``max_span`` is in words (= longest run + window - 1)."""
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)
    L = int(window)

    slim = ds.map_batches(
        lambda b: word_window_hashes(b, text_col, id_col, L, nparts),
        batch_format="pyarrow",
    )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["h", "id", "pos"], kind="stable")
        # a doc contributes at most pos_cap positions per distinct window
        g = g[g.groupby(["h", "id"], sort=False).cumcount() < pos_cap]
        # windows shared by too many docs are boilerplate, not duplication
        ndocs = g.groupby("h", sort=False)["id"].nunique()
        g = g[g["h"].map(ndocs) <= max_docs]
        if g.empty:
            return pd.DataFrame({"a": [], "b": [], "ia": [], "ib": [], "ppart": []}).astype(
                {"a": "int64", "b": "int64", "ia": "int32", "ib": "int32", "ppart": "int32"})
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        out = pd.DataFrame({
            "a": m["id_a"].to_numpy(), "b": m["id_b"].to_numpy(),
            "ia": m["pos_a"].to_numpy(), "ib": m["pos_b"].to_numpy(),
        })
        key = (out["a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ out["b"].to_numpy().astype(np.uint64))
        out["ppart"] = (key % np.uint64(nparts)).astype(np.int32)
        return out

    matches = slim.groupby("part").map_groups(_pairs, batch_format="pandas")

    def _spans(group: pd.DataFrame) -> pd.DataFrame:
        a = group["a"].to_numpy().astype(np.int64)
        b = group["b"].to_numpy().astype(np.int64)
        ia = group["ia"].to_numpy().astype(np.int64)
        ib = group["ib"].to_numpy().astype(np.int64)
        if len(a) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "n_windows": [],
                                 "max_span": []}).astype("int64")
        d = ia - ib
        order = np.lexsort((ia, d, b, a))
        a, b, ia, d = a[order], b[order], ia[order], d[order]
        n = len(a)
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            new_run[1:] = ((a[1:] != a[:-1]) | (b[1:] != b[:-1])
                           | (d[1:] != d[:-1]) | (ia[1:] != ia[:-1] + 1))
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        new_pair = np.ones(n, dtype=bool)
        if n > 1:
            new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pair_id = np.cumsum(new_pair) - 1
        n_windows = np.bincount(pair_id)
        # max run per pair (runs nest within pairs under this sort order)
        run_pair = pair_id[new_run]
        max_run = np.zeros(int(pair_id[-1]) + 1, dtype=np.int64)
        np.maximum.at(max_run, run_pair, run_len)
        return pd.DataFrame({
            "a_id": a[new_pair], "b_id": b[new_pair],
            "n_windows": n_windows.astype(np.int64),
            "max_span": (max_run + L - 1).astype(np.int64),
        })

    return matches.groupby("ppart").map_groups(_spans, batch_format="pandas")


def window_novelty(ds, text_col: str = "text", id_col: str = "doc_id",
                   window: int = 8, scale: int = 1_000_000,
                   partitions: int | None = None):
    """Per-document novelty scoring — the per-doc readout of exact
    substring deduplication: for every doc, how many of its L-word windows
    were already seen in a LOWER-doc_id document, and the exact-rational
    novelty ratio

        novelty_u = floor(scale * (n_windows - n_dup) / n_windows).

    The canonical filter signal for "this doc is mostly boilerplate /
    already in the corpus" (ExactSubstr scoring, Lee et al. 2022 shape).
    First-occurrence is defined by min(doc_id) per window content, so the
    score is partitioning- and order-invariant.

    Scale shape: one :func:`word_window_hashes` pass (slim 16-byte rows,
    text never ships), a key-hash exchange deriving min(id) per window,
    then a doc-keyed exchange folding per-doc totals. Ubiquitous windows
    need no cap — only (min, count) aggregates ride, never cross products.

    Returns ``(doc_id, n_windows, n_dup, novelty_u)`` — one row per doc
    that has at least one L-word window."""
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)
    L = int(window)

    slim = ds.map_batches(
        lambda b: word_window_hashes(b, text_col, id_col, L, nparts),
        batch_format="pyarrow",
    )

    def _mark(group: pd.DataFrame) -> pd.DataFrame:
        first = group.groupby("h", sort=False)["id"].min()
        dup = group["id"].to_numpy() > first[group["h"]].to_numpy()
        out = pl.DataFrame({"id": group["id"].to_numpy(), "dup": dup}) \
            .group_by("id").agg(pl.len().alias("n"), pl.col("dup").sum().alias("nd"))
        ids = out["id"].to_numpy()
        return pd.DataFrame({
            "id": ids,
            "n": out["n"].to_numpy().astype(np.int64),
            "nd": out["nd"].to_numpy().astype(np.int64),
            "dpart": (ids.astype(np.uint64) % np.uint64(nparts)).astype(np.int32),
        })

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("id", sort=False)[["n", "nd"]].sum().reset_index()
        n = g["n"].to_numpy().astype(np.int64)
        nd = g["nd"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "doc_id": g["id"].to_numpy().astype(np.int64),
            "n_windows": n,
            "n_dup": nd,
            "novelty_u": int(scale) * (n - nd) // n,
        })

    return (
        slim.groupby("part").map_groups(_mark, batch_format="pandas")
        .groupby("dpart").map_groups(_fold, batch_format="pandas")
    )
