"""Distributed graph analytics over edge-list Datasets.

- :func:`pagerank` — power-iteration PageRank with the edge list RESIDENT
  on disk, hash-partitioned by source exactly once; every iteration ships
  only the slim (id, rank) table through that same partitioning (pick ONE
  key, reuse it), pre-aggregates destination contributions inside each
  partition, and reduces with a second slim node-keyed exchange. The
  corpus-scale object (edges) never re-shuffles.

Complements :func:`pprl_ray.stages.dedup.connected_components_collapse`
(label propagation) with the other classic iterative-matvec shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pagerank"]


def _local_pagerank(iters: int, damping: float):
    """Single-task vectorized power iteration over a coalesced edge batch:
    np.unique dedup + positional bincount matvec — milliseconds for
    millions of edges."""

    def _f(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "r": pa.array([], pa.float64())})
        if src.max() < (1 << 31) and dst.max() < (1 << 31) and src.min() >= 0 and dst.min() >= 0:
            # pack the pair into one int64: unique on a flat int array is
            # ~10x np.unique(axis=0)'s void-dtype sort
            packed = np.unique((src.astype(np.int64) << 31) | dst.astype(np.int64))
            s, d = packed >> 31, packed & ((1 << 31) - 1)
        else:
            pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
            s, d = pairs[:, 0], pairs[:, 1]
        ids = np.unique(np.concatenate([s, d]))
        si = np.searchsorted(ids, s)
        di = np.searchsorted(ids, d)
        n = len(ids)
        deg = np.bincount(si, minlength=n).astype(np.float64)
        r = np.full(n, 1.0 / n)
        t = (1.0 - damping) / n
        for _ in range(int(iters)):
            contrib = r[si] / deg[si]
            r = t + damping * np.bincount(di, weights=contrib, minlength=n)
        return pa.table({"id": pa.array(ids), "r": pa.array(r, pa.float64())})

    return _f


def pagerank(edges_ds, src_col: str = "src", dst_col: str = "dst",
             iters: int = 5, damping: float = 0.85,
             partitions: int | None = None, work_dir: str | None = None,
             local_max_edges: int = 2_000_000):
    """PageRank by fixed-count power iteration (Page et al. 1999; the
    simplified no-dangling-redistribution variant: rank leaving a node
    with no out-edges is not recycled, matching the textbook recurrence
    ``r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/deg(u)`` exactly — which keeps
    the result reproducible by any other engine running the same
    recurrence).

    Scale shape:
    1. ONE edge exchange: edges are de-duplicated, annotated with their
       source's out-degree, and written hash-partitioned by ``src`` to
       ``work_dir`` (the resident-index pattern of write_hash_index) —
       the big table moves once, then never again;
    2. per iteration, the slim ``(id, r)`` rank table routes through the
       SAME src-hash partitioning; each group reads only its resident
       edge partition, joins vectorised, and pre-aggregates ``Σ r/deg``
       per destination INSIDE the partition (map-side combine);
    3. a second slim node-keyed reduce adds the teleport term over the
       full node set (so sink nodes keep their (1-d)/N mass).

    Driver holds only loop control and the node count; ranks stay a
    Dataset throughout. Returns ``(id, r:float64)``.

    Hybrid execution (the connected_components small-side guard): at or
    under ``local_max_edges`` raw edge rows, the compact (src, dst) list
    coalesces into ONE vectorized task (np.unique dedup + bincount
    matvec per iteration) — ~10 all-to-all barriers become a single
    coalesce. Pass ``local_max_edges=0`` to force the distributed path,
    which stays the unbounded-scale guarantee."""
    import os
    import tempfile

    import polars as pl
    import pyarrow.dataset as pads

    from .partitioning import auto_partitions

    compact = edges_ds.map_batches(
        lambda b: pa.table({"src": b[src_col], "dst": b[dst_col]}),
        batch_format="pyarrow",
    ).materialize()
    if compact.count() <= local_max_edges:
        return compact.repartition(1).map_batches(
            _local_pagerank(iters, damping), batch_size=None,
            batch_format="pyarrow",
        )
    edges_ds = compact
    src_col, dst_col = "src", "dst"

    if partitions is None:
        partitions = auto_partitions(edges_ds)
    nparts = int(partitions)

    def _hash_part(ids) -> np.ndarray:
        hp = pl.from_arrow(ids).hash(seed=53).to_numpy()
        return (hp % np.uint64(nparts)).astype(np.int32)

    work_dir = work_dir or tempfile.mkdtemp(prefix="pagerank_", dir="/tmp")
    edge_root = os.path.join(work_dir, "edges")

    def _tag_edges(batch: pa.Table) -> pa.Table:
        src = batch[src_col].combine_chunks()
        return pa.table(
            {
                "src": src,
                "dst": batch[dst_col].combine_chunks(),
                "epart": pa.array(_hash_part(src)),
            }
        )

    def _dedup_deg(group: pd.DataFrame) -> pd.DataFrame:
        # every row of a src lands in this group (epart keys on src), so
        # both the distinct filter and the out-degree are exact here
        g = group.drop_duplicates(subset=["src", "dst"])
        return g.assign(deg=g.groupby("src", sort=False)["dst"].transform("size"))[
            ["src", "dst", "deg", "epart"]
        ]

    edges_ds.map_batches(_tag_edges, batch_format="pyarrow").groupby(
        "epart"
    ).map_groups(_dedup_deg, batch_format="pandas").write_parquet(
        edge_root, partition_cols=["epart"]
    )

    # distinct node set with its routing partition (one slim exchange)
    def _emit_ids(batch: pa.Table) -> pa.Table:
        ids = pa.concat_tables(
            [pa.table({"id": batch[src_col]}), pa.table({"id": batch[dst_col]})]
        )["id"].combine_chunks()
        return pa.table({"id": ids, "npart": pa.array(_hash_part(ids))})

    def _distinct_ids(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=["id"])[["id", "npart"]]

    nodes = edges_ds.map_batches(
        _emit_ids, batch_format="pyarrow"
    ).groupby("npart").map_groups(_distinct_ids, batch_format="pandas").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes
    teleport = (1.0 - damping) / n_nodes

    ranks = nodes.map_batches(
        lambda b: pa.table(
            {"id": b["id"],
             "r": pa.array(np.full(b.num_rows, 1.0 / n_nodes), pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def _route(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks()
        return pa.table(
            {"id": ids, "r": batch["r"], "epart": pa.array(_hash_part(ids))}
        )

    def _contrib(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["epart"].iloc[0])
        edir = os.path.join(edge_root, f"epart={b}")
        empty = pd.DataFrame({"id": pd.Series(dtype=group["id"].dtype),
                              "c": pd.Series(dtype="float64")})
        if not os.path.isdir(edir):
            return empty
        e = pads.dataset(edir).to_table(columns=["src", "dst", "deg"]).to_pandas()
        m = e.merge(group[["id", "r"]], left_on="src", right_on="id", sort=False)
        if m.empty:
            return empty
        m["c"] = m["r"] / m["deg"]
        out = m.groupby("dst", sort=False)["c"].sum().reset_index()
        return out.rename(columns={"dst": "id"})[["id", "c"]]

    def _tag_partials(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks()
        return pa.table(
            {
                "id": ids,
                "val": pc.cast(batch["c"], pa.float64()),
                "is_node": pa.array(np.zeros(batch.num_rows, np.int8)),
                "npart": pa.array(_hash_part(ids)),
            }
        )

    def _tag_nodes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": batch["id"],
                "val": pa.nulls(batch.num_rows, pa.float64()),
                "is_node": pa.array(np.ones(batch.num_rows, np.int8)),
                "npart": batch["npart"],
            }
        )

    def _new_rank(group: pd.DataFrame) -> pd.DataFrame:
        node_ids = group.loc[group["is_node"] == 1, "id"]
        parts = group[group["is_node"] == 0]
        s = parts.groupby("id", sort=False)["val"].sum()
        r = teleport + damping * node_ids.map(s).fillna(0.0)
        return pd.DataFrame({"id": node_ids.to_numpy(), "r": r.to_numpy()})

    for _ in range(int(iters)):
        partials = ranks.map_batches(_route, batch_format="pyarrow").groupby(
            "epart"
        ).map_groups(_contrib, batch_format="pandas")
        combined = partials.map_batches(_tag_partials, batch_format="pyarrow").union(
            nodes.map_batches(_tag_nodes, batch_format="pyarrow")
        )
        ranks = combined.groupby("npart").map_groups(
            _new_rank, batch_format="pandas"
        ).materialize()
    return ranks
