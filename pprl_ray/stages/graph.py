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

__all__ = ["pagerank", "triangle_counts", "k_core", "degree_assortativity"]


def _wedge_pairs(nb_sorted: np.ndarray, group_starts: np.ndarray,
                 group_sizes: np.ndarray):
    """All within-group ordered pairs (i<j) of a flat, group-sorted
    neighbor array — vectorised by looping over DISTINCT group sizes
    (np.triu_indices once per size, fancy-indexed across all groups of
    that size), so Python overhead is O(#distinct sizes), not O(#groups).
    Yields (group_index_array, a_array, b_array) chunks."""
    for size in np.unique(group_sizes[group_sizes >= 2]):
        sel = np.flatnonzero(group_sizes == size)
        idx = group_starts[sel][:, None] + np.arange(size)[None, :]
        nb = nb_sorted[idx]  # (n_groups_of_size, size), sorted rows
        iu, ju = np.triu_indices(int(size), 1)
        g = np.repeat(sel, len(iu))
        yield g, nb[:, iu].ravel(), nb[:, ju].ravel()


def _local_triangles(src_col: str, dst_col: str):
    """Single-task exact triangle counting over a coalesced edge batch:
    dense-code the nodes, dedup canonical pairs packed into int64,
    degree-ordered orientation, per-size-vectorised wedge enumeration,
    sorted-array membership for the closing edge. Exact for any node
    dtype (strings included — np.unique dense-codes them)."""

    def _f(batch: pa.Table) -> pa.Table:
        su = batch[src_col].to_numpy(zero_copy_only=False)
        sv = batch[dst_col].to_numpy(zero_copy_only=False)
        empty = pa.table({"node": pa.array([], batch.schema.field(src_col).type),
                          "triangles": pa.array([], pa.int64())})
        if len(su) == 0:
            return empty
        nodes, codes = np.unique(np.concatenate([su, sv]), return_inverse=True)
        n = len(nodes)
        cu, cv = codes[: len(su)], codes[len(su):]
        keep = cu != cv
        lo = np.minimum(cu[keep], cv[keep]).astype(np.int64)
        hi = np.maximum(cu[keep], cv[keep]).astype(np.int64)
        if len(lo) == 0:
            return empty
        packed = np.unique(lo * n + hi)
        lo, hi = packed // n, packed % n
        deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
        # orientation rank: position in the (degree, id) total order
        order = np.lexsort((np.arange(n), deg))
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        fwd = rank[lo] < rank[hi]
        a = np.where(fwd, lo, hi)
        b = np.where(fwd, hi, lo)
        ra, rb = rank[a], rank[b]
        o2 = np.lexsort((rb, ra))
        a, b, ra, rb = a[o2], b[o2], ra[o2], rb[o2]
        edge_keys = ra * n + rb  # sorted ascending by construction
        starts = np.flatnonzero(np.diff(ra, prepend=-1))
        sizes = np.diff(np.append(starts, len(ra)))
        tri = np.zeros(n, np.int64)
        for g, wa_r, wb_r in _wedge_pairs(rb, starts, sizes):
            wkey = wa_r * n + wb_r  # wa_r < wb_r: rows are rank-sorted
            pos = np.searchsorted(edge_keys, wkey)
            pos_c = np.minimum(pos, len(edge_keys) - 1)
            hit = edge_keys[pos_c] == wkey
            if not hit.any():
                continue
            centers = a[starts[g[hit]]]
            np.add.at(tri, centers, 1)
            # wedge endpoints back to code space via the rank inverse
            np.add.at(tri, order[wa_r[hit]], 1)
            np.add.at(tri, order[wb_r[hit]], 1)
        nz = np.flatnonzero(tri)
        return pa.table({"node": pa.array(nodes[nz]),
                         "triangles": pa.array(tri[nz], pa.int64())})

    return _f


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


def _canon_dedup_edges(compact, nparts: int):
    """Distinct undirected edges ``(lo, hi)`` from a raw ``(u, v)`` edge
    Dataset: per-batch canonicalize (min/max) + local unique, then ONE
    pair-keyed exchange finishes the exact dedup. Arrow blocks out (the
    downstream bucket_joins need Arrow schemas). Materialized — callers
    reuse it across passes."""
    import polars as pl

    def _pair_part(df: "pl.DataFrame") -> np.ndarray:
        h = df.select(pl.struct(["lo", "hi"]).hash(seed=71).alias("h"))["h"].to_numpy()
        return (h % np.uint64(nparts)).astype(np.int32)

    def _canon(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        df = df.filter(pl.col("u") != pl.col("v")).select(
            pl.min_horizontal("u", "v").alias("lo"),
            pl.max_horizontal("u", "v").alias("hi"),
        ).unique()
        out = df.to_arrow()
        return out.append_column("part", pa.array(_pair_part(df)))

    def _dedup(group: pa.Table) -> pa.Table:
        return pl.from_arrow(group).unique(subset=["lo", "hi"]).select(
            ["lo", "hi"]
        ).to_arrow()

    return (
        compact.map_batches(_canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_dedup, batch_format="pyarrow")
        .materialize()
    )


def _exact_degrees(edges, nparts: int):
    """Exact undirected degrees of a distinct ``(lo, hi)`` edge Dataset:
    per-batch combine, then a node-keyed sum — the only exchange is the
    slim (node, count) table."""
    import polars as pl

    def _deg_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        both = pl.concat(
            [df.select(pl.col("lo").alias("node")),
             df.select(pl.col("hi").alias("node"))]
        )
        g = both.group_by("node").agg(pl.len().alias("c"))
        out = g.to_arrow()
        h = pl.from_arrow(out["node"]).hash(seed=73).to_numpy()
        return out.append_column(
            "npart", pa.array((h % np.uint64(nparts)).astype(np.int32))
        )

    def _deg_sum(group: pa.Table) -> pa.Table:
        return pl.from_arrow(group).group_by("node").agg(
            pl.col("c").sum().alias("deg")
        ).to_arrow()

    return (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("npart")
        .map_groups(_deg_sum, batch_format="pyarrow")
    )


def triangle_counts(edges_ds, src_col: str = "src", dst_col: str = "dst",
                    partitions: int | None = None,
                    local_max_edges: int = 2_000_000):
    """Exact distributed triangle counting with per-node participation —
    the node-iterator with degree-ordered orientation (Schank & Wagner
    2005), in the MapReduce wedge-check shape (Suri & Vassilvitskii,
    WWW 2011; Cohen, CiSE 2009). Input: an edge-list Dataset (directed or
    undirected, duplicates/self-loops tolerated — canonicalized away).
    Output: ``(node, triangles)`` for every node in ≥1 triangle; the
    global triangle count is ``sum(triangles) / 3``.

    Scale shape (all exchanges are slim id/pair tables; node payloads
    never move):
    1. ONE pair-keyed exchange canonicalizes + dedups undirected edges
       (per-batch combine first, so the shuffle carries ~unique pairs);
    2. a node-keyed count reduce computes exact degrees; two
       :func:`~.join.bucket_join` passes attach them to both endpoints;
    3. every edge is oriented from its (degree, id)-smaller endpoint to
       the larger — forward-degrees are then O(sqrt(m)) even on
       power-law hubs, bounding the wedge fan-out Σ d+(u)²;
    4. a src-keyed group emits each node's forward-neighbor pairs
       (wedges, canonically ordered by the same (degree, id) rule);
    5. one pair-keyed bucket_join matches wedges against the oriented
       edge set — each match is exactly one triangle, found exactly once;
    6. a final node-keyed fold sums the three participants per triangle.

    Hybrid execution (the pagerank/connected-components small-side
    guard): at or under ``local_max_edges`` raw edge rows the compact
    edge list coalesces into ONE vectorised task; pass
    ``local_max_edges=0`` to force the distributed path."""
    import polars as pl

    from .join import bucket_join
    from .partitioning import auto_partitions

    compact = edges_ds.map_batches(
        lambda b: pa.table({"u": b[src_col], "v": b[dst_col]}),
        batch_format="pyarrow",
    ).materialize()
    if compact.count() <= local_max_edges:
        return compact.repartition(1).map_batches(
            _local_triangles("u", "v"), batch_size=None, batch_format="pyarrow"
        )

    if partitions is None:
        partitions = auto_partitions(compact)
    nparts = int(partitions)

    def _node_part(col) -> np.ndarray:
        h = pl.from_arrow(col).hash(seed=73).to_numpy()
        return (h % np.uint64(nparts)).astype(np.int32)

    # 1. canonical + per-batch combine + pair-keyed exact dedup
    edges = _canon_dedup_edges(compact, nparts)

    # 2. exact degrees: per-batch combine, node-keyed sum
    degrees = _exact_degrees(edges, nparts)

    # 3. attach degrees to both endpoints, orient by (deg, id)
    with_lo = bucket_join(edges, degrees, keys="lo", right_keys="node",
                          partitions=nparts,
                          post=lambda t: t.rename_columns(
                              ["deg_lo" if c == "deg" else c for c in t.column_names]))
    both = bucket_join(with_lo, degrees, keys="hi", right_keys="node",
                       partitions=nparts,
                       post=lambda t: t.rename_columns(
                           ["deg_hi" if c == "deg" else c for c in t.column_names]))

    def _orient(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        fwd = (pl.col("deg_lo") < pl.col("deg_hi")) | (
            (pl.col("deg_lo") == pl.col("deg_hi")) & (pl.col("lo") < pl.col("hi"))
        )
        df = df.select(
            pl.when(fwd).then(pl.col("lo")).otherwise(pl.col("hi")).alias("src"),
            pl.when(fwd).then(pl.col("hi")).otherwise(pl.col("lo")).alias("dst"),
            pl.when(fwd).then(pl.col("deg_hi")).otherwise(pl.col("deg_lo")).alias("deg_dst"),
        )
        out = df.to_arrow()
        return out.append_column("spart", pa.array(_node_part(out["src"])))

    oriented = both.map_batches(_orient, batch_format="pyarrow").materialize()

    # 4. wedge emission: per src, all forward-neighbor pairs in (deg, id)
    #    canonical order (matches the orientation rule, so the closing
    #    edge — if present — is stored exactly as (a, b))
    def _wedges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["src", "deg_dst", "dst"], kind="mergesort")
        src_codes, starts = np.unique(
            pd.factorize(g["src"], sort=False)[0], return_index=True
        )
        sizes = np.diff(np.append(starts, len(g)))
        nb = g["dst"].to_numpy()
        srcs = g["src"].to_numpy()
        out_a, out_b, out_u = [], [], []
        for grp_idx, wa, wb in _wedge_pairs(nb, starts, sizes):
            out_a.append(wa)
            out_b.append(wb)
            out_u.append(srcs[starts[grp_idx]])
        if not out_a:
            df = pd.DataFrame({"a": pd.Series(dtype=g["dst"].dtype),
                               "b": pd.Series(dtype=g["dst"].dtype),
                               "u": pd.Series(dtype=g["src"].dtype)})
        else:
            df = pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b),
                 "u": np.concatenate(out_u)}
            )
        # arrow block out: the wedge-closing bucket_join needs Arrow schemas
        return pa.Table.from_pandas(df, preserve_index=False)

    wedges = oriented.groupby("spart").map_groups(_wedges, batch_format="pandas")

    # 5. close wedges against the oriented edge set — inner join on the
    #    canonical pair; each surviving row is one triangle (u, a, b)
    closing = oriented.map_batches(
        lambda b: pa.table({"a": b["src"], "b": b["dst"]}), batch_format="pyarrow"
    )
    tris = bucket_join(wedges, closing, keys=["a", "b"], partitions=nparts,
                       join_type="left semi")

    # 6. per-node participation: slim node-keyed count fold
    def _emit_nodes(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        allnodes = pl.concat(
            [df.select(pl.col("u").alias("node")),
             df.select(pl.col("a").alias("node")),
             df.select(pl.col("b").alias("node"))]
        )
        g = allnodes.group_by("node").agg(pl.len().alias("c"))
        out = g.to_arrow()
        return out.append_column("npart", pa.array(_node_part(out["node"])))

    def _count(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("node", sort=False, as_index=False)["c"].sum()
        return g.rename(columns={"c": "triangles"})

    return (
        tris.map_batches(_emit_nodes, batch_format="pyarrow")
        .groupby("npart")
        .map_groups(_count, batch_format="pandas")
    )


def _local_assortativity():
    """Single-task exact Newman sums over a coalesced edge batch."""

    def _f(batch: pa.Table) -> pa.Table:
        su = batch["u"].to_numpy(zero_copy_only=False)
        sv = batch["v"].to_numpy(zero_copy_only=False)
        if len(su):
            nodes, codes = np.unique(np.concatenate([su, sv]), return_inverse=True)
            n = len(nodes)
            cu, cv = codes[: len(su)], codes[len(su):]
            keepm = cu != cv
            lo = np.minimum(cu[keepm], cv[keepm]).astype(np.int64)
            hi = np.maximum(cu[keepm], cv[keepm]).astype(np.int64)
            packed = np.unique(lo * n + hi) if len(lo) else np.array([], np.int64)
            lo, hi = packed // max(n, 1), packed % max(n, 1)
        else:
            lo = hi = np.array([], np.int64)
            n = 0
        if len(lo) == 0:
            return pa.table(
                {"m_edges": pa.array([0], pa.int64()),
                 "s1": pa.array([0], pa.int64()), "s2": pa.array([0], pa.int64()),
                 "s3": pa.array([0], pa.int64()),
                 "assortativity": pa.array([0.0], pa.float64())}
            )
        deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
        j, k = deg[lo].astype(np.int64), deg[hi].astype(np.int64)
        m = len(lo)
        s1, s2, s3 = int((j * k).sum()), int((j + k).sum()), int((j * j + k * k).sum())
        num, den = 4 * m * s1 - s2 * s2, 2 * m * s3 - s2 * s2
        r = float(num) / float(den) if den != 0 else 0.0
        return pa.table(
            {"m_edges": pa.array([m], pa.int64()), "s1": pa.array([s1], pa.int64()),
             "s2": pa.array([s2], pa.int64()), "s3": pa.array([s3], pa.int64()),
             "assortativity": pa.array([r], pa.float64())}
        )

    return _f


def degree_assortativity(edges_ds, src_col: str = "src", dst_col: str = "dst",
                         partitions: int | None = None,
                         local_max_edges: int = 2_000_000):
    """Degree assortativity of an undirected graph (Newman 2002, Phys.
    Rev. Lett. 89 — the Pearson correlation of endpoint degrees across
    edges), computed EXACTLY in integer arithmetic:

        r = (4*M*S1 - S2^2) / (2*M*S3 - S2^2)

    with M = |edges|, S1 = sum(j*k), S2 = sum(j+k), S3 = sum(j^2+k^2)
    over edges with endpoint degrees (j, k). The integer sums make the
    readout bit-reproducible on any engine; the final float division is
    a single deterministic op.

    Scale shape: canonical pair-keyed edge dedup + node-keyed degree fold
    (shared helpers), two bucket_joins to attach degrees, then a per-batch
    integer partial fold whose ONLY exchange is a 4-number row per batch.
    int64 bound: per-batch sums stay exact while rows * max_deg^2 < 2^63
    (fine for text/knn graphs; social-scale hub degrees need the big-int
    moments pattern).

    Output: one row ``(m_edges, s1, s2, s3, assortativity)``. Hybrid:
    under ``local_max_edges`` raw rows the sums run vectorised in one
    task (the module-wide small-side guard)."""
    import polars as pl

    from .join import bucket_join
    from .partitioning import auto_partitions

    compact = edges_ds.map_batches(
        lambda b: pa.table({"u": b[src_col], "v": b[dst_col]}),
        batch_format="pyarrow",
    ).materialize()
    if compact.count() <= local_max_edges:
        return compact.repartition(1).map_batches(
            _local_assortativity(), batch_size=None, batch_format="pyarrow"
        )
    if partitions is None:
        partitions = auto_partitions(compact)
    nparts = int(partitions)

    edges = _canon_dedup_edges(compact, nparts)
    degrees = _exact_degrees(edges, nparts)
    with_lo = bucket_join(edges, degrees, keys="lo", right_keys="node",
                          partitions=nparts,
                          post=lambda t: t.rename_columns(
                              ["deg_lo" if c == "deg" else c for c in t.column_names]))
    both = bucket_join(with_lo, degrees, keys="hi", right_keys="node",
                       partitions=nparts,
                       post=lambda t: t.rename_columns(
                           ["deg_hi" if c == "deg" else c for c in t.column_names]))

    def _partial(batch: pa.Table) -> pa.Table:
        j = batch["deg_lo"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["deg_hi"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m": pa.array([len(j)], pa.int64()),
                "s1": pa.array([int((j * k).sum())], pa.int64()),
                "s2": pa.array([int((j + k).sum())], pa.int64()),
                "s3": pa.array([int((j * j + k * k).sum())], pa.int64()),
            }
        )

    def _final(batch: pa.Table) -> pa.Table:
        m = int(pa.compute.sum(batch["m"]).as_py() or 0)
        s1 = int(pa.compute.sum(batch["s1"]).as_py() or 0)
        s2 = int(pa.compute.sum(batch["s2"]).as_py() or 0)
        s3 = int(pa.compute.sum(batch["s3"]).as_py() or 0)
        num = 4 * m * s1 - s2 * s2  # exact python ints — no overflow
        den = 2 * m * s3 - s2 * s2
        r = float(num) / float(den) if den != 0 else 0.0
        return pa.table(
            {
                "m_edges": pa.array([m], pa.int64()),
                "s1": pa.array([s1], pa.int64()),
                "s2": pa.array([s2], pa.int64()),
                "s3": pa.array([s3], pa.int64()),
                "assortativity": pa.array([r], pa.float64()),
            }
        )

    return (
        both.map_batches(_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_final, batch_size=None, batch_format="pyarrow")
    )


def _local_kcore(k: int, rounds: int):
    """Single-task vectorised k-core peel over a coalesced edge batch:
    dense-code, canonical int64-packed dedup, then `rounds` bincount
    peels (early exit at the fixpoint — identical output, extra rounds
    are no-ops)."""

    def _f(batch: pa.Table) -> pa.Table:
        su = batch["u"].to_numpy(zero_copy_only=False)
        sv = batch["v"].to_numpy(zero_copy_only=False)
        empty = pa.table({"node": pa.array([], batch.schema.field("u").type),
                          "deg": pa.array([], pa.int64())})
        if len(su) == 0:
            return empty
        nodes, codes = np.unique(np.concatenate([su, sv]), return_inverse=True)
        n = len(nodes)
        cu, cv = codes[: len(su)], codes[len(su):]
        keep = cu != cv
        lo = np.minimum(cu[keep], cv[keep]).astype(np.int64)
        hi = np.maximum(cu[keep], cv[keep]).astype(np.int64)
        if len(lo) == 0:
            return empty
        packed = np.unique(lo * n + hi)
        lo, hi = packed // n, packed % n
        for _ in range(int(rounds)):
            deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
            good = deg >= k
            m = good[lo] & good[hi]
            if m.all():
                break
            lo, hi = lo[m], hi[m]
        if len(lo) == 0:
            return empty
        deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
        nz = np.flatnonzero(deg)
        return pa.table({"node": pa.array(nodes[nz]),
                         "deg": pa.array(deg[nz], pa.int64())})

    return _f


def k_core(edges_ds, k: int, rounds: int = 4, src_col: str = "src",
           dst_col: str = "dst", partitions: int | None = None,
           local_max_edges: int = 2_000_000):
    """Bounded-round k-core peeling (Seidman 1983 coreness; the
    synchronous peel of Montresor et al. 2013 "Distributed k-Core
    Decomposition"): repeatedly drop nodes whose CURRENT degree is below
    ``k`` — after ``rounds`` synchronous peels the surviving subgraph is
    returned as ``(node, deg)`` (deg measured IN the surviving subgraph).
    A fixed round count keeps the operator engine-reproducible (chained
    SQL CTEs replicate it exactly); rounds beyond the fixpoint are no-ops,
    and real graphs converge in a few peels.

    Scale shape: ONE pair-keyed exchange dedups the undirected edges
    (then they stay put); each round costs one slim node-keyed degree
    fold plus two pair-bucket semi-joins filtering edges on surviving
    endpoints — all exchanged tables are (node) or (pair) ids, never
    payloads. Hybrid: under ``local_max_edges`` raw rows the peel loop
    runs vectorised in one task."""
    from .join import bucket_join
    from .partitioning import auto_partitions

    compact = edges_ds.map_batches(
        lambda b: pa.table({"u": b[src_col], "v": b[dst_col]}),
        batch_format="pyarrow",
    ).materialize()
    if compact.count() <= local_max_edges:
        return compact.repartition(1).map_batches(
            _local_kcore(k, rounds), batch_size=None, batch_format="pyarrow"
        )

    if partitions is None:
        partitions = auto_partitions(compact)
    nparts = int(partitions)

    edges = _canon_dedup_edges(compact, nparts)
    for _ in range(int(rounds)):
        good = _exact_degrees(edges, nparts).map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k)).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        kept = bucket_join(edges, good, keys="lo", right_keys="node",
                           partitions=nparts, join_type="left semi")
        edges = bucket_join(kept, good, keys="hi", right_keys="node",
                            partitions=nparts, join_type="left semi").materialize()

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "deg"])

    return _exact_degrees(edges, nparts).map_batches(
        _rename, batch_format="pyarrow"
    )


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
