"""Cross-tabulation statistics over categorical columns.

:func:`crosstab_chi2` — the chi-square independence scan every
data-profiling / drift-monitoring pipeline wants over (lang x source)-style
categorical pairs, computed in EXACT fixed-point big-int arithmetic so the
result is bit-identical on any engine (replicated in SQL with HUGEINT
floor division).

Reference parity: none (the reference has no statistics beyond
attribute_stats frequencies, SURVEY.md section 2.6) — profiling extension
surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["crosstab_chi2", "source_tv_distance", "source_cosine_matrix"]


def crosstab_chi2(ds, row_col: str, col_col: str, scale: int = 1_000_000,
                  partitions: int | None = None):
    """Exact chi-square contingency scan: per cell (r, c) with count n,
    row margin R, column margin C and total N,

        expected_u     = floor(scale * R * C / N)
        chi2_contrib_u = floor(scale * (n*N - R*C)^2 / (R*C*N))

    — the per-cell Pearson X^2 terms in fixed-point integer arithmetic
    (sum(chi2_contrib_u) / scale is the X^2 statistic to within one ULP
    per cell). All divisions are big-int floor divisions of positive
    integers, so every value is engine-reproducible bit-for-bit.

    Scale shape: ONE slim map-side-combined exchange reduces the corpus
    to exact cell counts (|rows| x |cols| cells — the contingency table,
    categorically bounded, NOT the corpus); the margins + statistics then
    run in a single worker task over that tiny table. The corpus itself
    never shuffles and nothing lands on the driver.

    Output: one row per non-empty cell —
    ``(row_col, col_col, n, expected_u, chi2_contrib_u)``."""
    import polars as pl

    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)
    nparts = int(partitions)

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([row_col, col_col]))
        g = df.group_by([row_col, col_col]).agg(pl.len().alias("n"))
        h = g.select(pl.struct([row_col, col_col]).hash(seed=37).alias("h"))["h"].to_numpy()
        out = g.to_arrow()
        return out.append_column(
            "part", pa.array((h % np.uint64(nparts)).astype(np.int32))
        )

    def _sum_cells(group: pa.Table) -> pa.Table:
        return pl.from_arrow(group).group_by([row_col, col_col]).agg(
            pl.col("n").sum().alias("n")
        ).to_arrow()

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum_cells, batch_format="pyarrow")
    )

    def _stats(batch: pa.Table) -> pa.Table:
        # one task over the full (tiny) contingency table: exact big-int
        # margins and per-cell statistics
        rows = batch[row_col].to_pylist()
        cols = batch[col_col].to_pylist()
        ns = [int(x) for x in batch["n"].to_pylist()]
        total = sum(ns)
        rmarg: dict = {}
        cmarg: dict = {}
        for r, c, n in zip(rows, cols, ns):
            rmarg[r] = rmarg.get(r, 0) + n
            cmarg[c] = cmarg.get(c, 0) + n
        exp_u, chi_u = [], []
        for r, c, n in zip(rows, cols, ns):
            rc = rmarg[r] * cmarg[c]
            exp_u.append(scale * rc // total)
            d = n * total - rc
            chi_u.append(scale * d * d // (rc * total))
        return pa.table(
            {
                row_col: batch[row_col],
                col_col: batch[col_col],
                "n": pa.array(ns, pa.int64()),
                "expected_u": pa.array(exp_u, pa.int64()),
                "chi2_contrib_u": pa.array(chi_u, pa.int64()),
            }
        )

    return cells.repartition(1).map_batches(
        _stats, batch_size=None, batch_format="pyarrow"
    )


def source_tv_distance(ds, group_col: str = "source", text_col: str = "text",
                       scale: int = 1_000_000_000, partitions: int | None = None):
    """Exact total-variation distance between every pair of per-group word
    distributions — the drift / source-divergence readout:

        TV(A, B) = 1/2 * sum_t | c_A(t)/N_A - c_B(t)/N_B |
                 = sum_t | c_A(t)*N_B - c_B(t)*N_A |  /  (2*N_A*N_B)

    computed entirely in big-int arithmetic (the numerator is an exact
    integer; the output is ``floor(scale * num / (2*N_A*N_B))``), so the
    result is engine-reproducible bit-for-bit — unlike KL/JS divergences,
    TV needs no logarithms and stays rational.

    Scale shape: group totals come from one light word-count scan (a tiny
    per-group aggregate, broadcast via closure). The main pass reduces the
    corpus to slim per-(token-hash, group) partial counts (16-byte
    md5-prefix keys, SQL-recomputable) and ONE hash-partitioned exchange;
    each partition pivots its token slice and folds the pairwise numerator
    partials — exact because a token absent from a partition contributes
    zero. Per-partition partials ride as decimal strings (arbitrary
    precision survives 10^12-token counts); the final fold over the
    (pairs x partitions) tiny table runs in one task.

    Returns ``(group_a, group_b, tv_u)`` with ``group_a < group_b``;
    ``tv_u / scale`` is the exact-floored TV distance in [0, 1]."""
    import polars as pl

    from ..functions.digest import md5_prefix64
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)

    # --- pass 1: exact word totals per group (tiny result) ---------------
    def _count_words(batch: pa.Table) -> pa.Table:
        texts = pl.Series(pl.from_arrow(batch[text_col].combine_chunks())).fill_null("")
        nw = texts.str.split(" ").list.len().to_numpy().astype(np.int64)
        g = (
            pl.DataFrame({"g": pl.from_arrow(batch[group_col].combine_chunks()), "n": nw})
            .group_by("g").agg(pl.col("n").sum())
        )
        return pa.table({"g": g["g"].to_arrow(), "n": g["n"].to_arrow().cast(pa.int64())})

    totals_tbl = (
        ds.map_batches(_count_words, batch_format="pyarrow")
        .groupby("g").sum("n")
        .to_pandas()
    )
    totals = {r["g"]: int(r["sum(n)"]) for _, r in totals_tbl.iterrows()}
    groups = sorted(totals)
    if len(groups) < 2:
        raise ValueError("source_tv_distance needs at least two groups")

    # --- pass 2: slim (token-hash, group, count) partials + one exchange --
    def _partial(batch: pa.Table) -> pa.Table:
        texts = pl.Series(pl.from_arrow(batch[text_col].combine_chunks())).fill_null("")
        gs = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        words = texts.str.split(" ")
        lens = words.list.len().to_numpy().astype(np.int64)
        flat = words.explode()
        if len(flat) != int(lens.sum()):  # explode of an empty list -> one null row
            lens = np.maximum(lens, 1)
        h = md5_prefix64(flat.fill_null("").to_arrow())
        t = (
            pl.DataFrame({"h": h, "g": np.repeat(gs, lens)})
            .group_by(["h", "g"]).agg(pl.len().alias("n"))
        )
        hh = t["h"].to_numpy()
        return pa.table({
            "h": pa.array(hh, pa.uint64()),
            "g": t["g"].to_arrow(),
            "n": pa.array(t["n"].to_numpy().astype(np.int64), pa.int64()),
            "part": pa.array((hh % np.uint64(nparts)).astype(np.int32), pa.int32()),
        })

    idx = {g: i for i, g in enumerate(groups)}
    n_groups = len(groups)

    def _pair_partials(group):
        import pandas as pd

        df = pl.from_arrow(pa.Table.from_pandas(group[["h", "g", "n"]]))
        agg = df.group_by(["h", "g"]).agg(pl.col("n").sum())
        hcode = agg["h"].to_numpy()
        _, hids = np.unique(hcode, return_inverse=True)
        gids = np.array([idx[g] for g in agg["g"].to_list()], dtype=np.int64)
        M = np.zeros((int(hids.max()) + 1 if len(hids) else 0, n_groups), dtype=np.int64)
        if len(hids):
            M[hids, gids] = agg["n"].to_numpy().astype(np.int64)
        ga, gb, nums = [], [], []
        max_c = int(M.max()) if M.size else 0
        for i in range(n_groups):
            for j in range(i + 1, n_groups):
                na, nb = totals[groups[i]], totals[groups[j]]
                if max_c and max_c * max(na, nb) < 2 ** 62 and M.shape[0] * max_c * max(na, nb) < 2 ** 63:
                    num = int(np.abs(M[:, i] * nb - M[:, j] * na).sum())
                else:  # exact big-int path for counts beyond int64 headroom
                    num = int(np.abs(M[:, i].astype(object) * nb
                                     - M[:, j].astype(object) * na).sum())
                ga.append(groups[i]); gb.append(groups[j]); nums.append(str(num))
        return pd.DataFrame({"group_a": ga, "group_b": gb, "num": nums})

    partials = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pair_partials, batch_format="pandas")
    )

    def _fold(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        acc: dict = {}
        for a, b, s in zip(df["group_a"], df["group_b"], df["num"]):
            acc[(a, b)] = acc.get((a, b), 0) + int(s)
        rows = sorted(acc)
        tv = [int(scale) * acc[k] // (2 * totals[k[0]] * totals[k[1]]) for k in rows]
        out = pd.DataFrame({
            "group_a": [k[0] for k in rows],
            "group_b": [k[1] for k in rows],
            "tv_u": np.array(tv, dtype=np.int64),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    return partials.repartition(1).map_batches(
        _fold, batch_size=None, batch_format="pyarrow"
    )


def source_cosine_matrix(ds, group_col: str = "source", text_col: str = "text",
                         scale: int = 1_000_000_000, partitions: int | None = None):
    """Exact pairwise cosine similarity between per-group word-count
    vectors — the bag-of-words drift metric next to
    :func:`source_tv_distance`'s distributional one:

        cos(A, B)^2 = (sum_t c_A(t)*c_B(t))^2
                      / (sum_t c_A(t)^2 * sum_t c_B(t)^2)

    All three sums are exact integers, so the squared cosine is an exact
    rational and the output ``cos2_u = floor(scale * dot^2 / (n2_A*n2_B))``
    is engine-reproducible bit-for-bit (no square roots, no floats). The
    raw ``dot`` rides along for direct verification.

    Scale shape: same as TV — the corpus reduces to slim per-(token-hash,
    group) partial counts with ONE hash-partitioned exchange; each
    partition pivots its token slice and folds per-pair dot / per-group
    norm partials (a token absent from a partition contributes zero, so
    partials are exactly additive). Partials ride as decimal strings
    (arbitrary precision survives 10^12-token counts); the final fold over
    the tiny (pairs x partitions) table runs in one task.

    Returns ``(group_a, group_b, dot, cos2_u)`` with ``group_a < group_b``.
    ``cos2_u`` is exact at any magnitude (big-int until the final floor);
    the raw ``dot`` column is int64 and CEILINGED at 2^63 — a dot product
    beyond it raises OverflowError with a clear message rather than
    wrapping (the SQL oracle's BIGINT cast shares the same ceiling, so
    the two sides can never silently diverge)."""
    import polars as pl

    from ..functions.digest import md5_prefix64
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)

    def _partial(batch: pa.Table) -> pa.Table:
        texts = pl.Series(pl.from_arrow(batch[text_col].combine_chunks())).fill_null("")
        gs = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        words = texts.str.split(" ")
        lens = words.list.len().to_numpy().astype(np.int64)
        flat = words.explode()
        if len(flat) != int(lens.sum()):  # explode of an empty list -> one null row
            lens = np.maximum(lens, 1)
        h = md5_prefix64(flat.fill_null("").to_arrow())
        t = (
            pl.DataFrame({"h": h, "g": np.repeat(gs, lens)})
            .group_by(["h", "g"]).agg(pl.len().alias("n"))
        )
        hh = t["h"].to_numpy()
        return pa.table({
            "h": pa.array(hh, pa.uint64()),
            "g": t["g"].to_arrow(),
            "n": pa.array(t["n"].to_numpy().astype(np.int64), pa.int64()),
            "part": pa.array((hh % np.uint64(nparts)).astype(np.int32), pa.int32()),
        })

    def _pair_partials(group):
        import pandas as pd

        df = pl.from_arrow(pa.Table.from_pandas(group[["h", "g", "n"]]))
        agg = df.group_by(["h", "g"]).agg(pl.col("n").sum())
        groups = sorted(set(agg["g"].to_list()))
        idx = {g: i for i, g in enumerate(groups)}
        hcode = agg["h"].to_numpy()
        _, hids = np.unique(hcode, return_inverse=True)
        gids = np.array([idx[g] for g in agg["g"].to_list()], dtype=np.int64)
        M = np.zeros((int(hids.max()) + 1 if len(hids) else 0, len(groups)),
                     dtype=np.int64)
        if len(hids):
            M[hids, gids] = agg["n"].to_numpy().astype(np.int64)
        max_c = int(M.max()) if M.size else 0
        small = max_c and M.shape[0] * max_c * max_c < 2 ** 63
        ga, gb, nums = [], [], []
        for i, g1 in enumerate(groups):
            for j in range(i, len(groups)):  # j == i rows carry norm^2
                if small:
                    v = int((M[:, i] * M[:, j]).sum())
                else:  # exact big-int path beyond int64 headroom
                    v = int((M[:, i].astype(object) * M[:, j].astype(object)).sum())
                ga.append(g1); gb.append(groups[j]); nums.append(str(v))
        return pd.DataFrame({"group_a": ga, "group_b": gb, "num": nums})

    partials = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pair_partials, batch_format="pandas")
    )

    def _fold(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        acc: dict = {}
        for a, b, s in zip(df["group_a"], df["group_b"], df["num"]):
            acc[(a, b)] = acc.get((a, b), 0) + int(s)
        # orthogonal pairs (dot == 0) are omitted, matching the SQL
        # replica's inner join on shared token hashes
        pairs = sorted(k for k in acc if k[0] < k[1] and acc[k] > 0)
        dots = [acc[k] for k in pairs]
        cos2 = [
            int(scale) * acc[k] * acc[k]
            // (acc[(k[0], k[0])] * acc[(k[1], k[1])])
            for k in pairs
        ]
        if dots and max(dots) >= 2 ** 63:
            raise OverflowError(
                "source_cosine dot product exceeds the documented int64 "
                "ceiling of the `dot` output column (the SQL oracle's "
                "BIGINT cast shares it); cos2_u itself is exact — drop "
                "the dot column or rescale counts to go beyond"
            )
        out = pd.DataFrame({
            "group_a": [k[0] for k in pairs],
            "group_b": [k[1] for k in pairs],
            "dot": np.array(dots, dtype=np.int64),
            "cos2_u": np.array(cos2, dtype=np.int64),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    return partials.repartition(1).map_batches(
        _fold, batch_size=None, batch_format="pyarrow"
    )
