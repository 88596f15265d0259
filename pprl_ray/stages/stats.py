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

__all__ = ["crosstab_chi2"]


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
