"""Attribute-weight estimation (reference `pprl estimate`,
`/root/reference/packages/pprl_client/pprl_client/cli.py:381-408` +
`pprl_client/lib.py:88-162`): per attribute, the mean padded-q-gram
token-set size and the Shannon entropy of the global token counts; the
entropy becomes the attribute WEIGHT for RBF/CLKRBF masking.

Ray-Data shape: one map_batches pass emits pre-aggregated
(attribute, token, cnt) partials plus per-entity token-set sizes; two small
native aggregations finish the stats — raw values never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["estimate_attribute_weights"]


def estimate_attribute_weights(
    ds,
    attribute_columns: list[str] | None = None,
    *,
    id_column: str = "id",
    token_size: int = 2,
    padding: str = "_",
    partitions: int | None = None,
) -> list[dict]:
    """Returns the reference's ``WeightedAttributeConfig`` list:
    ``[{attribute_name, weight (= ngram entropy), average_token_count}]``,
    sorted by attribute name."""
    from ray.data.aggregate import Mean

    cols = attribute_columns
    pad = (token_size - 1) * padding

    def _qgram_frame(batch: pa.Table, use: list[str]):
        """One vectorised polars pass: distinct (attribute, row, token) rows
        for every attribute column (reference ``tokenize`` set semantics —
        parity with the row-wise kernel is pytest-gated)."""
        import polars as pl

        frames = []
        for attr in use:
            col = batch[attr]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = pl.from_arrow(col.cast(pa.string())).fill_null("")
            df = (
                pl.DataFrame({"row": pl.arange(0, len(s), eager=True), "v": s})
                .with_columns((pl.lit(pad) + pl.col("v") + pl.lit(pad)).alias("p"))
                .with_columns(
                    # len_chars() is UInt32: cast before subtracting and clamp
                    # at 0 so a padded value shorter than the q-gram (reachable
                    # with padding="") yields zero tokens instead of a ~2^32
                    # underflowed range that panics the polars kernel.
                    pl.int_ranges(
                        0,
                        pl.max_horizontal(
                            pl.lit(0, dtype=pl.Int64),
                            pl.col("p").str.len_chars().cast(pl.Int64) - (token_size - 1),
                        ),
                    ).alias("i")
                )
                .explode("i")
                # zero-token rows explode to one null slot — drop them here;
                # the sizes frame re-adds them as n=0 via the all_pairs join
                .drop_nulls("i")
                .with_columns(pl.col("p").str.slice(pl.col("i"), token_size).alias("token"))
                .select(["row", "token"])
                .unique()
                .with_columns(pl.lit(attr).alias("attribute"))
            )
            frames.append(df)
        return pl.concat(frames)

    def _partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        use = cols if cols is not None else [c for c in batch.column_names if c != id_column]
        g = _qgram_frame(batch, use)
        token_counts = g.group_by(["attribute", "token"]).len(name="n")
        # every (attribute, row) pair — zero-token rows (empty value with
        # padding="") must still count as size 0 in average_token_count
        all_pairs = pl.DataFrame({"attribute": pl.Series(use, dtype=pl.String)}).join(
            pl.DataFrame({"row": pl.int_range(0, batch.num_rows, eager=True)}), how="cross"
        )
        sizes = (
            all_pairs.join(
                g.group_by(["attribute", "row"]).len(name="n"),
                on=["attribute", "row"],
                how="left",
            )
            .with_columns(pl.col("n").fill_null(0).cast(pl.UInt32))
            .select(["attribute", "n"])
            .with_columns(pl.lit("").alias("token"))
        )
        out = pl.concat(
            [
                token_counts.with_columns(pl.lit("t").alias("kind")),
                sizes.with_columns(pl.lit("s").alias("kind")),
            ],
            how="diagonal",
        ).select(["kind", "attribute", "token", "n"])
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("kind", pa.string()),
                    ("attribute", pa.string()),
                    ("token", pa.string()),
                    ("n", pa.int64()),
                ]
            )
        )

    from pprl_ray.stages.partitioning import auto_partitions

    # size partitions from the INPUT's free metadata (token partials are a
    # compressed view of it, so this over-provisions safely); never a literal
    n_parts = partitions if partitions is not None else auto_partitions(ds)

    rows = ds.map_batches(_partials, batch_format="pyarrow")

    avg = (
        rows.filter(expr="kind == 's'")
        .groupby("attribute")
        .aggregate(Mean("n", alias_name="average_token_count"))
        .to_pandas()
    )
    # partitioned-vectorized token-count sum: native aggregates pay
    # ~0.3 ms of Python per DISTINCT (attribute, token) group — O(vocab)
    # groups would dominate at scale
    def _part(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return batch.append_column("part", pa.array([], pa.int32()))
        h = pl.from_arrow(batch["token"].combine_chunks()).hash(seed=47).to_numpy()
        return batch.append_column("part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["attribute", "token"], as_index=False)["n"].sum()
        return out.rename(columns={"n": "c"})

    token_counts = (
        rows.filter(expr="kind == 't'")
        .map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum, batch_format="pandas")
    )

    def _entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.float64)
        p = c / c.sum()
        return pd.DataFrame(
            {
                "attribute": [g["attribute"].iloc[0]],
                "weight": [float(-(p * np.log2(p)).sum())],
            }
        )

    ent = token_counts.groupby("attribute").map_groups(_entropy, batch_format="pandas").to_pandas()
    merged = avg.merge(ent, on="attribute").sort_values("attribute")
    return [
        {
            "attribute_name": r["attribute"],
            "weight": round(float(r["weight"]), 6),
            "average_token_count": round(float(r["average_token_count"]), 6),
        }
        for _, r in merged.iterrows()
    ]
