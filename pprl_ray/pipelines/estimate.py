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

from ..functions.qgram import tokenize

__all__ = ["estimate_attribute_weights"]


def estimate_attribute_weights(
    ds,
    attribute_columns: list[str] | None = None,
    *,
    id_column: str = "id",
    token_size: int = 2,
    padding: str = "_",
) -> list[dict]:
    """Returns the reference's ``WeightedAttributeConfig`` list:
    ``[{attribute_name, weight (= ngram entropy), average_token_count}]``,
    sorted by attribute name."""
    from ray.data.aggregate import Mean, Sum

    cols = attribute_columns

    def _partials(batch: pa.Table) -> pa.Table:
        use = cols if cols is not None else [c for c in batch.column_names if c != id_column]
        out_attr: list[str] = []
        out_token: list[str] = []
        out_cnt: list[int] = []
        sz_attr: list[str] = []
        sz_n: list[int] = []
        for attr in use:
            counts: dict[str, int] = {}
            for v in batch[attr].to_pylist():
                toks = tokenize("" if v is None else str(v), token_size, padding)
                sz_attr.append(attr)
                sz_n.append(len(toks))
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
            out_attr.extend([attr] * len(counts))
            out_token.extend(counts.keys())
            out_cnt.extend(counts.values())
        # token rows get kind='t'; per-entity size rows kind='s'
        return pa.table(
            {
                "kind": pa.array(["t"] * len(out_attr) + ["s"] * len(sz_attr), pa.string()),
                "attribute": pa.array(out_attr + sz_attr, pa.string()),
                "token": pa.array(out_token + [""] * len(sz_attr), pa.string()),
                "n": pa.array(out_cnt + sz_n, pa.int64()),
            }
        )

    rows = ds.map_batches(_partials, batch_format="pyarrow")

    avg = (
        rows.filter(expr="kind == 's'")
        .groupby("attribute")
        .aggregate(Mean("n", alias_name="average_token_count"))
        .to_pandas()
    )
    token_counts = (
        rows.filter(expr="kind == 't'")
        .groupby(["attribute", "token"])
        .aggregate(Sum("n", alias_name="c"))
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
