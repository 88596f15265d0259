"""Distributed BPE subword-vocabulary learning and encoding.

Byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") is the vocabulary-learning
step every LLM data pipeline runs at least once per corpus. Production
trainers (subword-nmt, HuggingFace tokenizers) share one shape, and this
module keeps it:

- **word counting is the distributed part**: one streaming corpus pass of
  per-batch pre-aggregated (word, count) partials, one partitioned count
  exchange — the corpus text never shuffles and the driver never holds the
  vocabulary.
- **the merge loop is inherently sequential** (merge k's input depends on
  merge k-1's output), so it runs in ONE remote task over the word table
  capped to ``max_words`` by (count desc, word asc) — the same bounded
  word-frequency table every production trainer centralizes. Each
  iteration is fully vectorized polars (explode → shifted pair counts →
  one literal ``replace_all``), O(num_merges x total-symbols) with no
  Python loop over words.

Segmentation-string representation (shared with the SQL oracle): a word's
symbols are joined with TWO spaces and padded with one space on each end
(``'the'`` -> ``' t  h  e  </w> '``). A merge ``(l, r) -> lr`` is then the
plain non-overlapping left-to-right string replacement
``' l  r ' -> ' lr '`` — each match consumes one boundary space per side,
so consecutive matches chain correctly and overlapping occurrences resolve
leftmost-first (``' a  a  a '`` + merge (a,a) -> ``' aa  a '``), exactly
the semantics of SQL ``replace()`` and polars ``str.replace_all(literal)``.
That makes the whole learner replicable as an unrolled DuckDB CTE chain
(:func:`learn_bpe_sql`) — the correctness oracle verifies count exchange,
vocabulary cap, pair statistics, tie-breaks and merge application
end-to-end.

Pair ties break by (count desc, left asc, right asc) under UTF-8 byte
order (polars and DuckDB both compare strings bytewise; UTF-8 byte order
equals codepoint order).

Encoding (:func:`apply_bpe`) applies the learned merges IN RANK ORDER,
each as one vectorized column-wide ``replace_all`` — ``num_merges``
streaming passes over each batch, no per-row Python. Word boundaries are
safe inside a whole-document segmentation string because ``'</w>'`` only
ever terminates a word, so no learnable pattern ``' l  r '`` can span two
words (a spanning match would need ``l == '</w>'``, which pair counting
never emits as a left symbol). Sequential rank-order application is the
deterministic variant of the lowest-rank-first encoder; the two differ
only when two distinct merges produce the same symbol string.

The reference corpus tooling (``/root/reference`` pprl_client CLI) stops
at q-gram tokenization; BPE extends the same tokenize-then-sketch surface
to subword vocabularies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "word_counts",
    "learn_bpe",
    "apply_bpe",
    "learn_bpe_reference",
    "learn_bpe_sql",
    "apply_bpe_sql",
]

_EOW = "</w>"

MERGES_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left_sym", pa.large_string()),
        ("right_sym", pa.large_string()),
        ("merged", pa.large_string()),
    ]
)


def word_counts(ds, text_col: str = "text", partitions: int | None = None):
    """(word, cnt) occurrence counts as a Dataset — per-batch polars
    explode+group_by partials (only deduplicated (word, partial-count)
    rows enter the reduce), then the partitioned-vectorized sum, mirroring
    :func:`~pprl_ray.stages.text.document_frequency`'s exchange shape."""
    import pandas as pd
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _partial(batch: pa.Table) -> pa.Table:
        words = (
            pl.DataFrame(
                {"w": pl.from_arrow(batch[text_col].combine_chunks()).fill_null("")}
            )["w"]
            .str.split(" ")
            .explode()
        )
        counts = (
            pl.DataFrame({"w": words})
            .filter(pl.col("w") != "")
            .group_by("w")
            .len(name="cnt")
            .with_columns(pl.col("cnt").cast(pl.Int64))
        )
        h = counts["w"].hash(seed=43).to_numpy()
        counts = counts.with_columns(
            pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
        )
        return counts.to_arrow()

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("w", as_index=False, sort=False)["cnt"].sum()

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum, batch_format="pandas")
    )


def _merge_loop(num_merges: int, max_words: int, *tables) -> pa.Table:
    """The sequential merge loop over the capped word table (runs inside
    one remote task; every step is vectorized polars)."""
    import polars as pl

    ts = [t for t in tables if t.num_rows > 0]
    if not ts:
        return MERGES_SCHEMA.empty_table()
    wc = pl.from_arrow(pa.concat_tables(ts))
    df = (
        wc.sort(["cnt", "w"], descending=[True, False])
        .head(max_words)
        .with_columns(
            (
                pl.lit(" ")
                + pl.col("w").str.replace_all(r"([^ ])", "$1  ")
                + pl.lit(_EOW + " ")
            ).alias("seg")
        )
        .select(["seg", "cnt"])
    )
    out_rank, out_l, out_r, out_m = [], [], [], []
    for k in range(1, num_merges + 1):
        e = (
            df.with_columns(
                pl.col("seg").str.strip_chars(" ").str.split("  ").alias("syms")
            )
            .with_row_index("ridx")
            .select(["ridx", "cnt", "syms"])
            .explode("syms")
        )
        same = e["ridx"] == e["ridx"].shift(-1)
        pairs = pl.DataFrame(
            {"l": e["syms"], "r": e["syms"].shift(-1), "cnt": e["cnt"]}
        ).filter(same)
        if pairs.height == 0:
            break
        best = (
            pairs.group_by(["l", "r"])
            .agg(pl.col("cnt").sum().alias("c"))
            .sort(["c", "l", "r"], descending=[True, False, False])
            .head(1)
        )
        l, r = best["l"][0], best["r"][0]
        m = l + r
        out_rank.append(k)
        out_l.append(l)
        out_r.append(r)
        out_m.append(m)
        df = df.with_columns(
            pl.col("seg").str.replace_all(f" {l}  {r} ", f" {m} ", literal=True)
        )
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            "left_sym": pa.array(out_l, pa.large_string()),
            "right_sym": pa.array(out_r, pa.large_string()),
            "merged": pa.array(out_m, pa.large_string()),
        }
    )


def learn_bpe(ds, text_col: str = "text", num_merges: int = 1000,
              max_words: int = 1_000_000, partitions: int | None = None) -> pa.Table:
    """Learn a BPE merge table over a text corpus.

    Returns a small Arrow table ``(rank, left_sym, right_sym, merged)``
    with ``rank`` 1-based in merge order. The word-count exchange is
    distributed; the capped word table is assembled from the count
    dataset's object-store blocks inside the learner task
    (``to_arrow_refs`` — the driver never holds the vocabulary; only the
    ``num_merges``-row result returns)."""
    import ray

    wc = word_counts(ds, text_col=text_col, partitions=partitions)

    def _select(b: pa.Table) -> pa.Table:
        return b.select(["w", "cnt"])

    refs = wc.map_batches(_select, batch_format="pyarrow").materialize().to_arrow_refs()
    if not refs:
        return MERGES_SCHEMA.empty_table()
    task = ray.remote(num_cpus=2)(_merge_loop)
    return ray.get(task.remote(num_merges, max_words, *refs))


def _merges_as_rows(merges) -> list[tuple[int, str, str, str]]:
    if isinstance(merges, pa.Table):
        t = merges.sort_by("rank")
        return list(
            zip(
                t["rank"].to_pylist(),
                t["left_sym"].to_pylist(),
                t["right_sym"].to_pylist(),
                t["merged"].to_pylist(),
            )
        )
    return [tuple(m) for m in merges]


def apply_bpe(ds, merges, text_col: str = "text", id_col: str = "doc_id"):
    """Encode every document with a learned merge table.

    One ``map_batches`` pass; per batch the whole text column becomes one
    segmentation string per doc and each merge is one vectorized literal
    ``replace_all`` in rank order (``num_merges`` column passes, zero
    per-row Python). The merge table is tiny (``num_merges`` rows) and
    ships by closure once per task. Emits ``(id, n_pieces, encoded)``
    where ``encoded`` is the single-space-joined symbol sequence with
    ``</w>`` end-of-word markers."""
    import polars as pl

    rows = _merges_as_rows(merges)
    pats = [(f" {l}  {r} ", f" {m} ") for _, l, r, m in rows]

    def _encode(batch: pa.Table) -> pa.Table:
        d = pl.DataFrame(
            {
                id_col: pl.from_arrow(batch[id_col].combine_chunks()),
                "seg": pl.from_arrow(batch[text_col].combine_chunks()).fill_null(""),
            }
        ).with_columns(
            (
                pl.lit(" ")
                + pl.col("seg")
                .str.replace_all(r"([^ ])", "$1  ")
                .str.replace_all("   ", f"  {_EOW}  ", literal=True)
                + pl.lit(_EOW + " ")
            ).alias("seg")
        )
        for pat, rep in pats:
            d = d.with_columns(pl.col("seg").str.replace_all(pat, rep, literal=True))
        return d.with_columns(
            pl.col("seg")
            .str.strip_chars(" ")
            .str.split("  ")
            .list.len()
            .cast(pl.Int64)
            .alias("n_pieces"),
            pl.col("seg")
            .str.strip_chars(" ")
            .str.replace_all("  ", " ", literal=True)
            .alias("encoded"),
        ).select([id_col, "n_pieces", "encoded"]).to_arrow()

    return ds.map_batches(_encode, batch_format="pyarrow")


def learn_bpe_reference(word_cnt: dict[str, int], num_merges: int,
                        max_words: int = 1_000_000) -> list[tuple[int, str, str, str]]:
    """Independent naive learner (dict + per-word Python loop) used as the
    test oracle — deliberately the simplest possible statement of the
    semantics, structurally unrelated to the vectorized path."""
    capped = sorted(word_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    segs = {w: " " + "  ".join(list(w) + [_EOW]) + " " for w, _ in capped}
    merges: list[tuple[int, str, str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, c in capped:
            syms = segs[w].strip(" ").split("  ")
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (l, r) = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        m = l + r
        merges.append((len(merges) + 1, l, r, m))
        for w in segs:
            segs[w] = segs[w].replace(f" {l}  {r} ", f" {m} ")
    return merges


def learn_bpe_sql(docs_rel: str, text_col: str, num_merges: int,
                  max_words: int) -> tuple[str, str]:
    """(CTE chain, final-select) replicating :func:`learn_bpe` in DuckDB —
    one unrolled (pairs, best, re-segment) CTE triple per merge."""
    parts = [
        f"tok AS (SELECT unnest(string_split({text_col}, ' ')) AS w FROM {docs_rel})",
        f"wc AS MATERIALIZED (SELECT w, count(*)::BIGINT AS cnt FROM tok WHERE w <> ''"
        f" GROUP BY w ORDER BY cnt DESC, w LIMIT {max_words})",
        "s0 AS MATERIALIZED (SELECT ' ' || regexp_replace(w, '([^ ])', '\\1  ', 'g')"
        f" || '{_EOW} ' AS seg, cnt FROM wc)",
    ]
    outs = []
    for k in range(1, num_merges + 1):
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c"
            f" FROM (SELECT string_split(trim(seg, ' '), '  ') AS syms, cnt"
            f" FROM s{k-1}), UNNEST(range(1, len(syms))) AS t(i) GROUP BY l, r)"
        )
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT l, r, l || r AS m FROM p{k}"
            " ORDER BY c DESC, l ASC, r ASC LIMIT 1)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT replace(seg, ' ' || b.l || '  ' || b.r || ' ',"
            f" ' ' || b.m || ' ') AS seg, cnt FROM s{k-1}, b{k} b)"
        )
        outs.append(
            f"SELECT {k}::BIGINT AS rank, l AS left_sym, r AS right_sym,"
            f" m AS merged FROM b{k}"
        )
    return ",\n".join(parts), "\nUNION ALL\n".join(outs)


def apply_bpe_sql(docs_rel: str, text_col: str, id_col: str, num_merges: int,
                  max_words: int) -> str:
    """Full SQL for learn-then-encode: the learning chain's per-rank best
    pair feeds one ``replace()`` CTE per merge over the documents."""
    learn_ctes, _ = learn_bpe_sql(docs_rel, text_col, num_merges, max_words)
    chain = [
        f"a0 AS MATERIALIZED (SELECT {id_col}, ' ' ||"
        f" replace(regexp_replace({text_col}, '([^ ])', '\\1  ', 'g'),"
        f" '   ', '  {_EOW}  ') || '{_EOW} ' AS seg FROM {docs_rel})"
    ]
    for k in range(1, num_merges + 1):
        chain.append(
            f"a{k} AS MATERIALIZED (SELECT {id_col}, replace(seg,"
            f" ' ' || b.l || '  ' || b.r || ' ', ' ' || b.m || ' ') AS seg"
            f" FROM a{k-1}, b{k} b)"
        )
    return (
        "WITH " + learn_ctes + ",\n" + ",\n".join(chain)
        + f"\nSELECT {id_col}, len(string_split(trim(seg, ' '), '  '))::BIGINT"
        f" AS n_pieces, replace(trim(seg, ' '), '  ', ' ') AS encoded"
        f" FROM a{num_merges}"
    )
