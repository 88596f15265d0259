"""Statistical language-model quality scoring (the CCNet recipe shape).

Web-scale pipelines score every document's perplexity under a small LM
trained on a trusted reference corpus and keep/bucket docs by that score
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" — there a pruned KenLM 5-gram; here a bigram model
with stupid backoff, Brants et al. 2007, which keeps the model exactly
replicable in SQL for the correctness oracle).

Scale shape (mirrors CCNet's production layout):

- **Training** streams the reference corpus once: per-batch vectorized
  token/bigram counting (numpy shift within doc boundaries — no Python
  loop over words), pre-aggregated inside ``map_batches`` so only
  (token, partial-count) rows — deduplicated per batch — enter the ONE
  partitioned shuffle; a per-partition pandas groupby-sum finishes the
  counts (Ray-native aggregates would pay ~0.3 ms of Python per DISTINCT
  token).
- **The model is a broadcast artifact, not a join side** — exactly how
  CCNet ships its KenLM file to every worker. ``min_count`` pruning
  bounds its size (hapax bigrams are most of an open-vocab count table);
  the broadcast table is assembled in a WORKER from the count datasets'
  object-store blocks (``to_arrow_refs`` + remote concat), the driver
  never holds a copy.
- **Scoring** is embarrassingly parallel: one ``map_batches`` pass, each
  batch doing three vectorized polars hash joins (bigram, previous-token
  unigram, token unigram) against the local zero-copy model table.

Token probability (stupid backoff, alpha = 0.4):

- first token of a doc:       P = cnt(w) / total
- seen bigram (prev, w):      P = cnt(prev, w) / cnt(prev)
- else:                       P = alpha * max(cnt(w), 1) / total

Perplexity = exp(-mean log P). All arithmetic in float64 with a fixed
operation order, so the DuckDB oracle reproduces it bit-for-bit before
rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["train_bigram_lm", "score_perplexity", "score_kn_perplexity", "kn_model_tables", "ALPHA", "KN_DISCOUNT"]

ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


def _doc_tokens(batch: pa.Table, text_col: str):
    """Flat token Series (polars, no Python-object copies) + per-doc
    lengths for a batch (one polars split). ``explode()`` emits one null
    per EMPTY list; single-space-separated text never yields an empty
    split, so lengths stay aligned."""
    import polars as pl

    words = pl.from_arrow(batch[text_col].combine_chunks()).str.split(" ")
    lens = words.list.len().to_numpy().astype(np.int64)
    flat = words.explode()
    return flat, lens


def train_bigram_lm(ds, text_col: str = "text", partitions: int | None = None,
                    min_count: int = 1):
    """Count unigrams and bigrams over a reference corpus.

    Returns ``(uni_ds, bi_ds, total_tokens)``: Datasets of
    ``(token, cnt)`` / ``(w1, w2, cnt)`` plus the corpus token count.
    ``min_count`` prunes rare BIGRAMS after the global sum (pruning
    unigrams would break the backoff denominator) — the knob that bounds
    the broadcast model size, as in CCNet's pruned LM artifacts.
    """
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        flat, lens = _doc_tokens(batch, text_col)
        # bigram mask: positions that are NOT the first token of a doc
        starts = np.zeros(len(flat), bool)
        starts[np.cumsum(lens)[:-1]] = True
        if len(flat):
            starts[0] = True
        uni = (
            pl.DataFrame({"token": flat.alias("token")})
            .group_by("token").len(name="cnt")
        )
        bi = (
            pl.DataFrame({"w1": flat.shift(1).alias("w1"),
                          "w2": flat.alias("w2")})
            .filter(pl.Series(~starts))
            .group_by(["w1", "w2"]).len(name="cnt")
        )
        hu = uni["token"].hash(seed=47).to_numpy()
        hb = bi["w1"].hash(seed=47).to_numpy()
        uni = uni.with_columns(
            pl.Series("part", (hu % np.uint64(partitions)).astype(np.int32)),
            pl.lit(None, dtype=pl.Utf8).alias("w2"),
            pl.Series("kind", np.zeros(len(uni), np.int8)),
        ).rename({"token": "w1"})
        bi = bi.with_columns(
            pl.Series("part", (hb % np.uint64(partitions)).astype(np.int32)),
            pl.Series("kind", np.ones(len(bi), np.int8)),
        )
        cols = ["w1", "w2", "cnt", "part", "kind"]
        return pa.concat_tables([uni.select(cols).to_arrow(),
                                 bi.select(cols).to_arrow()])

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _sum(group: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(group)
            .group_by(["kind", "w1", "w2"])
            .agg(pl.col("cnt").cast(pl.Int64).sum())
            .select(["kind", "w1", "w2", "cnt"])
        )
        return out.to_arrow()

    counts = partials.groupby("part").map_groups(_sum, batch_format="pyarrow")
    counts = counts.materialize()

    import pyarrow.compute as pc

    uni_ds = counts.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)).select(["w1", "cnt"]).rename_columns(
            ["token", "cnt"]
        ),
        batch_format="pyarrow",
    )
    bi_ds = counts.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["kind"], 1), pc.greater_equal(b["cnt"], min_count))
        ).select(["w1", "w2", "cnt"]),
        batch_format="pyarrow",
    )
    total = counts.map_batches(
        lambda b: pa.table(
            {"t": pa.array([pc.sum(b.filter(pc.equal(b["kind"], 0))["cnt"]).as_py() or 0],
                           pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("t")
    return uni_ds.materialize(), bi_ds.materialize(), int(total)


def _broadcast_tables(*datasets):
    """One object-store ref per dataset, each table concatenated in a
    WORKER from the dataset's blocks (same pattern as broadcast_join)."""
    import ray

    def _assemble(schema, *tables):
        ts = [t for t in tables if t.num_rows > 0]
        return pa.concat_tables(ts).combine_chunks() if ts else schema.empty_table()

    refs = []
    for d in datasets:
        blocks = d.to_arrow_refs()
        schema = d.schema().base_schema
        refs.append(ray.remote(num_cpus=1)(_assemble).remote(schema, *blocks))
    return refs


class _PerplexityStage:
    """Per-batch stupid-backoff scoring against the local model tables
    (zero-copy object-store reads; three vectorized polars hash joins)."""

    def __init__(self, uni_ref, bi_ref, total: int, text_col: str, id_col: str):
        self.uni_ref = uni_ref
        self.bi_ref = bi_ref
        self.total = float(total)
        self.text_col = text_col
        self.id_col = id_col
        self._model = None  # lazy per-actor pandas views of the broadcast

    def _tables(self):
        if self._model is None:
            import polars as pl
            import ray

            uni, bi = ray.get(self.uni_ref), ray.get(self.bi_ref)
            # polars frames with float64 counts: per-batch lookups become
            # vectorized hash joins instead of per-row Python dict probes
            updf = pl.from_arrow(uni).select(
                pl.col("token"), pl.col("cnt").cast(pl.Float64).alias("cw")
            )
            bpdf = pl.from_arrow(bi).select(
                pl.col("w1"), pl.col("w2"),
                pl.col("cnt").cast(pl.Float64).alias("cbi"),
            )
            self._model = (updf, bpdf)
        return self._model

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        updf, bpdf = self._tables()
        flat, lens = _doc_tokens(batch, self.text_col)
        n = len(flat)
        starts = np.zeros(n, bool)
        if n:
            starts[0] = True
            starts[np.cumsum(lens)[:-1]] = True
        # three vectorized hash joins against the local model tables; the
        # row index restores input order (left joins don't guarantee it).
        # prev at doc starts is masked out below, so shift's leading null
        # (vs np.roll's wrap-around) never reaches the arithmetic.
        frame = pl.DataFrame(
            {
                "tok": flat.alias("tok"),
                "prev": flat.shift(1).alias("prev"),
            }
        ).with_row_index("idx")
        frame = (
            frame.join(updf, left_on="tok", right_on="token", how="left")
            .join(
                updf.rename({"token": "prev", "cw": "cprev"}),
                on="prev", how="left",
            )
            .join(
                bpdf, left_on=["prev", "tok"], right_on=["w1", "w2"], how="left"
            )
            .sort("idx")
        )
        cw = frame["cw"].to_numpy()
        cprev = frame["cprev"].to_numpy()
        cbi = np.array(frame["cbi"].to_numpy(), dtype=np.float64, copy=True)
        cbi[starts] = np.nan  # no bigram across doc boundaries

        # fixed operation order (matches the SQL oracle exactly):
        #   start:        ln(cw / total)
        #   seen bigram:  ln(cbi / cprev)
        #   backoff:      ln(ALPHA * max(cw, 1) / total)
        with np.errstate(divide="ignore", invalid="ignore"):
            lp = np.where(
                starts,
                np.log(np.nan_to_num(cw, nan=1.0) / self.total),
                np.where(
                    ~np.isnan(cbi),
                    np.log(cbi / cprev),
                    np.log(ALPHA * np.fmax(np.nan_to_num(cw, nan=1.0), 1.0) / self.total),
                ),
            )
        # segmented sum via reduceat (np.add.at is orders slower); empty
        # docs can't occur (split(' ') of any string yields >= 1 token)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(lp, offsets) if len(lp) else np.zeros(0)
        safe_lens = np.maximum(lens, 1)
        avg = sums / safe_lens
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(lens, pa.int64()),
                "avg_logp": pa.array(avg, pa.float64()),
                "perplexity": pa.array(np.exp(-avg), pa.float64()),
            }
        )


def score_perplexity(ds, uni_ds, bi_ds, total_tokens: int, text_col: str = "text",
                     id_col: str = "doc_id", **map_kwargs):
    """Score every doc's stupid-backoff bigram perplexity under a trained
    model (:func:`train_bigram_lm`). The model broadcasts once and is
    decoded to lookup structures ONCE PER ACTOR (actor-pool stage, like
    CCNet loading its KenLM per worker); the corpus streams. Returns
    (id, n_tokens, avg_logp, perplexity)."""
    uni_ref, bi_ref = _broadcast_tables(uni_ds, bi_ds)
    map_kwargs.setdefault("concurrency", (1, 16))
    return ds.map_batches(
        _PerplexityStage,
        fn_constructor_kwargs=dict(uni_ref=uni_ref, bi_ref=bi_ref,
                                   total=total_tokens, text_col=text_col,
                                   id_col=id_col),
        batch_format="pyarrow",
        **map_kwargs,
    )


# --- interpolated Kneser-Ney ------------------------------------------------

KN_DISCOUNT = 0.75  # the standard fixed absolute discount (Chen & Goodman 1999)


def kn_model_tables(bi_ds, partitions: int | None = None):
    """Derive the interpolated-Kneser-Ney model tables from a trained
    bigram table (:func:`train_bigram_lm`'s ``bi_ds``):

    - ``ctx_ds (w1, cctx, nf)`` — per context: total bigram count
      ``Σ_w2 c(w1,w2)`` and follower fan-out ``N1+(w1·)``. Distinct
      (w1, w2) rows are globally unique after the count reduce, so both
      are exactly additive over per-batch partials — a slim two-level
      fold, never trusting block boundaries to preserve the counting
      exchange's w1 co-location (Ray may split a large group's output
      across blocks).
    - ``cont_ds (w2, np)`` — continuation fan-in ``N1+(·w2)``: same
      partial-sum argument on the w2 axis.
    - ``n_bigrams`` — ``N1+(··)``, the distinct-bigram count (one
      metadata-cheap ``count()``).
    """
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(bi_ds) or 16

    def _ctx_partial(batch: pa.Table) -> pa.Table:
        d = (
            pl.from_arrow(batch)
            .group_by("w1")
            .agg(pl.col("cnt").cast(pl.Int64).sum().alias("cctx"),
                 pl.len().cast(pl.Int64).alias("nf"))
        )
        h = d["w1"].hash(seed=48).to_numpy()
        return d.with_columns(
            pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
        ).to_arrow()

    def _ctx_sum(group) -> "pa.Table":
        return (
            pl.from_arrow(group)
            .group_by("w1")
            .agg(pl.col("cctx").sum(), pl.col("nf").sum())
            .to_arrow()
        )

    ctx_ds = (
        bi_ds.map_batches(_ctx_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_ctx_sum, batch_format="pyarrow")
    )

    def _cont_partial(batch: pa.Table) -> pa.Table:
        d = (
            pl.from_arrow(batch)
            .group_by("w2")
            .agg(pl.len().cast(pl.Int64).alias("np"))
        )
        h = d["w2"].hash(seed=49).to_numpy()
        return d.with_columns(
            pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
        ).to_arrow()

    def _cont_sum(group) -> "pa.Table":
        out = (
            pl.from_arrow(group)
            .group_by("w2")
            .agg(pl.col("np").sum())
        )
        return out.to_arrow()

    cont_ds = (
        bi_ds.map_batches(_cont_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_cont_sum, batch_format="pyarrow")
    )
    return ctx_ds.materialize(), cont_ds.materialize(), int(bi_ds.count())


class _KNStage:
    """Per-batch interpolated-Kneser-Ney scoring against broadcast model
    tables (same actor-pool shape as :class:`_PerplexityStage`).

    Fixed operation order (matches the SQL oracle exactly):
      doc start:     ln(cw / total)
      seen bigram:   ln((cbi - D) / cctx + D * nf / cctx * np / B)
      unseen bigram, seen context:  ln(D * nf / cctx * np1 / B)
      no context (prev never a w1): ln(np1 / B)
    where np1 = max(np, 1) floors the continuation count so a token never
    seen as a continuation still scores finitely (self-scored corpora
    never reach the fallback branches — every in-doc bigram was counted)."""

    def __init__(self, uni_ref, ctx_ref, cont_ref, bi_ref, total: int,
                 n_bigrams: int, text_col: str, id_col: str):
        self.refs = (uni_ref, ctx_ref, cont_ref, bi_ref)
        self.total = float(total)
        self.nb = float(n_bigrams)
        self.text_col = text_col
        self.id_col = id_col
        self._model = None

    def _tables(self):
        if self._model is None:
            import polars as pl
            import ray

            uni, ctx, cont, bi = ray.get(list(self.refs))
            self._model = (
                pl.from_arrow(uni).select(
                    pl.col("token"), pl.col("cnt").cast(pl.Float64).alias("cw")
                ),
                pl.from_arrow(ctx).select(
                    pl.col("w1"),
                    pl.col("cctx").cast(pl.Float64),
                    pl.col("nf").cast(pl.Float64),
                ),
                pl.from_arrow(cont).select(
                    pl.col("w2"), pl.col("np").cast(pl.Float64)
                ),
                pl.from_arrow(bi).select(
                    pl.col("w1"), pl.col("w2"),
                    pl.col("cnt").cast(pl.Float64).alias("cbi"),
                ),
            )
        return self._model

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        updf, ctxdf, contdf, bpdf = self._tables()
        flat, lens = _doc_tokens(batch, self.text_col)
        n = len(flat)
        starts = np.zeros(n, bool)
        if n:
            starts[0] = True
            starts[np.cumsum(lens)[:-1]] = True
        frame = pl.DataFrame(
            {"tok": flat.alias("tok"), "prev": flat.shift(1).alias("prev")}
        ).with_row_index("idx")
        frame = (
            frame.join(updf, left_on="tok", right_on="token", how="left")
            .join(ctxdf.rename({"w1": "prev"}), on="prev", how="left")
            .join(contdf.rename({"w2": "tok"}), on="tok", how="left")
            .join(bpdf, left_on=["prev", "tok"], right_on=["w1", "w2"], how="left")
            .sort("idx")
        )
        D = KN_DISCOUNT
        cw = np.nan_to_num(frame["cw"].to_numpy(), nan=1.0)
        cctx = frame["cctx"].to_numpy()
        nf = frame["nf"].to_numpy()
        np1 = np.fmax(np.nan_to_num(frame["np"].to_numpy(), nan=0.0), 1.0)
        cbi = np.array(frame["cbi"].to_numpy(), dtype=np.float64, copy=True)
        cbi[starts] = np.nan
        has_ctx = ~np.isnan(cctx)
        with np.errstate(divide="ignore", invalid="ignore"):
            lp = np.where(
                starts,
                np.log(cw / self.total),
                np.where(
                    ~np.isnan(cbi),
                    np.log((cbi - D) / cctx + D * nf / cctx * np1 / self.nb),
                    np.where(
                        has_ctx,
                        np.log(D * np.nan_to_num(nf, nan=1.0)
                               / np.nan_to_num(cctx, nan=1.0) * np1 / self.nb),
                        np.log(np1 / self.nb),
                    ),
                ),
            )
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(lp, offsets) if len(lp) else np.zeros(0)
        avg = sums / np.maximum(lens, 1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(lens, pa.int64()),
                "avg_logp": pa.array(avg, pa.float64()),
                "perplexity": pa.array(np.exp(-avg), pa.float64()),
            }
        )


def score_kn_perplexity(ds, uni_ds, bi_ds, total_tokens: int,
                        text_col: str = "text", id_col: str = "doc_id",
                        partitions: int | None = None, **map_kwargs):
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995; Chen
    & Goodman 1999 fixed-discount form) under a model trained by
    :func:`train_bigram_lm` — the smoothing CCNet-style quality scoring
    uses in production LMs, next to :func:`score_perplexity`'s stupid
    backoff. Model tables (continuation/fan-out counts derived
    distributed, see :func:`kn_model_tables`) broadcast once; the corpus
    streams through an actor pool."""
    ctx_ds, cont_ds, n_bigrams = kn_model_tables(bi_ds, partitions)
    uni_ref, ctx_ref, cont_ref, bi_ref = _broadcast_tables(
        uni_ds, ctx_ds, cont_ds, bi_ds
    )
    map_kwargs.setdefault("concurrency", (1, 16))
    return ds.map_batches(
        _KNStage,
        fn_constructor_kwargs=dict(
            uni_ref=uni_ref, ctx_ref=ctx_ref, cont_ref=cont_ref, bi_ref=bi_ref,
            total=total_tokens, n_bigrams=n_bigrams,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        **map_kwargs,
    )
