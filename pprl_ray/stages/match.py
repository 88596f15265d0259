"""Bit-vector matching stages (reference ``routers/match.py`` semantics).

- Crosswise = the reference's only join: a full cartesian θ-join on
  similarity ≥ threshold (``match.py:54-67``). Ray-Data-first design: the
  smaller side is materialised ONCE, broadcast via ``ray.put``, and each
  actor fetches it in ``__init__``; the larger side streams through
  ``map_batches``, computing a vectorised popcount similarity block against
  the whole broadcast matrix per batch. No shuffle.
- Pairwise = positional zip (``match.py:68-87``): ``Dataset.zip`` +
  one vectorised row-aligned kernel. Requires aligned row order
  (``preserve_order`` or identically-produced datasets), the same assumption
  the reference's client makes when tiling batch index pairs
  (``cli.py:218-220``).
- Multi-file: all unordered dataset pairs (i<j), mirroring ``cli.py:209-222``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import MatchConfig
from ..functions.similarity import crosswise_similarity, pairwise_similarity
from ..sketches.hashing import hash_strings
from .mask import decode_b64_column

__all__ = ["match_crosswise", "match_pairwise", "match_blocked", "match_many", "BroadcastMatcher", "blocking_metrics", "fs_agreement_counts", "fuzzy_join", "sorted_neighborhood_pairs"]


class BroadcastMatcher:
    """Stateless matcher against the broadcast (small) domain side; each
    batch of the range side produces all threshold-passing pairs. The
    domain tuple is fetched per call via ``ray.get`` — a zero-copy read
    from the node's object store, so this runs as a plain task pool (no
    actor startup)."""

    def __init__(self, domain_ref, measure: str, threshold: float):
        self.domain_ref = domain_ref
        self.measure = measure
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        domain_ids, domain_mat = ray.get(self.domain_ref)
        # ids are strings in the reference's model; CSV inference may have
        # read them back as ints — normalise like _materialize_side does
        range_ids = np.asarray([str(v) for v in batch["id"].to_pylist()], dtype=object)
        range_mat = decode_b64_column(batch["value"].to_pylist())
        sims = crosswise_similarity(domain_mat, range_mat, self.measure)
        dom_idx, rng_idx = np.nonzero(sims >= self.threshold)
        return pa.table(
            {
                "domain_id": pa.array(domain_ids[dom_idx], pa.string()),
                "range_id": pa.array(range_ids[rng_idx], pa.string()),
                "similarity": pa.array(sims[dom_idx, rng_idx], pa.float64()),
            }
        )


def _materialize_side(ds) -> tuple[np.ndarray, np.ndarray]:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    ids: list[str] = []
    vals: list[str] = []
    for b in batches:
        ids.extend(str(v) for v in b["id"].to_pylist())
        vals.extend(b["value"].to_pylist())
    return np.asarray(ids, dtype=object), decode_b64_column(vals)


def _broadcast_side_ref(ds):
    """Assemble the (ids, bit-matrix) broadcast payload in a WORKER from the
    dataset's existing object-store blocks (``to_arrow_refs``) — the driver
    heap never holds the decoded side; its remote return ref IS the
    broadcast handle. Falls back to driver-side :func:`_materialize_side`
    for non-Dataset inputs."""
    import ray

    if not hasattr(ds, "to_arrow_refs"):
        return ray.put(_materialize_side(ds))
    refs = ds.to_arrow_refs()
    if not refs:
        return ray.put((np.asarray([], dtype=object), decode_b64_column([])))

    def _assemble(*tables):
        # empty blocks can surface with a bare zero-column schema — drop
        # them before concat (they contribute no rows anyway)
        ts = [t for t in tables if t.num_rows > 0]
        if not ts:
            return np.asarray([], dtype=object), decode_b64_column([])
        t = pa.concat_tables(ts)
        ids = np.asarray([str(v) for v in t["id"].to_pylist()], dtype=object)
        return ids, decode_b64_column(t["value"].to_pylist())

    return ray.remote(num_cpus=1)(_assemble).remote(*refs)


def match_crosswise(domain_ds, range_ds, config: MatchConfig | None = None, **map_kwargs):
    """Broadcast block-nested-loop θ-join. ``domain_ds`` must be the smaller
    side (assembled once in a worker, pinned in the object store)."""
    config = config or MatchConfig()
    domain_ref = _broadcast_side_ref(domain_ds)
    map_kwargs.setdefault("batch_size", 4096)
    return range_ds.map_batches(
        BroadcastMatcher(domain_ref, config.measure, config.threshold),
        batch_format="pyarrow",
        **map_kwargs,
    )


def match_pairwise(domain_ds, range_ds, config: MatchConfig | None = None):
    """Positional zip match; raises on length mismatch like the reference."""
    config = config or MatchConfig()
    n_domain, n_range = domain_ds.count(), range_ds.count()
    if n_domain != n_range:
        raise ValueError(
            "length of domain and range lists do not match: domain has length of "
            f"{n_domain}, range has length of {n_range}"
        )
    d = domain_ds.rename_columns({"id": "domain_id", "value": "domain_value"})
    r = range_ds.rename_columns({"id": "range_id", "value": "range_value"})
    zipped = d.zip(r)

    measure, threshold = config.measure, config.threshold

    def _match(batch: pa.Table) -> pa.Table:
        dm = decode_b64_column(batch["domain_value"].to_pylist())
        rm = decode_b64_column(batch["range_value"].to_pylist())
        sims = pairwise_similarity(dm, rm, measure)
        keep = sims >= threshold
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                "domain_id": batch["domain_id"].take(pa.array(idx)),
                "range_id": batch["range_id"].take(pa.array(idx)),
                "similarity": pa.array(sims[idx], pa.float64()),
            }
        )

    return zipped.map_batches(_match, batch_format="pyarrow")


def match_blocked(domain_ds, range_ds, config: MatchConfig | None = None,
                  bands: int = 16, partitions: int | None = None,
                  max_bucket: int = 10_000, verify_salt: int = 1):
    """Banded blocking for bit-vector matching — the scale path when BOTH
    sides are large (the reference's crosswise θ-join is all-pairs; a
    broadcast BNL stops fitting once neither side is broadcastable).

    Candidate pairs agree EXACTLY on at least one of ``bands`` byte-bands
    of the encoded vector; exact similarity then verifies every candidate.
    Recall: 1.0 for identical vectors (threshold-1.0 matching); for lower
    thresholds a true pair is missed only if every band contains a
    differing bit — the standard LSH-banding trade-off (tune ``bands`` up
    for recall on near-threshold pairs). ``max_bucket`` caps degenerate
    buckets (documented truncation, no silent O(n²)).

    Scale shape: one union shuffle of (band, key, id, value) rows
    co-partitions equal bands; per (band, key-partition) group ONE
    vectorised merge pairs the sides and ONE vectorised popcount kernel
    verifies; across-band duplicate pairs collapse with a native Max.

    ``verify_salt`` (default 1 = off) splits each band key's VERIFICATION
    across S partition groups: range rows land in exactly one salt (by id
    hash), domain rows replicate to all S — exact (each candidate pair
    verifies in exactly one group) at S× domain-side shuffle volume. Use
    it when one giant equality class (many identical vectors) would
    otherwise serialize the popcount verify into a single straggler task
    (measured: a 3 000-row identical-mask class at sf0.1 put every
    candidate pair in one group — 51 s on an idle 32-cpu host; salt 8
    restores parallel verify)."""
    import pandas as pd

    from .partitioning import auto_partitions

    config = config or MatchConfig()
    if partitions is None:
        partitions = max(auto_partitions(domain_ds), auto_partitions(range_ds))

    from ..sketches.hashing import splitmix64

    def _explode(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            ids = np.asarray([str(v) for v in batch["id"].to_pylist()], dtype=object)
            mat = decode_b64_column(batch["value"].to_pylist())  # (n, nbytes)
            n, nbytes = mat.shape
            bands_eff = min(bands, max(nbytes, 1))
            bounds = np.linspace(0, nbytes, bands_eff + 1).astype(int)
            out_band: list[np.ndarray] = []
            out_key: list[np.ndarray] = []
            for b in range(bands_eff):
                sl = mat[:, bounds[b] : bounds[b + 1]].astype(np.uint64)
                h = np.full(n, np.uint64(b + 1))
                with np.errstate(over="ignore"):
                    for c in range(sl.shape[1]):
                        h = splitmix64(h ^ sl[:, c])
                out_band.append(np.full(n, b, np.int32))
                out_key.append(h)
            band = np.concatenate(out_band) if out_band else np.empty(0, np.int32)
            key = (
                np.concatenate(out_key).astype(np.int64)
                if out_key
                else np.empty(0, np.int64)
            )
            rep = np.tile(np.arange(n), len(out_band))
            if verify_salt > 1:
                if side == 0:
                    # domain rows replicate to every salt
                    idx = np.repeat(np.arange(len(rep)), verify_salt)
                    band, key, rep = band[idx], key[idx], rep[idx]
                    salt = np.tile(
                        np.arange(verify_salt, dtype=np.uint64), len(idx) // verify_salt
                    )
                else:
                    # range rows land in exactly one salt (by id hash)
                    row_salt = hash_strings(ids.astype(str)) % np.uint64(verify_salt)
                    salt = row_salt[rep]
            else:
                salt = np.zeros(len(rep), np.uint64)
            part = (
                (key.astype(np.uint64) % np.uint64(partitions)) * np.uint64(verify_salt)
                + salt
            ).astype(np.int32)
            return pa.table(
                {
                    "band": pa.array(band, pa.int32()),
                    "key": pa.array(key, pa.int64()),
                    "part": pa.array(part),
                    "id": pa.array(ids[rep]),
                    "value": batch["value"].take(pa.array(rep)),
                    "__side": pa.array(np.full(len(rep), side, np.int8)),
                }
            )

        return _f

    both = domain_ds.map_batches(_explode(0), batch_format="pyarrow").union(
        range_ds.map_batches(_explode(1), batch_format="pyarrow")
    )

    measure, threshold = config.measure, config.threshold

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "domain_id": pd.Series(dtype=object),
            "range_id": pd.Series(dtype=object),
            "similarity": pd.Series(dtype=np.float64),
        }
        dom = group[group["__side"] == 0]
        rng = group[group["__side"] == 1]
        if len(dom) == 0 or len(rng) == 0:
            return pd.DataFrame(empty)
        dom = dom[dom.groupby(["band", "key"]).cumcount() < max_bucket].reset_index(drop=True)
        rng = rng[rng.groupby(["band", "key"]).cumcount() < max_bucket].reset_index(drop=True)
        left = dom[["band", "key"]].assign(i=np.arange(len(dom)))
        right = rng[["band", "key"]].assign(j=np.arange(len(rng)))
        m = left.merge(right, on=["band", "key"])
        if len(m) == 0:
            return pd.DataFrame(empty)
        dmat = decode_b64_column(dom["value"].tolist())
        rmat = decode_b64_column(rng["value"].tolist())
        i, j = m["i"].to_numpy(), m["j"].to_numpy()
        sims = pairwise_similarity(dmat[i], rmat[j], measure)
        keep = sims >= threshold
        out = pd.DataFrame(
            {
                "domain_id": dom["id"].to_numpy()[i[keep]],
                "range_id": rng["id"].to_numpy()[j[keep]],
                "similarity": sims[keep],
            }
        )
        # batch-local dedup of across-band duplicates (cross-part dups are
        # collapsed by the partitioned reduce below)
        return out.drop_duplicates(subset=["domain_id", "range_id"])

    pairs = both.groupby("part").map_groups(_pairs, batch_format="pandas")

    # across-part duplicate collapse with the partitioned-vectorized
    # pattern: ONE pandas groupby-max per partition group. (A native
    # Max aggregate here pays per-distinct-group overhead — with O(pairs)
    # distinct keys that dominated the whole pipeline.)
    def _add_part2(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return batch.append_column("part2", pa.array([], pa.int32()))
        df = pl.DataFrame(
            {
                "a": pl.from_arrow(batch["domain_id"].combine_chunks()),
                "b": pl.from_arrow(batch["range_id"].combine_chunks()),
            }
        )
        h = df.hash_rows(seed=29).to_numpy()
        return batch.append_column(
            "part2", pa.array((h % np.uint64(partitions)).astype(np.int32))
        )

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby(["domain_id", "range_id"], as_index=False)["similarity"].max()

    return (
        pairs.map_batches(_add_part2, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(_dedup, batch_format="pandas")
    )


def match_many(datasets: list, config: MatchConfig | None = None):
    """All unordered dataset pairs (i<j), as the reference CLI does for
    multi-file matching (``cli.py:209-222``). Returns {(i, j): Dataset}."""
    out = {}
    for i in range(len(datasets)):
        for j in range(i + 1, len(datasets)):
            out[(i, j)] = match_crosswise(datasets[i], datasets[j], config)
    return out


def blocking_metrics(a_ds, b_ds, id_col: str = "id", key_col: str = "block_key",
                     scale: int = 1_000_000_000, max_block: int = 100_000,
                     partitions: int | None = None):
    """Blocking-scheme evaluation for record linkage: reduction ratio and
    pairs completeness (Christen, "Data Matching", ch. 7 — the standard
    blocking quality measures), computed exactly and distributed.

    Inputs are (id, block_key) tables — one row per key a record blocks
    under, so multi-pass blocking is rows with several keys per id. Ground
    truth is id equality across sides (the planted-duplicate evaluation
    shape). With |A|x|B| total pairs, C the distinct cross-side candidate
    pairs sharing >=1 key, and M the ids present on both sides:

        reduction_ratio    rr_u = floor(scale * (|A||B| - |C|) / (|A||B|))
        pairs_completeness pc_u = floor(scale * |C with a_id=b_id| / |M|)

    Scale shape: two slim exchanges. (1) keys co-locate by hash; per key
    the bounded a x b id cross-product emits pair rows (blocks beyond
    ``max_block`` comparisons are dropped — an evaluation cap, replicated
    in the oracle); (2) pairs co-locate by pair hash and dedupe (a pair
    sharing several keys counts once). Side cardinalities ride the same
    key exchange. Record payloads never move — only ids and keys.

    Returns ONE row: ``(n_left, n_right, n_candidates, n_true, n_found,
    rr_u, pc_u)``, all int64."""
    import pandas as pd
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = max(auto_partitions(a_ds), auto_partitions(b_ds))
    nparts = int(partitions)

    def _emit(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].combine_chunks()
            h = hash_strings(keys.cast(pa.string()).to_pylist())
            return pa.table({
                "id": batch[id_col].combine_chunks().cast(pa.int64()),
                "k": pa.array(h, pa.uint64()),
                "side": pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()),
                "part": pa.array((h % np.uint64(nparts)).astype(np.int32), pa.int32()),
            })
        return _f

    # the slim (id, key-hash, side) table feeds BOTH the pair and the id
    # exchange — materialize it once (16-byte rows; the object store spills
    # at scale) instead of re-executing the upstream reads per consumer
    both = a_ds.map_batches(_emit(0), batch_format="pyarrow").union(
        b_ds.map_batches(_emit(1), batch_format="pyarrow")
    ).materialize()

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["id", "k", "side"])
        # distinct ids per side in this id-hash-agnostic partition would
        # double count across partitions; count ids keyed by id hash below
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"ia": [], "ib": [], "ppart": []}).astype(
                {"ia": "int64", "ib": "int64", "ppart": "int32"})
        sizes = (a.groupby("k", sort=False)["id"].size()
                 * b.groupby("k", sort=False)["id"].size()).dropna()
        ok = sizes[sizes <= max_block].index
        m = a[a["k"].isin(ok)].merge(b[b["k"].isin(ok)], on="k",
                                     suffixes=("_a", "_b"))
        out = pd.DataFrame({"ia": m["id_a"].to_numpy(), "ib": m["id_b"].to_numpy()})
        out = out.drop_duplicates()
        key = (out["ia"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ out["ib"].to_numpy().astype(np.uint64))
        out["ppart"] = (key % np.uint64(nparts)).astype(np.int32)
        return out

    def _count_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["ia", "ib"])
        return pd.DataFrame({
            "n_candidates": [np.int64(len(g))],
            "n_found": [np.int64(int((g["ia"] == g["ib"]).sum()))],
        })

    pair_partials = (
        both.groupby("part").map_groups(_pairs, batch_format="pandas")
        .groupby("ppart").map_groups(_count_pairs, batch_format="pandas")
    )

    # side cardinalities + truth size: one slim id-keyed exchange
    def _id_rows(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "id": batch["id"].combine_chunks(),
            "side": batch["side"].combine_chunks(),
            "ipart": pa.array((ids.astype(np.uint64) % np.uint64(nparts)).astype(np.int32)),
        })

    def _count_ids(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["id", "side"])
        per = g.groupby("id", sort=False)["side"].agg(["min", "max", "size"])
        return pd.DataFrame({
            "n_left": [np.int64(int((g["side"] == 0).sum()))],
            "n_right": [np.int64(int((g["side"] == 1).sum()))],
            "n_true": [np.int64(int(((per["min"] == 0) & (per["max"] == 1)).sum()))],
        })

    id_partials = (
        both.map_batches(_id_rows, batch_format="pyarrow")
        .groupby("ipart").map_groups(_count_ids, batch_format="pandas")
    )

    pair_df = pair_partials.to_pandas()
    id_tot = id_partials.to_pandas().sum()
    n_left, n_right = int(id_tot["n_left"]), int(id_tot["n_right"])
    # an all-dropped candidate set yields schema-less empty pandas blocks
    n_cand = int(pair_df["n_candidates"].sum()) if "n_candidates" in pair_df else 0
    n_found = int(pair_df["n_found"].sum()) if "n_found" in pair_df else 0
    n_true = int(id_tot["n_true"])
    total = n_left * n_right
    rr_u = int(scale) * (total - n_cand) // total if total else 0
    pc_u = int(scale) * n_found // n_true if n_true else 0
    out = pd.DataFrame({
        "n_left": [n_left], "n_right": [n_right], "n_candidates": [n_cand],
        "n_true": [n_true], "n_found": [n_found],
        "rr_u": [rr_u], "pc_u": [pc_u],
    }).astype("int64")
    import ray.data as rd

    return rd.from_pandas(out)


def fs_agreement_counts(a_ds, b_ds, pairs_ds, attrs, a_id: str = "id",
                        b_id: str = "id", scale: int = 1_000_000,
                        partitions: int | None = None):
    """Fellegi-Sunter m/u agreement estimation over labeled candidate
    pairs — the weight-estimation step of probabilistic record linkage
    (Fellegi & Sunter 1969; the reference's `estimate` tooling computes
    the entropy side of attribute weights, `pprl_client/cli.py:566-628` —
    this adds the match/nonmatch agreement side).

    Inputs: two record tables and a pairs table ``(a_id, b_id,
    label:int)`` (1 = known match, 0 = known nonmatch). For every
    attribute in ``attrs``: m = P(values agree | match) and
    u = P(values agree | nonmatch), as exact fixed-point floors
    ``m_u = floor(scale * n_agree / n)`` plus the raw counts (so callers
    can form log2(m/u) weights at whatever precision they need).

    Scale shape: two :func:`~pprl_ray.stages.join.bucket_join` passes pull
    each side's attribute columns onto the pairs (only ``attrs`` columns
    ride — prune upstream), then a vectorised per-batch comparison folds
    into per-(attribute, label) partial counts and ONE tiny fold finishes.

    Returns ``(attribute, n_match, n_match_agree, n_nonmatch,
    n_nonmatch_agree, m_u, u_u)`` — one row per attribute."""
    import pandas as pd
    import pyarrow.compute as pc

    from .join import bucket_join

    attrs = list(attrs)
    a_cols = a_ds.select_columns([a_id] + attrs)
    b_cols = b_ds.select_columns([b_id] + attrs)
    j1 = bucket_join(pairs_ds, a_cols, keys="a_id", right_keys=a_id,
                     join_type="inner", partitions=partitions, suffix="_a")
    # after join 1 the a-side attrs may carry no suffix (no collision with
    # pairs columns) — rename them explicitly so join 2's suffix logic
    # can't collide
    def _tag_a(batch: pa.Table) -> pa.Table:
        names = [c + "_a" if c in attrs else c for c in batch.schema.names]
        return batch.rename_columns(names)

    j1 = j1.map_batches(_tag_a, batch_format="pyarrow")
    j2 = bucket_join(j1, b_cols, keys="b_id", right_keys=b_id,
                     join_type="inner", partitions=partitions, suffix="_b")

    def _tag_b(batch: pa.Table) -> pa.Table:
        names = [c + "_b" if c in attrs else c for c in batch.schema.names]
        return batch.rename_columns(names)

    j2 = j2.map_batches(_tag_b, batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].combine_chunks().to_numpy(zero_copy_only=False) != 0
        rows = []
        for c in attrs:
            eq = pc.equal(batch[c + "_a"], batch[c + "_b"])
            eq = pc.fill_null(eq, False).combine_chunks().to_numpy(zero_copy_only=False)
            rows.append((c, int(lab.sum()), int((eq & lab).sum()),
                         int((~lab).sum()), int((eq & ~lab).sum())))
        return pa.table({
            "attribute": pa.array([r[0] for r in rows]),
            "n_match": pa.array([r[1] for r in rows], pa.int64()),
            "n_match_agree": pa.array([r[2] for r in rows], pa.int64()),
            "n_nonmatch": pa.array([r[3] for r in rows], pa.int64()),
            "n_nonmatch_agree": pa.array([r[4] for r in rows], pa.int64()),
        })

    partials = j2.map_batches(_partial, batch_format="pyarrow")

    def _fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("attribute", sort=True).sum().reset_index()
        m_u = [int(scale) * int(a) // int(n) if n else 0
               for a, n in zip(df["n_match_agree"], df["n_match"])]
        u_u = [int(scale) * int(a) // int(n) if n else 0
               for a, n in zip(df["n_nonmatch_agree"], df["n_nonmatch"])]
        out = df.assign(m_u=np.array(m_u, dtype=np.int64),
                        u_u=np.array(u_u, dtype=np.int64))
        return pa.Table.from_pandas(out, preserve_index=False)

    return partials.repartition(1).map_batches(
        _fold, batch_size=None, batch_format="pyarrow"
    )


def fuzzy_join(a_ds, b_ds, a_col: str, b_col: str, a_id: str = "id",
               b_id: str = "id", q: int = 2, threshold: float = 0.5,
               padding: str = "_", scale: int = 1_000_000,
               max_bucket: int = 4096, partitions: int | None = None):
    """Similarity join on RAW strings: every cross-side pair whose padded
    char q-gram sets (the reference's ``tokenize`` semantics,
    ``pprl_core/common.py:9-28``) have Jaccard >= ``threshold`` — the
    plaintext counterpart of the encoded crosswise match, i.e. classic
    q-gram record linkage (Christen, "Data Matching" ch. 5).

    Scale shape: each side tokenizes once (short strings, reference
    per-value tokenize; grams hashed vectorised); ONLY slim
    ``(gram_hash, id, side, n_grams)`` rows shuffle. One gram-hash
    exchange cross-joins a-side x b-side ids per shared gram (grams in
    more than ``max_bucket`` pairwise combinations are dropped —
    ubiquitous grams carry no signal and the cap bounds the blow-up;
    raise ``q`` if it triggers), pre-reducing pair intersection counts;
    a pair-keyed fold finishes with the EXACT Jaccard
    ``inter / (nq_a + nq_b - inter)`` — sizes ride along, no size join.

    Returns ``(a_id, b_id, n_shared, jaccard_u)`` with
    ``jaccard_u = floor(scale * inter / union) >= floor(scale*threshold)``;
    exact modulo 64-bit gram-hash collisions."""
    import pandas as pd

    from ..functions.qgram import tokenize
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = max(auto_partitions(a_ds), auto_partitions(b_ds))
    nparts = int(partitions)
    thr_u = int(scale * threshold)

    def _emit(side: int, col: str, idc: str):
        def _f(batch: pa.Table) -> pa.Table:
            vals = batch[col].combine_chunks().to_pylist()
            ids = batch[idc].combine_chunks().to_numpy(zero_copy_only=False)
            grams = [sorted(tokenize(v if v is not None else "", q, padding))
                     for v in vals]
            lens = np.array([len(g) for g in grams], dtype=np.int64)
            flat = [g for gs in grams for g in gs]
            h = hash_strings(flat) if flat else np.empty(0, np.uint64)
            return pa.table({
                "h": pa.array(h, pa.uint64()),
                "id": pa.array(np.repeat(ids, lens), pa.int64()),
                "nq": pa.array(np.repeat(lens, lens), pa.int64()),
                "side": pa.array(np.full(int(lens.sum()), side, np.int8), pa.int8()),
                "part": pa.array((h % np.uint64(nparts)).astype(np.int32), pa.int32()),
            })
        return _f

    both = a_ds.map_batches(_emit(0, a_col, a_id), batch_format="pyarrow").union(
        b_ds.map_batches(_emit(1, b_col, b_id), batch_format="pyarrow")
    )

    def _inter(group: pd.DataFrame) -> pd.DataFrame:
        a = group[group["side"] == 0]
        b = group[group["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"ia": [], "ib": [], "na": [], "nb": [],
                                 "n": [], "ppart": []}).astype(
                {"ia": "int64", "ib": "int64", "na": "int64", "nb": "int64",
                 "n": "int64", "ppart": "int32"})
        sizes = (a.groupby("h", sort=False)["id"].size()
                 * b.groupby("h", sort=False)["id"].size()).dropna()
        ok = sizes[sizes <= max_bucket].index
        m = a[a["h"].isin(ok)].merge(b[b["h"].isin(ok)], on="h",
                                     suffixes=("_a", "_b"))
        g = (m.groupby(["id_a", "id_b", "nq_a", "nq_b"], sort=False)
             .size().reset_index(name="n"))
        out = pd.DataFrame({
            "ia": g["id_a"].to_numpy(), "ib": g["id_b"].to_numpy(),
            "na": g["nq_a"].to_numpy(), "nb": g["nq_b"].to_numpy(),
            "n": g["n"].to_numpy().astype(np.int64),
        })
        key = (out["ia"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ out["ib"].to_numpy().astype(np.uint64))
        out["ppart"] = (key % np.uint64(nparts)).astype(np.int32)
        return out

    def _jaccard(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["ia", "ib", "na", "nb"], sort=False)["n"]
             .sum().reset_index())
        inter = g["n"].to_numpy().astype(np.int64)
        union = g["na"].to_numpy() + g["nb"].to_numpy() - inter
        ju = int(scale) * inter // union
        keep = ju >= thr_u
        return pd.DataFrame({
            "a_id": g["ia"].to_numpy()[keep],
            "b_id": g["ib"].to_numpy()[keep],
            "n_shared": inter[keep],
            "jaccard_u": ju[keep].astype(np.int64),
        })

    return (
        both.groupby("part").map_groups(_inter, batch_format="pandas")
        .groupby("ppart").map_groups(_jaccard, batch_format="pandas")
    )


def sorted_neighborhood_pairs(ds, key_col: str, id_col: str = "id",
                              window: int = 5, partitions: int | None = None,
                              sample_per_batch: int = 64):
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): order all
    records by ``(key, id)`` and emit every pair within ``window``
    positions — the classic sliding-window candidate generator that
    catches near-misses equality blocking splits apart. EXACT: the output
    equals the single-machine definition row for row (oracled by a
    ``row_number`` self-join).

    Scale shape: range-partition by deterministic hash-sampled string
    boundaries (no global sort materialisation); each bucket sorts locally
    and emits its intra-bucket window pairs vectorised (gap d = 1..w-1 by
    array slicing). Cross-boundary pairs are reconstructed EXACTLY from a
    slim edge set — each bucket ships only its first/last ``window`` rows
    plus its size, the single edge task rebuilds exact global ranks from
    the bucket-size prefix sums and pairs edge rows with rank distance <
    ``window`` across buckets. Two passes over the slim (key, id)
    projection; record payloads never move.

    Returns ``(a_id, b_id, gap)`` with rank(a) < rank(b), gap = rank
    distance in [1, window-1]."""
    import pandas as pd

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)
    w = int(window)

    slim = ds.select_columns([key_col, id_col])

    import pyarrow.compute as pc

    # --- deterministic string boundaries: per-batch bottom-k by hash ------
    # (the sampled table is tiny — batches x sample_per_batch rows — so the
    # driver-side sort is legitimate, like k-means centroids)
    def _sample(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].combine_chunks()
        h = hash_strings([str(x) for x in keys.to_pylist()])
        take = np.argsort(h, kind="stable")[:sample_per_batch]
        return pa.table({"k": pc.take(keys, pa.array(take))})

    sample = sorted(
        slim.map_batches(_sample, batch_format="pyarrow").to_pandas()["k"]
    )
    bounds = ([sample[i * len(sample) // nparts] for i in range(1, nparts)]
              if sample else [])
    bounds = sorted(set(bounds))

    def _tag(batch: pa.Table) -> pa.Table:
        keys = np.array(batch[key_col].to_pylist(), dtype=object)
        b = np.searchsorted(np.array(bounds, dtype=object), keys,
                            side="left").astype(np.int32)
        return pa.table({
            "k": batch[key_col].combine_chunks(),
            "id": pc.cast(batch[id_col], pa.int64()).combine_chunks(),
            "bucket": pa.array(b),
        })

    tagged = slim.map_batches(_tag, batch_format="pyarrow")

    # --- pass A: intra-bucket window pairs (vectorised slicing) -----------
    def _intra(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["k", "id"], kind="stable")
        ids = g["id"].to_numpy()
        outs = []
        for d in range(1, w):
            if d < len(ids):
                outs.append(pd.DataFrame({
                    "a_id": ids[:-d], "b_id": ids[d:],
                    "gap": np.full(len(ids) - d, d, np.int64),
                }))
        if not outs:
            return pd.DataFrame({"a_id": [], "b_id": [], "gap": []}).astype("int64")
        return pd.concat(outs, ignore_index=True)

    intra = tagged.groupby("bucket").map_groups(_intra, batch_format="pandas")

    # --- pass B: slim edges (first/last w rows + size per bucket) ---------
    def _edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["k", "id"], kind="stable").reset_index(drop=True)
        n = len(g)
        head = g.iloc[: min(w, n)].assign(pos=np.arange(min(w, n)))
        tail = g.iloc[max(0, n - w):].assign(pos=np.arange(max(0, n - w), n))
        e = pd.concat([head, tail]).drop_duplicates(["pos"])
        e["size"] = n
        return e[["bucket", "k", "id", "pos", "size"]]

    edges = tagged.groupby("bucket").map_groups(_edges, batch_format="pandas")

    def _cross(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64())})
        sizes = df.drop_duplicates("bucket").set_index("bucket")["size"].sort_index()
        offsets = sizes.cumsum().shift(fill_value=0)
        df["rank"] = df["pos"].to_numpy() + df["bucket"].map(offsets).to_numpy()
        df = df.sort_values(["rank"], kind="stable").reset_index(drop=True)
        r = df["rank"].to_numpy()
        ids = df["id"].to_numpy()
        bk = df["bucket"].to_numpy()
        a, b, gp = [], [], []
        for d in range(1, w):
            # pair edge rows at exact rank distance d, different buckets only
            # (same-bucket pairs were emitted by pass A)
            i = np.searchsorted(r, r + d)
            ok = (i < len(r)) & (r[np.minimum(i, len(r) - 1)] == r + d)
            j = np.minimum(i, len(r) - 1)
            ok &= bk[j] != bk
            a.append(ids[ok])
            b.append(ids[j[ok]])
            gp.append(np.full(int(ok.sum()), d, np.int64))
        return pa.table({
            "a_id": pa.array(np.concatenate(a) if a else [], pa.int64()),
            "b_id": pa.array(np.concatenate(b) if b else [], pa.int64()),
            "gap": pa.array(np.concatenate(gp) if gp else [], pa.int64()),
        })

    cross = edges.repartition(1).map_batches(_cross, batch_size=None,
                                             batch_format="pyarrow")
    return intra.union(cross)
