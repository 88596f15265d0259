"""Fused one-pass corpus profiling: N sketches in ONE scan of the corpus.

At 100 TB the dominant cost is reading + flattening the ``tokens`` column;
running each sketch as its own pipeline would re-scan the corpus once per
sketch. This stage folds every configured sketch into a single
``map_batches`` pass: the token ``list<int32>`` column is flattened once,
the group key is dictionary-encoded once, and each sketch consumes the
shared flat values. Output is tiny ``(sketch, key, blob, rows)`` partial
rows; only those move through the (salted, two-level) merge — raw rows are
never shuffled.

Reference parity: generalizes the reference's per-attribute corpus stats
(`packages/pprl_client/pprl_client/lib.py:133-162` computes avg-token-count
and n-gram entropy per attribute in one client-side pass) to mergeable
sketches at scale.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa

from ..sketches import (
    BloomSketch,
    CMSSketch,
    CountSketch,
    DDSketch,
    HistogramSketch,
    HLLSketch,
    KLLSketch,
    KMVSketch,
    MGSketch,
    MomentsSketch,
    TDigestSketch,
    ThetaSketch,
)
from ..state.aggregate import _flatten_list_column

__all__ = [
    "ProfileSpec",
    "MultiSketchPartials",
    "corpus_profile",
    "finalize_profile",
    "default_specs",
    "SKETCH_CLASSES",
]

SKETCH_CLASSES: dict[str, type] = {
    "hll": HLLSketch,
    "cms": CMSSketch,
    "kll": KLLSketch,
    "tdigest": TDigestSketch,
    "bloom": BloomSketch,
    "mg": MGSketch,
    "theta": ThetaSketch,
    "histogram": HistogramSketch,
    "countsketch": CountSketch,
    "kmv": KMVSketch,
    "moments": MomentsSketch,
    "ddsketch": DDSketch,
}


@dataclass(frozen=True)
class ProfileSpec:
    """One sketch to build in the fused pass.

    ``kind`` selects the merge class (SKETCH_CLASSES); ``factory`` builds an
    empty accumulator; ``value_col`` may be a list<int32> column (flattened)
    or a scalar column; ``key_col=None`` aggregates globally (key "")."""

    name: str
    kind: str
    factory: Callable[[], Any]
    value_col: str
    key_col: str | None = None


def default_specs(hll_p: int = 14, cms_width: int = 1 << 16, cms_depth: int = 5,
                  kll_k: int = 200, bloom_bits: int = 1 << 20, bloom_k: int = 4) -> list[ProfileSpec]:
    """The headline corpus-profile suite (BASELINE.json north_star set):
    per-source distinct tokens (HLL), global token frequencies (CMS),
    global + per-source n_tok quantiles (KLL / t-digest), per-source token
    presence (Bloom)."""
    return [
        ProfileSpec("hll_tokens", "hll", lambda: HLLSketch(hll_p), "tokens", "source"),
        ProfileSpec("cms_tokens", "cms", lambda: CMSSketch(width=cms_width, depth=cms_depth), "tokens", None),
        ProfileSpec("kll_ntok", "kll", lambda: KLLSketch(kll_k), "n_tok", None),
        ProfileSpec("tdigest_ntok", "tdigest", lambda: TDigestSketch(), "n_tok", "source"),
        ProfileSpec("bloom_tokens", "bloom", lambda: BloomSketch(bloom_bits, bloom_k), "tokens", "source"),
    ]


class MultiSketchPartials:
    """``map_batches`` callable emitting one partial row per (spec, key, batch).

    Flattening and key-encoding work is shared across all specs, so adding a
    sketch to the pass costs only its own update kernel."""

    def __init__(self, specs: list[ProfileSpec]):
        self.specs = list(specs)
        for s in self.specs:
            if s.kind not in SKETCH_CLASSES:
                raise ValueError(f"unknown sketch kind {s.kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Shared-work evaluation, one pass over the batch:

        - each value column is flattened once (zero-copy via Arrow offsets);
        - per (value_col, key_col) the values are gathered into key-sorted
          order ONCE (stable argsort of the repeated key codes), so every
          group is a contiguous slice instead of a boolean-mask pass per key;
        - per slice, ``np.unique`` runs at most once and feeds every
          set-semantics sketch (HLL / Bloom dedup, CMS duplicate counts),
          while quantile sketches (KLL / t-digest) consume the raw slice.
        """
        flat_cache: dict[str, tuple[np.ndarray, np.ndarray | None]] = {}
        key_cache: dict[str, tuple[np.ndarray, list]] = {}
        slice_cache: dict = {}
        uniq_cache: dict = {}

        def flat(col_name: str):
            if col_name not in flat_cache:
                col = batch[col_name]
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    flat_cache[col_name] = _flatten_list_column(col)
                else:
                    flat_cache[col_name] = (col.to_numpy(zero_copy_only=False), None)
            return flat_cache[col_name]

        def keys(col_name: str):
            if col_name not in key_cache:
                arr = batch[col_name].combine_chunks()
                enc = arr.dictionary_encode()
                key_cache[col_name] = (
                    enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
                    enc.dictionary.to_pylist(),
                )
            return key_cache[col_name]

        def grouped(value_col: str, key_col: str):
            """(uniques, [value-slice per key code], [row count per code])."""
            ck = (value_col, key_col)
            if ck not in slice_cache:
                values, lengths = flat(value_col)
                codes, uniques = keys(key_col)
                n_codes = len(uniques)
                vcodes = np.repeat(codes, lengths) if lengths is not None else codes
                order = np.argsort(vcodes, kind="stable")
                sv = values[order]
                bounds = np.searchsorted(vcodes[order], np.arange(n_codes + 1))
                slices = [sv[bounds[c] : bounds[c + 1]] for c in range(n_codes)]
                counts = np.bincount(codes, minlength=n_codes)
                slice_cache[ck] = (uniques, slices, counts)
            return slice_cache[ck]

        def uniq(value_col: str, key_col: str | None, code: int | None):
            uk = (value_col, key_col, code)
            if uk not in uniq_cache:
                if key_col is None:
                    values, _ = flat(value_col)
                    uniq_cache[uk] = np.unique(values, return_counts=True)
                else:
                    _, slices, _ = grouped(value_col, key_col)
                    uniq_cache[uk] = np.unique(slices[code], return_counts=True)
            return uniq_cache[uk]

        names_out: list[str] = []
        keys_out: list[str] = []
        blobs_out: list[bytes] = []
        rows_out: list[int] = []

        def emit(spec, key, sk, rows):
            names_out.append(spec.name)
            keys_out.append(str(key))
            blobs_out.append(zlib.compress(sk.to_bytes(), 1))
            rows_out.append(int(rows))

        for spec in self.specs:
            set_like = spec.kind in ("hll", "bloom", "cms", "kmv", "theta")
            if spec.key_col is None:
                sk = spec.factory()
                if set_like:
                    uq, cnt = uniq(spec.value_col, None, None)
                    if spec.kind == "cms":
                        sk.update(uq, cnt)
                    else:
                        sk.update_unique(uq)
                else:
                    values, _ = flat(spec.value_col)
                    sk.update(values)
                emit(spec, "", sk, batch.num_rows)
            else:
                uniques, slices, counts = grouped(spec.value_col, spec.key_col)
                for code, key in enumerate(uniques):
                    sk = spec.factory()
                    if set_like:
                        uq, cnt = uniq(spec.value_col, spec.key_col, code)
                        if spec.kind == "cms":
                            sk.update(uq, cnt)
                        else:
                            sk.update_unique(uq)
                    else:
                        sk.update(slices[code])
                    emit(spec, key, sk, counts[code])

        return pa.table(
            {
                "sketch": pa.array(names_out, pa.string()),
                "key": pa.array(keys_out, pa.string()),
                "blob": pa.array(blobs_out, pa.large_binary()),
                "rows": pa.array(rows_out, pa.int64()),
            }
        )


def _merge_profile_group(df, kind_by_name: dict[str, str]):
    import pandas as pd

    name = df["sketch"].iloc[0]
    cls = SKETCH_CLASSES[kind_by_name[name]]
    blobs = df["blob"].tolist()
    sk = cls.from_bytes(zlib.decompress(blobs[0]))
    for b in blobs[1:]:
        sk = sk.merge(cls.from_bytes(zlib.decompress(b)))
    return pd.DataFrame(
        {
            "sketch": [name],
            "key": [df["key"].iloc[0]],
            "blob": [zlib.compress(sk.to_bytes(), 1)],
            "rows": [df["rows"].sum()],
        }
    )


def _combine_partials_batch(batch: pa.Table, kind_by_name: dict[str, str]) -> pa.Table:
    """Local combiner: merge every (sketch, key) group WITHIN one batch of
    partial rows. Runs as a plain map task over bundled partial blocks — no
    shuffle — so each combiner task emits at most one row per (sketch, key)
    regardless of input skew. This bounds the final groupby's fan-in per key
    to the number of combiner tasks (the classic combiner pattern; sketch
    merges are associative + commutative, so the result is identical to a
    flat merge — property-tested in tests/test_sketches.py)."""
    names = batch["sketch"].to_pylist()
    keys = batch["key"].to_pylist()
    blobs = batch["blob"].to_pylist()
    rows = batch["rows"].to_pylist()

    merged: dict[tuple[str, str], Any] = {}
    rowsum: dict[tuple[str, str], int] = {}
    for name, key, blob, r in zip(names, keys, blobs, rows):
        cls = SKETCH_CLASSES[kind_by_name[name]]
        sk = cls.from_bytes(zlib.decompress(blob))
        gk = (name, key)
        if gk in merged:
            merged[gk] = merged[gk].merge(sk)
            rowsum[gk] += r
        else:
            merged[gk] = sk
            rowsum[gk] = r

    gks = sorted(merged)
    return pa.table(
        {
            "sketch": pa.array([g[0] for g in gks], pa.string()),
            "key": pa.array([g[1] for g in gks], pa.string()),
            "blob": pa.array(
                [zlib.compress(merged[g].to_bytes(), 1) for g in gks], pa.large_binary()
            ),
            "rows": pa.array([rowsum[g] for g in gks], pa.int64()),
        }
    )


def corpus_profile(
    ds,
    specs: list[ProfileSpec] | None = None,
    *,
    combiner: str | None = "tasks",
    combine_batch_size: int = 256,
    combiner_actors: int = 4,
    batch_size: int | None = 16384,
    concurrency: int | None = None,
):
    """One fused scan -> Dataset of combined (sketch, key, blob, rows)
    partial rows (a handful of rows per (spec, key); fully reduced by
    :func:`finalize_profile` on the driver).

    Merge topology — no sort-based shuffle anywhere. The scan emits one tiny
    partial row per (spec, key, input block); a combiner then merges partials
    across many blocks per task, so per-key fan-in at the driver is bounded
    by the number of combiner tasks regardless of key skew (the classic
    combiner pattern; hot ``source`` keys collapse the same as cold ones).

    ``combiner`` selects the physical plan:

    - ``"tasks"`` (default): materialize the partial rows (tiny aggregate
      state — NOT the corpus; the input stream is still fully pipelined) and
      run the combiner as bundled map tasks. Zero per-run actor startup;
      right for up to ~10^5 input blocks.
    - ``"actors"``: streaming actor-pool combiner (no materialization at
      all). Pays ~seconds of actor startup per run; right for huge block
      counts where even the partial rows are big.
    - ``None``: return raw per-block partials.
    """
    specs = specs if specs is not None else default_specs()
    kind_by_name = {s.name: s.kind for s in specs}

    partials = ds.map_batches(
        MultiSketchPartials(specs),
        batch_format="pyarrow",
        batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {}),
    )

    combine = lambda b: _combine_partials_batch(b, kind_by_name)  # noqa: E731
    if combiner == "tasks":
        # iterative parallel tree-reduce: each pass merges bundles of
        # ``combine_batch_size`` partial rows in parallel map tasks (~9x
        # reduction per pass for the default spec set) until the remainder
        # is small enough for the driver; block counts per pass come free
        # from the materialized metadata
        partials = partials.materialize()
        while partials.count() > 8 * combine_batch_size:
            partials = partials.map_batches(
                combine, batch_format="pyarrow", batch_size=combine_batch_size
            ).materialize()
        partials = partials.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_batch_size
        )
    elif combiner == "actors":
        partials = partials.map_batches(
            combine,
            batch_format="pyarrow",
            batch_size=combine_batch_size,
            concurrency=combiner_actors,
        )
    elif combiner is not None:
        raise ValueError(f"unknown combiner {combiner!r}")
    return partials


def finalize_profile(partials_ds, specs: list[ProfileSpec] | None = None) -> dict[tuple[str, str], Any]:
    """Driver-side final merge of the (small) combined-partials Dataset into
    {(sketch, key): sketch}. Accepts raw or combined partials — per-key
    duplicates are merged (associative), so any combiner topology feeds in."""
    specs = specs if specs is not None else default_specs()
    kind_by_name = {s.name: s.kind for s in specs}
    out: dict[tuple[str, str], Any] = {}
    for row in partials_ds.take_all():
        cls = SKETCH_CLASSES[kind_by_name[row["sketch"]]]
        sk = cls.from_bytes(zlib.decompress(row["blob"]))
        gk = (row["sketch"], row["key"])
        out[gk] = out[gk].merge(sk) if gk in out else sk
    return out
