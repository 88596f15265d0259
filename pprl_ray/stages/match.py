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
from .mask import decode_b64_column

__all__ = ["match_crosswise", "match_pairwise", "match_many", "BroadcastMatcher"]


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


def match_crosswise(domain_ds, range_ds, config: MatchConfig | None = None, **map_kwargs):
    """Broadcast block-nested-loop θ-join. ``domain_ds`` must be the smaller
    side (it is pinned in the object store once via ``ray.put``)."""
    import ray

    config = config or MatchConfig()
    domain_ref = ray.put(_materialize_side(domain_ds))
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


def match_many(datasets: list, config: MatchConfig | None = None):
    """All unordered dataset pairs (i<j), as the reference CLI does for
    multi-file matching (``cli.py:209-222``). Returns {(i, j): Dataset}."""
    out = {}
    for i in range(len(datasets)):
        for j in range(i + 1, len(datasets)):
            out[(i, j)] = match_crosswise(datasets[i], datasets[j], config)
    return out
