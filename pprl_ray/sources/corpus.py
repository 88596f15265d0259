"""Tokenized-corpus table sources (BASELINE.json ``input_hint`` schema:
``doc_id:string, tokens:list<int32>, n_tok:int32, source:string``).

Two providers:

- :func:`derive_corpus` — deterministically derives the corpus from a
  ``documents.parquet`` table (whitespace word tokens -> stable int32 ids via
  vectorised hashing). Used by the sf-dir test/oracle paths.
- :func:`synth_corpus` — fully synthetic deterministic corpus per FIXTURES.md
  F1: per-row values are pure functions of the row id (splitmix64 streams),
  so the table is identical under any partitioning / parallelism. Lengths
  lognormal clipped to [1, 2048]; token ids zipf-ish over a 50,257 vocab;
  sources skewed {web .70, books .15, code .10, wiki .05} to exercise salted
  skew handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches.hashing import splitmix64

__all__ = ["derive_corpus", "synth_corpus", "synth_entities", "CORPUS_SCHEMA", "tokenize_words_batch"]

VOCAB_SIZE = 50_257
SOURCES = ("web", "books", "code", "wiki")
_SOURCE_CUM = np.array([0.70, 0.85, 0.95, 1.0])

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def tokenize_words_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
                         source_col: str = "source") -> pa.Table:
    """documents batch -> corpus batch. Word tokens = whitespace split; token
    id = 64-bit vectorised hash of the word folded to non-negative int32."""
    import polars as pl

    texts = pl.from_arrow(batch[text_col])
    words = texts.str.split(" ")  # documents are single-space separated
    lengths = words.list.len().to_numpy().astype(np.int64)
    flat = words.explode()
    ids32 = (flat.hash(seed=0).to_numpy() & np.uint64(0x7FFFFFFF)).astype(np.int32)

    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids32, pa.int32()))

    doc_ids = pa.compute.binary_join_element_wise(
        "doc-", pa.compute.cast(batch[id_col], pa.string()), ""
    )
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
            "source": batch[source_col].combine_chunks().cast(pa.string()),
        }
    )


def derive_corpus(sf_dir: str, concurrency: int | None = None):
    """Read ``{sf_dir}/documents.parquet`` and derive the corpus table as a
    streaming Dataset (columns pruned at the read).

    The read's block count is pinned from the file's OWN metadata (~32 MiB
    per block, floor 16) rather than the cluster's default parallelism:
    topology-sensitive consumers (KLL/t-digest merges) are then
    bit-reproducible across num_cpus, and the block count still scales with
    the input, not with a literal."""
    import ray.data as rd

    from ..stages.partitioning import auto_partitions, free_size_bytes

    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text", "source"]
    size = free_size_bytes(rd.read_parquet(path, columns=cols))
    if size is not None:
        ds = rd.read_parquet(
            path,
            columns=cols,
            override_num_blocks=auto_partitions(
                size_bytes=size, target_bytes=32 << 20, lo=16
            ),
        )
    else:
        ds = rd.read_parquet(path, columns=cols)
    return ds.map_batches(tokenize_words_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# synthetic corpus (FIXTURES.md F1)


def _uniform(stream: np.ndarray) -> np.ndarray:
    return splitmix64(stream).astype(np.float64) / float(2**64)


def _zipf_cdf(vocab: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks**-s
    cdf = np.cumsum(p)
    return cdf / cdf[-1]


_ZIPF_CDF = None


def synth_batch(batch: pa.Table, seed: int = 42, mean_len: float = 200.0,
                sigma: float = 0.8, max_len: int = 2048) -> pa.Table:
    """Map an (id:int64) batch from ``ray.data.range`` to corpus rows.
    Deterministic per id — independent of batch boundaries."""
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        _ZIPF_CDF = _zipf_cdf(VOCAB_SIZE)

    ids = batch["id"].to_numpy().astype(np.uint64)
    base = splitmix64(ids + np.uint64(seed))

    # lognormal length via Box-Muller from two per-row uniform streams
    u1 = np.clip(_uniform(base), 1e-12, 1 - 1e-12)
    u2 = _uniform(base + np.uint64(1))
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    lengths = np.clip(np.exp(np.log(mean_len) + sigma * z).astype(np.int64), 1, max_len)

    # source from a third stream, skewed
    u3 = _uniform(base + np.uint64(2))
    src_idx = np.searchsorted(_SOURCE_CUM, u3)
    sources = np.array(SOURCES)[src_idx]

    # token ids: stream indexed by (id * (max_len+1) + j)
    tok_pos = np.repeat(ids * np.uint64(max_len + 1), lengths) + _concat_aranges(lengths)
    u_tok = _uniform(splitmix64(tok_pos) + np.uint64(seed * 7919))
    token_ids = np.searchsorted(_ZIPF_CDF, u_tok).astype(np.int32)

    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(token_ids, pa.int32()))
    doc_ids = pa.array([f"doc-{i:012d}" for i in ids.tolist()], pa.string())
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
            "source": pa.array(sources, pa.string()),
        }
    )


def _concat_aranges(lengths: np.ndarray) -> np.ndarray:
    """[arange(l) for l in lengths] concatenated, vectorised."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.ones(total, dtype=np.uint64)
    ends = np.cumsum(lengths)
    out[0] = 0
    out[ends[:-1]] = -(lengths[:-1] - 1).astype(np.int64)
    return np.cumsum(out.astype(np.int64)).astype(np.uint64)


_FIRST_NAMES = (
    "Ada Alan Grace Emmy Kurt Rosalind Barbara Donald Edsger Margaret John "
    "Katherine Claude Hedy Radia Annie Tim Linus Guido Frances Jean Mary "
    "Dorothy Evelyn Marie Niels Enrico Lise Erwin Paul".split()
)
_LAST_NAMES = (
    "Lovelace Turing Hopper Noether Goedel Franklin Liskov Knuth Dijkstra "
    "Hamilton Backus Johnson Shannon Lamarr Perlman Easley BernersLee "
    "Torvalds Rossum Allen Bartik Vaughan Curie Bohr Fermi Meitner "
    "Schroedinger Dirac Wilson Hoover".split()
)
_GENDERS = ("f", "m", "x")


def synth_entities(n: int, seed: int = 727):
    """Deterministic person-entity table (reference ``pprl estimate
    gecko|faker`` generator parity, `pprl_client/cli.py:428-563` — seeded
    synthetic entities for weight estimation; Faker/Gecko replaced by an
    embedded deterministic generator, no external data). Schema matches the
    reference's Faker persons: id, firstName, lastName, dateOfBirth, gender."""
    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.uint64)
        s = splitmix64(ids + np.uint64(seed))
        fn = np.array(_FIRST_NAMES, dtype=object)[
            (splitmix64(s + np.uint64(1)) % np.uint64(len(_FIRST_NAMES))).astype(np.int64)
        ]
        ln = np.array(_LAST_NAMES, dtype=object)[
            (splitmix64(s + np.uint64(2)) % np.uint64(len(_LAST_NAMES))).astype(np.int64)
        ]
        year = 1920 + (splitmix64(s + np.uint64(3)) % np.uint64(86)).astype(np.int64)
        month = 1 + (splitmix64(s + np.uint64(4)) % np.uint64(12)).astype(np.int64)
        day = 1 + (splitmix64(s + np.uint64(5)) % np.uint64(28)).astype(np.int64)
        dob = [f"{y:04d}-{m:02d}-{d:02d}" for y, m, d in zip(year, month, day)]
        g = np.array(_GENDERS, dtype=object)[
            (splitmix64(s + np.uint64(6)) % np.uint64(len(_GENDERS))).astype(np.int64)
        ]
        return pa.table(
            {
                "id": pa.array([str(i) for i in ids.tolist()], pa.string()),
                "firstName": pa.array(fn, pa.string()),
                "lastName": pa.array(ln, pa.string()),
                "dateOfBirth": pa.array(dob, pa.string()),
                "gender": pa.array(g, pa.string()),
            }
        )

    return rd.range(n).map_batches(_gen, batch_format="pyarrow")


def synth_corpus(n_docs: int, seed: int = 42, override_num_blocks: int | None = None):
    """Lazy synthetic corpus Dataset of ``n_docs`` rows."""
    import ray.data as rd

    kwargs = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    ds = rd.range(n_docs, **kwargs)
    return ds.map_batches(lambda b: synth_batch(b, seed=seed), batch_format="pyarrow")
