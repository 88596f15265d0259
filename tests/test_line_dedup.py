"""Corpus-wide line dedup (stages/dedup.py line_dedup): CCNet-style
first-occurrence-wins line removal, sep and fixed-word-window modes."""

import numpy as np
import pyarrow as pa
import pytest


def _reference(docs: dict[int, str], sep: str) -> dict[int, tuple[str, int]]:
    """Pure-python oracle: keep each line only at its globally first
    (doc_id, line_no) occurrence."""
    seen = set()
    out = {}
    for doc_id in sorted(docs):
        kept, dropped = [], 0
        for line in docs[doc_id].split(sep):
            if line in seen:
                dropped += 1
            else:
                seen.add(line)
                kept.append(line)
        out[doc_id] = (sep.join(kept), dropped)
    return out


def _run(ray_docs, **kw):
    import ray.data as rd

    from pprl_ray.stages.dedup import line_dedup

    t = pa.table({
        "doc_id": pa.array(sorted(ray_docs), pa.int64()),
        "text": pa.array([ray_docs[k] for k in sorted(ray_docs)]),
    })
    out = line_dedup(rd.from_arrow(t).repartition(3), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_line_dedup_first_occurrence_wins(ray_session):
    docs = {
        0: "header\nalpha beta\nfooter",
        1: "header\ngamma delta\nfooter",          # header+footer dup'd
        2: "alpha beta\nalpha beta\nunique two",   # cross-doc + in-doc dup
        3: "header\nfooter",                       # fully boilerplate
    }
    ref = _reference(docs, "\n")
    out = _run(docs)
    got = {int(r.doc_id): (r.text, int(r.n_dropped)) for r in out.itertuples()}
    assert got == ref
    assert got[3] == ("", 2)  # every line was a dup -> empty text


def test_line_dedup_partitioning_invariant(ray_session):
    rng = np.random.default_rng(7)
    lines = [f"line {i} " + " ".join(f"w{j}" for j in rng.integers(0, 50, 6))
             for i in range(40)]
    docs = {
        i: "\n".join(lines[j] for j in rng.integers(0, 40, 8))
        for i in range(25)
    }
    ref = _reference(docs, "\n")
    for parts in (1, 7):
        import ray.data as rd

        from pprl_ray.stages.dedup import line_dedup

        t = pa.table({
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)]),
        })
        out = line_dedup(
            rd.from_arrow(t).repartition(parts)
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        got = {int(r.doc_id): (r.text, int(r.n_dropped)) for r in out.itertuples()}
        assert got == ref


def test_line_dedup_word_windows(ray_session):
    # words_per_line=3: docs chunk into 3-word pseudo-lines; doc 1 repeats
    # doc 0's first window and its own second window
    docs = {
        0: "a b c d e f",
        1: "a b c x y z x y z g",
    }
    out = _run(docs, words_per_line=3)
    got = {int(r.doc_id): (r.text, int(r.n_dropped)) for r in out.itertuples()}
    # doc 0: windows [a b c][d e f] both novel, re-joined with sep
    assert got[0] == ("a b c\nd e f", 0)
    # doc 1: [a b c] dup of doc 0, [x y z] novel, [x y z] in-doc dup, [g] novel
    assert got[1] == ("x y z\ng", 2)


def test_line_dedup_no_dups_roundtrip(ray_session):
    docs = {i: f"only line {i}\nsecond {i}" for i in range(6)}
    out = _run(docs)
    assert list(out["n_dropped"]) == [0] * 6
    assert list(out["text"]) == [docs[i] for i in range(6)]
