"""BPE subword vocabulary learning + encoding (stages/bpe.py)."""

import duckdb
import pyarrow as pa
import pytest

from pprl_ray.stages.bpe import (
    apply_bpe,
    apply_bpe_sql,
    learn_bpe,
    learn_bpe_reference,
    learn_bpe_sql,
)

CORPUS = [
    "low low lower lowest new newer newest wide wider widest",
    "low lower new newer new low",
    "the newest new thing is the widest wide thing",
]


def _word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_items(
        [{"doc_id": f"d{i}", "text": t} for i, t in enumerate(texts)]
    )


def test_learn_matches_naive_reference(ray_session):
    got = learn_bpe(_docs_ds(CORPUS), num_merges=12, max_words=1000)
    want = learn_bpe_reference(_word_counts(CORPUS), 12, 1000)
    rows = list(
        zip(
            got["rank"].to_pylist(),
            got["left_sym"].to_pylist(),
            got["right_sym"].to_pylist(),
            got["merged"].to_pylist(),
        )
    )
    assert rows == want


def test_learn_partitioning_invariant(ray_session):
    a = learn_bpe(_docs_ds(CORPUS), num_merges=8, max_words=1000)
    b = learn_bpe(_docs_ds(CORPUS).repartition(7), num_merges=8, max_words=1000,
                  partitions=3)
    assert a.to_pylist() == b.to_pylist()


def test_learn_matches_sql_chain(ray_session):
    got = learn_bpe(_docs_ds(CORPUS), num_merges=10, max_words=1000)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join(f"('d{i}', '{t}')" for i, t in enumerate(CORPUS))
    )
    ctes, final = learn_bpe_sql("docs", "text", 10, 1000)
    want = con.execute("WITH " + ctes + "\n" + final + " ORDER BY rank").fetchall()
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_tie_break_lexicographic(ray_session):
    # 'ab' and 'cd' both occur twice -> every first-round pair ties at 2;
    # (a,b) < (c,d) < (x,</w>) lexicographically
    merges = learn_bpe(_docs_ds(["ab cd ab cd"]), num_merges=1, max_words=10)
    assert merges.to_pylist()[0] == {
        "rank": 1, "left_sym": "a", "right_sym": "b", "merged": "ab",
    }


def test_early_stop_when_pairs_exhausted(ray_session):
    # 'a' segments to [a, </w>]: one merge possible, then no pairs remain
    merges = learn_bpe(_docs_ds(["a a a"]), num_merges=5, max_words=10)
    assert merges.to_pylist() == [
        {"rank": 1, "left_sym": "a", "right_sym": "</w>", "merged": "a</w>"},
    ]


def test_apply_reconstructs_text_and_matches_sql(ray_session):
    merges = learn_bpe(_docs_ds(CORPUS), num_merges=10, max_words=1000)
    enc = apply_bpe(_docs_ds(CORPUS), merges).to_pandas()
    enc = enc.sort_values("doc_id").reset_index(drop=True)
    # stripping piece-internal joins and mapping </w> back to spaces
    # reconstructs the original text exactly
    for i, t in enumerate(CORPUS):
        row = enc[enc.doc_id == f"d{i}"].iloc[0]
        assert row.encoded.replace(" ", "").replace("</w>", " ").strip() == t
        assert row.n_pieces == len(row.encoded.split(" "))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join(f"('d{i}', '{t}')" for i, t in enumerate(CORPUS))
    )
    want = con.execute(
        apply_bpe_sql("docs", "text", "doc_id", 10, 1000) + " ORDER BY doc_id"
    ).fetch_df()
    assert list(enc.doc_id) == list(want.doc_id)
    assert list(enc.n_pieces) == list(want.n_pieces)
    assert list(enc.encoded) == list(want.encoded)


def test_apply_accepts_row_tuples_and_handles_empty_text(ray_session):
    merges = [(1, "a", "b", "ab")]
    enc = apply_bpe(_docs_ds(["ab ab", ""]), merges).to_pandas()
    enc = enc.sort_values("doc_id").reset_index(drop=True)
    assert enc.iloc[0].encoded == "ab </w> ab </w>"
    assert enc.iloc[0].n_pieces == 4  # per word: merged 'ab' + separate '</w>'
    assert enc.iloc[1].encoded == "</w>"
    assert enc.iloc[1].n_pieces == 1


def test_merge_overlap_is_leftmost_first(ray_session):
    # merge (a,a) on 'aaa' consumes leftmost pair: [aa, a</w>... ] — exact
    # string-replace semantics shared with the SQL oracle
    merges = learn_bpe(_docs_ds(["aaa aaa"]), num_merges=1, max_words=10)
    assert merges.to_pylist()[0]["merged"] == "aa"
    enc = apply_bpe(_docs_ds(["aaa"]), merges).to_pandas()
    assert enc.iloc[0].encoded == "aa a </w>"
