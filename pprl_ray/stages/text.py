"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All vectorised / bounded per-row work inside
``map_batches``; compiled patterns and stopword tables are built once per
actor (``__init__``), per the actor-pool stateful-stage pattern.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["LangIdStage", "quality_batch", "repetition_batch", "token_count_batch", "fingerprint_batch", "rolling_fingerprint64", "document_frequency", "bm25_topk", "tfidf_top_terms", "PiiScrubStage", "ClassifierScoreStage", "vocab_growth"]

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "was", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von", "nicht", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans", "les", "des"},
}


class LangIdStage:
    """n-gram/stopword-heuristic language ID over a text column.

    Scoring: CJK character ratio short-circuits to ``zh``; otherwise the
    language whose stopword set covers the largest fraction of words wins,
    falling back to character-trigram overlap with tiny per-language
    profiles. Emits ``lang_pred`` and ``lang_score``.

    ``__call__`` is fully vectorised (one polars pass extracts and
    lowercases every word occurrence; set membership + per-row bincount
    sums compute all language scores with zero per-row Python).
    ``_classify`` is the row-at-a-time reference implementation the
    vectorised path is parity-tested against (tests/test_stages.py)."""

    _WORD_RE = r"[a-zA-Zà-ÿÀ-ß]+"
    _CJK_RE = r"[一-鿿㐀-䶿]"
    _TRIGRAMS = {
        "en": {"the", "ing", "and", "ion", "ent", "her", "for", "tha"},
        "de": {"der", "ein", "ich", "und", "sch", "die", "che", "end"},
        "es": {"que", "los", "ent", "ado", "con", "por", "una", "cio"},
        "fr": {"les", "ent", "que", "des", "une", "ion", "eur", "ait"},
    }
    _LANGS = tuple(_STOPWORDS)  # insertion order == tie-break priority

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(self._WORD_RE)
        self.cjk_re = re.compile(self._CJK_RE)

    def _classify(self, text: str) -> tuple[str, float]:
        if not text:
            return "unknown", 0.0
        cjk = len(self.cjk_re.findall(text))
        if cjk and cjk / max(len(text.replace(" ", "")), 1) > 0.2:
            return "zh", cjk / max(len(text.replace(" ", "")), 1)
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown", 0.0
        best_lang, best_score = "unknown", 0.0
        for lang, stops in _STOPWORDS.items():
            score = sum(1 for w in words if w in stops) / len(words)
            tris = self._TRIGRAMS[lang]
            tri_hits = sum(1 for w in words if len(w) >= 3 and (w[:3] in tris or w[-3:] in tris))
            score += 0.5 * tri_hits / len(words)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang, best_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = pl.from_arrow(col).fill_null("")
        n = len(texts)
        if n == 0:
            return batch.append_column("lang_pred", pa.array([], pa.string())).append_column(
                "lang_score", pa.array([], pa.float64())
            )

        # CJK short-circuit features
        cjk_cnt = texts.str.count_matches(self._CJK_RE).to_numpy().astype(np.float64)
        nonspace = (
            texts.str.replace_all(" ", "", literal=True).str.len_chars().to_numpy().astype(np.float64)
        )
        cjk_ratio = cjk_cnt / np.maximum(nonspace, 1.0)
        is_zh = (cjk_cnt > 0) & (cjk_ratio > 0.2)

        # one exploded (row, word) frame for all languages
        df = pl.DataFrame({"row": pl.arange(0, n, eager=True)}).with_columns(
            texts.str.extract_all(self._WORD_RE).alias("w")
        )
        ex = df.explode("w").drop_nulls("w").with_columns(pl.col("w").str.to_lowercase())
        rows = ex["row"].to_numpy()
        w = ex["w"]
        long_enough = (w.str.len_chars() >= 3).to_numpy()
        pre = w.str.slice(0, 3)
        suf = w.str.slice(-3, 3)

        n_words = np.bincount(rows, minlength=n).astype(np.float64)
        scores = np.zeros((len(self._LANGS), n), dtype=np.float64)
        for li, lang in enumerate(self._LANGS):
            stop_hits = np.bincount(
                rows, weights=w.is_in(sorted(_STOPWORDS[lang])).to_numpy(), minlength=n
            )
            tris = sorted(self._TRIGRAMS[lang])
            tri_mask = long_enough & (
                pre.is_in(tris).to_numpy() | suf.is_in(tris).to_numpy()
            )
            tri_hits = np.bincount(rows, weights=tri_mask, minlength=n)
            with np.errstate(invalid="ignore", divide="ignore"):
                # mirror the reference arithmetic exactly: hits/n + (0.5*tri)/n
                scores[li] = stop_hits / n_words + (0.5 * tri_hits) / n_words
        scores[:, n_words == 0] = 0.0

        best_idx = np.argmax(scores, axis=0)  # first max wins, like the dict loop
        best = scores[best_idx, np.arange(n)]
        lang_arr = np.array(self._LANGS, dtype=object)
        preds = np.where(best > 0, lang_arr[best_idx], "unknown")
        out_scores = np.where(best > 0, best, 0.0)
        preds = np.where(is_zh, "zh", preds)
        out_scores = np.where(is_zh, cjk_ratio, out_scores)
        return batch.append_column(
            "lang_pred", pa.array(preds, pa.string())
        ).append_column("lang_score", pa.array(out_scores, pa.float64()))


# BPE-ish word/number/punct segmentation (GPT-2-style coarse pattern)
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count (vectorised Arrow kernels) + BPE-ish regex
    token count (vectorised polars count_matches — same pattern as the
    ``_BPEISH`` reference regex). Whitespace count matches
    ``length(string_split(text, ' '))`` in SQL on single-space text."""
    import polars as pl

    texts = batch[text_col]
    ws_counts = pc.list_value_length(pc.split_pattern(texts, " "))
    col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    bpe_counts = (
        pl.from_arrow(col).fill_null("").str.count_matches(_BPEISH.pattern).to_numpy()
    )
    return batch.append_column("n_tok", pc.cast(ws_counts, pa.int64())).append_column(
        "n_bpeish", pa.array(bpe_counts.astype(np.int64), pa.int64())
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: char/word counts, mean word length, punctuation
    ratio, digit ratio, stopword ratio (en), uppercase ratio — the standard
    cheap quality-filter features. Fully vectorised (polars count_matches /
    split sums; no per-row or per-char Python) with the same float
    arithmetic as the row-wise reference (``quality_row_reference``,
    parity-tested in tests/test_stages.py)."""
    import polars as pl

    out_cols = {name: batch[name] for name in batch.column_names}
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = pl.from_arrow(col).fill_null("")
    n_chars = t.str.len_chars().to_numpy().astype(np.int64)
    # words = t.split() semantics: any-whitespace split, empties dropped
    words = t.str.extract_all(r"\S+")
    n_words = words.list.len().to_numpy().astype(np.int64)
    sum_wl = n_chars - t.str.count_matches(r"\s").to_numpy().astype(np.int64)
    punct_re = "[" + re.escape("".join(sorted(_PUNCT))) + "]"
    punct = t.str.count_matches(punct_re).to_numpy().astype(np.int64)
    # Unicode Nd / Lu classes — semantics shared with quality_row_reference
    # (which uses unicodedata.category), so parity holds beyond ASCII too
    digits = t.str.count_matches(r"\d").to_numpy().astype(np.int64)
    uppers = t.str.count_matches(r"\p{Lu}").to_numpy().astype(np.int64)
    stop_hits = (
        words.list.eval(pl.element().str.to_lowercase().is_in(sorted(_STOPWORDS["en"])))
        .list.sum()
        .to_numpy()
        .astype(np.int64)
    )
    nw = np.maximum(n_words, 1).astype(np.float64)
    nc = np.maximum(n_chars, 1).astype(np.float64)
    has_w = n_words > 0
    has_c = n_chars > 0
    for name, arr, typ in [
        ("n_chars_q", n_chars, pa.int64()),
        ("n_words", n_words, pa.int64()),
        ("mean_word_len", np.where(has_w, sum_wl / nw, 0.0), pa.float64()),
        ("punct_ratio", np.where(has_c, punct / nc, 0.0), pa.float64()),
        ("digit_ratio", np.where(has_c, digits / nc, 0.0), pa.float64()),
        ("stopword_ratio", np.where(has_w, stop_hits / nw, 0.0), pa.float64()),
        ("upper_ratio", np.where(has_c, uppers / nc, 0.0), pa.float64()),
    ]:
        out_cols[name] = pa.array(arr, typ)
    return pa.table(out_cols)


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    Appendix A quality filters): repetitious documents are a dominant
    low-quality mode in web crawl and these cheap counts catch most of it
    before any model-based scoring.

    Emits per doc (space-split words, matching the engine's other token
    semantics): ``n_words``, ``dup_word_ratio`` (1 - distinct/total),
    ``top_word_frac`` (most frequent word's share), ``top_bigram_frac``
    (most frequent word bigram's share of the doc's bigrams).

    Vectorised: one flatten + two C-level pandas groupbys per batch — no
    per-row Python over words."""
    import pandas as pd
    import polars as pl

    ids = {name: batch[name] for name in batch.column_names if name != text_col}
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pl.from_arrow(col).fill_null("").str.split(" ")
    lens = words.list.len().to_numpy().astype(np.int64)
    flat = words.explode().to_numpy().astype(object)
    n_docs = len(lens)
    doc_idx = np.repeat(np.arange(n_docs), lens)

    wc = (
        pd.DataFrame({"d": doc_idx, "w": flat})
        .groupby(["d", "w"], sort=False)
        .size()
    )
    top_word = wc.groupby(level=0).max()
    distinct = wc.groupby(level=0).size()
    topw = np.zeros(n_docs, np.int64)
    dist = np.zeros(n_docs, np.int64)
    topw[top_word.index.to_numpy()] = top_word.to_numpy()
    dist[distinct.index.to_numpy()] = distinct.to_numpy()

    topb = np.zeros(n_docs, np.int64)
    if len(flat) > 1:
        starts = np.zeros(len(flat), bool)
        starts[0] = True
        starts[np.cumsum(lens)[:-1]] = True
        keep = ~starts[1:]
        bg = pd.Series(flat[:-1][keep]) + "\x00" + pd.Series(flat[1:][keep])
        bd = doc_idx[1:][keep]
        if len(bg):
            bc = pd.DataFrame({"d": bd, "b": bg.to_numpy()}).groupby(
                ["d", "b"], sort=False
            ).size()
            top_big = bc.groupby(level=0).max()
            topb[top_big.index.to_numpy()] = top_big.to_numpy()

    nw = np.maximum(lens, 1).astype(np.float64)
    nbig = np.maximum(lens - 1, 1).astype(np.float64)
    ids["n_words"] = pa.array(lens, pa.int64())
    ids["dup_word_ratio"] = pa.array(1.0 - dist / nw, pa.float64())
    ids["top_word_frac"] = pa.array(topw / nw, pa.float64())
    ids["top_bigram_frac"] = pa.array(topb / nbig, pa.float64())
    return pa.table(ids)


def quality_row_reference(text: str) -> dict:
    """Row-at-a-time reference for :func:`quality_batch` (parity tests).

    Digit/uppercase semantics are the Unicode general categories ``Nd`` /
    ``Lu`` (regex ``\\d`` / ``\\p{Lu}``) — NOT Python's ``str.isdigit`` /
    ``str.isupper``, which additionally match No-category digit forms like
    '²' and non-Lu cased letters; the regex classes are what a vectorised
    engine can evaluate, so they define the operator."""
    import unicodedata

    t = text or ""
    words = t.split()
    stops = _STOPWORDS["en"]
    cat = unicodedata.category
    return {
        "n_chars_q": len(t),
        "n_words": len(words),
        "mean_word_len": sum(len(w) for w in words) / len(words) if words else 0.0,
        "punct_ratio": sum(1 for c in t if c in _PUNCT) / len(t) if t else 0.0,
        "digit_ratio": sum(1 for c in t if cat(c) == "Nd") / len(t) if t else 0.0,
        "stopword_ratio": (
            sum(1 for w in words if w.lower() in stops) / len(words) if words else 0.0
        ),
        "upper_ratio": sum(1 for c in t if cat(c) == "Lu") / len(t) if t else 0.0,
    }


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Two fingerprints per document:
    - ``fp_md5``: md5 hex of the lowercased text (exact-dup key,
      SQL-reproducible via DuckDB ``md5(lower(text))``),
    - ``fp_roll``: 64-bit Karp–Rabin rolling hash over words (order
      sensitive, cheap streaming fingerprint) — vectorised
      (:func:`rolling_fingerprint64_batch`).

    Both halves are vectorised: the md5 runs through the DuckDB kernel
    (:func:`~pprl_ray.functions.digest.md5_hex`, ~6x a per-row hashlib
    loop per BASELINE.md) over ``pc.utf8_lower``."""
    from ..functions.digest import md5_hex

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.coalesce(col, pa.scalar("", col.type)))
    md5s = pc.cast(md5_hex(lowered), pa.string())
    rolls = rolling_fingerprint64_batch(col)
    return batch.append_column("fp_md5", md5s).append_column(
        "fp_roll", pa.array(rolls.astype(np.int64), pa.int64())
    )


def _utf8_flat_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, starts, ends) view of an Arrow string array's
    UTF-8 storage (handles string/large_string and sliced arrays)."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offs[:-1], offs[1:]


def rolling_fingerprint64_batch(col: pa.Array, base: int = 1_000_003) -> np.ndarray:
    """Vectorised :func:`rolling_fingerprint64` over an Arrow string column
    (byte-identical; parity-tested in tests/test_stages.py).

    Shape: one polars pass extracts every word occurrence; word hashes are
    a Horner fold over the flat UTF-8 byte buffer (numpy loop over byte
    POSITIONS — bounded by the longest word, not the corpus); the per-doc
    combine is ``sum(word_hash[i] * base^(n-1-i)) mod 2^64`` evaluated as
    wrap-around uint64 products + one ``np.add.reduceat`` per batch. No
    per-row Python."""
    import polars as pl

    texts = pl.from_arrow(col).fill_null("")
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    words = texts.str.extract_all(r"\S+")  # == str.split() semantics
    lengths = words.list.len().to_numpy().astype(np.int64)
    total = int(lengths.sum())
    out = np.zeros(n, dtype=np.uint64)
    if total == 0:
        return out
    # explode() emits one null slot per empty list; drop_nulls restores
    # exact (sum(lengths)) alignment in row order
    flat = words.explode().drop_nulls().to_arrow()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    data, starts, ends = _utf8_flat_view(flat)
    wlen = ends - starts
    wh = np.zeros(total, dtype=np.uint64)
    B131 = np.uint64(131)
    with np.errstate(over="ignore"):
        for j in range(int(wlen.max())):
            mask = wlen > j
            wh[mask] = wh[mask] * B131 + data[starts[mask] + j].astype(np.uint64)
        # doc-level Horner: h = sum_i wh_i * base^(len-1-i)  (mod 2^64)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        row_of = np.repeat(np.arange(n), lengths)
        pos = np.arange(total) - offsets[row_of]
        max_exp = int((lengths.max() - 1))
        powers = np.empty(max_exp + 1, dtype=np.uint64)
        powers[0] = 1
        b = np.uint64(base)
        for k in range(1, max_exp + 1):
            powers[k] = powers[k - 1] * b
        terms = wh * powers[lengths[row_of] - 1 - pos]
        nz = lengths > 0
        out[nz] = np.add.reduceat(terms, offsets[:-1][nz])
    return out


def rolling_fingerprint64(text: str, base: int = 1_000_003) -> int:
    """Karp–Rabin over whitespace words mod 2^64."""
    h = 0
    for w in text.split():
        wh = 0
        for b in w.encode():
            wh = (wh * 131 + b) & 0xFFFFFFFFFFFFFFFF
        h = (h * base + wh) & 0xFFFFFFFFFFFFFFFF
    return h


def document_frequency(ds, text_col: str = "text", id_col: str = "doc_id",
                       partitions: int | None = None):
    """(token, df) — number of documents containing each token, as a
    Dataset. Per-batch polars explode+unique-per-doc partials (only
    deduplicated (token, partial-df) rows enter the reduce), then the
    partitioned-vectorized sum (hash(token) % partitions -> one pandas
    groupby per group) — never a native per-distinct-group aggregate."""
    import pandas as pd
    import polars as pl

    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "token": pl.from_arrow(batch[text_col].combine_chunks()).str.split(" "),
                "_rid": np.arange(batch.num_rows, dtype=np.int64),
            }
        )
        counts = (
            df.explode("token").unique(["_rid", "token"]).group_by("token").len(name="df")
        )
        h = counts["token"].hash(seed=47).to_numpy()
        counts = counts.with_columns(
            pl.Series("part", (h % np.uint64(partitions)).astype(np.int32))
        )
        return counts.to_arrow()

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("token", as_index=False, sort=False)["df"].sum()

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum, batch_format="pandas")
    )


def bm25_topk(ds, terms: list[str], text_col: str = "text",
              id_col: str = "doc_id", k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 top-k retrieval for a FIXED query over a streaming
    corpus (Robertson & Zaragoza 2009) — the exact-scoring baseline a
    distributed search stack verifies against.

    Scale shape: because the query is known up front, no inverted index
    and no postings shuffle are needed — two streaming passes suffice.
    Pass 1 reduces per-batch partials of (n_docs, total_len, df per query
    term): |terms|+2 integers per BLOCK, trivially driver-mergeable at any
    corpus size. Pass 2 broadcasts the scalar stats by closure, scores
    each batch vectorised (polars ``list.count_matches`` per term, fixed
    term-order float64 accumulation so the arithmetic is replicable in
    SQL), keeps each batch's top-k, and the driver merges the bounded
    (k x n_blocks) candidate set. The corpus never shuffles.

    Returns a pandas DataFrame ``(doc_id, score, rank)`` of the global
    top-k ordered by (score desc, id asc)."""
    import pandas as pd
    import polars as pl

    terms = list(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        words = pl.from_arrow(batch[text_col].combine_chunks()).fill_null("").str.split(" ")
        cols = {
            "n_docs": pa.array([len(words)], pa.int64()),
            "total_len": pa.array([int(words.list.len().sum() or 0)], pa.int64()),
        }
        for i, t in enumerate(terms):
            cols[f"df_{i}"] = pa.array(
                [int((words.list.count_matches(t) > 0).sum())], pa.int64()
            )
        return pa.table(cols)

    # distributed tree fold: Dataset.sum aggregates the one-row-per-block
    # partials inside the cluster — only |terms|+2 scalars reach the driver
    stat_cols = ["n_docs", "total_len"] + [f"df_{i}" for i in range(len(terms))]
    sums = ds.map_batches(_stats, batch_format="pyarrow").sum(stat_cols)
    n_docs = int(sums["sum(n_docs)"])
    total_len = int(sums["sum(total_len)"])
    dfs = [int(sums[f"sum(df_{i})"]) for i in range(len(terms))]
    avgdl = total_len / n_docs
    idfs = [np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) for df in dfs]

    def _score(batch: pa.Table) -> pa.Table:
        words = pl.from_arrow(batch[text_col].combine_chunks()).fill_null("").str.split(" ")
        dl = words.list.len().to_numpy().astype(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(dl), np.float64)
        for t, idf in zip(terms, idfs):  # fixed term order = SQL-replicable
            tf = words.list.count_matches(t).to_numpy().astype(np.float64)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + denom_base)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "score": pa.array(score[top], pa.float64()),
            }
        )

    cand = pd.DataFrame(ds.map_batches(_score, batch_format="pyarrow").take_all())
    cand = cand.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    out = cand.head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1)
    return out


def tfidf_top_terms(ds, n_docs: int, text_col: str = "text", id_col: str = "doc_id",
                    partitions: int | None = None,
                    broadcast_max_terms: int = 50_000_000):
    """Per-document top TF-IDF term: score = (tf / n_tok) * ln((N+1)/(df+1)),
    ties broken by token ascending. Two corpus passes: one for the global
    document-frequency table, one scoring pass.

    Open-vocabulary safe — the df table NEVER materializes on the driver:

    - vocabulary ≤ ``broadcast_max_terms`` (16-24 B/term): the df blocks
      (already in the object store) are concatenated by a REMOTE task via
      ``to_arrow_refs()`` — the driver holds only the broadcast ref — and
      each corpus batch scores locally against the shared table.
    - larger vocabularies (open-vocab web text: billions of terms):
      automatic switch to a token-keyed :func:`~pprl_ray.stages.join.bucket_join`
      of slim per-batch ``(doc, token, tf, n_tok)`` partials against the df
      table. Per-token-bucket ``post`` pre-reduces to one best-candidate row
      per (doc, bucket) — valid because (s, token) is a total order within
      a doc — then one slim doc-keyed reduce picks the global winner. Two
      extra slim shuffles, zero driver-side vocabulary copy.

    Both paths emit identical ``(id, top_term, tfidf)`` rows."""
    import polars as pl
    import ray

    df_ds = document_frequency(ds, text_col=text_col, partitions=partitions)

    def _select_df(b: pa.Table) -> pa.Table:
        return b.select(["token", "df"])

    df_ds = df_ds.map_batches(_select_df, batch_format="pyarrow").materialize()
    n_terms = df_ds.count()

    if n_terms <= broadcast_max_terms:
        # broadcast path — assemble in a worker, not through the driver heap
        refs = df_ds.to_arrow_refs()
        schema = pa.schema([("token", pa.large_string()), ("df", pa.uint32())])

        def _assemble(*tables):
            ts = [t for t in tables if t.num_rows > 0]
            return pa.concat_tables(ts).combine_chunks() if ts else schema.empty_table()

        ref = (ray.remote(num_cpus=1)(_assemble).remote(*refs)
               if refs else ray.put(schema.empty_table()))

        def _score(batch: pa.Table) -> pa.Table:
            df_map = pl.from_arrow(ray.get(ref))
            d = pl.DataFrame(
                {
                    id_col: pl.from_arrow(batch[id_col].combine_chunks()),
                    "token": pl.from_arrow(batch[text_col].combine_chunks()).str.split(" "),
                }
            )
            words = d.explode("token")
            tf = words.group_by([id_col, "token"]).len(name="c")
            ntok = words.group_by(id_col).len(name="n")
            scored = (
                tf.join(ntok, on=id_col)
                .join(df_map, on="token")
                .with_columns(
                    (
                        (pl.col("c") * 1.0 / pl.col("n"))
                        * ((n_docs + 1.0) / (pl.col("df") + 1.0)).log()
                    ).alias("s")
                )
                .sort([id_col, "s", "token"], descending=[False, True, False])
                .group_by(id_col, maintain_order=True)
                .first()
            )
            return scored.select(
                [
                    pl.col(id_col),
                    pl.col("token").alias("top_term"),
                    pl.col("s").round(4).alias("tfidf"),
                ]
            ).to_arrow()

        return ds.map_batches(_score, batch_format="pyarrow")

    # join path — slim (doc, token, c, n) partials vs the df table
    from .join import bucket_join
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)

    def _tf_partial(batch: pa.Table) -> pa.Table:
        d = pl.DataFrame(
            {
                id_col: pl.from_arrow(batch[id_col].combine_chunks()),
                "token": pl.from_arrow(batch[text_col].combine_chunks()).str.split(" "),
            }
        )
        words = d.explode("token")
        tf = words.group_by([id_col, "token"]).len(name="c")
        ntok = words.group_by(id_col).len(name="n")
        return tf.join(ntok, on=id_col).to_arrow()

    partials = ds.map_batches(_tf_partial, batch_format="pyarrow")

    def _bucket_best(joined: pa.Table) -> pa.Table:
        # per-(doc, bucket) best candidate: (s desc, token asc) is a total
        # order within a doc (tokens are distinct), so max-of-maxes across
        # buckets equals the global per-doc max
        t = pl.from_arrow(joined)
        return (
            t.with_columns(
                (
                    (pl.col("c") * 1.0 / pl.col("n"))
                    * ((n_docs + 1.0) / (pl.col("df") + 1.0)).log()
                ).alias("s")
            )
            .sort([id_col, "s", "token"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .first()
            .select([id_col, "token", "s"])
            .to_arrow()
        )

    cands = bucket_join(partials, df_ds, keys="token", join_type="inner",
                        partitions=partitions, post=_bucket_best)

    def _doc_part(batch: pa.Table) -> pa.Table:
        dfp = pl.DataFrame({"k": pl.from_arrow(batch[id_col].combine_chunks())})
        h = dfp["k"].hash(seed=59).to_numpy()
        return batch.append_column(
            "part", pa.array((h % np.uint64(partitions)).astype(np.int32))
        )

    def _final(group) -> "pa.Table":
        t = pl.from_pandas(group)
        return (
            t.sort([id_col, "s", "token"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .first()
            .select(
                [
                    pl.col(id_col),
                    pl.col("token").alias("top_term"),
                    pl.col("s").round(4).alias("tfidf"),
                ]
            )
            .to_pandas()
        )

    return (
        cands.map_batches(_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_final, batch_format="pandas")
    )


def _one_chunk(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _cp_postings(batch: pa.Table, df_map, n_docs: int, threshold: float,
                 prefix_filter: bool, group_cap: int, partitions: int,
                 text_col: str, id_col: str, emit: str = "pairs",
                 light_max: float | None = None) -> pa.Table:
    """One batch of documents → salted probe/build posting rows for
    :func:`cosine_pairs` (``emit="pairs"``), or the docs' unindexed
    PREFIX postings ``(id, token, wn, gpart)`` (``emit="prefix"``).

    Pure function of (batch, broadcast df table) — unit-testable without
    Ray. A doc's tokens never leave its batch: tf, n_tok, the L2 norm
    and the prefix/indexed split are all computed here.

    Prefix selection (soundness needs only a PER-DOC property): any
    subset P(x) of a normalized vector's features with ``‖x_P‖ < t``
    may go unindexed, because a pair sharing ONLY such features has
    ``dot ≤ ‖x_shared‖·‖y‖ ≤ ‖x_P‖ < t``. We pick P(x) greedily in
    descending-df order so the globally hottest tokens (tiny idf ⇒ tiny
    weight) land in nearly every doc's prefix — their inverted lists
    then hold almost no indexed entries and the df² pair blowup dies.

    Only LIGHT tokens (``wn ≤ light_max``, default ``threshold/8``) are
    prefix-eligible: hot tokens on zipfian corpora are exactly the light
    ones, while on a degenerate tiny-vocab corpus (every token heavy AND
    ubiquitous — the pair space is genuinely dense, no exact method is
    sub-quadratic) prefixes go empty and the plan degrades gracefully to
    index-everything instead of paying the remainder machinery for
    nothing. Light prefixes also keep each doc's prefix NORM tiny, which
    the candidate floor ``pd + pn_a·pn_b ≥ t`` exploits (the remainder
    can never exceed the product of the two prefix norms), so near-miss
    pairs die at the reduce instead of flooding the remainder join.

    Salting: a token with df build rows splits into ``ceil(df /
    group_cap)`` salt buckets by ``hash(id)``; its (few) indexed probe
    rows replicate into every bucket, so no single partition group ever
    holds more than ~group_cap rows for one token."""
    import polars as pl

    d = pl.DataFrame(
        {
            "id": pl.from_arrow(batch[id_col].combine_chunks()),
            "token": pl.from_arrow(batch[text_col].combine_chunks()).str.split(" "),
        }
    )
    words = d.explode("token")
    tf = words.group_by(["id", "token"]).len(name="c")
    ntok = words.group_by("id").len(name="n")
    w = (
        tf.join(ntok, on="id")
        .join(df_map, on="token")  # inner: max_df-pruned tokens drop out
        .with_columns(
            (
                (pl.col("c") * 1.0 / pl.col("n"))
                * ((n_docs + 1.0) / (pl.col("df") + 1.0)).log()
            ).alias("w")
        )
    )
    norms = w.group_by("id").agg((pl.col("w") ** 2).sum().sqrt().alias("nm"))
    wn = w.join(norms, on="id").with_columns(
        (pl.col("w") / pl.col("nm")).alias("wn")
    )
    if light_max is None:
        light_max = threshold / 8.0
    if prefix_filter:
        # prefix ⇔ LIGHT (wn ≤ light_max) and the cumulative ‖·‖² of
        # light tokens (desc-df order) is still under t²; the -1e-12
        # guard shrinks the prefix under float noise (sound side).
        wn = wn.sort(["id", "df", "token"], descending=[False, True, False])
        wn = wn.with_columns(
            (pl.col("wn") <= light_max).alias("_elig")
        ).with_columns(
            (
                ((pl.col("wn") ** 2) * pl.col("_elig"))
                .cum_sum().over("id")
            ).alias("_cum")
        ).with_columns(
            (
                ~(pl.col("_elig") & (pl.col("_cum") < threshold * threshold - 1e-12))
            ).alias("indexed")
        )
        pnorms = (
            wn.filter(~pl.col("indexed"))
            .group_by("id")
            .agg((pl.col("wn") ** 2).sum().sqrt().alias("pn"))
        )
        wn = wn.join(pnorms, on="id", how="left").with_columns(
            pl.col("pn").fill_null(0.0)
        )
    else:
        wn = wn.with_columns(
            pl.lit(True).alias("indexed"), pl.lit(0.0).alias("pn")
        )
    if emit == "prefix":
        pp = wn.filter(~pl.col("indexed")).select(["id", "token", "wn"])
        gh = pp["id"].hash(seed=13).to_numpy()
        return pp.to_arrow().append_column(
            "gpart", pa.array((gh % np.uint64(partitions)).astype(np.int32))
        )
    wn = wn.with_columns(
        ((pl.col("df") - 1) // group_cap + 1).cast(pl.UInt64).alias("nsalt"),
        pl.col("id").hash(seed=13).alias("_idh"),
    )
    build = wn.with_columns(
        (pl.col("_idh") % pl.col("nsalt")).cast(pl.UInt32).alias("salt"),
        pl.lit(False).alias("probe"),
        (pl.col("nsalt") > 1).alias("salted"),
    )
    # probe replicas exist ONLY for salted tokens (an unsalted token's
    # indexed build rows double as the probe side in the group merge) —
    # the common case pays zero row duplication
    probe = (
        wn.filter(pl.col("indexed") & (pl.col("nsalt") > 1))
        .with_columns(pl.int_ranges(0, pl.col("nsalt").cast(pl.Int64)).alias("salt"))
        .explode("salt")
        .with_columns(
            pl.col("salt").cast(pl.UInt32),
            pl.lit(True).alias("probe"),
            pl.lit(True).alias("salted"),
        )
    )
    cols = ["token", "salt", "id", "wn", "indexed", "probe", "pn", "salted"]
    out = pl.concat([build.select(cols), probe.select(cols)])
    h = out["token"].hash(seed=59).to_numpy()
    part = (
        (h + out["salt"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
        % np.uint64(partitions)
    ).astype(np.int32)
    return out.to_arrow().append_column("part", pa.array(part))


def _cp_pair_partials(group):
    """One (token-hash, salt) partition group → per-pair partial dot
    products, generated ONLY between probe (indexed) rows and build
    rows — a hot token with k indexed of df postings costs k·df rows,
    not df². Both-indexed pairs appear twice (probe_a×build_b and
    probe_b×build_a); the ``id_a < id_b`` keep-rule retains exactly one.
    Probe-side × unindexed-build pairs appear once and are kept as-is,
    then normalized to (min, max). Pure pandas — unit-testable."""
    import pandas as pd

    build = group[~group["probe"]]
    # probe side: explicit replicas for salted tokens, the indexed build
    # rows themselves for unsalted ones (no duplication emitted upstream)
    probe = pd.concat(
        [group[group["probe"]], build[build["indexed"] & ~build["salted"]]]
    )
    m = probe.merge(build, on=["token", "salt"], suffixes=("_a", "_b"))
    m = m[(m["id_a"] != m["id_b"]) & ~(m["indexed_b"] & (m["id_a"] > m["id_b"]))]
    if m.empty:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=group["id"].dtype),
             "id_b": pd.Series(dtype=group["id"].dtype),
             "d": pd.Series(dtype="float64"),
             "pna": pd.Series(dtype="float64"),
             "pnb": pd.Series(dtype="float64")}
        )
    swap = m["id_a"] > m["id_b"]  # dtype-generic (int or string ids)
    res = pd.DataFrame(
        {
            "id_a": m["id_a"].where(~swap, m["id_b"]),
            "id_b": m["id_b"].where(~swap, m["id_a"]),
            "d": (m["wn_a"] * m["wn_b"]).to_numpy(),
            # per-doc prefix norms ride along (constant per pair) so the
            # candidate reduce can apply the pd + pn_a·pn_b ≥ t floor
            "pna": m["pn_a"].where(~swap, m["pn_b"]),
            "pnb": m["pn_b"].where(~swap, m["pn_a"]),
        }
    )
    return res.groupby(["id_a", "id_b"], sort=False).agg(
        d=("d", "sum"), pna=("pna", "first"), pnb=("pnb", "first")
    ).reset_index()


def cosine_pairs(ds, n_docs: int | None = None, threshold: float = 0.8,
                 text_col: str = "text", id_col: str = "doc_id",
                 max_df: int | None = None, partitions: int | None = None,
                 prefix_filter: bool = True, group_cap: int = 2_000_000,
                 light_max: float | None = None):
    """Sparse TF-IDF cosine ALL-PAIRS similarity join — the weighted
    complement of :func:`~pprl_ray.stages.dedup.ngram_jaccard_pairs`:
    every doc pair whose L2-normalized TF-IDF vectors (w = (tf/n_tok) ·
    ln((N+1)/(df+1))) have cosine ≥ ``threshold``. The inverted-index
    partial-dot-product plan WITH the prefix filter (Bayardo, Ma &
    Srikant, WWW 2007 'Scaling Up All Pairs Similarity Search' §3 —
    the exact answer is preserved; only candidate generation shrinks):

    1. global df table (one slim :func:`document_frequency` exchange),
       broadcast worker-assembled (the tfidf_top_terms pattern);
    2. each batch computes its docs' FULL normalized vectors locally
       and splits each into an unindexed PREFIX (greedy descending-df
       features while ``‖prefix‖ < threshold``) and an INDEXED suffix;
       it emits slim salted ``(token, salt, id, wn, indexed)`` build
       rows plus probe replicas for the indexed rows
       (:func:`_cp_postings` — soundness proof in its docstring);
    3. (token-hash, salt) partition groups merge probe × build rows
       into per-pair partial dot products (:func:`_cp_pair_partials`) —
       a ubiquitous token contributes k·df rows (k = its few indexed
       postings), not df²;
    4. a pair-keyed reduce sums partials into CANDIDATES, pruning pairs
       whose partial dot cannot reach the threshold even with the
       maximal possible prefix-prefix remainder (< threshold²,
       since both prefixes have norm < threshold);
    5. the exact remainder — the dot product restricted to tokens in
       BOTH docs' prefixes — is recovered per candidate: candidates
       explode to (pair, side) keys, cogroup with a second streaming
       prefix-postings pass by ``hash(id)`` (re-scan chosen over
       materializing a corpus-sized posting table), then a pair-keyed
       group merges the two sides' prefix vectors and adds
       ``Σ wn_a·wn_b`` to the partial before the final threshold.

    Worst-case partial rows drop from O(Σ_t df(t)²) to
    O(Σ_t idx(t)·df(t)) where idx(t) counts docs whose indexed suffix
    kept t — near zero for hot low-idf tokens. ``group_cap`` salts any
    single token's build rows across ⌈df/group_cap⌉ groups so no task
    materializes an unbounded group (probe rows replicate per salt).
    ``max_df`` is retained for vocabulary-pruned variants (tokens in
    more than max_df docs drop from the VECTORS — weights and norms
    both — redefining the answer); with the prefix filter on it is no
    longer needed for tractability. ``prefix_filter=False`` restores
    the index-everything plan (prefixes empty, remainder zero).

    Returns ``(id_a, id_b, cosine:float64)`` with ``id_a < id_b``."""
    import pandas as pd
    import polars as pl
    import ray

    from .partitioning import auto_partitions

    if n_docs is None:
        n_docs = ds.count()
    if partitions is None:
        partitions = auto_partitions(ds)

    df_ds = document_frequency(ds, text_col=text_col, partitions=partitions)

    def _select(b: pa.Table) -> pa.Table:
        t = b.select(["token", "df"])
        if max_df is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.less_equal(t["df"], max_df))
        return t

    df_ds = df_ds.map_batches(_select, batch_format="pyarrow").materialize()
    refs = df_ds.to_arrow_refs()
    schema = pa.schema([("token", pa.large_string()), ("df", pa.uint32())])

    def _assemble(*tables):
        ts = [t for t in tables if t.num_rows > 0]
        return pa.concat_tables(ts).combine_chunks() if ts else schema.empty_table()

    ref = (ray.remote(num_cpus=1)(_assemble).remote(*refs)
           if refs else ray.put(schema.empty_table()))

    def _postings(batch: pa.Table) -> pa.Table:
        return _cp_postings(
            batch, pl.from_arrow(ray.get(ref)), n_docs, threshold,
            prefix_filter, group_cap, partitions, text_col, id_col,
            light_max=light_max,
        )

    postings = ds.map_batches(_postings, batch_format="pyarrow")
    partials = postings.groupby("part").map_groups(
        _cp_pair_partials, batch_format="pandas"
    )

    def _pair_part(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "id_a": pl.from_arrow(batch["id_a"].combine_chunks()),
                "id_b": pl.from_arrow(batch["id_b"].combine_chunks()),
            }
        )
        hp = (df.hash_rows(seed=71).to_numpy() % np.uint64(partitions)).astype(np.int32)
        return batch.append_column("ppart", pa.array(hp))

    # the missing remainder is the prefix-prefix dot, bounded by the
    # PRODUCT of the two docs' prefix norms (tiny with light-only
    # prefixes): a pair below t - pn_a·pn_b can never qualify
    def _cand_reduce(group):
        s = group.groupby(["id_a", "id_b"], sort=False).agg(
            d=("d", "sum"), pna=("pna", "first"), pnb=("pnb", "first")
        ).reset_index()
        if prefix_filter:
            keep = s["d"] + s["pna"] * s["pnb"] >= threshold - 1e-9
        else:
            keep = s["d"] >= threshold
        return s.loc[keep]

    cand = (
        partials.map_batches(_pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(_cand_reduce, batch_format="pandas")
    )

    def _strip(b: pa.Table) -> pa.Table:
        return b.select(["id_a", "id_b", "d"]).rename_columns(
            ["id_a", "id_b", "cosine"]
        )

    if not prefix_filter:
        return cand.map_batches(_strip, batch_format="pyarrow")

    cand = cand.materialize()  # small: near-miss-bounded candidate pairs

    # --- stage 5: exact prefix-prefix remainder per candidate pair ---
    def _explode_cand(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [_one_chunk(batch["id_a"]), _one_chunk(batch["id_b"])]
        )
        ia = pa.concat_arrays([_one_chunk(batch["id_a"])] * 2)
        ib = pa.concat_arrays([_one_chunk(batch["id_b"])] * 2)
        gh = pl.from_arrow(ids).hash(seed=13).to_numpy()
        n = len(ids)
        return pa.table(
            {
                "id": ids, "id_a": ia, "id_b": ib,
                "token": pa.nulls(n, pa.large_string()),
                "wn": pa.nulls(n, pa.float64()),
                "kind": pa.array(["k"] * n),
                "gpart": pa.array((gh % np.uint64(partitions)).astype(np.int32)),
            }
        )

    # arrow id type from the materialized schema (base_schema keeps the
    # true arrow types that Dataset.schema().types degrades), and a
    # DISTRIBUTED max over the candidates' prefix norms: if every
    # candidate doc has an EMPTY prefix (the degenerate dense-corpus
    # fallback, where light_max disqualified everything), the remainder
    # is identically zero and the whole correction machinery (second
    # corpus scan, two shuffles) is skipped. No candidate block ever
    # ships to the driver.
    _schema = cand.schema()
    id_type = None
    if _schema is not None and "id_a" in _schema.names:
        if isinstance(_schema.base_schema, pa.Schema):
            id_type = _schema.base_schema.field("id_a").type
        else:  # pandas-backed blocks: read ONE block's arrow schema
            for _r in cand.to_arrow_refs():
                _t0 = ray.get(_r)
                if "id_a" in _t0.schema.names:
                    id_type = _t0.schema.field("id_a").type
                    if _t0.num_rows:
                        break
    max_pn = 0.0
    if id_type is not None:
        _mx = cand.map_batches(
            lambda b: pa.table(
                {"m": pa.array(
                    [max(pc.max(b["pna"]).as_py() or 0.0,
                         pc.max(b["pnb"]).as_py() or 0.0)], pa.float64())}
            ),
            batch_format="pyarrow",
        ).max("m")
        max_pn = float(_mx or 0.0)
    if id_type is None or max_pn <= 0.0:
        # no candidates, or no candidate has prefix mass to correct for
        def _final_exact(b: pa.Table) -> pa.Table:
            t = _strip(b)
            return t.filter(pc.greater_equal(t["cosine"], threshold))

        return cand.map_batches(_final_exact, batch_format="pyarrow")
    cand_keys = cand.map_batches(_explode_cand, batch_format="pyarrow")

    def _prefix_postings(batch: pa.Table) -> pa.Table:
        t = _cp_postings(
            batch, pl.from_arrow(ray.get(ref)), n_docs, threshold,
            prefix_filter, group_cap, partitions, text_col, id_col,
            emit="prefix", light_max=light_max,
        )
        n = t.num_rows
        return pa.table(
            {
                "id": t["id"].cast(id_type),
                "id_a": pa.nulls(n, id_type), "id_b": pa.nulls(n, id_type),
                "token": t["token"], "wn": t["wn"],
                "kind": pa.array(["p"] * n), "gpart": t["gpart"],
            }
        )

    pp = ds.map_batches(_prefix_postings, batch_format="pyarrow")

    def _cogroup(group: pd.DataFrame) -> pd.DataFrame:
        k = group[group["kind"] == "k"][["id", "id_a", "id_b"]]
        p = group[group["kind"] == "p"][["id", "token", "wn"]]
        m = k.merge(p, on="id")
        if m.empty:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=k["id_a"].dtype),
                 "id_b": pd.Series(dtype=k["id_b"].dtype),
                 "side": pd.Series(dtype="object"),
                 "token": pd.Series(dtype="object"),
                 "wn": pd.Series(dtype="float64")}
            )
        m["side"] = np.where(m["id"] == m["id_a"], "a", "b")
        return m[["id_a", "id_b", "side", "token", "wn"]]

    rem_rows = cand_keys.union(pp).groupby("gpart").map_groups(
        _cogroup, batch_format="pandas"
    )

    def _tag_rem(batch: pa.Table) -> pa.Table:
        # cast BEFORE hashing: pandas null-coercion upstream can float
        # int ids, and polars hashes 0.0 differently from 0
        ia = _one_chunk(batch["id_a"].cast(id_type))
        ib = _one_chunk(batch["id_b"].cast(id_type))
        df = pl.DataFrame({"id_a": pl.from_arrow(ia), "id_b": pl.from_arrow(ib)})
        hp = (df.hash_rows(seed=71).to_numpy() % np.uint64(partitions)).astype(np.int32)
        return pa.table(
            {
                "id_a": ia,
                "id_b": ib,
                "side": batch["side"].cast(pa.string()),
                "token": batch["token"].cast(pa.large_string()),
                "wn": batch["wn"].cast(pa.float64()),
                "d": pa.nulls(batch.num_rows, pa.float64()),
                "kind": pa.array(["r"] * batch.num_rows),
                "fpart": pa.array(hp),
            }
        )

    def _tag_cand(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "id_a": pl.from_arrow(_one_chunk(batch["id_a"])),
                "id_b": pl.from_arrow(_one_chunk(batch["id_b"])),
            }
        )
        hp = (df.hash_rows(seed=71).to_numpy() % np.uint64(partitions)).astype(np.int32)
        n = batch.num_rows
        return pa.table(
            {
                "id_a": batch["id_a"].cast(id_type),
                "id_b": batch["id_b"].cast(id_type),
                "side": pa.nulls(n, pa.string()),
                "token": pa.nulls(n, pa.large_string()),
                "wn": pa.nulls(n, pa.float64()),
                "d": batch["d"].cast(pa.float64()),
                "kind": pa.array(["c"] * n),
                "fpart": pa.array(hp),
            }
        )

    def _finalize(group: pd.DataFrame) -> pd.DataFrame:
        c = group[group["kind"] == "c"][["id_a", "id_b", "d"]]
        r = group[group["kind"] == "r"]
        ra = r[r["side"] == "a"][["id_a", "id_b", "token", "wn"]]
        rb = r[r["side"] == "b"][["id_a", "id_b", "token", "wn"]]
        mm = ra.merge(rb, on=["id_a", "id_b", "token"], suffixes=("_a", "_b"))
        if mm.empty:
            out = c.rename(columns={"d": "cosine"})
        else:
            mm["rem"] = mm["wn_a"] * mm["wn_b"]
            rem = mm.groupby(["id_a", "id_b"], sort=False)["rem"].sum().reset_index()
            out = c.merge(rem, on=["id_a", "id_b"], how="left")
            out["cosine"] = out["d"] + out["rem"].fillna(0.0)
            out = out[["id_a", "id_b", "cosine"]]
        return out[out["cosine"] >= threshold]

    return (
        rem_rows.map_batches(_tag_rem, batch_format="pyarrow")
        .union(cand.map_batches(_tag_cand, batch_format="pyarrow"))
        .groupby("fpart")
        .map_groups(_finalize, batch_format="pandas")
    )


class PiiScrubStage:
    """Actor-pool PII redaction: patterns compile ONCE per actor
    (``__init__``), each batch is scrubbed vectorised via polars'
    RE2-compatible replace_all. Emits the scrubbed text plus a redaction
    count per row (the audit column a compliance pipeline needs).

    Default patterns cover emails, E.164-ish phone numbers and IPv4 —
    deliberately RE2-safe (no backrefs/lookaround) so the same pattern
    runs identically in polars, Python re and DuckDB regexp_replace
    (which is how the oracle replicates this stage exactly)."""

    EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    PHONE = r"\+[0-9]{7,15}"
    IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

    def __init__(self, patterns: "dict[str, str] | None" = None,
                 text_col: str = "text"):
        self.text_col = text_col
        self.patterns = patterns or {
            "<EMAIL>": self.EMAIL, "<PHONE>": self.PHONE, "<IP>": self.IPV4
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch[self.text_col].combine_chunks()).fill_null("")
        redactions = np.zeros(len(s), dtype=np.int64)
        for token, pattern in self.patterns.items():
            redactions += s.str.count_matches(pattern).to_numpy().astype(np.int64)
            s = s.str.replace_all(pattern, token)
        out = batch.set_column(
            batch.column_names.index(self.text_col), self.text_col, s.to_arrow()
        )
        return out.append_column("n_redactions", pa.array(redactions, pa.int64()))


class ClassifierScoreStage:
    """Hashed-bag-of-words linear classifier inference (the fastText-style
    quality/domain classifier shape) as an actor-pool ``map_batches`` stage.

    The model is a weight vector over ``buckets`` feature-hash buckets;
    a document's score is the mean weight of its word occurrences. The
    weight vector is built / received ONCE per actor (``__init__``) —
    broadcast-once model state, never re-shipped per batch — and scoring
    is exact integer arithmetic: weights are int64 fixed-point millionths
    (``w_fx``), ``score_fx = sum(w_fx[bucket(word)])`` accumulates in
    int64 (order-invariant, overflow-free to ~9e12 words/doc), and the
    single float division ``score = score_fx / (1000003 * n_words)``
    happens once per row — bit-reproducible under any partitioning.

    Feature hashing uses the stock-SQL-replicable md5 bucketing primitive
    (:func:`pprl_ray.functions.digest.md5_bucket32`), computed per
    DISTINCT word in the batch (dictionary-encode first), so the md5 cost
    is O(batch vocabulary), not O(word occurrences).

    Default weights are synthesized deterministically from the bucket
    index (``(b * 2654435761) % 1000003 - 501501`` — a Knuth-hash spread
    over [-501501, 498501] millionths) so the whole stage is replicable
    in ANSI SQL; pass ``weights_fx`` (int64, len == buckets) to score
    with a real trained model.
    """

    def __init__(self, buckets: int = 4096, weights_fx: "np.ndarray | None" = None,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.buckets = int(buckets)
        if weights_fx is None:
            b = np.arange(self.buckets, dtype=np.int64)
            weights_fx = (b * 2654435761) % 1000003 - 501501
        self.w = np.ascontiguousarray(weights_fx, dtype=np.int64)
        assert len(self.w) == self.buckets
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.digest import md5_bucket32

        lists = pc.split_pattern(batch[self.text_col].combine_chunks(), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.values.slice(offsets[0], offsets[-1] - offsets[0])
        off0 = offsets - offsets[0]

        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        uniq_buckets = md5_bucket32(dic.dictionary, self.buckets)
        w_occ = self.w[uniq_buckets[codes]]

        cs = np.concatenate([[0], np.cumsum(w_occ, dtype=np.int64)])
        score_fx = cs[off0[1:]] - cs[off0[:-1]]
        n_words = off0[1:] - off0[:-1]
        score = score_fx.astype(np.float64) / (1000003.0 * n_words.astype(np.float64))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "score_fx": pa.array(score_fx, pa.int64()),
                "score": pa.array(score, pa.float64()),
                "label": pa.array(score_fx > 0),
            }
        )


def collocation_lift(ds, text_col: str = "text", min_count: int = 5, k: int = 50,
                     partitions: int | None = None, scale: int = 1 << 20,
                     broadcast_max_terms: int = 50_000_000, salt: int = 1):
    """Collocation mining: top-k adjacent word pairs by EXACT integer PMI
    lift ``lift_fx = floor(c12 · Nw² · scale / (Nb · c1 · c2))`` — the
    pointwise-mutual-information ratio p(w1,w2)/(p(w1)·p(w2)) in fixed
    point, computed with exact integer arithmetic (Python big ints above
    the int64-safe range), so ranking is bit-deterministic and fully
    SQL-replicable (no ln()).

    Distributed shape: ONE corpus scan emits BOTH bigram and unigram
    partial counts (deduplicated per batch via polars, like token_freq;
    unigram rows ride with kind="u" and an empty-string w2 sentinel —
    safe because kind disambiguates), and both ride ONE slim count
    exchange. ``c12 >= min_count`` is filtered DISTRIBUTED before the
    joins, then the unigram counts attach to the candidates — broadcast
    (worker-assembled ref, the tfidf pattern) when the vocabulary is
    under ``broadcast_max_terms``, else two token-keyed ``bucket_join``s
    (no driver-side vocabulary copy at open vocabulary). Lift per
    candidate inside ``map_batches``, per-block top-k, one driver merge
    of k rows/block. ``Nw``/``Nb`` reduce from per-block partial sums.

    ``salt > 1`` turns the count exchange into a TWO-LEVEL fold (the
    state/aggregate.py salting pattern): level 1 groups by
    ``(key-hash % partitions)·salt + s`` where ``s`` mixes a per-batch
    discriminator, so a key appearing in every block (at web scale its
    partials are one row per block — millions of rows in ONE group)
    splits across ``salt`` groups; level 2 re-reduces the ≤salt
    surviving rows per key. Sums are exact integers, so the result is
    identical for any salt (partitioning-invariance is tested)."""
    import pandas as pd
    import polars as pl

    from .join import bucket_join
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds) or 16

    def _partials(batch: pa.Table) -> pa.Table:
        ws = pl.DataFrame(
            {"ws": pl.from_arrow(batch[text_col].combine_chunks()).str.split(" ")}
        )
        pairs = (
            ws.with_columns(w2s=pl.col("ws").list.slice(1))
            .select(
                w1=pl.col("ws").list.slice(0, pl.col("ws").list.len() - 1),
                w2=pl.col("w2s"),
            )
            .explode(["w1", "w2"])
            .drop_nulls()
            .group_by(["w1", "w2"])
            .len(name="cnt")
            .with_columns(kind=pl.lit("b"))
        )
        uni = (
            ws.select(w1=pl.col("ws"))
            .explode("w1")
            .group_by("w1")
            .len(name="cnt")
            .with_columns(w2=pl.lit("", dtype=pl.String), kind=pl.lit("u"))
        )
        cols = ["kind", "w1", "w2", "cnt"]
        both = pl.concat([pairs.select(cols), uni.select(cols)])
        key = (
            pl.when(pl.col("kind") == "b")
            .then(pl.col("w1") + " " + pl.col("w2"))
            .otherwise(pl.col("w1"))
        )
        h = both.select(key=key)["key"].hash(seed=43).to_numpy()
        if salt > 1:
            mix = np.uint64(h.sum())  # per-batch discriminator (wraps)
            s = ((h ^ mix) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(salt)
            part = (h % np.uint64(partitions)) * np.uint64(salt) + s
        else:
            part = h % np.uint64(partitions)
        both = both.with_columns(pl.Series("part", part.astype(np.int32)))
        return both.to_arrow()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["kind", "w1", "w2"], as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    counts = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum, batch_format="pandas")
    )
    if salt > 1:
        def _resalt(t: pa.Table) -> pa.Table:
            d = pl.from_arrow(t)
            key = (
                pl.when(pl.col("kind") == "b")
                .then(pl.col("w1") + " " + pl.col("w2"))
                .otherwise(pl.col("w1"))
            )
            h = d.select(key=key)["key"].hash(seed=43).to_numpy()
            return t.append_column(
                "part", pa.array((h % np.uint64(partitions)).astype(np.int32))
            )

        counts = (
            counts.map_batches(_resalt, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_sum, batch_format="pandas")
        )
    counts = counts.materialize()

    def _kind_sums(t: pa.Table) -> pa.Table:
        is_b = pc.equal(t["kind"], "b")
        cnt = t["cnt"]
        zero = pa.scalar(0, pa.int64())
        sb = pc.sum(pc.if_else(is_b, cnt, zero)).as_py() or 0
        su = pc.sum(pc.if_else(is_b, zero, cnt)).as_py() or 0
        n_u = pc.sum(pc.cast(pc.invert(is_b), pa.int64())).as_py() or 0
        return pa.table(
            {
                "nb": pa.array([sb], pa.int64()),
                "nw": pa.array([su], pa.int64()),
                "n_terms": pa.array([n_u], pa.int64()),
            }
        )

    totals = counts.map_batches(_kind_sums, batch_format="pyarrow").take_all()
    nb = sum(r["nb"] for r in totals)
    nw = sum(r["nw"] for r in totals)
    n_terms = sum(r["n_terms"] for r in totals)

    cands = counts.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["kind"], "b"), pc.greater_equal(t["cnt"], min_count))
        ).select(["w1", "w2", "cnt"]).rename_columns(["w1", "w2", "c12"]),
        batch_format="pyarrow",
    )
    ucnt = counts.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "u"))
        .select(["w1", "cnt"])
        .rename_columns(["w", "cnt"]),
        batch_format="pyarrow",
    )
    if n_terms <= broadcast_max_terms:
        # small vocabulary: broadcast the unigram counts (assembled in a
        # REMOTE task from the already-materialized blocks — the driver
        # holds only the ref, the tfidf pattern) and attach c1/c2 inside
        # map_batches; saves two bucket-join shuffles.
        import ray

        refs = ucnt.to_arrow_refs()
        uschema = pa.schema([("w", pa.large_string()), ("cnt", pa.int64())])

        def _assemble(*tables):
            ts = [t.select(["w", "cnt"]) for t in tables if t.num_rows > 0]
            return pa.concat_tables(ts).combine_chunks() if ts else uschema.empty_table()

        uref = (ray.remote(num_cpus=1)(_assemble).remote(*refs)
                if refs else ray.put(uschema.empty_table()))

        def _attach(batch: pa.Table) -> pa.Table:
            um = pl.from_arrow(ray.get(uref))
            d = pl.from_arrow(batch)
            d = d.join(um.rename({"w": "w1", "cnt": "c1"}), on="w1", how="inner")
            d = d.join(um.rename({"w": "w2", "cnt": "c2"}), on="w2", how="inner")
            return d.to_arrow()

        j = cands.map_batches(_attach, batch_format="pyarrow")
    else:
        # open vocabulary: token-keyed bucket joins, no driver/worker-wide
        # vocabulary copy
        u1 = ucnt.map_batches(lambda b: b.select(["w", "cnt"]).rename_columns(["w", "c1"]),
                              batch_format="pyarrow")
        u2 = ucnt.map_batches(lambda b: b.select(["w", "cnt"]).rename_columns(["w", "c2"]),
                              batch_format="pyarrow")
        j = bucket_join(cands, u1, keys="w1", right_keys="w", partitions=partitions)
        j = bucket_join(j, u2, keys="w2", right_keys="w", partitions=partitions)

    int64_safe = min_count * nw * nw * scale <= (1 << 62)  # c12 <= nb anyway

    def _lift_topk(batch: pa.Table) -> pa.Table:
        c12 = batch["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = batch["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (
            int64_safe
            and c12.max(initial=0) * nw * nw * scale <= (1 << 62)
            and nb * int(c1.max(initial=1)) * int(c2.max(initial=1)) <= (1 << 62)
        ):
            lift = (c12 * nw * nw * scale) // (nb * c1 * c2)
        else:  # exact big-int path (corpus-scale counts overflow int64)
            lift = np.array(
                [int(a) * nw * nw * scale // (nb * int(b) * int(c))
                 for a, b, c in zip(c12, c1, c2)],
                dtype=np.int64,
            )
        w1 = batch["w1"].to_numpy(zero_copy_only=False)
        w2 = batch["w2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -lift))[:k]
        t = batch.take(pa.array(order)).append_column(
            "lift_fx", pa.array(lift[order], pa.int64())
        )
        return t.select(["w1", "w2", "c12", "lift_fx"])

    parts = j.map_batches(_lift_topk, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    df = df.sort_values(["lift_fx", "w1", "w2"], ascending=[False, True, True],
                        kind="mergesort")
    return df.head(k).reset_index(drop=True).astype({"c12": "int64", "lift_fx": "int64"})


def vocab_growth(ds, text_col: str = "text", id_col: str = "doc_id",
                 bucket_size: int = 100, partitions: int | None = None):
    """Exact vocabulary-growth (Heaps-law) curve: cumulative token
    occurrences vs cumulative distinct word types, bucketed by
    ``doc_id // bucket_size`` — the dataset-diversity readout (a flattening
    type curve means new data stops contributing vocabulary).

    A type's bucket of first appearance is ``min(bucket)`` over its
    occurrences — an associative reduce, so the curve is exact with ONE slim
    exchange: a vectorised pass turns each batch into per-(token-hash,
    bucket) partial counts (16-byte md5-prefix keys, SQL-recomputable;
    text never ships), the hash-partitioned reduce derives both per-bucket
    new-type counts (min-bucket per hash) and per-bucket occurrence sums,
    and the final cumulative sum runs in one task over the tiny
    (n_buckets x partitions) table.

    Returns ``(bucket, n_tokens, n_types)`` int64, cumulative, bucket-ascending.
    """
    import polars as pl

    from ..functions.digest import md5_prefix64
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    nparts = int(partitions)
    bsz = int(bucket_size)

    def _partial(batch: pa.Table) -> pa.Table:
        texts = pl.Series(pl.from_arrow(batch[text_col].combine_chunks())).fill_null("")
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        words = texts.str.split(" ")
        lens = words.list.len().to_numpy().astype(np.int64)
        flat = words.explode()
        if len(flat) != int(lens.sum()):  # explode of an empty list -> one null row
            lens = np.maximum(lens, 1)
        h = md5_prefix64(flat.fill_null("").to_arrow())
        bucket = np.repeat(ids // bsz, lens).astype(np.int64)
        g = (
            pl.DataFrame({"h": h, "bucket": bucket})
            .group_by(["h", "bucket"])
            .agg(pl.len().alias("n"))
        )
        hh = g["h"].to_numpy()
        return pa.table({
            "h": pa.array(hh, pa.uint64()),
            "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            "part": pa.array((hh % np.uint64(nparts)).astype(np.int32), pa.int32()),
        })

    def _reduce(group):
        import pandas as pd

        occ = group.groupby("bucket", sort=False)["n"].sum()
        firstb = group.groupby("h", sort=False)["bucket"].min()
        newt = firstb.value_counts()
        buckets = occ.index.union(newt.index)
        return pd.DataFrame({
            "bucket": buckets.to_numpy().astype(np.int64),
            "occ": occ.reindex(buckets, fill_value=0).to_numpy().astype(np.int64),
            "newt": newt.reindex(buckets, fill_value=0).to_numpy().astype(np.int64),
        })

    partials = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_reduce, batch_format="pandas")
    )

    def _cumsum(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch)
            .group_by("bucket")
            .agg(pl.col("occ").sum(), pl.col("newt").sum())
            .sort("bucket")
        )
        return pa.table({
            "bucket": df["bucket"].to_arrow().cast(pa.int64()),
            "n_tokens": pa.array(np.cumsum(df["occ"].to_numpy()), pa.int64()),
            "n_types": pa.array(np.cumsum(df["newt"].to_numpy()), pa.int64()),
        })

    return partials.repartition(1).map_batches(
        _cumsum, batch_size=None, batch_format="pyarrow"
    )
