"""Synthesize a deterministic sf1-scale documents table (10x sf0.1) for
the composition-pipeline scale point (VERDICT r4 ask #7).

No external data: the vocabulary, empirical unigram distribution, length
band, language/source mixes and exact-dup rate are all LEARNED from the
driver-generated sf0.1 documents.parquet, then 10x rows are drawn from
those distributions with splitmix64 streams (pure function of doc_id) —
the FIXTURES.md seeded-synthesis convention. Output schema matches
exactly: (doc_id:int64, text, lang, source, n_chars:int64).

Usage: python scripts/gen_sf1_documents.py [src_sf_dir] [out_dir] [mult]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
MULT = int(sys.argv[3]) if len(sys.argv) > 3 else 10

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x):
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _M1
        z ^= z >> np.uint64(27)
        z *= _M2
        z ^= z >> np.uint64(31)
    return z


def uniform(stream):
    return splitmix64(stream).astype(np.float64) / float(2 ** 64)


def main():
    con = duckdb.connect()
    path = f"{SRC}/documents.parquet"
    words = con.execute(
        "SELECT w, count(*) c FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM read_parquet('{path}')) GROUP BY w ORDER BY c DESC, w"
    ).fetchall()
    vocab = np.array([w for w, _ in words])
    wcdf = np.cumsum(np.array([c for _, c in words], np.float64))
    wcdf /= wcdf[-1]
    lens = con.execute(
        f"SELECT min(len(string_split(text,' '))), max(len(string_split(text,' '))),"
        f" count(*) FROM read_parquet('{path}')"
    ).fetchone()
    lmin, lmax, n_src_rows = int(lens[0]), int(lens[1]), int(lens[2])
    langs = con.execute(
        f"SELECT lang, count(*) FROM read_parquet('{path}') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    lv = np.array([l for l, _ in langs])
    lcdf = np.cumsum(np.array([c for _, c in langs], np.float64))
    lcdf /= lcdf[-1]
    sources = con.execute(
        f"SELECT source, count(*) FROM read_parquet('{path}') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    sv = np.array([s for s, _ in sources])
    scdf = np.cumsum(np.array([c for _, c in sources], np.float64))
    scdf /= scdf[-1]
    dup_rate = con.execute(
        f"SELECT (count(*) - count(DISTINCT text)) * 1.0 / count(*) "
        f"FROM read_parquet('{path}')"
    ).fetchone()[0]

    n = n_src_rows * MULT
    ids = np.arange(n, dtype=np.uint64)
    base = splitmix64(ids + np.uint64(727))
    lengths = (lmin + (uniform(base) * (lmax - lmin + 1)).astype(np.int64)).clip(
        lmin, lmax
    )
    lang = lv[np.searchsorted(lcdf, uniform(base + np.uint64(1)))]
    source = sv[np.searchsorted(scdf, uniform(base + np.uint64(2)))]

    # token stream indexed by (doc_id * (lmax+1) + position)
    pos = np.repeat(ids * np.uint64(lmax + 1), lengths) + np.concatenate(
        [np.arange(k, dtype=np.uint64) for k in lengths]
    )
    toks = vocab[np.searchsorted(wcdf, uniform(splitmix64(pos) + np.uint64(31)))]
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    texts = np.array(
        [" ".join(toks[offsets[i]:offsets[i + 1]]) for i in range(n)], dtype=object
    )
    # planted exact dups at the source rate: doc i copies doc i-1's text
    dup_mask = (uniform(base + np.uint64(3)) < dup_rate) & (ids > 0)
    texts[dup_mask] = texts[np.flatnonzero(dup_mask) - 1]

    tbl = pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "text": pa.array(texts.tolist(), pa.string()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "source": pa.array(source.tolist(), pa.string()),
            "n_chars": pa.array(
                [len(t) for t in texts.tolist()], pa.int64()
            ),
        }
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(tbl, f"{OUT}/documents.parquet", row_group_size=4096)
    print(f"wrote {n} docs to {OUT}/documents.parquet "
          f"(vocab {len(vocab)}, dups ~{dup_mask.sum()})")


if __name__ == "__main__":
    main()
