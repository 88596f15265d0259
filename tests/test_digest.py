"""functions/digest.py: vectorised md5 must be byte-identical to hashlib."""

import hashlib

import numpy as np
import pyarrow as pa

from pprl_ray.functions.digest import md5_bucket32, md5_hex


def test_md5_hex_matches_hashlib():
    vals = ["", "a", "hello world", "ünïcødé ✓", "x" * 10_000]
    out = md5_hex(pa.array(vals)).to_pylist()
    assert out == [hashlib.md5(v.encode()).hexdigest() for v in vals]


def test_md5_hex_numeric_cast_matches_str():
    ids = pa.array(np.arange(1000, dtype=np.int64))
    out = md5_hex(ids).to_pylist()
    assert out == [hashlib.md5(str(i).encode()).hexdigest() for i in range(1000)]


def test_md5_hex_null_passthrough():
    out = md5_hex(pa.array(["a", None, "b"])).to_pylist()
    assert out[1] is None and out[0] == hashlib.md5(b"a").hexdigest()


def test_md5_bucket32_matches_python():
    ids = pa.array(np.arange(5000, dtype=np.int64))
    buckets = md5_bucket32(ids, 10)
    expected = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10 for i in range(5000)]
    )
    assert np.array_equal(buckets, expected)
