"""Hardener conformance (ported from ``pprl_core/tests/test_harden.py``) plus
cross-checks of the vectorised batch implementations against direct per-row
re-derivations of the reference algorithms (seed 727 convention)."""

import struct
from random import Random

import numpy as np
import pytest

from pprl_ray.functions import bitvec, harden


def _bits(s: str) -> np.ndarray:
    return np.array([int(c) for c in s], dtype=np.uint8)[None, :]


def _to_str(row: np.ndarray) -> str:
    return "".join(str(int(b)) for b in row)


@pytest.fixture
def random_rows():
    # reference conftest bitarray_factory: 64 draws of Random(727).random() < .5
    rng = Random(727)
    rows = []
    for _ in range(6):
        rows.append([1 if rng.random() < 0.5 else 0 for _ in range(64)])
    return np.array(rows, dtype=np.uint8)


def test_balance():
    out = harden.balance()(_bits("1010"))
    assert _to_str(out[0]) == "10100101"


def test_xor_fold():
    b1, b2 = "11111111", "10100011"
    out = harden.xor_fold()(_bits(b1 + b2))
    expected = "".join(str(int(x) ^ int(y)) for x, y in zip(b1, b2))
    assert _to_str(out[0]) == expected


def test_xor_fold_padded():
    b1, b2 = "11111111", "10100011"
    out = harden.xor_fold()(_bits(b1 + b2[:-1]))
    expected = "".join(str(int(x) ^ int(y)) for x, y in zip(b1, "10100010"))
    assert _to_str(out[0]) == expected


@pytest.mark.parametrize(
    "original,expected",
    [("10010", "01100"), ("0110101", "0110000")],
)
def test_rule_90(original, expected):
    out = harden.rule_90()(_bits(original))
    assert _to_str(out[0]) == expected


def test_permute_matches_reference_rowwise(random_rows):
    """Batch permute must equal the reference's per-row biased Fisher-Yates
    (fresh Random(seed) per filter, ``harden.py:88-108``)."""
    out = harden.permute(727)(random_rows)
    for r in range(random_rows.shape[0]):
        ba = list(random_rows[r])
        rng = Random(727)
        for i in range(len(ba) - 1, 0, -1):
            j = rng.randrange(i)
            ba[i], ba[j] = ba[j], ba[i]
        assert list(out[r]) == ba


def test_permute_changes_and_is_deterministic(random_rows):
    h = harden.permute(727)
    out1 = h(random_rows)
    out2 = harden.permute(727)(random_rows)
    assert not np.array_equal(out1, random_rows)
    assert np.array_equal(out1, out2)
    assert not np.array_equal(harden.permute(456)(random_rows), out1)


def test_randomized_response_matches_reference_rowwise(random_rows):
    out = harden.randomized_response(727, 0.5)(random_rows)
    for r in range(random_rows.shape[0]):
        ba = list(random_rows[r])
        rng = Random(727)
        for i in range(len(ba)):
            d = rng.random()
            if d > 0.5:
                continue
            ba[i] = 1 if d < 0.25 else 0
        assert list(out[r]) == ba


def test_randomized_response_probability_changes_output(random_rows):
    out1 = harden.randomized_response(727, 0.5)(random_rows)
    out2 = harden.randomized_response(727, 0.25)(random_rows)
    assert not np.array_equal(out1, out2)


def test_rehash_matches_reference_rowwise(random_rows):
    out = harden.rehash(8, 8, 3)(random_rows)
    for r in range(random_rows.shape[0]):
        ba = list(random_rows[r])
        new = list(ba)
        n = len(ba)
        for i in range(0, n - 8 + 1, 8):
            window = ba[i : i + 8]
            packed = np.packbits(np.array(window, dtype=np.uint8), bitorder="big").tobytes()
            seed = struct.unpack_from("<i", packed + b"\x00" * 4)[0]
            rng = Random(seed)
            for _ in range(3):
                new[rng.randrange(n)] = 1
        assert list(out[r]) == new


def test_rehash_param_sensitivity(random_rows):
    base = harden.rehash(8, 8, 3)(random_rows)
    assert not np.array_equal(base, harden.rehash(16, 8, 3)(random_rows))
    assert not np.array_equal(base, harden.rehash(8, 16, 3)(random_rows))
    assert not np.array_equal(base, harden.rehash(8, 8, 5)(random_rows))


@pytest.mark.parametrize(
    "n,ws,step,expected",
    [
        (16, 16, 16, [0]),
        (16, 8, 8, [0, 8]),
        (16, 16, 8, [0]),
        (16, 4, 2, [0, 2, 4, 6, 8, 10, 12]),
        (16, 32, 8, []),
        (16, 12, 4, [0, 4]),
    ],
)
def test_rehash_window_range(n, ws, step, expected):
    assert list(range(0, n - ws + 1, step)) == expected


def test_chain_order(random_rows):
    chain = harden.build_hardener_chain(
        [{"name": "balance"}, {"name": "xor_fold"}]
    )
    out = chain(random_rows)
    # balance then fold: fold(b + ~b) == b ^ ~b == all ones
    assert np.all(out == 1)
    chain2 = harden.build_hardener_chain([{"name": "xor_fold"}, {"name": "balance"}])
    out2 = chain2(random_rows)
    assert out2.shape[1] == 64
    assert not np.all(out2 == 1)


def test_pack_unpack_roundtrip(random_rows):
    packed = bitvec.pack_rows(random_rows)
    unpacked = bitvec.unpack_rows(packed, 64)
    assert np.array_equal(unpacked, random_rows)
