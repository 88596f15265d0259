"""Golden-vector conformance tests for the pure kernels, ported from the
reference test suites (``packages/pprl_core/tests/``)."""

import numpy as np
import pytest

from pprl_ray.functions import bitvec, qgram, similarity, transform
from pprl_ray.functions.phonetics import ascii_fold

# --- tokenize (pprl_core/tests/test_common.py) -----------------------------


def test_tokenize_default():
    assert qgram.tokenize("foobar") == {"_f", "fo", "oo", "ob", "ba", "ar", "r_"}


def test_tokenize_with_padding():
    assert qgram.tokenize("foobar", padding="#") == {"#f", "fo", "oo", "ob", "ba", "ar", "r#"}


def test_tokenize_with_size():
    assert qgram.tokenize("foobar", q=3) == {
        "__f", "_fo", "foo", "oob", "oba", "bar", "ar_", "r__"
    }


def test_tokenize_no_padding_empty():
    assert qgram.tokenize("a", q=2, padding="") == set()


def test_destructure_digest():
    assert qgram.destructure_digest(
        b"\x01" * 4 + b"\x23" * 4 + b"\x45" * 4 + b"\x67" * 4
    ) == (0x01010101, 0x23232323, 0x45454545, 0x67676767)


# --- bits (pprl_core/tests/test_bits.py) -----------------------------------


@pytest.mark.parametrize("p,n,expected", [(0.5, 5, 8), (0.75, 5, 18), (0.5, 20, 30)])
def test_optimal_size(p, n, expected):
    assert bitvec.optimal_size(p, n) == expected


def test_optimal_size_errors():
    with pytest.raises(ValueError):
        bitvec.optimal_size(0.5, 0)
    with pytest.raises(ValueError):
        bitvec.optimal_size(1.0, 5)


def test_fold_indices_negative_flip():
    # reference _compute_idx: ~i for negative, then mod
    assert bitvec.fold_indices(np.array([-1]), 16)[0] == (~-1) % 16  # 0
    assert bitvec.fold_indices(np.array([-5]), 16)[0] == 4
    assert bitvec.fold_indices(np.array([21]), 16)[0] == 5


def test_set_and_test_bits():
    bv = bitvec.zeros(16)
    bitvec.set_indices(bv, bitvec.fold_indices(np.array([3, -5, 21]), 16))
    for i in (3, 4, 5):
        assert bitvec.test_index(bv, i)
    assert bv.count() == 3
    assert bitvec.test_index(bv, -5)  # folds to 4


def test_double_hash_indices():
    # h1 + i*h2 for i=1..k
    idx = qgram.fold_indices(np.array([5 + 1 * 3, 5 + 2 * 3]), 16)
    bv = bitvec.zeros(16)
    bitvec.set_indices(bv, idx)
    assert bitvec.to_01(bv) == "0000000010010000"


def test_base64_roundtrip_bitarray_layout():
    # MSB-first byte packing: bits "10000001" -> byte 0x81
    bv = bitvec.from_01("10000001")
    assert bitvec.to_bytes(bv) == b"\x81"
    assert bitvec.to_base64(bv) == "gQ=="
    back = bitvec.from_base64("gQ==")
    assert back.nbits == 8 and bitvec.to_01(back) == "10000001"
    # non-byte-aligned: trailing pad bits are zero
    bv2 = bitvec.from_01("1010")
    assert bitvec.to_bytes(bv2) == b"\xa0"


# --- similarity (pprl_core/tests/test_similarity.py) -----------------------

_left = bitvec.from_01("1" * 40)
_right = bitvec.from_01("1" * 10 + "0" * 30)


def test_dice():
    assert similarity.dice(_left, _right) == 0.4


def test_cosine():
    assert similarity.cosine(_left, _right) == 0.5


def test_jaccard():
    assert similarity.jaccard(_left, _right) == 0.25


def test_vectorized_similarity_matches_scalar():
    rng = np.random.default_rng(727)
    rows = rng.integers(0, 256, size=(8, 16), dtype=np.uint8).astype(np.uint8)
    for measure, scalar_fn in [
        ("dice", similarity.dice),
        ("cosine", similarity.cosine),
        ("jaccard", similarity.jaccard),
    ]:
        mat = similarity.crosswise_similarity(rows[:4], rows[4:], measure)
        for i in range(4):
            for j in range(4):
                a = bitvec.BitVec(rows[i].copy(), 128)
                b = bitvec.BitVec(rows[4 + j].copy(), 128)
                assert mat[i, j] == pytest.approx(scalar_fn(a, b))
        pv = similarity.pairwise_similarity(rows[:4], rows[4:], measure)
        for i in range(4):
            assert pv[i] == pytest.approx(mat[i, i])


def test_pairwise_length_mismatch():
    with pytest.raises(ValueError, match="do not match"):
        similarity.pairwise_similarity(np.zeros((2, 4), np.uint8), np.zeros((3, 4), np.uint8))


# --- transformers (pprl_core/tests/test_transform.py) ----------------------


def test_character_filter_custom():
    assert transform.character_filter("o")("foobar") == "fbar"


def test_normalize():
    assert transform.normalize()(" Fòo   bár ") == "foo bar"


def test_date_time():
    assert transform.date_time("%d.%m.%Y", "%Y-%m-%d")("29.06.1998") == "1998-06-29"


def test_number_six_digits():
    fn = transform.number(6)
    assert fn("2") == "2.000000"
    assert fn("2.11") == "2.110000"
    assert fn("2.5000001") == "2.500000"
    assert fn("-2.5000001") == "-2.500000"


def test_number_zero_digits():
    fn = transform.number(0)
    assert fn("2") == "2"
    assert fn("2.11") == "2"
    assert fn("-2.11") == "-2"


def test_phonetic_code_soundex():
    assert transform.phonetic_code("soundex")("foobar") == "F160"


def test_phonetic_code_cologne():
    assert transform.phonetic_code("cologne")("Müller-Ludenscheidt") == "65752682"


def test_mapping_no_default():
    fn = transform.mapping({"male": "m", "female": "f"})
    assert fn("male") == "m"
    assert fn("female") == "f"
    with pytest.raises(ValueError) as e:
        fn("foobar")
    assert str(e.value) == "value `foobar` has no mapping, or no default value is present"


def test_mapping_with_default():
    fn = transform.mapping({"male": "m", "female": "f"}, default_val="x")
    assert fn("foobar") == "x"


def test_mapping_inline():
    # b's introduced by the replacement must not be re-replaced
    assert transform.mapping({"o": "b", "b": "a"}, inline=True)("foobar") == "fbbaar"


def test_mapping_inline_collision():
    fn = transform.mapping({"ob": "x", "ba": "y"}, inline=True)
    with pytest.raises(ValueError) as e:
        fn("foobar")
    assert str(e.value) == (
        "cannot resolve inline mapping: replacement of `ba` with `y` at index 3 overlaps"
    )


def test_chain_order_and_empty_policy():
    chain = transform.build_chain(
        attribute_transformers={"name": [{"name": "character_filter", "characters": "o"}]},
        global_before=[{"name": "normalization"}],
        global_after=[{"name": "character_filter", "characters": "b"}],
    )
    assert transform.apply_chain(chain, "name", " FooBar ") == "far"
    assert transform.apply_chain(chain, "other", " FooBar ") == "fooar"
    assert transform.apply_chain(chain, "name", "", empty_value="skip") == ""
    with pytest.raises(ValueError):
        transform.apply_chain(chain, "name", "", empty_value="error")


def test_ascii_fold():
    assert ascii_fold("Fòo bár") == "Foo bar"
    assert ascii_fold("ß") == "ss"
    assert ascii_fold("Müller") == "Muller"
