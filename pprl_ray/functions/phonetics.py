"""Phonetic encoding algorithms, dependency-free.

Replicates the reference's phonetic surface
(``pprl_core/phonetics_extra.py`` and the pyphonetics algorithms registered in
``pprl_service/routers/transform.py:40-46``) from the public algorithm
definitions. The third-party ``pyphonetics`` / ``unidecode`` packages are not
available here, so:

- ``ascii_fold`` replaces ``unidecode`` using NFKD decomposition + a small
  Latin special-case table (covers every character exercised by the
  reference's ~120 golden test vectors in
  ``pprl_core/tests/test_phonetics_extra.py``).
- ``ColognePhonetics`` / ``GenericSoundex`` follow
  ``phonetics_extra.py:26-241`` exactly (including the ``'ß'.upper() == 'SS'``
  multi-char key quirk of ``GenericSoundex.__init__``).
- ``Soundex`` / ``RefinedSoundex`` / ``Metaphone`` / ``FuzzySoundex`` are
  written from the published algorithm specs (Russell/Odell soundex with the
  H/W rule, Apache commons-codec RefinedSoundex, Philips 1990 Metaphone,
  Holmes & McCabe 2002 Fuzzy Soundex).

All classes expose ``phonetics(word) -> str`` like pyphonetics'
``PhoneticAlgorithm``.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = [
    "ascii_fold",
    "ColognePhonetics",
    "GenericSoundex",
    "Soundex",
    "RefinedSoundex",
    "Metaphone",
    "FuzzySoundex",
    "PHONETIC_ALGORITHMS",
]

_SPECIAL_FOLD = {
    "ß": "ss",
    "ẞ": "SS",
    "Æ": "AE",
    "æ": "ae",
    "Œ": "OE",
    "œ": "oe",
    "Ø": "O",
    "ø": "o",
    "Þ": "Th",
    "þ": "th",
    "Ð": "D",
    "ð": "d",
    "Ł": "L",
    "ł": "l",
    "Đ": "D",
    "đ": "d",
}


def ascii_fold(text: str) -> str:
    """Closest-ASCII folding (stand-in for ``unidecode``): special-case table,
    then NFKD decomposition with combining marks stripped, then drop any
    remaining non-ASCII."""
    if text.isascii():
        return text
    text = "".join(_SPECIAL_FOLD.get(c, c) for c in text)
    text = unicodedata.normalize("NFKD", text)
    return "".join(c for c in text if c.isascii() and not unicodedata.combining(c))


def _check(word: str) -> None:
    if not isinstance(word, str):
        raise ValueError("expected a string")
    if not word:
        raise ValueError("empty string")


_PAD = "#"


def _char_context(word: str, idx: int) -> tuple[str, str, str]:
    """Previous / current / next character with ``#`` padding
    (``phonetics_extra.py:11-23``)."""
    return word[idx - 1 : idx] or _PAD, word[idx : idx + 1], word[idx + 1 : idx + 2] or _PAD


class ColognePhonetics:
    """Kölner Phonetik (``phonetics_extra.py:26-102``); validated against the
    Apache commons-codec derived vectors in the reference tests."""

    def phonetics(self, word: str) -> str:
        _check(word)
        word = ascii_fold(word).upper()
        word = re.sub(r"[^A-Z]", "", word)

        raw = []
        for i in range(len(word)):
            prev_c, c, next_c = _char_context(word, i)
            if c in "AEIJOUY":
                raw.append("0")
            elif c == "B":
                raw.append("1")
            elif c == "P":
                raw.append("3" if next_c == "H" else "1")
            elif c in "DT":
                raw.append("8" if next_c in "CSZ" else "2")
            elif c in "FVW":
                raw.append("3")
            elif c in "GKQ":
                raw.append("4")
            elif c == "C":
                if i == 0:
                    raw.append("4" if next_c in "AHKLOQRUX" else "8")
                elif prev_c in "SZ":
                    raw.append("8")
                else:
                    raw.append("4" if next_c in "AHKOQUX" else "8")
            elif c == "X":
                raw.append("8" if prev_c in "CKQ" else "48")
            elif c == "L":
                raw.append("5")
            elif c in "MN":
                raw.append("6")
            elif c == "R":
                raw.append("7")
            elif c in "SZ":
                raw.append("8")
        raw_code = "".join(raw)
        if not raw_code:
            return ""

        code = []
        last = ""
        for ch in raw_code:
            if ch != last:
                code.append(ch)
            last = ch
        dedup = "".join(code)
        return dedup[0] + dedup[1:].replace("0", "")


class GenericSoundex:
    """Table-driven soundex (``phonetics_extra.py:105-241``) with the four
    reference variants. Multi-character table keys (e.g. ``CH`` for German, or
    the ``SS`` produced by ``'ß'.upper()``) resolve longest-first."""

    DEFAULT_DIGIT_COUNT = 3

    def __init__(
        self,
        digit_to_chars: dict[int, list[str]],
        ignore_chars: list[str] | None = None,
        num_digits: int = DEFAULT_DIGIT_COUNT,
    ):
        self._map: dict[str, str] = {}
        self._max_len = 0
        self._ignore = ignore_chars or []
        for ch in self._ignore:
            self._map[ch] = "0"
        for digit, chars in digit_to_chars.items():
            for ch in chars:
                key = ch.upper()
                self._map[key] = str(digit)
                self._max_len = max(self._max_len, len(key))
        self._num_digits = num_digits

    @staticmethod
    def us_english(num_digits: int = DEFAULT_DIGIT_COUNT) -> "GenericSoundex":
        return GenericSoundex(_US_TABLE, ignore_chars=list("HW"), num_digits=num_digits)

    @staticmethod
    def us_english_simplified(num_digits: int = DEFAULT_DIGIT_COUNT) -> "GenericSoundex":
        return GenericSoundex(_US_TABLE, num_digits=num_digits)

    @staticmethod
    def us_english_genealogy(num_digits: int = DEFAULT_DIGIT_COUNT) -> "GenericSoundex":
        return GenericSoundex(_US_TABLE, ignore_chars=list("AEIOUYHW"), num_digits=num_digits)

    @staticmethod
    def german(num_digits: int = DEFAULT_DIGIT_COUNT) -> "GenericSoundex":
        return GenericSoundex(
            {
                0: list("AEIOUÄÖÜ"),
                1: list("BPFV"),
                2: list("CGKQXSZẞß"),
                3: list("DT"),
                4: list("L"),
                5: list("MN"),
                6: list("R"),
                7: ["CH"],
            },
            ignore_chars=list("WHYJ"),
            num_digits=num_digits,
        )

    def _resolve(self, word: str, idx: int) -> tuple[str | None, str]:
        if self._max_len <= 1:
            return self._map.get(word[idx]), word[idx]
        for n in range(self._max_len, 0, -1):
            chunk = word[idx : idx + n]
            digit = self._map.get(chunk)
            if digit is not None:
                return digit, chunk
        return None, word[idx]

    def phonetics(self, word: str) -> str:
        _check(word)
        word = ascii_fold(word).upper()

        start = 0
        while True:
            first_digit, first_char = self._resolve(word, start)
            if first_digit is not None:
                break
            start += len(first_char)

        digits = []
        i = start
        while i < len(word):
            digit, chunk = self._resolve(word, i)
            i += len(chunk)
            if digit is None or chunk in self._ignore:
                continue
            digits.append(digit)

        code = first_char
        last = first_digit
        for digit in digits:
            if digit != "0" and digit != last:
                code += digit
            last = digit

        code += "0" * self._num_digits
        return code[: self._num_digits + len(first_char)]


_US_TABLE = {
    0: list("AEIOUYHW"),
    1: list("BFPV"),
    2: list("CGJKQSXZ"),
    3: list("DT"),
    4: list("L"),
    5: list("MN"),
    6: list("R"),
}

_SOUNDEX_MAP = {
    **{c: "0" for c in "AEIOUY"},
    **{c: "1" for c in "BFPV"},
    **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"},
    "L": "4",
    "M": "5",
    "N": "5",
    "R": "6",
}


class Soundex:
    """American Soundex, 4 characters, H/W transparent for run-merging
    (golden vector from the reference: ``"foobar" -> "F160"``,
    ``pprl_core/tests/test_transform.py``)."""

    def phonetics(self, word: str) -> str:
        _check(word)
        word = ascii_fold(word).upper()
        word = re.sub(r"[^A-Z]", "", word)
        if not word:
            raise ValueError("no alphabetic characters")
        first = word[0]
        # H and W are dropped entirely, so runs merge across them
        codes = [_SOUNDEX_MAP[c] for c in word if c not in "HW"]
        out = []
        prev = _SOUNDEX_MAP.get(first, "0") if first not in "HW" else ""
        for code in codes[1:] if first not in "HW" else codes:
            if code != prev and code != "0":
                out.append(code)
            prev = code
        return (first + "".join(out) + "000")[:4]


_REFINED_MAP = {
    **{c: "0" for c in "AEIOUYWH"},
    "B": "1",
    "P": "1",
    "F": "2",
    "V": "2",
    "C": "3",
    "K": "3",
    "S": "3",
    "G": "4",
    "J": "4",
    "Q": "5",
    "X": "5",
    "Z": "5",
    "D": "6",
    "T": "6",
    "L": "7",
    "M": "8",
    "N": "8",
    "R": "9",
}


class RefinedSoundex:
    """Refined Soundex per the Apache commons-codec definition: first letter,
    then the digit of every letter (vowels keep '0'), consecutive duplicates
    collapsed, no length cap."""

    def phonetics(self, word: str) -> str:
        _check(word)
        word = ascii_fold(word).upper()
        word = re.sub(r"[^A-Z]", "", word)
        if not word:
            raise ValueError("no alphabetic characters")
        out = [word[0]]
        prev = None
        for c in word:
            code = _REFINED_MAP[c]
            if code != prev:
                out.append(code)
            prev = code
        return "".join(out)


_FUZZY_MAP = {
    **{c: "0" for c in "AEIOUYHW"},
    "B": "1",
    "P": "1",
    "F": "2",
    "V": "2",
    "C": "3",
    "K": "3",
    "S": "3",
    "G": "4",
    "J": "4",
    "Q": "5",
    "X": "5",
    "Z": "5",
    "D": "6",
    "T": "6",
    "L": "7",
    "M": "8",
    "N": "8",
    "R": "9",
}

# (pattern, replacement, position constraint) — Holmes & McCabe 2002 table
_FUZZY_SUBS_START = [
    ("CS", "SS"),
    ("CZ", "SS"),
    ("TS", "SS"),
    ("TZ", "SS"),
    ("GN", "NN"),
    ("HR", "RR"),
    ("WR", "RR"),
    ("HW", "WW"),
    ("KN", "NN"),
    ("NG", "NN"),
    ("MAC", "MK"),
    ("MC", "MK"),
]
_FUZZY_SUBS_ANY = [
    ("CA", "KA"),
    ("CC", "KK"),
    ("CK", "KK"),
    ("CE", "SE"),
    ("CHL", "KL"),
    ("CL", "KL"),
    ("CHR", "KR"),
    ("CR", "KR"),
    ("CI", "SI"),
    ("CO", "KO"),
    ("CU", "KU"),
    ("CY", "SY"),
    ("DG", "GG"),
    ("GH", "HH"),
    ("MAC", "MK"),
    ("MC", "MK"),
    ("NST", "NSS"),
    ("PF", "FF"),
    ("PH", "FF"),
    ("SCH", "SSS"),
    ("TIO", "SIO"),
    ("TIA", "SIO"),
    ("TCH", "CHH"),
]


class FuzzySoundex:
    """Fuzzy Soundex (Holmes & McCabe 2002): q-gram substitutions then a
    soundex-style 4-character code."""

    def phonetics(self, word: str) -> str:
        _check(word)
        word = ascii_fold(word).upper()
        word = re.sub(r"[^A-Z]", "", word)
        if not word:
            raise ValueError("no alphabetic characters")
        for pat, rep in _FUZZY_SUBS_START:
            if word.startswith(pat):
                word = rep + word[len(pat) :]
                break
        for pat, rep in _FUZZY_SUBS_ANY:
            word = word.replace(pat, rep)
        first = word[0]
        out = []
        prev = _FUZZY_MAP.get(first, "0")
        for c in word[1:]:
            code = _FUZZY_MAP[c]
            if code != prev and code != "0":
                out.append(code)
            prev = code
        return (first + "".join(out) + "000")[:4]


_VOWELS = "AEIOU"


class Metaphone:
    """Classic Metaphone (Lawrence Philips, Computer Language 1990), written
    from the published rule set. No length cap (like pyphonetics' default)."""

    def phonetics(self, word: str) -> str:
        _check(word)
        w = ascii_fold(word).upper()
        w = re.sub(r"[^A-Z]", "", w)
        if not w:
            raise ValueError("no alphabetic characters")

        # initial-letter exceptions
        if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
            w = w[1:]
        elif w[:1] == "X":
            w = "S" + w[1:]
        elif w[:2] == "WH":
            w = "W" + w[2:]

        out = []
        n = len(w)
        i = 0
        while i < n:
            c = w[i]
            # collapse doubled letters except C
            if i > 0 and c == w[i - 1] and c != "C":
                i += 1
                continue
            nxt = w[i + 1] if i + 1 < n else ""
            nxt2 = w[i + 2] if i + 2 < n else ""
            prev = w[i - 1] if i > 0 else ""

            if c in _VOWELS:
                if i == 0:
                    out.append(c)
            elif c == "B":
                if not (i == n - 1 and prev == "M"):
                    out.append("B")
            elif c == "C":
                if nxt == "I" and nxt2 == "A":
                    out.append("X")
                elif nxt == "H":
                    if prev == "S":
                        out.append("K")
                    else:
                        out.append("X")
                    i += 1
                elif nxt in "IEY":
                    if prev != "S":
                        out.append("S")
                else:
                    out.append("K")
            elif c == "D":
                if nxt == "G" and nxt2 in "EYI":
                    out.append("J")
                    i += 2
                else:
                    out.append("T")
            elif c == "G":
                if nxt == "H":
                    if i + 2 < n and w[i + 2] in _VOWELS:
                        out.append("K")
                        # GH followed by vowel -> K, consume H
                        i += 1
                    # else silent (e.g. "light", trailing GH)
                elif nxt == "N":
                    pass  # silent in GN / GNED
                elif nxt in "IEY":
                    out.append("J")
                else:
                    out.append("K")
            elif c == "H":
                if prev in _VOWELS and nxt not in _VOWELS:
                    pass  # silent
                elif prev in "CSPTG":
                    pass  # already handled by digraph rules
                else:
                    out.append("H")
            elif c == "K":
                if prev != "C":
                    out.append("K")
            elif c == "P":
                if nxt == "H":
                    out.append("F")
                    i += 1
                else:
                    out.append("P")
            elif c == "Q":
                out.append("K")
            elif c == "S":
                if nxt == "H":
                    out.append("X")
                    i += 1
                elif nxt == "I" and nxt2 in ("O", "A"):
                    out.append("X")
                else:
                    out.append("S")
            elif c == "T":
                if nxt == "H":
                    out.append("0")
                    i += 1
                elif nxt == "I" and nxt2 in ("O", "A"):
                    out.append("X")
                else:
                    out.append("T")
            elif c == "V":
                out.append("F")
            elif c == "W":
                if nxt in _VOWELS:
                    out.append("W")
            elif c == "X":
                out.append("KS")
            elif c == "Y":
                if nxt in _VOWELS:
                    out.append("Y")
            elif c == "Z":
                out.append("S")
            elif c in "FJLMNR":
                out.append(c)
            i += 1
        return "".join(out)


def PHONETIC_ALGORITHMS() -> dict[str, object]:
    """Registry mirroring ``routers/transform.py:40-46``."""
    return {
        "soundex": Soundex(),
        "metaphone": Metaphone(),
        "refined_soundex": RefinedSoundex(),
        "fuzzy_soundex": FuzzySoundex(),
        "cologne": ColognePhonetics(),
    }
