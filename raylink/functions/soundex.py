"""American Soundex phonetic encoder.

Capability parity with the reference's (dead-code) encoder
(/root/reference/src/encode/soundex.jl:29-66); useful here as an optional
blocking-key function for name-like fields.
"""

from __future__ import annotations

__all__ = ["soundex"]

_CODES = {}
for _letters, _digit in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
):
    for _c in _letters:
        _CODES[_c] = _digit


def soundex(s: str | None) -> str | None:
    """4-character Soundex code (e.g. 'ROBERT' -> 'R163'); None-safe.

    Follows the standard rules: keep the first letter; H/W are transparent
    between consonants with equal codes; vowels reset the run; pad with '0'.
    """
    if s is None:
        return None
    letters = [c for c in s.upper() if c.isalpha()]
    if not letters:
        return None
    first = letters[0]
    code = [first]
    prev = _CODES.get(first, "")
    for c in letters[1:]:
        d = _CODES.get(c)
        if d is None:
            if c not in "HW":  # vowels (and Y) break a run of equal codes
                prev = ""
            continue
        if d != prev:
            code.append(d)
            prev = d
        if len(code) == 4:
            break
    return "".join(code).ljust(4, "0")
