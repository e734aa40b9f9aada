"""Gamma-level constants for agreement vectors.

Semantics mirror the reference's 2-bit match codes
(/root/reference/src/FastLink.jl:6-9):

- ``NONMATCH`` (0): the pair disagrees on the variable.
- ``MATCH1``   (1): partial agreement (similarity in [cut_b, cut_a)).
- ``MATCH2``   (2): exact / close agreement (similarity >= cut_a).
- ``MISSING``  (3): either side of the pair is null for the variable;
  treated as missing-at-random by the EM fit (skipped in the likelihood,
  /root/reference/src/emlink.jl:117-131).

Each gamma value fits in 2 bits, so a whole agreement vector of up to 32
variables packs into one uint64 ``pattern_key`` (see
:mod:`raylink.stages.patterns`).
"""

NONMATCH = 0
MATCH1 = 1
MATCH2 = 2
MISSING = 3

#: Bits used per variable when packing a gamma vector into a uint64 key.
BITS_PER_VAR = 2
#: Maximum number of comparison variables a packed pattern key supports.
MAX_VARS = 32
