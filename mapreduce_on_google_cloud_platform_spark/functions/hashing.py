"""Portable deterministic hashing for dedup / sketching.

Engine-native hash functions differ (Spark xxhash64 vs DuckDB hash), and
the reference's Python ``hash()`` is salted per process -- the source of
its nondeterministic partition assignment (SURVEY.md §4 defect 8).  Every
sketch here is built on **md5 of an explicit string**, which both Spark
and DuckDB expose with identical lowercase-hex output, so signatures,
bands and buckets replicate exactly in the oracle.

MinHash family: ``h_i(x) = md5('mh<i>:' || x)`` with the *lexicographic*
min over a set -- min of i.i.d.-ish hex strings is a valid minwise hash,
and string order is engine-independent.

SimHash bit extraction avoids integer<->hex conversion builtins (DuckDB
lacks ``conv``): a hex digit's value is its position in
'0123456789abcdef', and its bits are looked up in a 64-char 0/1 string.
"""

from __future__ import annotations

NUM_MINHASHES = 16
MINHASH_BANDS = 8  # 8 bands x 2 rows

SIMHASH_BITS = 32
SIMHASH_BANDS = 8  # 8 bands x 4 bits: hamming <= 7 keeps >=1 band intact

# 16 nibbles as 4-bit binary strings: bit k of digit d is
# substring(BITS16, d*4 + k + 1, 1)   (1-indexed, k = 0..3 MSB-first)
BITS16 = "".join(format(i, "04b") for i in range(16))

HEX_DIGITS = "0123456789abcdef"


def minhash_seed(i: int) -> str:
    return f"mh{i}:"
