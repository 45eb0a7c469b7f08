"""Vectorized scalar text functions shared by the analysis pipelines.

Each function is designed so its result is *expressible in ANSI SQL*
(DuckDB) with bit-identical semantics, so the driver's side-by-side
oracle comparison can hash-match:

- token counting  == ``len(regexp_split_to_array(trim(text), '\\s+'))``
  with empty/whitespace-only text counting 0 — same as python
  ``len(text.split())``;
- ratios are floored to a 1e-6 grid (``floor(x * 1e6) / 1e6``) rather
  than rounded, because python ``round`` is half-even while SQL
  ``ROUND`` is half-away — floor is unambiguous for non-negatives.

Everything operates on pyarrow arrays / numpy, no python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def floor6(x: np.ndarray | float):
    """floor(x * 1e6) / 1e6 — the float-stability grid used for every
    computed ratio (matches SQL FLOOR(x*1000000)/1000000)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6) / 1e6


def token_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count, bit-identical to the DuckDB expression

        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END

    Both sides run RE2 ``\\s`` (ASCII whitespace — does NOT match
    unicode spaces like NBSP, unlike python ``str.split``) and DuckDB
    ``trim`` strips only ASCII spaces, so the trim here does too.
    Property-tested against live DuckDB in tests/test_property.py.
    """
    trimmed = pc.utf8_trim(text, " ")
    counts = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    return pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), 0, counts)


def char_counts_nospace(text) -> pa.Array:
    """len(re.sub(r"\\s", "", text)) — SQL: length(regexp_replace(text,'\\s','','g'))."""
    return pc.utf8_length(pc.replace_substring_regex(text, r"\s", ""))


def digit_count(text) -> pa.Array:
    """SQL: length(regexp_replace(text, '[^0-9]', '', 'g'))."""
    return pc.utf8_length(pc.replace_substring_regex(text, r"[^0-9]", ""))


def stable_hash64(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized polynomial rolling hash over UTF-8 bytes (mod 2^64).

    Used for exact-dedup grouping keys and document fingerprints (NOT
    SQL-matched — SQL oracles for dedup group on the raw text).
    O(total_bytes) with numpy segment ops — no per-row python loop.
    h(s) = sum(b_j * P^(L-1-j)) + L * SALT  (uint64 wraparound).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    arr = text.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    null_mask = np.asarray(arr.is_null())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[: n + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    data = data[: offs[-1]]
    lengths = np.diff(offs)

    P = np.uint64(1099511628211)
    total = int(offs[-1])
    if total == 0:
        pos_pow = np.empty(0, dtype=np.uint64)
        contrib_sum = np.zeros(n, dtype=np.uint64)
    else:
        # exponent of P for each byte: L-1-j within its row
        row_of = np.repeat(np.arange(n), lengths)
        j_global = np.arange(total, dtype=np.int64)
        j_in_row = j_global - np.repeat(offs[:-1], lengths)
        expo = np.repeat(lengths, lengths) - 1 - j_in_row
        # P^expo mod 2^64 via binary exponentiation on the exponent bits
        pos_pow = np.ones(total, dtype=np.uint64)
        base = P
        e = expo.astype(np.uint64)
        max_e = int(lengths.max()) if n else 0
        bit = 0
        while (1 << bit) <= max_e:
            mask = (e >> np.uint64(bit)) & np.uint64(1)
            with np.errstate(over="ignore"):
                pos_pow = np.where(mask == 1, pos_pow * base, pos_pow)
                base = base * base
            bit += 1
        with np.errstate(over="ignore"):
            contrib = data.astype(np.uint64) * pos_pow
        contrib_sum = np.zeros(n, dtype=np.uint64)
        np.add.at(contrib_sum, row_of, contrib)
    with np.errstate(over="ignore"):
        out = contrib_sum + lengths.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    out[null_mask] = 0
    return out
