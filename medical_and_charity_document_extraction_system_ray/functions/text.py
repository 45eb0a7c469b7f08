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


_P = np.uint64(1099511628211)  # FNV-64 prime, the Horner base


def utf8_codepoints(text: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized UTF-8 -> Unicode codepoint decode for a string column.

    Returns ``(flat_codepoints uint64, row_of int64)`` where ``row_of[i]``
    is the row index of codepoint ``i`` (rows in order, codepoints in
    string order within a row).  Null rows contribute no codepoints.
    Pure numpy over the Arrow buffers — no per-row python loop.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    arr = text.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    bufs = arr.buffers()
    # a sliced array keeps its parent buffers and a nonzero offset: index
    # the offsets buffer from arr.offset and rebase data positions to 0
    offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    start = int(offs[0])
    total = int(offs[-1])
    if total == start or bufs[2] is None:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[start:total]
    offs = offs - start
    total -= start
    byte_lengths = np.diff(offs)
    row_of_byte = np.repeat(np.arange(n, dtype=np.int64), byte_lengths)
    # lead bytes: everything except 0b10xxxxxx continuations
    lead_pos = np.nonzero((data & 0xC0) != 0x80)[0]
    b0 = data[lead_pos]
    cp = b0.astype(np.uint32)
    # multi-byte decode only where needed (ASCII-dominant corpora pay
    # one mask + copy instead of evaluating every branch full-width)
    multi = np.nonzero(b0 >= 0x80)[0]
    if multi.size:
        mpos = lead_pos[multi]
        mb0 = cp[multi]

        def nb(k: int) -> np.ndarray:
            return data[np.minimum(mpos + k, total - 1)].astype(np.uint32) & 0x3F

        cp[multi] = np.where(
            mb0 < 0xE0,
            ((mb0 & 0x1F) << 6) | nb(1),
            np.where(
                mb0 < 0xF0,
                ((mb0 & 0x0F) << 12) | (nb(1) << 6) | nb(2),
                ((mb0 & 0x07) << 18) | (nb(1) << 12) | (nb(2) << 6) | nb(3),
            ),
        )
    return cp.astype(np.uint64), row_of_byte[lead_pos]


def horner_mod64(
    values: np.ndarray, row_of: np.ndarray, n_rows: int, p: np.uint64 = _P
) -> np.ndarray:
    """Per-row Horner fold ``h = h*p + v`` over uint64 values (mod 2^64),
    vectorized: h(row) = sum(v_j * p^(L-1-j)).  ``row_of`` must be
    non-decreasing.  Rows with no values hash to 0.

    SQL-expressible (DuckDB)::

        list_reduce(list_prepend(CAST(0 AS HUGEINT), vals),
                    (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
    """
    lengths = np.bincount(row_of, minlength=n_rows).astype(np.int64)
    total = values.size
    if total == 0:
        return np.zeros(n_rows, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(lengths)])
    j_in_row = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], lengths)
    expo = np.repeat(lengths, lengths) - 1 - j_in_row
    # p^expo mod 2^64 via a precomputed power table + one gather (the
    # table is max-row-length entries — tiny next to the value stream)
    max_e = int(lengths.max())
    with np.errstate(over="ignore"):
        ptable = np.empty(max_e + 1, dtype=np.uint64)
        ptable[0] = np.uint64(1)
        filled = 1
        while filled <= max_e:  # vectorized doubling: O(log max_e) passes
            m = min(filled, max_e + 1 - filled)
            ptable[filled : filled + m] = ptable[:m] * (ptable[filled - 1] * p)
            filled += m
        pos_pow = ptable[expo]
        contrib = values.astype(np.uint64) * pos_pow
        # segment sums via wrap-safe cumsum (uint64 overflow wraps mod 2^64,
        # so cs[end] - cs[start] is the exact segment sum mod 2^64)
        cs = np.concatenate([[np.uint64(0)], np.cumsum(contrib, dtype=np.uint64)])
        out = cs[starts[1:]] - cs[starts[:-1]]
    return out


def fingerprint64(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit content fingerprint: Horner fold of the Unicode codepoints
    (mod 2^64).  Bit-identical to the DuckDB expression::

        list_reduce(list_prepend(CAST(0 AS HUGEINT),
            list_transform(range(1, length(text)+1), i -> unicode(text[i]))),
            (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)

    (DuckDB string indexing is codepoint-based, verified incl. astral
    plane.)  Empty / null text -> 0.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cps, rows = utf8_codepoints(text)
    out = horner_mod64(cps, rows, len(text))
    null_mask = np.asarray(pc.is_null(text).combine_chunks() if isinstance(
        pc.is_null(text), pa.ChunkedArray) else pc.is_null(text))
    out[null_mask] = 0
    return out


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
    # slice the offsets buffer from arr.offset (a sliced/zero-copy-cast
    # array keeps a view offset — same hazard utf8_codepoints fixes),
    # then rebase data positions to 0
    offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    data = data[offs[0] : offs[-1]]
    offs = offs - offs[0]
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
