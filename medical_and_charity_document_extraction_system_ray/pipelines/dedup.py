"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes (ray guide "Aggregation at scale"):

- exact: per-batch combine (text -> min doc_id, count) BEFORE the
  groupby, so the shuffle moves one row per distinct text per batch;
- MinHash: the LSH shuffle carries ``(band_hash, doc_id)`` ONLY — no
  text; candidate pairs are re-joined to their texts with two hash
  joins before the exact-Jaccard verify (at 100 TB the band shuffle is
  ~24 B/row instead of bands x full corpus text);
- SimHash: 64-bit sketch per doc, 4 x 16-bit band tables catch every
  pair at hamming<=3 exactly (pigeonhole);
- embedding near-dup: exact block-pair sweep over the dataset's own
  object-store blocks (driver holds block *refs*, never the matrix),
  plus a hyperplane-LSH bucketed variant for high thresholds.

Token/shingle hashes are codepoint-Horner (functions/text.horner_mod64)
so the SimHash sketch and the word-shingle Jaccard are reproducible in
ANSI SQL — every operator here except the probabilistic-recall internals
has a DuckDB value oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.text import horner_mod64, utf8_codepoints
from ..functions.vectors import list_column_matrix
from ..sources.readers import read_table
from ..functions.cluster import derive_buckets, join_partitions

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_HORNER_P = np.uint64(1099511628211)
# coarse shuffle-key fan-out is derived per query on the DRIVER from
# live cluster CPUs (functions/cluster.derive_buckets): enough groups
# for full reduce-side parallelism at any cluster width, few enough
# that per-group python overhead stays negligible

def _with_schema(schema: pa.Schema):
    """map_batches fn pinning an explicit schema: Ray's sort-based
    groupby.aggregate emits ZERO-COLUMN blocks for empty partitions,
    which break downstream hash joins (FieldRef not found).  Empty
    batches are rebuilt to the full schema; non-empty ones are cast."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return pa.table({f.name: pc.cast(t[f.name], f.type) for f in schema})

    return fn


_PAIR_SCHEMA = pa.schema(
    [
        pa.field("doc_a", pa.int64()),
        pa.field("doc_b", pa.int64()),
        pa.field("jaccard", pa.float64()),
    ]
)

_PAIR2_SCHEMA = pa.schema(
    [pa.field("doc_a", pa.int64()), pa.field("doc_b", pa.int64())]
)


def _graph_partitions() -> int:
    """Partition width for the iterative PAIR-GRAPH algorithms (label
    propagation, PageRank): the graph is tiny relative to the corpus
    (only near-dup members appear) but at 100 TB it is still millions
    of rows — a fixed width of 2 would serialize every per-round join
    and groupby through two reducers.  ~1 partition per 4 cluster CPUs
    keeps per-round task overhead negligible on a single node (8 on
    this 32-CPU box) while the reduce width grows with the cluster.
    Resolved on the driver once per query (same rule as
    ``derive_buckets``)."""
    from ..functions.cluster import cluster_cpus

    return max(2, cluster_cpus() // 4)


def _pair_dedup_buckets(
    cand: ray.data.Dataset, nb: int, out_partitions: int
) -> ray.data.Dataset:
    """Global (doc_a, doc_b) dedup via ONE bounded-key coarse-bucket
    shuffle: pairs are keyed ``hash(a,b) % nb`` so every copy of a pair
    lands in the same bucket group, then each group dedups with one
    vectorized ``np.unique`` — one python call per BUCKET, never per
    pair (the project's unbounded-key rule).  Replaces a
    ``groupby(["doc_a","doc_b"])`` whose composite unbounded key cost
    ~30 s at a 450 k-pair sf0.1 candidate list."""

    def add_pb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "pb": pa.array([], pa.int32()),
                }
            )
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            pb = ((a * _P1 + b) * _P2 % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "pb": pa.array(pb)}
        )

    def bucket_dedup(g: pa.Table) -> pa.Table:
        ab = np.unique(
            np.stack(
                [
                    g["doc_a"].to_numpy(zero_copy_only=False),
                    g["doc_b"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "doc_a": pa.array(ab[:, 0], pa.int64()),
                "doc_b": pa.array(ab[:, 1], pa.int64()),
            }
        )

    return (
        cand.map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(bucket_dedup, batch_format="pyarrow")
        # absorb the groupby's zero-column empty-partition blocks before
        # any downstream hash join (FieldRef recipe)
        .repartition(out_partitions)
        .map_batches(_with_schema(_PAIR2_SCHEMA), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Exact dedup (SQL-matched)
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keeper per distinct text = min(doc_id); emits (doc_id, n_dups)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("text").aggregate([("doc_id", "min"), ("doc_id", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("text").aggregate(
        Min("doc_id_min", alias_name="doc_id"),
        Sum("doc_id_count", alias_name="n_dups"),
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "n_dups"]),
        batch_format="pyarrow",
    )


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text
"""


def q_dup_cluster_sizes(sf_dir: str) -> ray.data.Dataset:
    """Histogram of exact-duplicate cluster sizes — the corpus-health
    summary every dedup run reports (how much of the corpus is unique,
    how heavy the heaviest clusters are).

    Scale shape: per-batch (text -> count) partials so the one
    text-keyed shuffle moves distinct texts per batch, then the
    cluster-size histogram itself re-aggregates with per-batch
    partials over a tiny bounded key (distinct sizes) — output is a
    handful of rows regardless of corpus size."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("text").aggregate([([], "count_all")])
        return g.rename_columns(["text", "n"])

    clusters = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text")
        .aggregate(Sum("n", alias_name="cluster_size"))
    )

    def size_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_size" not in t.column_names:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.select(["cluster_size"]).group_by("cluster_size").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["cluster_size", "n"])

    return (
        clusters.map_batches(size_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n", alias_name="n_clusters"))
    )


Q_DUP_CLUSTER_SIZES_SQL = """
WITH g AS (SELECT COUNT(*) AS cluster_size FROM documents GROUP BY text)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM g GROUP BY cluster_size
"""


def q_dedup_normalized(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup after text normalization — lowercase, strip
    non-alphanumerics, collapse whitespace — the standard first rung
    above byte-exact dedup (catches casing/punctuation near-copies
    that byte-exact misses; CC-style pipelines run both).

    Same scale shape as ``q_dedup_exact``: the normalization is a
    per-batch vectorized RE2 pass, partials group per batch, and the
    one shuffle moves distinct normalized keys.  Both engines run RE2
    ``[^a-z0-9 ]`` / ``' +'`` so the key is byte-identical."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(pc.utf8_lower(t["text"]), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
        norm = pc.replace_substring_regex(norm, "^ +| +$", "")
        m = pa.table({"norm": norm, "doc_id": t["doc_id"]})
        return m.group_by("norm").aggregate([("doc_id", "min"), ("doc_id", "count")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("norm")
        .aggregate(
            Min("doc_id_min", alias_name="doc_id"),
            Sum("doc_id_count", alias_name="n_dups"),
        )
        .map_batches(lambda t: t.select(["doc_id", "n_dups"]), batch_format="pyarrow")
    )


Q_DEDUP_NORMALIZED_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY regexp_replace(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'),
             '^ +| +$', '', 'g')
"""


# ---------------------------------------------------------------------------
# Shingling + MinHash signatures (vectorized)
# ---------------------------------------------------------------------------

# ASCII-\s trim on BOTH sides (pipeline and SQL) — DuckDB trim() is
# space-only and utf8_trim_whitespace is unicode, either would drift
_TRIM_RE = r"^\s+|\s+$"


def _token_hashes_per_row(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes, row id per token) for a string column.

    Tokens = RE2 ``\\s+`` split of the ASCII-whitespace-trimmed text;
    token hash = Horner fold of the token's codepoints mod 2^64 —
    bit-identical to the DuckDB list_reduce expression used by the
    SimHash oracle (Q_SIMHASH_SQL)."""
    trimmed = pc.replace_substring_regex(text_col, _TRIM_RE, "")
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    rows = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    cps, cp_rows = utf8_codepoints(flat)
    return horner_mod64(cps, cp_rows, len(flat)), rows


def _shingle_hashes(text_col, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram shingle hashes (flat) + row ids, vectorized: combine
    k consecutive token hashes within a row."""
    th, rows = _token_hashes_per_row(text_col)
    n = th.size
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        sh = th.copy()
        valid = np.ones(n, dtype=bool)
        for j in range(1, k):
            shifted = np.empty(n, dtype=np.uint64)
            shifted[: n - j] = th[j:]
            shifted[n - j :] = 0
            same_row = np.zeros(n, dtype=bool)
            same_row[: n - j] = rows[j:] == rows[: n - j]
            sh = sh * _P1 + shifted * _P2
            valid &= same_row
    return sh[valid], rows[valid]


def minhash_signatures(
    text_col, num_hashes: int = 64, shingle_k: int = 3, seed: int = 1234
) -> tuple[np.ndarray, np.ndarray]:
    """(row_ids, signatures[num_rows, num_hashes]) for rows with >=1
    shingle."""
    sh, rows = _shingle_hashes(text_col, k=shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    uniq_rows = np.unique(rows)
    sig = np.full((uniq_rows.size, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    row_pos = np.searchsorted(uniq_rows, rows)
    with np.errstate(over="ignore"):
        for j in range(num_hashes):
            hv = sh * a[j] + b[j]
            np.minimum.at(sig[:, j], row_pos, hv)
    return uniq_rows, sig


_PAIR_SLAB = 4_000_000  # max candidate pairs materialized per allocation
_RUN_SKEW_WARN = 20_000  # ids sharing one LSH key before we log skew


def _iter_pair_slabs(m: int, cap: int = _PAIR_SLAB):
    """Yield local-index slabs ``(i_idx, j_idx)`` covering all C(m,2)
    unordered pairs with at most ``cap`` pairs per numpy allocation.

    Small runs get the one-shot ``triu_indices``; degenerate runs (a hot
    LSH bucket of near-identical docs — 10^4 ids is 10^8 pairs) walk row
    blocks so peak memory stays O(cap) instead of O(m^2)."""
    if m < 2:
        return
    if m * (m - 1) // 2 <= cap:
        iu = np.triu_indices(m, 1)
        yield iu[0], iu[1]
        return
    rows_per = max(1, cap // m)
    for r0 in range(0, m - 1, rows_per):
        r1 = min(r0 + rows_per, m - 1)
        counts = m - 1 - np.arange(r0, r1)  # pairs per row i: j in (i, m)
        i_idx = np.repeat(np.arange(r0, r1), counts)
        row_starts = np.cumsum(counts) - counts
        j_idx = np.arange(counts.sum()) - np.repeat(row_starts, counts) + i_idx + 1
        yield i_idx, j_idx


def _run_pairs(
    keys: np.ndarray, ids: np.ndarray, pair_cap: int = _PAIR_SLAB
) -> tuple[np.ndarray, np.ndarray]:
    """All (id_i, id_j) pairs within runs of equal ``keys`` — vectorized
    run detection, slab-bounded pair emission per run.  Returns
    sorted-id pairs a<b."""
    import logging

    order = np.lexsort((ids, keys))
    k, v = keys[order], ids[order]
    starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
    ends = np.concatenate([starts[1:], [k.size]])
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > _RUN_SKEW_WARN:
            logging.getLogger(__name__).warning(
                "skewed LSH key run: %d ids share one key -> %d candidate "
                "pairs (emitting in %d-pair slabs)", m, m * (m - 1) // 2, pair_cap
            )
        sub = v[s:e]
        for ii, jj in _iter_pair_slabs(m, pair_cap):
            out_a.append(sub[ii])
            out_b.append(sub[jj])
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate(out_a).astype(np.int64)
    b = np.concatenate(out_b).astype(np.int64)
    keep = a != b  # same doc colliding across two bands
    return a[keep], b[keep]


def _sorted_unique_rowsets(
    values: np.ndarray, rows: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sorted-unique value arrays, packed: (flat values, offsets
    of length n_rows+1).  One vectorized sort + adjacent-dedup."""
    order = np.lexsort((values, rows))
    r, v = rows[order], values[order]
    if v.size:
        keep = np.concatenate([[True], (r[1:] != r[:-1]) | (v[1:] != v[:-1])])
        r, v = r[keep], v[keep]
    counts = np.bincount(r, minlength=n_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return v, offsets


def _intersect_size(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for sorted unique uint64 arrays."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return 0
    idx = np.searchsorted(b, a)
    idx = np.minimum(idx, b.size - 1)
    return int((b[idx] == a).sum())


def _expand_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(starts[i], starts[i]+counts[i])`` without a
    python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    prefix = np.cumsum(counts) - counts
    return np.repeat(starts - prefix, counts) + np.arange(total)


def _pair_jaccard(texts_u, pa_idx: np.ndarray, pb_idx: np.ndarray) -> np.ndarray:
    """Exact shingle-Jaccard for candidate pairs, fully vectorized.

    ``texts_u`` holds each DISTINCT doc's text once (a doc in k pairs is
    shingled once, not k times); ``pa_idx``/``pb_idx`` index pairs into
    it.  Intersections are counted with ONE lexsort over the gathered
    (pair, gram) streams — within a side the per-pair gram sets are
    sorted-unique, so any adjacent duplicate is a cross-side hit."""
    n = pa_idx.size
    sh, rows = _shingle_hashes(texts_u)
    vals, offs = _sorted_unique_rowsets(sh, rows, len(texts_u))
    sizes = np.diff(offs)
    ca, cb = sizes[pa_idx], sizes[pb_idx]
    pair_of = np.concatenate(
        [np.repeat(np.arange(n), ca), np.repeat(np.arange(n), cb)]
    )
    gathered = np.concatenate(
        [
            vals[_expand_ranges(offs[pa_idx], ca)],
            vals[_expand_ranges(offs[pb_idx], cb)],
        ]
    )
    order = np.lexsort((gathered, pair_of))
    p, v = pair_of[order], gathered[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    union = ca + cb - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = np.where(union > 0, inter / union, 1.0)
    return np.floor(jac * 1e6) / 1e6


def q_minhash_lsh_pairs(
    sf_dir: str,
    num_hashes: int = 64,
    bands: int = 32,
    jaccard_threshold: float = 0.5,
    join_partitions: int = 8,
    broadcast_pairs_bytes: int = 8 << 20,
) -> ray.data.Dataset:
    """Near-dup pairs via MinHash banding, shuffle-light:

    signatures -> (band_hash, doc_id) rows [NO text] -> bucket groupby
    -> candidate pairs -> texts re-attached -> exact shingle-Jaccard
    verify (one vectorized shingle pass per batch, no per-pair
    recompute).

    Text re-attachment is adaptive: when the candidate pair list is
    under ``broadcast_pairs_bytes`` (measured off the materialized
    candidate set's actual byte size — BYTES, not pair count, because
    the driver-pull + ``ray.put`` cost this guards is a byte budget,
    and 200k pairs of wide ids cost 4x 200k pairs of narrow ones), the
    pair list is pulled to the driver, the needed texts are fetched
    with one shuffle-free filtered scan and broadcast via ``ray.put``
    — 1 shuffle total.  Above the threshold (dup-heavy corpora at
    scale; benched on the 30%-duplicate fixture, BASELINE.md) it falls
    back to groupby-distinct + two hash joins — still never shipping
    bands x text through the LSH shuffle.

    With bands=32 (2 hashes/band) a pair at the 0.5 threshold is missed
    with p=(1-0.25)^32 ~ 1e-4 and the corpus' true pairs (all at
    jaccard>=0.7, see BASELINE.md) with p<=5e-10 — recall is
    deterministically 1 on the test corpora, so the DuckDB oracle is
    the full exact word-3-gram-Jaccard self-join (Q_MINHASH_SQL)."""
    rows_per_band = num_hashes // bands
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()

    def to_band_rows(t: pa.Table) -> pa.Table:
        row_ids, sig = minhash_signatures(t["text"], num_hashes=num_hashes)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[row_ids]
        with np.errstate(over="ignore"):
            bh = np.zeros((row_ids.size, bands), dtype=np.uint64)
            for bidx in range(bands):
                seg = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
                # seed with the band index: cross-band hash collisions
                # can't merge buckets, so band_hash alone is the LSH key
                h = np.full(row_ids.size, np.uint64(bidx + 1), dtype=np.uint64)
                for c in range(seg.shape[1]):
                    h = h * _P1 + seg[:, c]
                bh[:, bidx] = h
        bh_flat = bh.T.reshape(-1)
        return pa.table(
            {
                "band_hash": pa.array(bh_flat.astype(np.int64)),
                # coarse shuffle key: one groupby call handles MANY LSH
                # buckets (a map_groups call per band-hash bucket would
                # pay python overhead per bucket — thousands of calls)
                "bucket": pa.array((bh_flat % np.uint64(nb)).astype(np.int32)),
                "doc_id": pa.array(np.tile(doc_ids, bands).astype(np.int64)),
            }
        )

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow", zero_copy_batch=True)
    # coalesce so the bucket shuffle has ~8 buckets per partition: every
    # partition is non-empty, so the groupby emits no schema-less blocks
    band_rows = band_rows.repartition(max(2, nb // 8))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        a, b = _run_pairs(
            g["band_hash"].to_numpy(zero_copy_only=False),
            g["doc_id"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    cand = band_rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")

    def verify_pairs(doc_a, doc_b, texts_a, texts_b) -> pa.Table:
        """Exact shingle-Jaccard over aligned pair arrays: texts are
        deduped to one shingle pass per DISTINCT doc, then one
        vectorized merge counts every intersection (_pair_jaccard — no
        per-pair python loop)."""
        n = len(doc_a)
        if n == 0:
            return _PAIR_SCHEMA.empty_table()
        a_ids = doc_a.to_numpy(zero_copy_only=False)
        b_ids = doc_b.to_numpy(zero_copy_only=False)
        all_ids = np.concatenate([a_ids, b_ids])
        uids, first = np.unique(all_ids, return_index=True)
        combined = pa.chunked_array([texts_a, texts_b]).combine_chunks()
        texts_u = combined.take(pa.array(first))
        jac = _pair_jaccard(
            texts_u, np.searchsorted(uids, a_ids), np.searchsorted(uids, b_ids)
        )
        keep = jac >= jaccard_threshold
        return pa.table(
            {
                "doc_a": pc.cast(doc_a.filter(pa.array(keep)), pa.int64()),
                "doc_b": pc.cast(doc_b.filter(pa.array(keep)), pa.int64()),
                "jaccard": pa.array(jac[keep]),
            },
            schema=_PAIR_SCHEMA,
        )

    # candidate set is the SMALL side: materialize it (object store, not
    # driver) to count it and pick the text re-attachment strategy
    import ray

    cand_m = cand.materialize()
    if cand_m.size_bytes() <= broadcast_pairs_bytes:
        # -- broadcast path: 1 shuffle total ------------------------------
        blocks = [
            ray.get(r)
            for bundle in cand_m.iter_internal_ref_bundles()
            for r in bundle.block_refs
        ]
        blocks = [b for b in blocks if b.num_rows and "doc_a" in b.column_names]
        if not blocks:
            return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
        raw = pa.concat_tables(blocks)
        ab = np.stack(
            [
                raw["doc_a"].to_numpy(zero_copy_only=False),
                raw["doc_b"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        pairs = np.unique(ab, axis=0)  # global pair dedup, driver-side
        need_ids = np.unique(pairs)  # sorted union of both columns
        ids_ref = ray.put(need_ids)

        def fetch(t: pa.Table) -> pa.Table:
            mask = np.isin(
                t["doc_id"].to_numpy(zero_copy_only=False), ray.get(ids_ref)
            )
            return t.filter(pa.array(mask))

        # shuffle-free filtered scan; collected texts bounded by 2x pairs
        # (drop the zero-column EMPTY marker blocks Ray can emit — they
        # break concat_tables' schema check)
        fetched_blocks = [
            ray.get(r)
            for bundle in ds.map_batches(
                fetch, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
            .iter_internal_ref_bundles()
            for r in bundle.block_refs
        ]
        fetched = pa.concat_tables(
            [b for b in fetched_blocks if b.num_rows and "doc_id" in b.column_names]
        )
        order = np.argsort(fetched["doc_id"].to_numpy(zero_copy_only=False))
        lookup_ids = fetched["doc_id"].to_numpy(zero_copy_only=False)[order]
        lookup_texts = fetched["text"].combine_chunks().take(pa.array(order))
        lookup_ref = ray.put((lookup_ids, lookup_texts))

        pair_tbl = pa.table(
            {
                "doc_a": pa.array(pairs[:, 0], type=pa.int64()),
                "doc_b": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )
        if len(pairs) <= 20_000:
            # small candidate set: verify inline on the driver — fully
            # vectorized (_pair_jaccard shingles each distinct doc once
            # and counts all intersections in one merge), so a third
            # dataset execution would cost more in scheduling fixed
            # costs than the shingle math it distributes
            ia = np.searchsorted(lookup_ids, pairs[:, 0])
            ib = np.searchsorted(lookup_ids, pairs[:, 1])
            jac = _pair_jaccard(lookup_texts, ia, ib)
            keep = jac >= jaccard_threshold
            return ray.data.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array(pairs[:, 0][keep], type=pa.int64()),
                        "doc_b": pa.array(pairs[:, 1][keep], type=pa.int64()),
                        "jaccard": pa.array(jac[keep]),
                    },
                    schema=_PAIR_SCHEMA,
                )
            )

        pair_ds = ray.data.from_arrow(pair_tbl)

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _PAIR_SCHEMA.empty_table()
            lids, ltexts = ray.get(lookup_ref)
            ia = np.searchsorted(lids, t["doc_a"].to_numpy(zero_copy_only=False))
            ib = np.searchsorted(lids, t["doc_b"].to_numpy(zero_copy_only=False))
            return verify_pairs(
                t["doc_a"].combine_chunks(),
                t["doc_b"].combine_chunks(),
                ltexts.take(pa.array(ia)),
                ltexts.take(pa.array(ib)),
            )

        return pair_ds.map_batches(verify_broadcast, batch_format="pyarrow")

    # -- join path (dup-heavy corpora at scale) ---------------------------
    # global pair dedup (a pair can surface in several bands/buckets):
    # one bounded-key coarse-bucket shuffle, not an unbounded composite
    # groupby
    uniq = _pair_dedup_buckets(cand_m, nb, join_partitions)
    # re-attach texts: two hash joins against the documents table — the
    # shuffle moves candidate pairs (small) + the doc table once, never
    # bands x text
    docs_a = ds.map_batches(
        lambda t: t.rename_columns(["doc_a", "text_a"]), batch_format="pyarrow"
    )
    docs_b = ds.map_batches(
        lambda t: t.rename_columns(["doc_b", "text_b"]), batch_format="pyarrow"
    )
    # repartition + schema pin between the chained joins: join #1 can
    # emit schema-less empty partition blocks that join #2's hash
    # shuffle rejects (FieldRef doc_b) — same absorption recipe as the
    # groupby->join seam
    half = uniq.join(
        docs_a, join_type="inner", num_partitions=join_partitions, on=("doc_a",)
    ).repartition(join_partitions).map_batches(
        _with_schema(
            pa.schema(
                [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("text_a", pa.string())]
            )
        ),
        batch_format="pyarrow",
    )
    withtext = half.join(
        docs_b, join_type="inner", num_partitions=join_partitions, on=("doc_b",)
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIR_SCHEMA.empty_table()
        return verify_pairs(
            t["doc_a"].combine_chunks(),
            t["doc_b"].combine_chunks(),
            t["text_a"].combine_chunks(),
            t["text_b"].combine_chunks(),
        )

    verified = withtext.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        # all-empty results report an arbitrary block's schema (an empty
        # join partition's) — pin the pair schema instead
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return verified


Q_MINHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                               '\s+') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws)-1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
  FROM toks WHERE len(ws) >= 3
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         FLOOR(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams)))
               * 1000000) / 1000000 AS jaccard
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
   AND len(a.grams) * 2 >= len(b.grams)  -- jac>=0.5 => |A|>=|B|/2
   AND len(b.grams) * 2 >= len(a.grams)
)
WHERE jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
# SimHash near-dup (SQL-matched: banding is EXACT for hamming<=3)
# ---------------------------------------------------------------------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(x.size, 8), axis=1
    ).sum(axis=1, dtype=np.int64)


def simhash64(text_col) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized."""
    th, rows = _token_hashes_per_row(text_col)
    n_rows = len(text_col)
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    if th.size:
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        np.add.at(acc, rows, 2 * bits - 1)
    out = np.zeros(n_rows, dtype=np.uint64)
    pos = (acc > 0).astype(np.uint64)
    for j in range(64):
        out |= pos[:, j] << np.uint64(j)
    return out


def q_simhash_pairs(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with SimHash hamming distance <= max_hamming via
    4 x 16-bit band tables.  A pair within distance 3 MUST agree on at
    least one of the 4 bands (pigeonhole), so the LSH output equals the
    all-pairs answer exactly — and because the token hash is the
    SQL-expressible codepoint Horner fold, the DuckDB oracle recomputes
    the sketch and the full pair set (Q_SIMHASH_SQL)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()

    def to_bands(t: pa.Table) -> pa.Table:
        sh = simhash64(t["text"])
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        band_key = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            # mix the band index into the key so one groupby key spans
            # all 4 tables without cross-band merges
            band_key[b * n : (b + 1) * n] = (
                ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                + (b << 16)
            )
        return pa.table(
            {
                "band_key": pa.array(band_key),
                "bucket": pa.array((band_key % nb).astype(np.int32)),
                "doc_id": pa.array(np.tile(doc, 4)),
                "simhash": pa.array(np.tile(sh.astype(np.int64), 4)),
            }
        )

    bands = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        keys = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, keys))
        k, v, h = keys[order], ids[order], hs[order]
        starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
        ends = np.concatenate([starts[1:], [k.size]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            # slab-bounded pair generation: a hot 16-bit band bucket of
            # near-identical docs would otherwise allocate O(m^2) at
            # once; the hamming filter applies PER SLAB so survivors
            # stay small even for degenerate runs
            for ii, jj in _iter_pair_slabs(m):
                ham = _popcount64(np.bitwise_xor(h[s:e][ii], h[s:e][jj]))
                keep = ham <= max_hamming
                out_a.append(v[s:e][ii][keep])
                out_b.append(v[s:e][jj][keep])
                out_h.append(ham[keep])
        if out_a:
            a = np.concatenate(out_a).astype(np.int64)
            b = np.concatenate(out_b).astype(np.int64)
            hm = np.concatenate(out_h).astype(np.int64)
            keep = a != b
            a, b, hm = a[keep], b[keep], hm[keep]
        else:
            a = b = hm = np.empty(0, np.int64)
        return pa.table(
            {"doc_a": pa.array(a), "doc_b": pa.array(b), "hamming": pa.array(hm)}
        )

    cand = bands.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    # a qualifying pair appears in >=1 band tables: dedup by key
    uniq = cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))
    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )
    result = uniq.map_batches(
        _with_schema(out_schema), batch_format="pyarrow"
    ).materialize()
    if result.count() == 0:
        # a corpus with no pairs at hamming<=3 yields only empty blocks,
        # whose reported schema is an upstream one — pin ours
        return ray.data.from_arrow(out_schema.empty_table())
    return result


Q_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                               '\s+') AS ws
  FROM documents
), th AS (
  SELECT doc_id,
         list_transform(ws, w ->
             list_reduce(list_prepend(CAST(0 AS HUGEINT),
                 list_transform(range(1, length(w)+1), i -> unicode(w[i]))),
                 (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)) AS hs
  FROM toks
), sim AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(63, -1, -1), j ->
                 CASE WHEN list_sum(list_transform(hs,
                          h -> CAST((h // (CAST(1 AS HUGEINT) << j)) % 2 AS BIGINT) * 2 - 1)) > 0
                      THEN 1 ELSE 0 END)),
             (a, b) -> a * 2 + b) AS shu
  FROM th
), simi AS (
  SELECT doc_id,
         CAST(CASE WHEN shu >= 9223372036854775808
              THEN shu - 18446744073709551616 ELSE shu END AS BIGINT) AS sh
  FROM sim
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM simi a JOIN simi b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard within blocking buckets (SQL-matched)
# ---------------------------------------------------------------------------

def _char_gram_hashes(text_col, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Char k-gram Horner hashes + row ids, vectorized over the decoded
    codepoint stream.  Rows shorter than k contribute ONE gram — the
    Horner hash of the whole row (== substr(text, 1, k) semantics)."""
    cps, rows = utf8_codepoints(text_col)
    n_rows = len(text_col)
    lengths = np.bincount(rows, minlength=n_rows)
    # short rows (len < k): one whole-row gram
    short = np.nonzero(lengths < k)[0]
    short_mask_flat = lengths[rows] < k if cps.size else np.empty(0, bool)
    short_hash = horner_mod64(cps[short_mask_flat], rows[short_mask_flat], n_rows)[short]
    # long rows: sliding window of k codepoints
    n = cps.size
    if n >= k:
        with np.errstate(over="ignore"):
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for d in range(k):
                h = h * _HORNER_P + cps[d : n - k + 1 + d]
        valid = rows[k - 1 :] == rows[: n - k + 1]
        win_h, win_rows = h[valid], rows[: n - k + 1][valid]
    else:
        win_h = np.empty(0, np.uint64)
        win_rows = np.empty(0, np.int64)
    all_h = np.concatenate([win_h, short_hash.astype(np.uint64)])
    all_rows = np.concatenate([win_rows, short.astype(np.int64)])
    order = np.argsort(all_rows, kind="stable")
    return all_h[order], all_rows[order]


def q_ngram_jaccard(sf_dir: str, threshold: float = 0.4) -> ray.data.Dataset:
    """Char-5-gram Jaccard over pairs blocked by (lang, length bucket).

    Gram hashes are computed ONCE per doc in a vectorized map_batches
    (carried as a sorted-unique list column); the per-block pair loop is
    pure numpy set-intersection with a count-ratio prefilter.  Blocking
    keeps the pair count bounded; the DuckDB oracle enumerates the same
    grams with substr() (Q_NGRAM_SQL)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text", "n_chars"])

    def add_grams(t: pa.Table) -> pa.Table:
        g, rows = _char_gram_hashes(t["text"], k=5)
        vals, offs = _sorted_unique_rowsets(g, rows, len(t))
        grams = pa.LargeListArray.from_arrays(offs, pa.array(vals.astype(np.int64)))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "len_bucket": pc.cast(pc.divide(t["n_chars"], 50), pa.int32()),
                "grams": grams,
            }
        )

    ds = ds.map_batches(add_grams, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pa.Table) -> pa.Table:
        tbl = g.combine_chunks()
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        langs = tbl["lang"].to_numpy(zero_copy_only=False)
        buckets = tbl["len_bucket"].to_numpy(zero_copy_only=False)
        glist = tbl["grams"].combine_chunks()
        offs = glist.offsets.to_numpy(zero_copy_only=False)
        vals = glist.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, buckets, langs))
        out_a, out_b, out_j = [], [], []
        # iterate (lang, bucket) runs
        key_change = np.concatenate(
            [[True], (langs[order][1:] != langs[order][:-1])
             | (buckets[order][1:] != buckets[order][:-1])]
        )
        starts = np.nonzero(key_change)[0]
        ends = np.concatenate([starts[1:], [order.size]])
        for s, e in zip(starts, ends):
            members = order[s:e]
            m = members.size
            if m < 2:
                continue
            sizes = (offs[members + 1] - offs[members]).astype(np.int64)
            for x in range(m):
                ax = vals[offs[members[x]] : offs[members[x] + 1]]
                for y in range(x + 1, m):
                    # |A| >= t|B| prefilter (jac <= min/max of sizes)
                    if sizes[x] < threshold * sizes[y] or sizes[y] < threshold * sizes[x]:
                        continue
                    ay = vals[offs[members[y]] : offs[members[y] + 1]]
                    inter = _intersect_size(ax, ay)
                    union = sizes[x] + sizes[y] - inter
                    jac = inter / union if union else 1.0
                    jac = np.floor(jac * 1e6) / 1e6
                    if jac >= threshold:
                        out_a.append(int(ids[members[x]]))
                        out_b.append(int(ids[members[y]]))
                        out_j.append(float(jac))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            },
            schema=_PAIR_SCHEMA,
        )

    result = ds.groupby(["lang", "len_bucket"]).map_groups(
        pairs, batch_format="pyarrow"
    ).materialize()
    if result.count() == 0:
        # all-empty results report an upstream block's schema — pin ours
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return result


Q_NGRAM_SQL = """
WITH g AS (
  SELECT doc_id, lang, CAST(n_chars // 50 AS INTEGER) AS len_bucket,
         list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
             i -> substr(text, i, 5))) AS grams
  FROM documents
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         FLOOR(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams)))
               * 1000000) / 1000000 AS jaccard
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
   AND len(a.grams) * 5 >= len(b.grams) * 2  -- jac>=0.4 prefilter
   AND len(b.grams) * 5 >= len(a.grams) * 2
)
WHERE jaccard >= 0.4
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = list_column_matrix(t["embedding"])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def q_embedding_neardup(
    sf_dir: str, threshold: float = 0.4, block_rows: int = 4096
) -> ray.data.Dataset:
    """All pairs with cosine >= threshold — exact block-pair sweep with
    a centroid-cone prune.

    The dataset is materialized into object-store blocks of
    ``block_rows`` vectors; the DRIVER holds only the block *refs*, and
    a task per block pair (i<=j) fetches its two blocks zero-copy from
    the object store and matmuls them.  Before enumerating pairs, one
    tiny task per block computes its angular cone (normalized centroid
    direction + max angle r to it); a block pair is skipped when the
    EXACT bound ``cos(max(0, θ_centroids - r_i - r_j)) < threshold``
    proves no pair can reach the threshold — a bound, not a heuristic,
    so the result set is unchanged.  On clustered real data this cuts
    most of the O(B^2) pairs; worst case (one isotropic cloud) it
    degrades to the full sweep, which is inherent for an all-pairs
    threshold this loose — q_embedding_neardup_lsh is the
    high-threshold path.  SQL oracle: the equivalent self-join."""
    import ray

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    nblocks = max(1, -(-n // block_rows))
    mat = ds.repartition(nblocks).materialize()
    block_refs = [
        ref for bundle in mat.iter_internal_ref_bundles() for ref in bundle.block_refs
    ]
    nb = len(block_refs)

    @ray.remote
    def _cone(ref) -> tuple:
        _, m = _batch_matrix(ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref)
        c = m.sum(axis=0)
        nrm = np.linalg.norm(c)
        if nrm < 1e-12:  # degenerate: vectors cancel -> no useful cone
            return np.zeros(m.shape[1]), np.pi
        c /= nrm
        r = float(np.arccos(np.clip(m @ c, -1.0, 1.0)).max())
        return c, r

    cones = ray.get([_cone.remote(ref) for ref in block_refs])
    cents = np.stack([c for c, _ in cones])
    radii = np.array([r for _, r in cones])
    # pairwise exact upper bound on any cross-block cosine
    theta = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    gap = np.maximum(theta - radii[:, None] - radii[None, :], 0.0)
    # -1e-9: keep boundary pairs despite float round-off (bound stays safe)
    feasible = np.cos(gap) >= threshold - 1e-9
    pair_items = [
        {"i": i, "j": j}
        for i in range(nb)
        for j in range(i, nb)
        if feasible[i, j]
    ]
    pair_ds = ray.data.from_items(pair_items)

    out_schema = pa.schema(
        [
            pa.field("vec_a", pa.int64()),
            pa.field("vec_b", pa.int64()),
            pa.field("cosine", pa.float64()),
        ]
    )

    def score_block_pair(batch: pa.Table) -> pa.Table:
        outs = [out_schema.empty_table()]
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ta = ray.get(block_refs[i])
            tb = ta if j == i else ray.get(block_refs[j])
            ids_a, ma = _batch_matrix(ta)
            ids_b, mb = (ids_a, ma) if j == i else _batch_matrix(tb)
            sims = ma @ mb.T
            ai, bj = np.nonzero(sims >= threshold)
            keep = ids_a[ai] < ids_b[bj]
            outs.append(
                pa.table(
                    {
                        "vec_a": pa.array(ids_a[ai][keep].astype(np.int64)),
                        "vec_b": pa.array(ids_b[bj][keep].astype(np.int64)),
                        "cosine": pa.array(
                            np.floor(sims[ai, bj][keep] * 1e6 + 1e-3) / 1e6
                        ),
                    },
                    schema=out_schema,
                )
            )
        return pa.concat_tables(outs)

    return pair_ds.map_batches(
        score_block_pair, batch_format="pyarrow", batch_size=1
    )


Q_EMB_NEARDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.001) / 1000000
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def q_embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.85,
    bits_per_band: int = 8,
    n_bands: int = 16,
    join_partitions: int = 8,
    seed: int = 99,
) -> ray.data.Dataset:
    """High-threshold near-dup via random-hyperplane LSH: sign-bit band
    keys -> bucket groupby -> candidate pairs -> join vectors back ->
    exact cosine verify.  The shuffle carries (band_key, vec_id) only.

    Recall is 1-(1-p^b)^B with p = 1 - arccos(cos)/pi — at cosine 0.99
    the miss probability is ~6e-9; at the default threshold 0.85 it is
    ~2% for a pair sitting exactly on the threshold, so this is the
    scale path for tight thresholds, not a drop-in for the exact sweep
    (q_embedding_neardup).  Planted-dup recall is pytest-asserted."""
    import ray

    import pyarrow.parquet as pq

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # probe the dimension from parquet metadata-level single-row read
    head = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(head.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * bits_per_band, dim))
    planes_ref = ray.put(planes)
    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()

    def to_bands(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        pl = ray.get(planes_ref)
        bits = (m @ pl.T) > 0  # [n, n_bands*bits]
        n = len(ids)
        keys = np.zeros((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            k = np.zeros(n, dtype=np.int64)
            for c in range(bits_per_band):
                k = (k << 1) | seg[:, c]
            keys[:, b] = k + (b << bits_per_band)
        flat = keys.T.reshape(-1)
        return pa.table(
            {
                "band_key": pa.array(flat),
                "bucket": pa.array((flat % nb).astype(np.int32)),
                "vec_id": pa.array(np.tile(ids.astype(np.int64), n_bands)),
            }
        )

    bands = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        a, b = _run_pairs(
            g["band_key"].to_numpy(zero_copy_only=False),
            g["vec_id"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"vec_a": pa.array(a), "vec_b": pa.array(b)})

    out_schema = pa.schema(
        [
            pa.field("vec_a", pa.int64()),
            pa.field("vec_b", pa.int64()),
            pa.field("cosine", pa.float64()),
        ]
    )

    cand = bands.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    uniq = cand.groupby(["vec_a", "vec_b"]).aggregate(Count(alias_name="_nb"))
    # repartition absorbs zero-column empty-partition blocks (see
    # q_minhash_lsh_pairs) before the hash joins
    uniq = uniq.repartition(join_partitions).map_batches(
        _with_schema(pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])),
        batch_format="pyarrow",
    )
    # the candidate set is the SMALL side; count it off a materialized
    # copy and pin the output schema on the empty path — map_batches
    # never calls the UDF on empty blocks, so without this short-circuit
    # an empty result reports the upstream JOIN's schema, not ours
    uniq = uniq.materialize()
    if uniq.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    def pack(id_name: str, emb_name: str):
        # Acero hash joins reject list-typed payload columns — carry the
        # vector as one large_binary cell (raw float64 bytes) instead
        def fn(t: pa.Table) -> pa.Table:
            _, m = _batch_matrix(t)  # normalized float64 [n, dim]
            n, dim = m.shape
            data = pa.py_buffer(np.ascontiguousarray(m).tobytes())
            offs = pa.py_buffer((np.arange(n + 1, dtype=np.int64) * 8 * dim).tobytes())
            emb = pa.Array.from_buffers(pa.large_binary(), n, [None, offs, data])
            return pa.table({id_name: t["vec_id"], emb_name: emb})

        return fn

    vecs_a = ds.map_batches(pack("vec_a", "emb_a"), batch_format="pyarrow")
    vecs_b = ds.map_batches(pack("vec_b", "emb_b"), batch_format="pyarrow")
    joined = uniq.join(
        vecs_a, join_type="inner", num_partitions=join_partitions, on=("vec_a",)
    ).join(vecs_b, join_type="inner", num_partitions=join_partitions, on=("vec_b",))

    def unpack(col: pa.ChunkedArray, n: int) -> np.ndarray:
        arr = col.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        flat = np.frombuffer(arr.buffers()[2], dtype=np.float64)
        dim = (offs[1] - offs[0]) // 8
        return flat[offs[0] // 8 : offs[-1] // 8].reshape(n, dim)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        ma = unpack(t["emb_a"], len(t))  # already normalized at pack time
        mb = unpack(t["emb_b"], len(t))
        sims = (ma * mb).sum(axis=1)
        keep = sims >= threshold
        return pa.table(
            {
                "vec_a": pc.cast(t["vec_a"].combine_chunks().filter(pa.array(keep)), pa.int64()),
                "vec_b": pc.cast(t["vec_b"].combine_chunks().filter(pa.array(keep)), pa.int64()),
                "cosine": pa.array(np.floor(sims[keep] * 1e6 + 1e-3) / 1e6),
            },
            schema=out_schema,
        )

    verified = joined.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        # all candidates failed the cosine verify: every block is empty
        # and Ray reports the FIRST block's schema (often an empty join
        # partition's 5-column one) — pin ours instead
        return ray.data.from_arrow(out_schema.empty_table())
    return verified


Q_EMB_NEARDUP_LSH_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.001) / 1000000
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.85
"""


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution: connected components over near-dup pairs
# ---------------------------------------------------------------------------

def _propagate_min_labels(
    edges: ray.data.Dataset, max_iters: int = 25
) -> tuple[ray.data.Dataset, int]:
    """Connected-component labels over a BIDIRECTIONAL edge dataset
    ``(src, dst)`` via min-label propagation with POINTER-JUMPING
    shortcuts (the hash-to-min acceleration): each round takes the
    per-node min over neighbor labels, then additionally contracts
    ``label(v) <- min(label(v), label(label(v)))``.  Labels look back
    ~2^k hops after k rounds, so convergence is O(log diameter) rounds
    instead of O(diameter) — a 64-node path converges in 7 rounds, not
    63 (pytest-asserted).  Labels are monotone decreasing and bounded
    by the component min, so an unchanged label sum is a sound
    fixpoint test (and at the fixpoint every edge has equal labels on
    both ends = the component min).

    Returns ``(labels, rounds)`` — labels as ``(node, label)``, rounds
    = loop iterations executed including the confirming one."""
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    np_parts = _graph_partitions()

    def init_labels(t: pa.Table) -> pa.Table:
        u = pc.unique(t["src"])
        return pa.table({"node": u, "label": u})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .repartition(np_parts)
        .map_batches(_with_schema(label_schema), batch_format="pyarrow")
        .materialize()
    )

    def label_sum(ds) -> int:
        from ray.data.aggregate import Sum as _Sum

        row = ds.groupby(None).aggregate(_Sum("label", alias_name="s")).take(1)
        return int(row[0]["s"]) if row else 0

    def shortcut(t: pa.Table) -> pa.Table:
        # label2 = label(label(v)); null when the left_outer probe
        # missed (can't happen — every label is a node id — but a
        # dropped row would silently lose a doc, so coalesce)
        lab = pc.min_element_wise(
            pc.cast(t["label"], pa.int64()),
            pc.coalesce(pc.cast(t["label2"], pa.int64()), t["label"]),
        )
        return pa.table({"node": pc.cast(t["node"], pa.int64()), "label": lab})

    prev_sum = label_sum(labels)
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # neighbor labels: edge (src, dst) joined to dst's label
        nbr = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["dst", "label"]), batch_format="pyarrow"
            ),
            join_type="inner", num_partitions=np_parts, on=("dst",),
        ).map_batches(
            lambda t: pa.table(
                {"node": pc.cast(t["src"], pa.int64()),
                 "label": pc.cast(t["label"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        stepped = (
            labels.union(nbr)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(np_parts)
            .map_batches(_with_schema(label_schema), batch_format="pyarrow")
        )
        # pointer jump: look up the label of each node's label — one
        # self-join per round buys the O(log d) round bound
        lut = stepped.map_batches(
            lambda t: pa.table({"label": t["node"], "label2": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            stepped.join(
                lut, join_type="left_outer", num_partitions=np_parts, on=("label",)
            )
            .map_batches(shortcut, batch_format="pyarrow")
            .repartition(np_parts)
            .map_batches(_with_schema(label_schema), batch_format="pyarrow")
            .materialize()
        )
        s = label_sum(labels)
        if s == prev_sum:  # fixpoint: min-labels can only decrease
            break
        prev_sum = s
    return labels, rounds


def q_dup_clusters(sf_dir: str, max_iters: int = 25) -> ray.data.Dataset:
    """Connected components over the MinHash near-dup pair graph — the
    step that turns pairs into KEEP/DROP decisions (each cluster keeps
    its min doc_id): every doc appearing in a pair is labeled with its
    cluster representative.

    Implemented as ITERATIVE min-label propagation with pointer-jumping
    shortcuts over Datasets (``_propagate_min_labels``): O(log
    diameter) rounds, each round a bounded hash join + groupby + one
    label self-join over the PAIR graph (tiny relative to the corpus:
    only near-dup members appear), never the documents table.  The
    DuckDB oracle walks the same graph with a recursive CTE."""
    pairs = q_minhash_lsh_pairs(sf_dir)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]).astype(np.int64)),
                "dst": pa.array(np.concatenate([b, a]).astype(np.int64)),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("cluster_rep", pa.int64())])
            .empty_table()
        )

    labels, _ = _propagate_min_labels(edges, max_iters=max_iters)
    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_rep": t["label"]}
        ),
        batch_format="pyarrow",
    )


Q_DUP_CLUSTERS_SQL = (
    "WITH RECURSIVE base AS MATERIALIZED (" + Q_MINHASH_SQL + """),
e AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM base
  UNION
  SELECT doc_b, doc_a FROM base
),
walk(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT w.a, e.b FROM walk w JOIN e ON w.b = e.a WHERE e.b <> w.a
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep
FROM walk GROUP BY a
"""
)


# ---------------------------------------------------------------------------
# Fuzzy vocabulary matching: edit-distance pairs over a distinct-value set
# ---------------------------------------------------------------------------

def _lev_pairs(
    a_codes: np.ndarray, a_len: np.ndarray, b_codes: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Levenshtein distance for P string pairs at once — the DP runs
    row-by-row over the longest left string (a Python loop of
    max(len_a) iterations), each row fully vectorized across pairs.

    The sequential insert dependency cur[j] = min(..., cur[j-1]+1) is
    folded into a prefix-min:  cur[j] = j + min_{k<=j}(m[k]-k)  where
    m[j] = min(prev[j]+1, sub[j-1]) — one ``minimum.accumulate`` per
    row instead of a per-cell loop.  Padding (code 0) never affects a
    result because pair (a, b)'s distance is read at row a_len, column
    b_len, which only depends on the real prefixes."""
    p, max_a = a_codes.shape
    max_b = b_codes.shape[1]
    jj = np.arange(max_b + 1, dtype=np.int64)
    prev = np.broadcast_to(jj, (p, max_b + 1)).copy()
    out = np.where(a_len == 0, b_len, -1).astype(np.int64)
    for i in range(1, max_a + 1):
        sub = prev[:, :-1] + (b_codes != a_codes[:, i - 1 : i])
        m = np.empty((p, max_b + 1), dtype=np.int64)
        m[:, 0] = i
        np.minimum(prev[:, 1:] + 1, sub, out=m[:, 1:])
        cur = np.minimum.accumulate(m - jj, axis=1) + jj
        done = a_len == i
        if done.any():
            out[done] = cur[done, b_len[done]]
        prev = cur
    return out


def q_fuzzy_vocab_pairs(sf_dir: str, max_dist: int = 2) -> ray.data.Dataset:
    """All pairs of DISTINCT ``p_name`` values within ``max_dist``
    Levenshtein edits — entity-resolution blocking over a value
    vocabulary (product names, brands, author strings).

    Scale shape: the corpus collapses to its distinct vocabulary first
    (per-batch ``unique`` partials + one groupby — the only pass over
    the data), then names band by length bucket ``len // (max_dist+1)``
    (each name also joins the bucket below, so any pair with
    ``|len_a - len_b| <= max_dist`` provably shares a bucket); buckets
    run the pair DP independently with slab-bounded pair generation
    (``_iter_pair_slabs``), and a final distinct collapses pairs seen
    by two buckets.  Nothing is ever all-pairs over the vocabulary."""
    ds = read_table(sf_dir, "part", columns=["p_name"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"name": pc.unique(t["p_name"])})

    names = (
        ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("name")
        .map_groups(
            lambda t: t.slice(0, 1) if t.num_rows else t, batch_format="pyarrow"
        )
    )

    width = max_dist + 1

    def to_buckets(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(t["name"]).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ln // width
        nm = t["name"].combine_chunks()
        lower = b - 1
        keep = lower >= 0
        return pa.table(
            {
                "bucket": pa.array(np.concatenate([b, lower[keep]]), type=pa.int64()),
                "name": pa.concat_arrays([nm, nm.filter(pa.array(keep))]),
            }
        )

    banded = names.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or "name" not in g.column_names:
            return out_schema.empty_table()
        nm = np.asarray(g["name"].to_pylist(), dtype="U")
        nm.sort()
        max_w = nm.dtype.itemsize // 4
        codes = nm.view(np.uint32).reshape(len(nm), max_w)
        lens = (codes != 0).sum(axis=1).astype(np.int64)
        out_a, out_b, out_d = [], [], []
        for ii, jjx in _iter_pair_slabs(len(nm)):
            ok = np.abs(lens[ii] - lens[jjx]) <= max_dist
            ii, jjx = ii[ok], jjx[ok]
            if ii.size == 0:
                continue
            d = _lev_pairs(codes[ii], lens[ii], codes[jjx], lens[jjx])
            hit = d <= max_dist
            out_a.append(nm[ii[hit]])
            out_b.append(nm[jjx[hit]])
            out_d.append(d[hit])
        if not out_a:
            return out_schema.empty_table()
        return pa.table(
            {
                "name_a": pa.array(np.concatenate(out_a)),
                "name_b": pa.array(np.concatenate(out_b)),
                "dist": pa.array(np.concatenate(out_d), type=pa.int64()),
            },
            schema=out_schema,
        )

    pairs = banded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair whose names share both buckets is found twice -> distinct
    return pairs.groupby(["name_a", "name_b"]).aggregate(
        Min("dist", alias_name="dist")
    )


Q_FUZZY_VOCAB_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# ---------------------------------------------------------------------------
# PageRank over the near-dup pair graph (iterative power method)
# ---------------------------------------------------------------------------

def q_pagerank_neardup(
    sf_dir: str,
    iters: int = 3,
    damping: float = 0.85,
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """PageRank (fixed ``iters`` power iterations, damping 0.85) over
    the undirected MinHash near-dup graph — ranking duplicate-cluster
    members by connectivity so the best-connected copy can be kept.

    Iterative-Dataset shape (same as ``q_dup_clusters``): the
    transition table ``(src, dst, deg_src)`` is built once; each
    iteration is one hash join (ranks on src) + one groupby(dst) sum —
    everything stays on the PAIR graph, never the corpus.  Per-row
    contribution is computed as ``r / deg`` (not ``r * (1/deg)``) so
    the elementary float ops match the SQL oracle bit-for-bit; the
    final grid floor absorbs summation-order ulps.  Undirected graphs
    have no dangling nodes, so no leaked-mass correction is needed."""
    pairs = q_minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]).astype(np.int64)),
                "dst": pa.array(np.concatenate([b, a]).astype(np.int64)),
            }
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("rank", pa.float64())])
    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    np_parts = _graph_partitions()
    deg_schema = pa.schema([("src", pa.int64()), ("d", pa.float64())])
    deg = (
        edges.groupby("src")
        .aggregate(Count(alias_name="d"))
        .repartition(np_parts)
        .map_batches(
            lambda t: pa.table(
                {"src": pc.cast(t["src"], pa.int64()),
                 "d": pc.cast(t["d"], pa.float64())}
            ) if t.num_rows and "src" in t.column_names else deg_schema.empty_table(),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = deg.count()

    trans = edges.join(
        deg, join_type="inner", num_partitions=np_parts, on=("src",)
    ).materialize()

    rank_schema = pa.schema([("src", pa.int64()), ("r", pa.float64())])
    ranks = deg.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "r": pa.array(np.full(t.num_rows, 1.0 / n))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = trans.join(
            ranks, join_type="inner", num_partitions=np_parts, on=("src",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": pc.cast(t["dst"], pa.int64()),
                    "c": pc.divide(
                        pc.cast(t["r"], pa.float64()), pc.cast(t["d"], pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        ranks = (
            contrib.groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
            .repartition(np_parts)
            .map_batches(
                lambda t: pa.table(
                    {
                        "src": pc.cast(t["dst"], pa.int64()),
                        "r": pa.array(
                            (1.0 - damping) / n
                            + damping * t["s"].to_numpy(zero_copy_only=False)
                        ),
                    }
                ) if t.num_rows and "dst" in t.column_names
                else rank_schema.empty_table(),
                batch_format="pyarrow",
            )
            .materialize()
        )

    def finalize(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pc.cast(t["src"], pa.int64()),
                "rank": pa.array(np.floor(r * 1e6 + 1e-3) / 1e6),
            },
            schema=out_schema,
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


# MATERIALIZED hints: ``base`` (the expensive exact-Jaccard self-join)
# and ``e`` are referenced by several CTE layers — without the hint
# DuckDB may inline them per reference, multiplying the base cost ~8x.
Q_PAGERANK_SQL = (
    "WITH base AS MATERIALIZED (" + Q_MINHASH_SQL + """),
e AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM base
  UNION ALL
  SELECT doc_b, doc_a FROM base
),
deg AS MATERIALIZED (SELECT a, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY a),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
r0 AS (SELECT a AS v, 1.0 / (SELECT n FROM nn) AS r FROM deg),
r1 AS MATERIALIZED (SELECT e.b AS v, 0.15 / (SELECT n FROM nn)
              + 0.85 * SUM(r0.r / deg.d) AS r
       FROM e JOIN deg ON deg.a = e.a JOIN r0 ON r0.v = e.a GROUP BY e.b),
r2 AS MATERIALIZED (SELECT e.b AS v, 0.15 / (SELECT n FROM nn)
              + 0.85 * SUM(r1.r / deg.d) AS r
       FROM e JOIN deg ON deg.a = e.a JOIN r1 ON r1.v = e.a GROUP BY e.b),
r3 AS (SELECT e.b AS v, 0.15 / (SELECT n FROM nn)
              + 0.85 * SUM(r2.r / deg.d) AS r
       FROM e JOIN deg ON deg.a = e.a JOIN r2 ON r2.v = e.a GROUP BY e.b)
SELECT v AS doc_id, FLOOR(r * 1e6 + 1e-3) / 1e6 AS rank FROM r3
"""
)


# ---------------------------------------------------------------------------
# Duplicate provenance: which source shards share near-dup content
# ---------------------------------------------------------------------------

def q_dup_provenance(sf_dir: str) -> ray.data.Dataset:
    """Cross-source duplication matrix: near-dup pair counts per
    (source_a, source_b) shard pair (unordered, LEAST/GREATEST
    normalized) — the corpus-provenance view that tells you WHICH
    ingest feeds duplicate each other.

    Scale shape: the near-dup PAIR list (tiny relative to the corpus)
    hash-joins twice against a column-pruned (doc_id, source) read —
    the documents table itself is never shuffled — then one groupby
    over at most |sources|^2 rows."""
    pairs = q_minhash_lsh_pairs(sf_dir).materialize()
    out_schema = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string()),
         ("n_pairs", pa.int64())]
    )
    if pairs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    def side(name: str):
        return read_table(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
            lambda t, n=name: pa.table(
                {f"doc_{n}": pc.cast(t["doc_id"], pa.int64()),
                 f"source_{n}": t["source"]}
            ),
            batch_format="pyarrow",
        )

    joined = pairs.select_columns(["doc_a", "doc_b"]).join(
        side("a"), join_type="inner", num_partitions=join_partitions(),
        on=("doc_a",),
    ).join(
        side("b"), join_type="inner", num_partitions=join_partitions(),
        on=("doc_b",),
    )

    def normalize(t: pa.Table) -> pa.Table:
        sa = t["source_a"].to_numpy(zero_copy_only=False)
        sb = t["source_b"].to_numpy(zero_copy_only=False)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        return (
            pa.table({"source_a": pa.array(lo), "source_b": pa.array(hi)})
            .group_by(["source_a", "source_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["source_a", "source_b", "n"])
        )

    agg = (
        joined.map_batches(normalize, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n_pairs"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source_a" not in t.column_names:
            return out_schema.empty_table()
        return pa.table(
            {
                "source_a": t["source_a"],
                "source_b": t["source_b"],
                "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
            },
            schema=out_schema,
        )

    return agg.repartition(2).map_batches(finalize, batch_format="pyarrow")


Q_DUP_PROVENANCE_SQL = (
    "WITH base AS MATERIALIZED (" + Q_MINHASH_SQL + """)
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       COUNT(*) AS n_pairs
FROM base
JOIN documents da ON da.doc_id = base.doc_a
JOIN documents db ON db.doc_id = base.doc_b
GROUP BY 1, 2
"""
)


# ---------------------------------------------------------------------------
# Canonical-document selection: the keep/drop end step of corpus dedup
# ---------------------------------------------------------------------------

def q_dup_canonical(sf_dir: str) -> ray.data.Dataset:
    """KEEP/DROP decision per clustered document: each near-dup cluster
    keeps its longest member (tie → smallest doc_id), everyone else in
    the cluster is dropped — the step that actually shrinks a training
    corpus after pair detection + clustering.

    Scale shape: the cluster labels (only near-dup members — tiny
    relative to the corpus) hash-join the documents table on doc_id to
    pick up lengths, then one keyed ``map_groups`` argmax per cluster
    with the vectorized lexsort-first-row pattern.  The corpus itself
    is scanned once, two columns only."""
    clusters = q_dup_clusters(sf_dir).materialize()

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("cluster_rep", pa.int64()),
            ("n_chars", pa.int64()),
            ("keep", pa.bool_()),
        ]
    )
    if clusters.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    j = clusters.repartition(join_partitions()).join(
        docs, join_type="inner", num_partitions=join_partitions(),
        on=("doc_id",),
    )

    def decide(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        nch = pc.cast(t["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -nch, rep))
        first = np.concatenate([[True], rep[order][1:] != rep[order][:-1]])
        keep = np.zeros(doc.size, dtype=bool)
        keep[order[first]] = True
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "cluster_rep": pa.array(rep, pa.int64()),
                "n_chars": pa.array(nch, pa.int64()),
                "keep": pa.array(keep),
            },
            schema=out_schema,
        )

    from ..functions.segments import bucket_grouped

    # decide() is segment-safe; bucket the shuffle so the call count is
    # bounded by buckets, not by cluster count
    return bucket_grouped(j, "cluster_rep").map_groups(
        decide, batch_format="pyarrow"
    )


Q_DUP_CANONICAL_SQL = (
    "WITH RECURSIVE base AS MATERIALIZED (" + Q_MINHASH_SQL + """),
e AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM base
  UNION
  SELECT doc_b, doc_a FROM base
),
walk(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT w.a, e.b FROM walk w JOIN e ON w.b = e.a WHERE e.b <> w.a
),
cl AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep FROM walk GROUP BY a
)
SELECT cl.doc_id, cl.cluster_rep, CAST(d.n_chars AS BIGINT) AS n_chars,
       (ROW_NUMBER() OVER (PARTITION BY cl.cluster_rep
                           ORDER BY d.n_chars DESC, cl.doc_id) = 1) AS keep
FROM cl JOIN documents d ON d.doc_id = cl.doc_id
"""
)


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity self-join (PPJoin family — exact, no LSH)
# ---------------------------------------------------------------------------

def q_setsim_prefix_join(
    sf_dir: str,
    threshold: float = 0.6,
    join_partitions: int = 8,
    broadcast_pairs_bytes: int = 8 << 20,
    broadcast_sets_bytes: int = 1 << 30,
) -> ray.data.Dataset:
    """ALL pairs with word-3-gram-shingle Jaccard >= ``threshold``, found
    by prefix filtering (SSJoin/PPJoin family) — exact recall with no
    probabilistic step, the deterministic alternative to MinHash.

    Prefix lemma: under any fixed total order of shingles (here:
    ascending Horner hash), two sets A, B with ``|A∩B| >= ceil(t·|A|)``
    must share an element inside A's first ``|A| - ceil(t·|A|) + 1``
    elements (pigeonhole) — so indexing ONLY each doc's prefix finds
    every qualifying pair.

    Scale shape: (1) one vectorized pass packs each doc's sorted-unique
    shingle set as ``large_binary`` (list-typed non-key columns break
    Acero joins) and is materialized ONCE to the object store (at
    100 TB: a parquet spill reused by both consumers); (2) the inverted
    index shuffles ``(prefix_gram, doc_id, set_size)`` rows only — with
    t=0.6 that is ~40 % of distinct shingles, no text; (3) candidate
    pairs pass the PPJoin length filter and a per-bucket local dedup
    BEFORE any exchange; (4) verification is regime-adaptive:
    broadcast-sets (packed sets fit the object store: ``ray.put`` once,
    parallel map_batches verify, survivors deduped by a groupby over
    the tiny result — the dominant regime, no joins), broadcast-pairs
    (few candidates but huge sets: driver-side verify against filtered
    set blocks; chosen by the pair list's BYTE size — the driver-pull
    budget — not pair count), or two hash joins + batch sort-merge
    intersection (the 100 TB dup-heavy fallback; benched on the
    30%-duplicate fixture, BASELINE.md).  Every regime uses the same vectorized
    whole-batch intersection — no per-pair python loop."""
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    set_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("set_bytes", pa.large_binary()),
            pa.field("set_size", pa.int64()),
        ]
    )

    def add_sets(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        g, rows = _shingle_hashes(t["text"], k=3)
        vals, offs = _sorted_unique_rowsets(g, rows, t.num_rows)
        sizes = np.diff(offs)
        keep = sizes > 0  # <3-token docs have no shingles (oracle: len(ws)>=3)
        vals64 = vals.astype(np.int64)
        packed = [
            vals64[offs[i] : offs[i + 1]].tobytes()
            for i in np.nonzero(keep)[0]
        ]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "set_bytes": pa.array(packed, type=pa.large_binary()),
                "set_size": pa.array(sizes[keep], type=pa.int64()),
            },
            schema=set_schema,
        )

    sets = ds.map_batches(
        add_sets, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()

    def emit_prefix(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "set_size": pa.array([], pa.int64()),
                }
            )
        sizes = t["set_size"].to_numpy(zero_copy_only=False)
        # p = s - ceil(t*s) + 1  (prefix under the ascending-hash order)
        plen = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        buf = t["set_bytes"].combine_chunks()
        raw = np.frombuffer(buf.buffers()[2], dtype=np.int64)
        # slice the offsets buffer from buf.offset (sliced arrays keep a
        # view offset); data positions are absolute, so raw[] is safe
        boffs = np.frombuffer(buf.buffers()[1], dtype=np.int64)[
            buf.offset : buf.offset + n + 1
        ] // 8
        flat_idx = _expand_ranges(boffs[:-1], plen)
        grams = raw[flat_idx]
        doc_rep = np.repeat(ids, plen)
        size_rep = np.repeat(sizes, plen)
        return pa.table(
            {
                "gram": pa.array(grams),
                "bucket": pa.array(
                    (grams.view(np.uint64) % np.uint64(nb)).astype(
                        np.int32
                    )
                ),
                "doc_id": pa.array(doc_rep),
                "set_size": pa.array(size_rep.astype(np.int64)),
            }
        )

    # no repartition before the groupby: the exploded prefix stream is
    # the LARGEST intermediate of this query (~40% of all shingle
    # occurrences), the groupby below already hash-shuffles it, and a
    # repartition here would move that stream all-to-all TWICE.
    # Map-side parallelism equals the upstream block count, which
    # tracks corpus size — interleaved A/B at sf0.1 measured the
    # repartition as a wash (min-of-4: 2.16 s with vs 2.22 s without)
    prefix_rows = sets.map_batches(
        emit_prefix, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        a, b = _run_pairs(g["gram"].to_numpy(zero_copy_only=False), ids)
        if a.size:
            # PPJoin length filter: jac >= t forces t·|B| <= |A| (and
            # symmetrically), so size-incompatible pairs skip the
            # expensive set intersection entirely (~35% at t=0.6 here)
            szs = g["set_size"].to_numpy(zero_copy_only=False)
            uids, first = np.unique(ids, return_index=True)
            usz = szs[first]  # sparse id->size (ids can be arbitrary int64)
            sa = usz[np.searchsorted(uids, a)]
            sb = usz[np.searchsorted(uids, b)]
            tnum = int(round(threshold * 1_000_000))
            ok = (sa * 1_000_000 >= sb * tnum) & (sb * 1_000_000 >= sa * tnum)
            a, b = a[ok], b[ok]
            if a.size:
                # local dedup (a pair repeats once per shared prefix
                # gram in this bucket) — no shuffle needed
                ab = np.unique(np.stack([a, b], axis=1), axis=0)
                a, b = ab[:, 0], ab[:, 1]
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    cand = (
        prefix_rows.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .materialize()
    )
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())

    if 0 < sets.size_bytes() <= broadcast_sets_bytes:
        # -- broadcast-sets path (the dominant mid-scale regime): the
        # packed shingle sets fit comfortably in the object store as ONE
        # flat block, so broadcast them via ray.put and verify candidate
        # pairs in parallel map_batches — no Acero joins, no driver-side
        # verify loop.  (At sf0.1 this replaced a 35-60 s two-join plan
        # with ~2 s: the joins replicated ~2 KB of set bytes per
        # candidate pair, ~1 GB of shuffle for a 450 k-pair list whose
        # referenced sets total 12 MB.)
        ids_parts, sizes_parts, vals_parts = [], [], []
        for bundle in sets.iter_internal_ref_bundles():
            for r in bundle.block_refs:
                b = ray.get(r)
                if not b.num_rows or "doc_id" not in b.column_names:
                    continue
                b = b.combine_chunks()
                arr = b["set_bytes"].combine_chunks()
                raw = np.frombuffer(arr.buffers()[2], dtype=np.int64)
                offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                    arr.offset : arr.offset + b.num_rows + 1
                ] // 8
                szs = b["set_size"].to_numpy(zero_copy_only=False).astype(np.int64)
                vals_parts.append(raw[_expand_ranges(offs[:-1], szs)])
                ids_parts.append(b["doc_id"].to_numpy(zero_copy_only=False))
                sizes_parts.append(szs)
        lids = np.concatenate(ids_parts)
        lsizes = np.concatenate(sizes_parts)
        lvals = np.concatenate(vals_parts)
        order = np.argsort(lids)
        loffs_un = np.concatenate([[0], np.cumsum(lsizes)]).astype(np.int64)
        lvals = lvals[_expand_ranges(loffs_un[order], lsizes[order])]
        lids, lsizes = lids[order], lsizes[order]
        loffs = np.concatenate([[0], np.cumsum(lsizes)]).astype(np.int64)
        sets_ref = ray.put((lids, lsizes, loffs, lvals))

        # NO global pair dedup before verify: a distributed groupby over
        # the full candidate list cost 30+ s at sf0.1 while cross-bucket
        # duplicate pairs are <5% after the local per-bucket dedup —
        # verify every occurrence and dedup the (small) survivor set

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc_a" not in t.column_names:
                return _PAIR_SCHEMA.empty_table()
            bids, bsizes, boffs, bvals = ray.get(sets_ref)
            pa_ids = t["doc_a"].to_numpy(zero_copy_only=False)
            pb_ids = t["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(bids, pa_ids)
            ib = np.searchsorted(bids, pb_ids)
            npairs = len(pa_ids)
            sa, sb = bsizes[ia], bsizes[ib]
            pair_lab = np.concatenate(
                [np.repeat(np.arange(npairs), sa), np.repeat(np.arange(npairs), sb)]
            )
            vals = np.concatenate(
                [
                    bvals[_expand_ranges(boffs[ia], sa)],
                    bvals[_expand_ranges(boffs[ib], sb)],
                ]
            )
            so = np.lexsort((vals, pair_lab))
            pl, vl = pair_lab[so], vals[so]
            dup = (pl[1:] == pl[:-1]) & (vl[1:] == vl[:-1])
            inter = np.bincount(pl[1:][dup], minlength=npairs)
            union = sa + sb - inter
            jac = np.floor(np.where(union > 0, inter / union, 1.0) * 1e6) / 1e6
            keep = jac >= threshold
            return pa.table(
                {
                    "doc_a": pa.array(pa_ids[keep], type=pa.int64()),
                    "doc_b": pa.array(pb_ids[keep], type=pa.int64()),
                    "jaccard": pa.array(jac[keep]),
                },
                schema=_PAIR_SCHEMA,
            )

        survivors = cand.map_batches(
            verify_broadcast, batch_format="pyarrow", batch_size=16384
        )
        verified = (
            survivors.groupby(["doc_a", "doc_b"])
            .aggregate(Min("jaccard", alias_name="jaccard"))
            .map_batches(_with_schema(_PAIR_SCHEMA), batch_format="pyarrow")
            .materialize()
        )
        if verified.count() == 0:
            return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
        return verified

    if cand.size_bytes() <= broadcast_pairs_bytes:
        # -- broadcast path (the common regime): the pair list is the
        # SMALL side — dedup it on the driver and verify against set
        # blocks fetched straight from the already-materialized `sets`
        # (zero further dataset executions, no hash joins)
        cand_blocks = [
            ray.get(r)
            for bundle in cand.iter_internal_ref_bundles()
            for r in bundle.block_refs
        ]
        cand_blocks = [
            b for b in cand_blocks if b.num_rows and "doc_a" in b.column_names
        ]
        ab = np.stack(
            [
                np.concatenate(
                    [b["doc_a"].to_numpy(zero_copy_only=False) for b in cand_blocks]
                ),
                np.concatenate(
                    [b["doc_b"].to_numpy(zero_copy_only=False) for b in cand_blocks]
                ),
            ],
            axis=1,
        )
        pairs = np.unique(ab, axis=0)
        need = np.unique(pairs)
        vals_parts: list[np.ndarray] = []
        ids_parts: list[np.ndarray] = []
        sizes_parts: list[np.ndarray] = []
        for bundle in sets.iter_internal_ref_bundles():
            for r in bundle.block_refs:
                b = ray.get(r)
                if not b.num_rows or "doc_id" not in b.column_names:
                    continue
                bids = b["doc_id"].to_numpy(zero_copy_only=False)
                mask = np.isin(bids, need)
                if not mask.any():
                    continue
                sub = b.filter(pa.array(mask)).combine_chunks()
                arr = sub["set_bytes"].combine_chunks()
                raw = np.frombuffer(arr.buffers()[2], dtype=np.int64)
                offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                    arr.offset : arr.offset + sub.num_rows + 1
                ] // 8
                szs = sub["set_size"].to_numpy(zero_copy_only=False)
                vals_parts.append(raw[_expand_ranges(offs[:-1], szs)])
                ids_parts.append(sub["doc_id"].to_numpy(zero_copy_only=False))
                sizes_parts.append(szs)
        lids = np.concatenate(ids_parts)
        lsizes = np.concatenate(sizes_parts).astype(np.int64)
        lvals = np.concatenate(vals_parts)
        order = np.argsort(lids)
        # reorder flat values to sorted-id layout
        loffs_un = np.concatenate([[0], np.cumsum(lsizes)]).astype(np.int64)
        lvals = lvals[_expand_ranges(loffs_un[order], lsizes[order])]
        lids, lsizes = lids[order], lsizes[order]
        loffs = np.concatenate([[0], np.cumsum(lsizes)]).astype(np.int64)
        ia = np.searchsorted(lids, pairs[:, 0])
        ib = np.searchsorted(lids, pairs[:, 1])
        npairs = len(pairs)
        sa, sb = lsizes[ia], lsizes[ib]
        pair_lab = np.concatenate(
            [np.repeat(np.arange(npairs), sa), np.repeat(np.arange(npairs), sb)]
        )
        vals = np.concatenate(
            [
                lvals[_expand_ranges(loffs[ia], sa)],
                lvals[_expand_ranges(loffs[ib], sb)],
            ]
        )
        so = np.lexsort((vals, pair_lab))
        pl, vl = pair_lab[so], vals[so]
        dup = (pl[1:] == pl[:-1]) & (vl[1:] == vl[:-1])
        inter = np.bincount(pl[1:][dup], minlength=npairs)
        union = sa + sb - inter
        jac = np.floor(np.where(union > 0, inter / union, 1.0) * 1e6) / 1e6
        keep = jac >= threshold
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(pairs[:, 0][keep], type=pa.int64()),
                    "doc_b": pa.array(pairs[:, 1][keep], type=pa.int64()),
                    "jaccard": pa.array(jac[keep]),
                },
                schema=_PAIR_SCHEMA,
            )
        )

    # -- join path (dup-heavy corpora at scale) ---------------------------
    # global pair dedup (a pair surfaces once per shared prefix-gram
    # BUCKET — for exact dups that is ~every bucket its ~40% prefix
    # hashes into, so dedup before the set joins is mandatory): one
    # bounded-key coarse-bucket shuffle, not an unbounded composite
    # groupby (that shape cost ~30 s at a 450 k-pair sf0.1 list)
    uniq = _pair_dedup_buckets(cand, derive_buckets(), join_partitions)

    sets_a = sets.map_batches(
        lambda t: t.rename_columns(["doc_a", "bytes_a", "size_a"]),
        batch_format="pyarrow",
    )
    sets_b = sets.map_batches(
        lambda t: t.rename_columns(["doc_b", "bytes_b", "size_b"]),
        batch_format="pyarrow",
    )
    half = uniq.join(
        sets_a, join_type="inner", num_partitions=join_partitions, on=("doc_a",)
    ).repartition(join_partitions).map_batches(
        # join #1 can emit zero-column blocks for empty partitions,
        # which join #2 rejects (FieldRef doc_b) — pin the mid schema
        _with_schema(
            pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("bytes_a", pa.large_binary()),
                    ("size_a", pa.int64()),
                ]
            )
        ),
        batch_format="pyarrow",
    )
    withsets = half.join(
        sets_b, join_type="inner", num_partitions=join_partitions, on=("doc_b",)
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        t = t.combine_chunks()
        n = t.num_rows
        sa = t["size_a"].to_numpy(zero_copy_only=False)
        sb = t["size_b"].to_numpy(zero_copy_only=False)

        def unpack(col):
            arr = t[col].combine_chunks()
            raw = np.frombuffer(arr.buffers()[2], dtype=np.int64)
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ] // 8
            return raw, offs

        ra, oa = unpack("bytes_a")
        rb, ob = unpack("bytes_b")
        # one sort-merge intersection for the WHOLE batch: label every
        # set element with its pair id, sort (pair, value), count
        # adjacent duplicates — each side is unique within a pair, so a
        # duplicate == one intersection element
        pair_lab = np.concatenate(
            [np.repeat(np.arange(n), sa), np.repeat(np.arange(n), sb)]
        )
        vals = np.concatenate(
            [ra[_expand_ranges(oa[:-1], sa)], rb[_expand_ranges(ob[:-1], sb)]]
        )
        order = np.lexsort((vals, pair_lab))
        pl, vl = pair_lab[order], vals[order]
        dup = (pl[1:] == pl[:-1]) & (vl[1:] == vl[:-1])
        inter = np.bincount(pl[1:][dup], minlength=n)
        union = sa + sb - inter
        jac = np.floor(np.where(union > 0, inter / union, 1.0) * 1e6) / 1e6
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": t["doc_a"].filter(pa.array(keep)),
                "doc_b": t["doc_b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep]),
            },
            schema=_PAIR_SCHEMA,
        )

    verified = withsets.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return verified


Q_SETSIM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                               '\s+') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws)-1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
  FROM toks WHERE len(ws) >= 3
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         FLOOR(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams)))
               * 1000000) / 1000000 AS jaccard
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
   AND len(a.grams) * 5 >= len(b.grams) * 3  -- jac>=0.6 => 5|A|>=3|B|
   AND len(b.grams) * 5 >= len(a.grams) * 3
)
WHERE jaccard >= 0.6
"""


# ---------------------------------------------------------------------------
# Incremental (ingest-time) exact dedup: new shard vs existing corpus
# ---------------------------------------------------------------------------

def q_dedup_incremental(sf_dir: str, shard_mod: int = 5) -> ray.data.Dataset:
    """Ingest-time dedup: admit a document from the *new* shard only if
    its text is absent from the existing corpus AND it is the first
    occurrence within the shard.

    The shard split is deterministic (``doc_id % shard_mod ==
    shard_mod-1`` is "new", ~1/shard_mod of the corpus) so tests and the
    SQL oracle agree without a side channel.

    Scale shape: ONE text-keyed shuffle, same as ``q_dedup_exact`` —
    per-batch partials collapse each batch to one row per distinct text
    carrying (min new id | sentinel, n_old, n_new), so the corpus text
    crosses the wire at most once per distinct text per batch, and the
    "index" of existing texts is never materialized anywhere (at 100 TB
    a broadcast set of all corpus texts would be impossible; the
    hash-partitioned anti-join shape is the only one that scales).
    Emits (doc_id, n_new_dups) for every admitted new document.
    """
    _SENT = np.iinfo(np.int64).max
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        is_new = pa.array(ids % shard_mod == shard_mod - 1)
        prep = pa.table(
            {
                "text": t["text"],
                # sentinel instead of null: Ray's Min aggregate must
                # never see an all-null partition
                "new_id": pc.if_else(is_new, t["doc_id"], pa.scalar(_SENT, pa.int64())),
                "old_cnt": pc.cast(pc.invert(is_new), pa.int64()),
                "new_cnt": pc.cast(is_new, pa.int64()),
            }
        )
        return prep.group_by("text").aggregate(
            [("new_id", "min"), ("old_cnt", "sum"), ("new_cnt", "sum")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text")
        .aggregate(
            Min("new_id_min", alias_name="doc_id"),
            Sum("old_cnt_sum", alias_name="n_old"),
            Sum("new_cnt_sum", alias_name="n_new"),
        )
    )

    out_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_new_dups", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        keep = pc.and_(
            pc.equal(t["n_old"], pa.scalar(0, pa.int64())),
            pc.greater(t["n_new"], pa.scalar(0, pa.int64())),
        )
        f = t.filter(keep)
        return pa.table(
            {"doc_id": f["doc_id"], "n_new_dups": f["n_new"]}, schema=out_schema
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q_DEDUP_INCREMENTAL_SQL = """
WITH agg AS (
  SELECT text,
         MIN(CASE WHEN doc_id % 5 = 4 THEN doc_id END) AS doc_id,
         CAST(SUM(CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(SUM(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM documents GROUP BY text
)
SELECT doc_id, n_new AS n_new_dups FROM agg WHERE n_old = 0 AND n_new > 0
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup within k-means clusters (Abbas et al. 2023)
# ---------------------------------------------------------------------------

def q_semdedup(
    sf_dir: str, k: int = 8, iters: int = 3, threshold: float = 0.4,
    probes: int = 2,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with distributed k-means, then report near-duplicate
    pairs (cosine >= threshold) WITHIN each cluster only — the trick
    that turns the quadratic all-pairs sweep into k independent
    within-cluster sweeps.  Each vector is assigned to its ``probes``
    nearest clusters (IVF-style multi-probe; 1 = the paper's strict
    variant) — on this uniform-sphere corpus 2 probes lift recall
    0.33→0.76 at sf0.1 for 2x assignment rows.

    Scale shape: the k-means fit streams O(k·dim) partials per block
    per iteration (``similarity.kmeans_fit``); the assignment pass
    shuffles (cluster_id, vec_id, packed vector) once (``probes``
    rows per vector), each cluster's pairs are one vectorized matmul,
    and a (vec_a, vec_b) groupby collapses pairs found in two shared
    clusters.  At 100 TB the operator's contract is k ∝ N /
    target_cluster_size (SemDeDup's own recipe), so per-cluster work
    stays bounded and parallelism grows with the corpus.  Vectors ride
    the shuffle as ``large_binary`` (list-typed non-key columns break
    downstream ops — CLAUDE.md).  Cosine math is identical to
    ``q_embedding_neardup`` (normalized float64 matmul, 1e-6+1e-3 grid
    floor), so the reported pairs are a strict subset of the exact
    operator's — ``q_semdedup_check`` gates precision (subset) and
    recall."""
    from .similarity import kmeans_fit
    import ray

    centroids, _ = kmeans_fit(sf_dir, k=k, iters=iters)
    cent_ref = ray.put(centroids)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_column_matrix(t["embedding"]).astype(np.float64)
        # same distance math as the fit/_cluster_sizes pass
        d = (cents**2).sum(axis=1)[None, :] - 2.0 * (m @ cents.T)
        near = np.argsort(d, axis=1, kind="stable")[:, :probes]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        packed = pa.array([row.tobytes() for row in mn], pa.large_binary())
        rep = np.repeat(np.arange(len(ids)), probes)
        return pa.table(
            {
                "cluster_id": pa.array(near.reshape(-1).astype(np.int64)),
                "vec_id": pa.array(ids[rep]),
                "vec": packed.take(pa.array(rep)),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("vec_a", pa.int64()),
            pa.field("vec_b", pa.int64()),
            pa.field("cosine", pa.float64()),
        ]
    )

    def cluster_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2 or "vec_id" not in t.column_names:
            return out_schema.empty_table()
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack(
            [np.frombuffer(b, dtype=np.float64) for b in t["vec"].to_pylist()]
        )
        sims = m @ m.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = ids[ai] < ids[bj]
        return pa.table(
            {
                "vec_a": pa.array(ids[ai][keep].astype(np.int64)),
                "vec_b": pa.array(ids[bj][keep].astype(np.int64)),
                "cosine": pa.array(np.floor(sims[ai, bj][keep] * 1e6 + 1e-3) / 1e6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster_id")  # bounded key: k clusters by construction
        .map_groups(cluster_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])  # collapse pairs sharing 2 clusters
        .aggregate(Max("cosine", alias_name="cosine"))
    )


def q_semdedup_check(
    sf_dir: str, threshold: float = 0.4, min_recall: float = 0.5
) -> pa.Table:
    """Value-oracled gate for SemDeDup: every reported pair must be in
    the exact all-pairs >= threshold set (precision — guaranteed by
    construction, checked anyway), recall vs that exact set must clear
    ``min_recall`` (within-cluster-only misses cross-cluster pairs by
    design; uniform-sphere synthetic data is SemDeDup's worst case,
    clustered real embeddings recall far higher), and the exact-set
    size is recomputed independently by the SQL oracle's quadratic
    join."""
    sem = q_semdedup(sf_dir, threshold=threshold).to_pandas()
    exact = q_embedding_neardup(sf_dir, threshold=threshold).to_pandas()
    sem_set = set(zip(sem["vec_a"], sem["vec_b"]))
    exact_set = set(zip(exact["vec_a"], exact["vec_b"]))
    recall = len(sem_set & exact_set) / max(len(exact_set), 1)
    return pa.table(
        {
            "n_true_pairs": pa.array([len(exact_set)], pa.int64()),
            "precision_ok": pa.array([sem_set <= exact_set], pa.bool_()),
            "recall_ok": pa.array([recall >= min_recall], pa.bool_()),
        }
    )


Q_SEMDEDUP_CHECK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
       TRUE AS precision_ok, TRUE AS recall_ok
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


# ---------------------------------------------------------------------------
# Duplicated-substring fraction (ExactSubstr-lite, Lee et al. 2022)
# ---------------------------------------------------------------------------

_DSF_W = 16  # window length in codepoints


def q_dup_substring_fraction(sf_dir: str) -> ray.data.Dataset:
    """Per-document fraction of fixed-length (16-codepoint) substring
    windows that also appear in ANOTHER document — the cheap
    stride-1 flavor of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    high fraction marks a document assembled from corpus boilerplate
    even when no full-text dedup key matches.

    Scale shape: windows are sliced per batch with ONE vectorized
    ``utf8_slice_codeunits`` per offset (a doc never leaves its
    batch), deduplicated per doc by an Arrow group_by so the one
    shuffle moves distinct (window, doc_id, n_positions) rows — ~35 B
    each, never documents.  Cross-doc resolution uses the repo's
    coarse-bucket rule (CLAUDE.md): shuffle on ``hash(window) % 64``,
    ONE Arrow sort per bucket group, flat run-boundary masks mark
    windows spanning >= 2 docs.  Per-doc totals and dup counts merge
    via a union + doc_id groupby (no join).  At 100 TB swap stride 1
    for the paper's stride-k sampling by slicing every k-th offset —
    the plumbing is identical."""
    from ..functions.segments import bucket_grouped_str

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    w = _DSF_W

    acc_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_windows", pa.int64()), ("n_dup", pa.int64())]
    )

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        max_off = int(max(lens.max() - w + 1, 0)) if len(lens) else 0
        parts = []
        for i in range(max_off):
            valid = lens >= i + w
            if not valid.any():
                break
            sub = pc.utf8_slice_codeunits(t["text"], i, i + w)
            parts.append(
                pa.table(
                    {
                        "window": sub.filter(pa.array(valid)),
                        "doc_id": t["doc_id"].filter(pa.array(valid)),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "window": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "npos": pa.array([], pa.int64()),
                }
            )
        flat = pa.concat_tables(parts)
        g = flat.group_by(["window", "doc_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["window", "doc_id", "npos"])

    pairs = ds.map_batches(emit_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window" not in t.column_names:
            return acc_schema.empty_table()
        t = t.take(pc.sort_indices(t, sort_keys=[("window", "ascending")]))
        win = t["window"].combine_chunks()
        neq = pc.not_equal(
            win.slice(1), win.slice(0, len(win) - 1)
        ).to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], neq])
        run_of = np.cumsum(new) - 1
        lengths = np.bincount(run_of)
        keep = lengths[run_of] >= 2  # window present in >= 2 docs
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_windows": pa.array(np.zeros(int(keep.sum()), np.int64)),
                "n_dup": pc.cast(t["npos"], pa.int64()).filter(pa.array(keep)),
            },
            schema=acc_schema,
        )

    dups = bucket_grouped_str(pairs, "window").map_groups(
        resolve, batch_format="pyarrow"
    )

    def totals(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        nw = np.maximum(lens.astype(np.int64) - (w - 1), 0)
        keep = nw > 0
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_windows": pa.array(nw[keep]),
                "n_dup": pa.array(np.zeros(int(keep.sum()), np.int64)),
            },
            schema=acc_schema,
        )

    tot = ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_windows", pa.int64()),
            ("n_dup_positions", pa.int64()),
            ("dup_frac", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        nw = t["n_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_windows": pa.array(nw),
                "n_dup_positions": pa.array(nd),
                "dup_frac": pa.array(
                    np.floor(nd / nw.astype(np.float64) * 1e6) / 1e6
                ),
            },
            schema=out_schema,
        )

    return (
        tot.union(dups)
        .groupby("doc_id")
        .aggregate(
            Sum("n_windows", alias_name="n_windows"),
            Sum("n_dup", alias_name="n_dup"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


Q_DUP_SUBSTR_SQL = """
WITH w AS (
  SELECT doc_id, substring(text, i, 16) AS win, COUNT(*) AS npos
  FROM (SELECT doc_id, text, UNNEST(range(1, length(text) - 14)) AS i
        FROM documents WHERE length(text) >= 16)
  GROUP BY 1, 2
), d AS (
  SELECT win FROM w GROUP BY win HAVING COUNT(*) >= 2
), s AS (
  SELECT w.doc_id, SUM(w.npos) AS n_dup FROM w JOIN d USING (win)
  GROUP BY w.doc_id
)
SELECT t.doc_id,
       CAST(length(t.text) - 15 AS BIGINT) AS n_windows,
       CAST(COALESCE(s.n_dup, 0) AS BIGINT) AS n_dup_positions,
       FLOOR(COALESCE(s.n_dup, 0) / CAST(length(t.text) - 15 AS DOUBLE)
             * 1000000) / 1000000 AS dup_frac
FROM documents t LEFT JOIN s USING (doc_id)
WHERE length(t.text) >= 16
"""


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (SQL-matched)
# ---------------------------------------------------------------------------

_XSRC_SCHEMA = pa.schema(
    [
        pa.field("source_a", pa.string()),
        pa.field("source_b", pa.string()),
        pa.field("dup_pairs", pa.int64()),
    ]
)


def q_cross_source_dup_matrix(sf_dir: str) -> ray.data.Dataset:
    """Corpus-provenance diagnostic: for every unordered source pair
    ``(source_a <= source_b)``, the number of exact-duplicate document
    pairs whose two copies live in those sources (same-source pairs are
    ``C(c, 2)`` per duplicated text).  Web-curation use: a hot
    off-diagonal cell means two crawls/feeds overlap and one should be
    dropped before training-data mixing.

    Scale shape (100 TB): texts never leave their batch — each batch
    collapses to ``(text_hash, source, count)`` partials (fingerprint64,
    the same Horner hash the SQL oracle family uses; a collision would
    surface as a gate mismatch), the one shuffle moves those ~24 B rows
    keyed by ``hash % 64`` coarse buckets, and each bucket group resolves
    pair counts fully vectorized: lexsort, run-collapse, then one dense
    ``M.T @ M`` over a (runs x sources) count matrix — sources are a
    bounded key set, so the matmul side is tiny.  The final groupby is
    over <= S^2 source-pair keys.  No driver materialization."""
    from ..functions.text import fingerprint64

    ds = read_table(sf_dir, "documents", columns=["text", "source"])
    # reduce fan-out derived from cluster CPUs (driver-resolved so all
    # batches agree); results are invariant to nb
    nb = derive_buckets()

    def partial(t: pa.Table) -> pa.Table:
        h = fingerprint64(t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray) else t["text"]).view(np.int64)
        g = pa.table(
            {"h": pa.array(h, pa.int64()), "source": t["source"]}
        ).group_by(["h", "source"]).aggregate([("h", "count")])
        h2 = g["h"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (h2.view(np.uint64) % np.uint64(nb)).astype(
                        np.int64
                    )
                ),
                "h": g["h"],
                "source": g["source"],
                "c": pc.cast(g["h_count"], pa.int64()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False), dtype=object)
        u, codes = np.unique(src, return_inverse=True)
        order = np.lexsort((codes, h))
        h, c, codes = h[order], c[order], codes[order]
        # collapse duplicate (h, source) rows from different batches
        bnd = np.concatenate([[True], (h[1:] != h[:-1]) | (codes[1:] != codes[:-1])])
        idx = np.flatnonzero(bnd)
        c = np.add.reduceat(c, idx)
        h, codes = h[idx], codes[idx]
        # runs of equal text hash; keep only runs that can produce pairs
        hb = np.concatenate([[True], h[1:] != h[:-1]])
        run_id = np.cumsum(hb) - 1
        n_runs = run_id[-1] + 1 if h.size else 0
        rows_per_run = np.bincount(run_id, minlength=n_runs)
        dup_possible = (rows_per_run[run_id] > 1) | (c > 1)
        codes_k, c_k = codes[dup_possible], c[dup_possible]
        run_k = run_id[dup_possible]
        if run_k.size:
            # re-densify kept run ids, scatter counts into (runs x S)
            _, run_dense = np.unique(run_k, return_inverse=True)
            M = np.zeros((run_dense.max() + 1, u.size), dtype=np.int64)
            np.add.at(M, (run_dense, codes_k), c_k)
            cross = M.T @ M
            same = ((M * (M - 1)) // 2).sum(axis=0)
        else:
            cross = np.zeros((u.size, u.size), np.int64)
            same = np.zeros(u.size, np.int64)
        a_i, b_i = np.triu_indices(u.size, k=1)
        keep = cross[a_i, b_i] > 0
        sa = list(u[a_i[keep]]) + list(u[same > 0])
        sb = list(u[b_i[keep]]) + list(u[same > 0])
        p = np.concatenate([cross[a_i[keep], b_i[keep]], same[same > 0]])
        return pa.table(
            {
                "source_a": pa.array(sa, pa.string()),
                "source_b": pa.array(sb, pa.string()),
                "pairs": pa.array(p, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partials.groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
    agg = per_bucket.groupby(["source_a", "source_b"]).aggregate(
        Sum("pairs", alias_name="dup_pairs")
    )
    # sf0.01 has no exact-dup pairs at all: pin the empty-result schema
    # (Ray reports the upstream groupby's zero-column blocks otherwise)
    if agg.count() == 0:
        return ray.data.from_arrow(_XSRC_SCHEMA.empty_table())
    return agg.map_batches(_with_schema(_XSRC_SCHEMA), batch_format="pyarrow")


Q_CROSS_SOURCE_DUP_SQL = """
WITH g AS (
  SELECT text, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.source = b.source
                     THEN a.c * (a.c - 1) // 2
                     ELSE a.c * b.c END) AS BIGINT) AS dup_pairs
FROM g a JOIN g b ON a.text = b.text AND a.source <= b.source
GROUP BY 1, 2
HAVING SUM(CASE WHEN a.source = b.source
                THEN a.c * (a.c - 1) // 2
                ELSE a.c * b.c END) > 0
ORDER BY 1, 2
"""
