"""Driver-contract invariants for ``__ray_entry__.py``: every oracled
query exists, the rows-only set is exactly the documented one, and
``entry()`` produces the flagship result on sf0.001 (the driver's smoke
shape — Ray already initialised by the session fixture, never by the
module)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

# rows-only by documented design: probabilistic / layout ops, each
# shadowed by a value-oracled gate query (see COVERAGE.md)
ROWS_ONLY = {
    "approx_distinct_users",
    "hll_distinct_users",
    "kmeans_clusters",
    "cms_token_counts",
    "heavy_hitters",
    "knn_ivf",
    "knn_pq",
    "media_features",
    "page_regions",
    "image_phash_neardup",
    "hll_overlap",
    "audio_fp_neardup",
    "semdedup",
    "pca_project",
    "approx_quantiles",
}


def test_oracle_keys_cover_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle for unknown query"
    assert set(q) - set(o) == ROWS_ONLY, (
        "every query needs an oracle unless documented rows-only; "
        f"diff={sorted(set(q) - set(o) - ROWS_ONLY)}"
    )
    # each rows-only op keeps a value-oracled companion gate
    for gate in ("approx_distinct_check", "knn_ivf_recall", "knn_pq_recall",
                 "media_features_geometry", "page_regions_check",
                 "heavy_hitters_check", "hll_check", "kmeans_check", "cms_check",
                 "image_phash_check", "hll_overlap_check", "audio_fp_check",
                 "semdedup_check", "pca_check"):
        assert gate in o, f"missing companion gate {gate}"


def test_entry_smoke():
    res = entrymod.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) >= 0
    assert list(df.columns), "entry() result must have a stable schema"
