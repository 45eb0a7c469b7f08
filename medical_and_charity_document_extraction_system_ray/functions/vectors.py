"""Vector-column helpers shared by the similarity / dedup pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_column_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """``[n, dim]`` float64 matrix from a fixed-dim ``list<float>``
    column.

    ``pc.list_flatten`` + one reshape — no per-row ``to_pylist`` /
    ``np.stack`` (which builds n python lists and is ~10x slower in the
    per-batch scoring hot path).  ``list_flatten`` honours slice offsets
    so sliced/zero-copy batches are safe.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.float64)
    vals = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    if vals.size % n:
        raise ValueError(
            f"ragged embedding column: {vals.size} values / {n} rows"
        )
    return vals.reshape(n, vals.size // n).astype(np.float64)
