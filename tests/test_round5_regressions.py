"""Round-5 regression tests for the ADVICE-flagged fixes
(pipelines/relational.py): orphan-FK handling in the blame_suppliers
name lookup and cross-block duplicate parent PKs in fk_audit.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def test_blame_suppliers_drops_orphan_suppkey(tmp_path):
    """A sole-R suppkey absent from the supplier table must be dropped
    (inner-join semantics), both for a key in a gap between supplier
    keys (searchsorted lands on a neighbour) and past the end of the
    key array (previously an IndexError / wrong-name attribution)."""
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_blame_suppliers,
    )

    li = [
        (1, 1, "R"), (1, 9, "N"),  # F, multi, sole R=1 -> blame Supp#1
        (2, 2, "R"), (2, 1, "N"),  # sole R=2: gap orphan (suppliers are 1,3)
        (3, 9, "R"), (3, 1, "N"),  # sole R=9: past-the-end orphan
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([x[0] for x in li], pa.int64()),
                "l_suppkey": pa.array([x[1] for x in li], pa.int64()),
                "l_returnflag": pa.array([x[2] for x in li], pa.string()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "F"], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 3], pa.int64()),
                "s_name": pa.array(["Supp#1", "Supp#3"], pa.string()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = (
        q_blame_suppliers(str(tmp_path))
        .to_pandas()
        .set_index("s_name")["n_blame"]
        .to_dict()
    )
    assert out == {"Supp#1": 1}


def test_fk_audit_duplicate_parent_across_blocks(tmp_path):
    """A parent PK duplicated across parquet files (separate read
    blocks, so the per-batch pc.unique combiner cannot collapse it)
    must not multiply child rows through the left join: the audit's
    global distinct keeps n_child exact."""
    from medical_and_charity_document_extraction_system_ray.pipelines.relational import (
        q_fk_audit,
    )

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 99], pa.int64()),  # 99 orphan
                "l_partkey": pa.array([10, 10, 10], pa.int64()),
                "l_suppkey": pa.array([5, 5, 5], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    # orders "table" is a directory of two files, each carrying the
    # SAME o_orderkey=1 row — a duplicated parent PK split across files
    odir = tmp_path / "orders.parquet"
    odir.mkdir()
    for i in range(2):
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1], pa.int64()),
                    "o_custkey": pa.array([7], pa.int64()),
                }
            ),
            str(odir / f"part-{i}.parquet"),
        )
    # precondition: the two files really land in separate blocks (the
    # scenario the global distinct exists for)
    nb = ray.data.read_parquet(str(odir)).materialize().num_blocks()
    assert nb >= 2, f"expected >=2 parent blocks, got {nb}"
    pq.write_table(
        pa.table({"p_partkey": pa.array([10], pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([5], pa.int64())}),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([7], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    out = q_fk_audit(str(tmp_path)).to_pandas().set_index("edge")
    # pre-fix: the duplicated parent key doubled the l_orderkey=1 child
    # partial through the join -> n_child=5; the global distinct keeps 3
    assert out.loc["lineitem->orders", "n_child"] == 3
    assert out.loc["lineitem->orders", "n_orphan"] == 1
    assert out.loc["orders->customer", "n_child"] == 2
    assert out.loc["orders->customer", "n_orphan"] == 0


def test_extract_documents_derived_default_pool(ray_session, tmp_path):
    """extract_documents with NO ocr_concurrency must derive the pool
    from the live session and complete on a small (4-CPU) session —
    the floor leaves headroom for the read/classify tasks and the
    reassembly shuffle (a pool holding every core starves it)."""
    import ray.data

    from medical_and_charity_document_extraction_system_ray.fixtures import (
        write_documents_parquet,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines import (
        extract_documents,
    )
    from medical_and_charity_document_extraction_system_ray.pipelines.extraction import (
        _default_ocr_concurrency,
    )

    assert 2 <= _default_ocr_concurrency() <= max(
        2, int(ray.cluster_resources()["CPU"])
    )
    docs = str(tmp_path / "docs.parquet")
    write_documents_parquet(docs, 40, seed=3)
    out = extract_documents(ray.data.read_parquet(docs)).take_all()
    assert len(out) == 40
    assert {r["processing_method"] for r in out} == {
        "direct_text_extraction", "ocr_pipeline",
    }
