"""Subprocess smoke of the ``ray job submit``-able CLI: a fresh run
commits all partitions and prints the one-line JSON summary; an
immediate rerun (same output dir) skips every partition — the
resume-is-rerun contract from CLAUDE.md, exercised end-to-end through
argument parsing, session bootstrap and checkpoint state."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(inp, out):
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "run_extraction.py"),
            "--input", inp, "--output", out,
            "--partitions", "4", "--num-cpus", "4", "--concurrency", "2",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env=dict(os.environ, RAY_ADDRESS=""),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_run_and_resume(tmp_path):
    from medical_and_charity_document_extraction_system_ray.fixtures import (
        write_documents_parquet,
    )

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out")
    write_documents_parquet(inp, 60, seed=13)

    first = _run_cli(inp, out)
    assert first["skipped"] == [] and first["executed"]
    assert first["rows_total"] == 60

    second = _run_cli(inp, out)
    assert second["executed"] == []                     # nothing recomputed
    assert second["skipped"] == first["executed"]       # every partition resumes
    assert second["rows_total"] == 60                   # output unchanged
