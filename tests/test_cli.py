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


def test_cli_joins_cluster_from_ray_address():
    """Under ``ray job submit`` the submitter exports RAY_ADDRESS; the
    CLI must JOIN that cluster rather than silently booting a fresh
    single-node Ray inside the job driver (which would leave a
    multi-node cluster idle).  Resolution is a pure function -- pin
    every branch without paying a GCS connection timeout."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_extraction", os.path.join(REPO, "scripts", "run_extraction.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    resolve = mod.resolve_ray_init_kwargs

    # job-submit shape: RAY_ADDRESS exported -> join that cluster, and
    # no local-only kwargs leak into the connect call
    kw = resolve(None, 8, env={"RAY_ADDRESS": "10.0.0.5:6379"})
    assert kw["address"] == "10.0.0.5:6379"
    assert "num_cpus" not in kw and "include_dashboard" not in kw

    # explicit --address beats the environment
    kw = resolve("auto", 0, env={"RAY_ADDRESS": "10.0.0.5:6379"})
    assert kw["address"] == "auto"

    # unset OR empty RAY_ADDRESS -> local mode with the local-only kwargs
    for env in ({}, {"RAY_ADDRESS": ""}):
        kw = resolve(None, 4, env=env)
        assert kw["address"] == "local"
        assert kw["num_cpus"] == 4 and kw["include_dashboard"] is False
