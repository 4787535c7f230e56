"""Smoke tests for the tools/ harnesses (in-process, CPU platform)."""

import json
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parents[1] / "tools"
sys.path.insert(0, str(TOOLS))


@pytest.fixture()
def corpus(tmp_index_env, tmp_path):
    from classmate_rag_tpu.pipeline.runtime import reset_runtime

    reset_runtime()
    doc = tmp_path / "doc.md"
    doc.write_text(
        "Stochastic gradient descent updates weights using noisy gradient "
        "estimates. Momentum accelerates convergence along stable directions."
    )
    yield doc
    reset_runtime()


def _run_tool(module_name, argv, capsys, monkeypatch):
    import importlib

    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name] + argv)
    assert mod.main() == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_bench_ingest(corpus, capsys, monkeypatch):
    res = _run_tool("bench_ingest", [str(corpus), "--repeat", "2"],
                    capsys, monkeypatch)
    assert res["total_chunks"] == 2
    assert res["chunks_per_sec"] > 0


def test_bench_ask_retrieval_only(corpus, capsys, monkeypatch):
    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline import ingest_file

    ingest_file(path=corpus, doc_meta=normalize_cli_metadata(course="ml"))
    res = _run_tool(
        "bench_ask",
        ["what does momentum do", "--n", "3", "--retrieval-only"],
        capsys, monkeypatch,
    )
    assert res["n"] == 3
    assert res["mean_ms"] > 0
    assert len(res["per_ask_ms"]) == 3
