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


def test_bench_product_stage_smoke(tmp_path, monkeypatch):
    """bench.py's end-to-end product stage at toy scale: fresh child
    processes cold-start the Runtime from the persisted index, answer
    asks, and the /add probe persists O(delta) without rewriting the
    base artifacts."""
    # Children are fresh interpreters: pin them to CPU (env works there
    # because it is set before python starts, with the axon pool
    # disabled).
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("EMBEDDING_BACKEND", "hash")
    sys.path.insert(0, str(TOOLS.parent))
    import bench

    monkeypatch.setattr(bench, "PRODUCT_ASKS", 3)
    res = bench.run_product_stage(1200)
    assert res["n_rows"] == 1200
    assert res["answer_nonempty"]
    assert res["retrieved_k"] > 0
    assert res["ask_p95_ms"] > 0
    assert res["cold_scan_start_s"] > 0
    assert not res["persist_rewrote_base"]
    assert 0 < res["persist_delta_bytes"] < 1_000_000


def test_bench_ingest(corpus, capsys, monkeypatch):
    res = _run_tool("bench_ingest", [str(corpus), "--repeat", "2"],
                    capsys, monkeypatch)
    assert res["total_chunks"] == 2
    assert res["chunks_per_sec"] > 0


def test_train_encoder_end_to_end(tmp_index_env, tmp_path, capsys,
                                  monkeypatch):
    """tools/train_encoder.py over a tiny ingested corpus: pairs mined
    from the catalog, a few dp×tp steps on the virtual mesh, eval metrics
    reported, checkpoint written, resume picks the step back up."""
    from classmate_rag_tpu.metadata import normalize_cli_metadata
    from classmate_rag_tpu.pipeline import ingest_file
    from classmate_rag_tpu.pipeline.runtime import reset_runtime

    reset_runtime()
    words = ("gradient descent momentum convergence eigenvalue matrix "
             "derivative integral limit probability entropy kernel").split()
    for d in range(10):
        doc = tmp_path / f"doc{d}.md"
        doc.write_text("\n\n".join(
            f"The {words[(d + i) % len(words)]} of the "
            f"{words[(d + 2 * i + 1) % len(words)]} determines the "
            f"{words[(d + 3 * i + 2) % len(words)]} in lecture {i}. "
            f"It follows that {words[(d + i + 5) % len(words)]} bounds "
            f"the {words[(d + i + 7) % len(words)]}."
            for i in range(30)
        ))
        ingest_file(path=doc, doc_meta=normalize_cli_metadata(course="ml"))
    reset_runtime()

    ckpt = tmp_path / "ckpt"
    argv = ["--steps", "4", "--batch", "8", "--seq-len", "32",
            "--eval-every", "2", "--eval-batches", "1",
            "--config", "small_test", "--checkpoint-dir", str(ckpt),
            "--checkpoint-every", "2"]
    res = _run_tool("train_encoder", argv, capsys, monkeypatch)
    assert res["done"] and res["steps"] == 4
    assert res["checkpoint"] and Path(res["checkpoint"]).exists()
    assert 0.0 <= res["eval_acc"] <= 1.0

    # Resume: with steps already reached, the driver must restore step 4
    # and exit without training further.
    import importlib

    mod = importlib.import_module("train_encoder")
    monkeypatch.setattr(sys, "argv", ["train_encoder"] + argv + ["--resume"])
    assert mod.main() == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert any(l.get("resumed_from") for l in lines)
    assert lines[-1]["steps"] == 4


def test_bench_embed_tiny(capsys, monkeypatch):
    res = _run_tool(
        "bench_embed",
        ["--tiny", "--batch", "8", "--seq", "32", "--iters", "2"],
        capsys, monkeypatch,
    )
    assert res["chunks_per_sec"] > 0 and res["mfu"] >= 0


def test_bench_decode_tiny(capsys, monkeypatch):
    res = _run_tool(
        "bench_decode",
        ["--batch", "2", "--prompt", "8", "--new", "4", "--hidden", "64"],
        capsys, monkeypatch,
    )
    assert res["decode_tokens_per_sec"] > 0


def test_bench_serve_http_load(tmp_index_env, capsys, monkeypatch):
    """tools/bench_serve.py end to end: synthetic corpus → HTTP daemon →
    concurrent /ask clients → QPS/latency JSON with zero errors."""
    from classmate_rag_tpu.pipeline.runtime import reset_runtime

    reset_runtime()
    try:
        res = _run_tool(
            "bench_serve",
            ["--clients", "4", "--seconds", "1.5", "--warmup-seconds",
             "1.0", "--port", "8199", "--synthetic", "128"],
            capsys, monkeypatch,
        )
    finally:
        reset_runtime()
    assert res["errors"] == 0
    assert res["requests"] > 0
    assert res["http_ask_qps"] > 0
    assert res["p95_ms"] > 0


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
