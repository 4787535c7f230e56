"""retrieve_batch / ask_question_batch must match the per-query paths."""

import numpy as np
import pytest

from classmate_rag_tpu.metadata import normalize_cli_metadata


@pytest.fixture()
def rt(tmp_index_env, tmp_path):
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.pipeline.ingest import ingest_file

    reset_runtime()
    runtime = get_runtime(reload=True)
    docs = {
        "calc.md": "The derivative measures the rate of change. The chain "
                   "rule differentiates compositions of functions.",
        "linalg.md": "Eigenvalues characterize linear maps. Matrix "
                     "multiplication composes transformations.",
        "cook.md": "Boil pasta nine minutes in salted water with basil.",
    }
    for name, text in docs.items():
        f = tmp_path / name
        f.write_text(text)
        ingest_file(
            path=f,
            doc_meta=normalize_cli_metadata(
                course="math" if name != "cook.md" else "food"
            ),
            runtime=runtime,
        )
    yield runtime
    reset_runtime()


QUESTIONS = [
    "what is the derivative rate of change",
    "eigenvalues of linear transformations",
    "how long to boil pasta",
    "chain rule compositions",
]


@pytest.mark.parametrize("hybrid", [True, False])
def test_retrieve_batch_matches_per_query(rt, hybrid):
    # use_fused=False pins the multi-dispatch spec path — without it this
    # comparison would be fused-vs-fused and prove nothing.
    per_query = [
        rt.retriever.retrieve(
            question=q, top_k=3, hybrid=hybrid, use_fused=False
        )
        for q in QUESTIONS
    ]
    batched = rt.retriever.retrieve_batch(
        questions=QUESTIONS, top_k=3, hybrid=hybrid
    )
    for single, batch in zip(per_query, batched):
        assert [r["id"] for r in single] == [r["id"] for r in batch]
        for a, b in zip(single, batch):
            assert abs(a["scores"]["fused"] - b["scores"]["fused"]) < 1e-5


def test_retrieve_batch_with_filters(rt):
    batched = rt.retriever.retrieve_batch(
        questions=QUESTIONS[:2], filters={"course": "math"}, top_k=4,
    )
    for results in batched:
        for r in results:
            assert r["metadata"]["course"] == "math"


def test_retrieve_batch_empty_question(rt):
    batched = rt.retriever.retrieve_batch(
        questions=["derivative", "   "], top_k=3,
    )
    assert batched[0]
    assert batched[1] == []


def test_ask_question_batch_matches_single(rt):
    from classmate_rag_tpu.pipeline.ask import ask_question, ask_question_batch

    meta = normalize_cli_metadata()
    singles = [
        ask_question(question=q, filters=meta, top_k=3, runtime=rt)
        for q in QUESTIONS[:3]
    ]
    batch = ask_question_batch(
        questions=QUESTIONS[:3], filters=meta, top_k=3, runtime=rt
    )
    for s, b in zip(singles, batch):
        assert s.answer == b.answer
        assert s.sources == b.sources
        assert [r["id"] for r in s.retrieved] == [r["id"] for r in b.retrieved]
