"""Routing: classifier margins, router cascade, registry fallback, loader."""

import numpy as np
import pytest

from classmate_rag_tpu.embeddings.hashing import HashingEmbedder
from classmate_rag_tpu.routing import (
    DEFAULT_ROUTE,
    HybridRouter,
    StickyModelLoader,
    SubjectClassifier,
    get_model_spec,
    system_prompt_for,
)
from classmate_rag_tpu.routing.types import ROUTES


@pytest.fixture(scope="module")
def classifier():
    return SubjectClassifier(HashingEmbedder(dim=512))


def test_score_query_covers_all_routes(classifier):
    scores = classifier.score_query("solve the differential equation")
    assert set(scores) == set(ROUTES)
    assert scores["default"] == 0.0  # no prototype by design
    assert scores["math"] > scores["code"]


def test_classify_ambiguous_falls_to_default(classifier):
    res = classifier.classify_text("zqx wvut completely unrelated nonsense")
    assert res.subject == DEFAULT_ROUTE


def test_classify_chunks_samples_evenly(classifier):
    # Lexical overlap with the math seed phrases (the hashing test
    # embedder approximates similarity by shared tokens).
    chunks = ["calculus derivative integral limit equation"] * 30
    res = classifier.classify_chunks(chunks)
    assert res.subject == "math"


class TestRouterCascade:
    def _router(self, classifier, **kw):
        return HybridRouter(classifier=classifier, **kw)

    def test_forced_short_circuits(self, classifier):
        d = self._router(classifier).decide("whatever", forced_subject="code")
        assert d.route == "code"
        assert d.reason == "forced"

    def test_query_confident(self, classifier):
        d = self._router(classifier, query_margin=0.0001).decide(
            "prove the theorem by induction on n"
        )
        assert d.route == "math"
        assert d.reason == "query_confident"

    def test_metadata_override_when_ambiguous(self, classifier):
        metas = [{"subject": "code"}] * 8
        d = self._router(classifier, query_margin=0.99).decide(
            "ambiguous question", retrieved_metas=metas
        )
        assert d.route == "code"
        assert d.reason == "metadata_override"

    def test_ambiguous_default(self, classifier):
        d = self._router(classifier, query_margin=0.99).decide(
            "ambiguous question", retrieved_metas=[{}]
        )
        assert d.route == DEFAULT_ROUTE
        assert d.reason == "ambiguous_default"

    def test_translation_requires_intent(self, classifier):
        router = self._router(classifier, query_margin=0.0001)
        # Without an intent keyword the translation route demotes.
        d = router.decide("frase in lingua straniera qualsiasi")
        assert d.route != "translation" or d.reason == "translation_intent"
        d2 = router.decide("translate this text from English to Italian")
        if d2.route == "translation":
            assert d2.reason == "translation_intent"


def test_registry_falls_back_to_default(tmp_path, monkeypatch):
    default = tmp_path / "default.gguf"
    default.write_bytes(b"gguf")
    monkeypatch.setenv("ROUTE_DEFAULT_MODEL_PATH", str(default))
    monkeypatch.setenv("ROUTE_MATH_MODEL_PATH", str(tmp_path / "missing.gguf"))
    from classmate_rag_tpu.config import load_config

    cfg = load_config(reload=True)
    spec = get_model_spec("math", cfg)
    assert spec.route == DEFAULT_ROUTE
    assert spec.model_path == default
    load_config(reload=True)


def test_registry_raises_when_all_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("ROUTE_DEFAULT_MODEL_PATH", str(tmp_path / "no.gguf"))
    monkeypatch.setenv("ROUTE_MATH_MODEL_PATH", str(tmp_path / "no2.gguf"))
    from classmate_rag_tpu.config import load_config

    cfg = load_config(reload=True)
    with pytest.raises(FileNotFoundError):
        get_model_spec("math", cfg)
    load_config(reload=True)


def test_sticky_loader_single_resident(tmp_index_env):
    loader = StickyModelLoader(tmp_index_env)
    r1 = loader.ensure_loaded("math")
    r2 = loader.ensure_loaded("math")
    assert r1 is r2  # sticky: no reload for the same route
    # Residency keys on the RESOLVED spec (reference
    # rag/routing/loader.py:70-71): with no model files at all, every
    # route resolves to the same fallback — no eviction between routes.
    r3 = loader.ensure_loaded("code")
    assert r1 is r3


def test_system_prompts_language_and_contract():
    en = system_prompt_for("math", "en")
    it = system_prompt_for("math", "it")
    assert "I don't know" in en
    assert "Non lo so" in it
    tr = system_prompt_for("translation", "en")
    assert "translat" in tr.lower()
    assert "I don't know" not in tr  # translation skips the contract


def test_decide_batch_matches_per_question(classifier):
    """decide_batch (one classifier encode) must produce exactly the
    decisions of B decide() calls — same cascade, same scores."""
    router = HybridRouter(classifier)
    questions = [
        "solve the differential equation for x",
        "write a python function to sort a list",
        "translate this sentence into italian please",
        "zqx wvut completely unrelated nonsense",
        "",
    ]
    metas_list = [
        [{"subject": "math"}] * 5,
        [],
        [{"subject": "translation"}] * 3 + [{}],
        [{"subject": "code"}] * 2 + [{"subject": "math"}],
        [],
    ]
    batch = router.decide_batch(questions, metas_list)
    for q, metas, got in zip(questions, metas_list, batch):
        want = router.decide(q, retrieved_metas=metas)
        assert got.route == want.route, q
        assert got.reason == want.reason, q
        assert got.query_scores == want.query_scores, q
        assert got.meta_scores == want.meta_scores, q
    forced = router.decide_batch(questions, metas_list,
                                 forced_subject="code")
    assert all(d.route == "code" and d.reason == "forced" for d in forced)


def test_sticky_loader_keys_on_resolved_spec(tmp_index_env, monkeypatch):
    """When several routes fall back to the SAME default model, route
    changes must not evict/reload it (the reference compares the
    resolved spec's route+path, rag/routing/loader.py:70-71)."""
    from classmate_rag_tpu.config import load_config

    monkeypatch.setenv("LLM_BACKEND", "extractive")
    loader = StickyModelLoader(load_config(reload=True))
    r1 = loader.ensure_loaded("math")      # falls back (no model files)
    r2 = loader.ensure_loaded("default")
    r3 = loader.ensure_loaded("code")
    assert r1 is r2 is r3, "same resolved model must stay resident"


def test_hashing_underscore_tokens_are_unigrams():
    """'snake_case' must be a full-weight unigram, not half-weighted as
    a bigram, and must not collide with the real bigram 'snake case'
    (review finding r4 — the old '_' bigram separator conflated them)."""
    e = HashingEmbedder(dim=512)
    ident = e.encode_queries(["my_var my_var"])[0]
    spaced = e.encode_queries(["my var my var"])[0]
    # Distinct texts must not hash to near-identical vectors through a
    # separator collision (unigram 'my_var' vs bigram my+var).
    assert float(ident @ spaced) < 0.9
    # An underscore unigram matches itself at full weight: similarity of
    # identical identifier-heavy texts stays 1.0.
    again = e.encode_queries(["my_var my_var"])[0]
    assert abs(float(ident @ again) - 1.0) < 1e-6
