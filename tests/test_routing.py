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
    assert loader.resident_route == "math"
    r2 = loader.ensure_loaded("math")
    assert r1 is r2  # sticky: no reload for the same route
    loader.ensure_loaded("code")
    assert loader.resident_route == "code"


def test_system_prompts_language_and_contract():
    en = system_prompt_for("math", "en")
    it = system_prompt_for("math", "it")
    assert "I don't know" in en
    assert "Non lo so" in it
    tr = system_prompt_for("translation", "en")
    assert "translat" in tr.lower()
    assert "I don't know" not in tr  # translation skips the contract
