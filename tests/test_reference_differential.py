"""Differential fuzz vs LIVE reference modules (beyond the chunker).

tests/test_chunker_differential.py already locks chunker byte-compat by
importing the real reference chunker. This file extends the same
technique to every other reference module that is importable offline
(stdlib/numpy-pure, loaded by file path with stubs for its heavyweight
package imports): stable IDs, near-dup filtering, citation post-
processing, context formatting, MMR ordering, RRF fusion, and neighbor
expansion. Each test feeds both implementations hundreds of seeded
random inputs and requires equal outputs — the parity claims in
PARITY.md are enforced by CI, not prose.

All tests skip cleanly when /root/reference is absent.
"""

import importlib.util
import json
import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference checkout not present"
)


def _load_ref(relpath: str, name: str, stubs: dict | None = None):
    """Import a reference module by file path, with optional sys.modules
    stubs standing in for its heavyweight imports (torch, chromadb...)."""
    inserted = []
    for mod_name, attrs in (stubs or {}).items():
        if mod_name in sys.modules:
            # Another fixture's stub is live (module-scoped teardown):
            # graft the attrs it lacks onto it instead of skipping.
            for k, v in attrs.items():
                if not hasattr(sys.modules[mod_name], k):
                    setattr(sys.modules[mod_name], k, v)
            continue
        mod = types.ModuleType(mod_name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[mod_name] = mod
        inserted.append(mod_name)
    spec = importlib.util.spec_from_file_location(name, REF_ROOT / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        for m in inserted + [name]:
            sys.modules.pop(m, None)
        raise
    return mod, inserted + [name]


@pytest.fixture(scope="module")
def ref_ids():
    mod, names = _load_ref("rag/utils/ids.py", "_ref_ids")
    yield mod
    for n in names:
        sys.modules.pop(n, None)


@pytest.fixture(scope="module")
def ref_dedup():
    mod, names = _load_ref("rag/utils/dedup.py", "_ref_dedup")
    yield mod
    for n in names:
        sys.modules.pop(n, None)


@pytest.fixture(scope="module")
def ref_post():
    mod, names = _load_ref("rag/generation/post.py", "_ref_post")
    yield mod
    for n in names:
        sys.modules.pop(n, None)


@pytest.fixture(scope="module")
def ref_prompting():
    mod, names = _load_ref("rag/generation/prompting.py", "_ref_prompting")
    yield mod
    for n in names:
        sys.modules.pop(n, None)


@pytest.fixture(scope="module")
def ref_fusion():
    # fusion.py imports the embedder and both stores at module scope; only
    # rrf_fuse/_mmr_order are exercised, so stub those imports.
    stubs = {
        "rag": {},
        "rag.embeddings": {"E5MultilingualEmbedder": object},
        "rag.retrieval": {},
        "rag.retrieval.vector_chroma": {
            "ChromaVectorStore": object,
            "build_where_filter": lambda *a, **k: None,
        },
        "rag.retrieval.bm25": {"BM25Store": object},
    }
    mod, names = _load_ref("rag/retrieval/fusion.py", "_ref_fusion", stubs)
    yield mod
    for n in names:
        sys.modules.pop(n, None)


@pytest.fixture()
def ref_expand(ref_ids, tmp_path, monkeypatch):
    """Reference expand reads ./indexes/bm25/bm25_index.jsonl relative to
    CWD — run it from a temp dir the test populates."""
    stubs = {
        "rag": {},
        "rag.utils": {"stable_chunk_id": ref_ids.stable_chunk_id},
    }
    mod, names = _load_ref("rag/retrieval/expand.py", "_ref_expand", stubs)
    monkeypatch.chdir(tmp_path)
    yield mod
    for n in names:
        sys.modules.pop(n, None)


# ---------------------------------------------------------------------------
# stable_chunk_id
# ---------------------------------------------------------------------------

def test_stable_chunk_id_differential(ref_ids):
    from classmate_rag_tpu.utils.ids import stable_chunk_id

    rng = random.Random(42)
    paths = [
        "notes.txt", "dir sub/Lec 2.pdf", "unicodé/città.md",
        "/abs/path/file.docx", "./rel/../rel/file.epub", "UPPER.PDF",
    ]
    courses = [None, "", "cs101", "Analisi Matematica", "a b"]
    for _ in range(300):
        kwargs = dict(
            source_path=rng.choice(paths),
            page=rng.randint(0, 999),
            chunk_index=rng.randint(0, 5000),
            course=rng.choice(courses),
            unit=rng.choice(courses),
        )
        assert stable_chunk_id(**kwargs) == ref_ids.stable_chunk_id(**kwargs)


# ---------------------------------------------------------------------------
# dedup_text_blocks
# ---------------------------------------------------------------------------

def test_dedup_differential(ref_dedup):
    from classmate_rag_tpu.utils.dedup import dedup_text_blocks

    rng = random.Random(7)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau").split()

    def block():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))

    for trial in range(40):
        blocks = []
        for _ in range(rng.randint(2, 15)):
            if blocks and rng.random() < 0.5:
                # near-duplicate of an earlier block with light mutation
                base = rng.choice(blocks).split()
                if rng.random() < 0.5 and len(base) > 4:
                    base[rng.randrange(len(base))] = rng.choice(vocab)
                blocks.append(" ".join(base))
            else:
                blocks.append(block())
        for thr in (0.92, 0.5, 0.99):
            assert dedup_text_blocks(blocks, jaccard_threshold=thr) == \
                ref_dedup.dedup_text_blocks(blocks, jaccard_threshold=thr), \
                f"trial {trial} thr {thr}"


# ---------------------------------------------------------------------------
# enforce_citations
# ---------------------------------------------------------------------------

def test_enforce_citations_differential(ref_post):
    from classmate_rag_tpu.generation.post import enforce_citations

    rng = random.Random(11)
    frags = ["The answer", "is", "therefore", "see", "la risposta", "è",
             "quindi", "compute", "x + y", "\n\n", "  ", "."]
    for trial in range(200):
        n_prov = rng.randint(0, 4)
        prov = [f"/src/doc{i}.pdf" for i in range(n_prov)]
        parts = []
        for _ in range(rng.randint(1, 25)):
            r = rng.random()
            if r < 0.3:
                parts.append(f"[{rng.randint(0, n_prov + 3)}]")
            elif r < 0.4:
                parts.append(f"[{rng.randint(1, 9)}] [{rng.randint(1, 9)}]")
            else:
                parts.append(rng.choice(frags))
        answer = " ".join(parts)
        for add_block in (False, True):
            for title in ("Sources", "Fonti"):
                got = enforce_citations(
                    answer, prov, add_sources_block=add_block,
                    sources_title=title,
                )
                want = ref_post.enforce_citations(
                    answer, prov, add_sources_block=add_block,
                    sources_title=title,
                )
                assert got == want, f"trial {trial}: {answer!r}"


# ---------------------------------------------------------------------------
# format_context_blocks (incl. the prov-before-budget-break quirk)
# ---------------------------------------------------------------------------

def test_format_context_blocks_differential(ref_prompting):
    from classmate_rag_tpu.generation.prompting import format_context_blocks

    rng = random.Random(23)
    for trial in range(120):
        retrieved = []
        for i in range(rng.randint(0, 8)):
            doc = " ".join(
                f"w{rng.randint(0, 50)}" for _ in range(rng.randint(0, 120))
            )
            meta = {}
            if rng.random() < 0.8:
                meta["source_path"] = f"/d/doc{rng.randint(0, 3)}.txt"
            retrieved.append({
                "id": f"c{i}",
                "document": doc if rng.random() < 0.9 else "",
                "metadata": meta,
            })
        for budget in (None, 50, 200, 2000):
            got = format_context_blocks(retrieved, max_total_chars=budget)
            want = ref_prompting.format_context_blocks(
                retrieved, max_total_chars=budget
            )
            assert got == want, f"trial {trial} budget {budget}"


def test_grounded_and_general_messages_differential(ref_prompting):
    from classmate_rag_tpu.generation.prompting import (
        build_general_messages, build_grounded_messages,
    )

    for q, ctx in [
        ("what is x", "[1] some context"),
        ("domanda", ""),
        ("q " * 50, "[1] a\n[2] b"),
    ]:
        for cit in (True, False):
            assert build_grounded_messages(
                question=q, context_text=ctx, citations_required=cit
            ) == ref_prompting.build_grounded_messages(
                question=q, context_text=ctx, citations_required=cit
            )
        assert build_general_messages(q) == \
            ref_prompting.build_general_messages(q)


# ---------------------------------------------------------------------------
# MMR ordering
# ---------------------------------------------------------------------------

def test_mmr_order_differential(ref_fusion):
    import jax.numpy as jnp

    from classmate_rag_tpu.ops.mmr import mmr_order

    rng = np.random.default_rng(5)
    for trial in range(60):
        p = int(rng.integers(1, 25))
        d = 16
        k = int(rng.integers(1, 9))
        cands = rng.standard_normal((p, d)).astype(np.float32)
        cands /= np.linalg.norm(cands, axis=1, keepdims=True)
        q = rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)

        want = ref_fusion._mmr_order(
            q, cands, [f"i{j}" for j in range(p)], k, 0.5
        )
        got = np.asarray(mmr_order(
            jnp.asarray(q), jnp.asarray(cands), jnp.ones(p, bool), k, 0.5
        ))
        got = [int(x) for x in got if x >= 0]
        assert got == list(want), f"trial {trial}: {got} vs {want}"


# ---------------------------------------------------------------------------
# RRF fusion + merge ordering
# ---------------------------------------------------------------------------

def test_rrf_merge_differential(ref_fusion):
    """Our fused scores and output order must match rrf_fuse + the
    reference retriever's merge/sort (fusion.py:132-167): sort key
    (fused, −vector_distance) descending, missing branches scored None."""
    import jax.numpy as jnp

    from classmate_rag_tpu.ops.fusion import rrf_merge

    rng = np.random.default_rng(9)
    for trial in range(80):
        n_universe = int(rng.integers(10, 40))
        kv = int(rng.integers(1, 9))
        kb = int(rng.integers(1, 9))
        vec = list(rng.choice(n_universe, size=kv, replace=False))
        bm = list(rng.choice(n_universe, size=kb, replace=False))
        vec_dist = np.sort(rng.random(kv)).astype(np.float32)  # ranked
        bm_scores = np.sort(rng.random(kb))[::-1].astype(np.float32)
        w_v = float(rng.choice([1.0, 0.5, 2.0]))
        w_b = float(rng.choice([1.0, 0.3]))
        rrf_k = int(rng.choice([60, 10]))
        top_k = int(rng.integers(1, 9))

        fused = ref_fusion.rrf_fuse(
            rank_lists=[[f"i{i}" for i in vec], [f"i{i}" for i in bm]],
            weights=[w_v, w_b], rrf_k=rrf_k,
        )
        # Reference merge: dict insertion order = vec then bm; stable sort
        # by (fused, -distance or 0) descending (fusion.py:159-166).
        by_id = {}
        for rank, i in enumerate(vec):
            by_id[i] = {"fused": fused[f"i{i}"], "vd": float(vec_dist[rank])}
        for i in bm:
            by_id.setdefault(i, {"fused": fused[f"i{i}"], "vd": None})
        ranked = sorted(
            by_id.items(),
            key=lambda kvp: (
                kvp[1]["fused"],
                -(kvp[1]["vd"] if kvp[1]["vd"] is not None else 0.0),
            ),
            reverse=True,
        )
        want_rows = [i for i, _ in ranked[:top_k]]

        rows, got_fused, vdist, bscore = rrf_merge(
            jnp.asarray(vec, jnp.int32), jnp.asarray(bm, jnp.int32),
            jnp.asarray(vec_dist), jnp.asarray(bm_scores),
            w_v, w_b, rrf_k, top_k,
        )
        rows = [int(r) for r in np.asarray(rows) if r >= 0]
        assert rows == want_rows, f"trial {trial}: {rows} vs {want_rows}"
        for pos, i in enumerate(rows):
            assert abs(float(np.asarray(got_fused)[pos]) - by_id[i]["fused"]) < 1e-6


# ---------------------------------------------------------------------------
# BM25 tokenizer semantics (regex, stopwords, 1-char drop)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_bm25():
    """Load the reference BM25 module with rank_bm25 + the langdetect-
    backed lang module stubbed (only the tokenizer path is exercised)."""
    stubs = {
        "rank_bm25": {"BM25Okapi": object},
        "rag": {},
        "rag.utils": {},
        "rag.utils.lang_detect": {"detect_lang_tag": lambda t: "en"},
    }
    mod, names = _load_ref("rag/retrieval/bm25.py", "_ref_bm25", stubs)
    yield mod
    for n in names:
        sys.modules.pop(n, None)


def test_bm25_tokenizer_differential(ref_bm25):
    from classmate_rag_tpu.index.lexical import tokenize

    rng = random.Random(13)
    pieces = [
        "The derivative of f(x)=x^2", "perché è così", "l'aquila",
        "naïve café", "x+y=z", "ÀÖØö è 123 abc", "CaPiTaLs",
        "a an the and but", "un uno una gli", "", "   ", "e-mail",
        "don't", "中文 текст abc", "perche quando dove",
    ]
    for trial in range(120):
        text = " ".join(rng.choice(pieces)
                        for _ in range(rng.randint(0, 8)))
        for lang in ("en", "it", "EN", "It", None, "de"):
            want = ref_bm25._tokenize(text, lang)
            got = tokenize(text, lang)
            assert got == want, f"trial {trial} lang={lang}: {text!r}"


def test_stopword_sets_byte_equal(ref_bm25):
    from classmate_rag_tpu.index.lexical import STOPWORDS_EN, STOPWORDS_IT

    assert set(STOPWORDS_EN) == set(ref_bm25._STOP_EN)
    assert set(STOPWORDS_IT) == set(ref_bm25._STOP_IT)


# ---------------------------------------------------------------------------
# Metadata schema: subject aliases + sentinel stripping
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_schema():
    mod, names = _load_ref("rag/metadata/schema.py", "_ref_schema")
    yield mod
    for n in names:
        sys.modules.pop(n, None)


def test_normalize_cli_metadata_differential(ref_schema):
    from classmate_rag_tpu.metadata import normalize_cli_metadata

    rng = random.Random(37)
    subjects = [None, "", "math", "Matematica", "MATHS", "informatica",
                "coding", "programming", "translation", "traduzione",
                "geometry", "algebra ", " Analisi", "other", "bogus"]
    langs = [None, "en", "it", "auto", "EN"]
    dts = [None, "pdf", "epub", "other", "auto"]
    for trial in range(150):
        kwargs = dict(
            course=rng.choice([None, "", "cs101", " CS101 "]),
            unit=rng.choice([None, "u1", ""]),
            language=rng.choice(langs),
            doc_type=rng.choice(dts),
            author=rng.choice([None, "Ada", ""]),
            semester=rng.choice([None, "2024F"]),
            tags=rng.choice([None, [], ["Week 1", "week-1"],
                             ["A B", "a_b", "x!"]]),
            subject=rng.choice(subjects),
        )
        try:
            want = ref_schema.normalize_cli_metadata(**kwargs)
            want_err = None
        except Exception as exc:
            want, want_err = None, type(exc).__name__
        try:
            got = normalize_cli_metadata(**kwargs)
            got_err = None
        except Exception as exc:
            got, got_err = None, type(exc).__name__
        assert got_err == want_err, f"trial {trial}: {kwargs}"
        if want is not None:
            # Representation differs by design (ours strips None keys and
            # flattens enums — the sentinel invariant); compare EFFECTIVE
            # content: key -> flattened value for populated fields.
            def effective(d):
                out = {}
                for k, v in d.items():
                    if v in (None, "", []):
                        continue
                    v = getattr(v, "value", v)
                    out[k] = [str(x) for x in v] if isinstance(v, list) \
                        else str(v)
                return out

            assert effective(got.to_dict()) == effective(want.to_dict()), \
                f"trial {trial}: {kwargs}\n{got.to_dict()}\nvs\n{want.to_dict()}"


# ---------------------------------------------------------------------------
# Loader doc-type inference
# ---------------------------------------------------------------------------

def test_infer_doc_type_differential():
    # Loading __init__.py by path makes "_ref_loaders" a package, so its
    # RELATIVE imports resolve as "_ref_loaders.<sub>" — stub those names.
    stubs = {
        "_ref_loaders.html_readable": {"load_html_readable": lambda *a: []},
        "_ref_loaders.csv_bullets": {"load_csv_bullets": lambda *a: []},
        "_ref_loaders.epub_loader": {"load_epub": lambda *a: []},
    }
    mod, names = _load_ref("rag/loaders/__init__.py", "_ref_loaders", stubs)
    try:
        from classmate_rag_tpu.loaders import infer_doc_type_from_path

        cases = [
            "a.pdf", "b.PDF", "notes.markdown", "x.md", "y.TXT", "z.text",
            "p.pptx", "q.ppt", "d.docx", "w.htm", "w.HTML", "t.csv",
            "e.epub", "noext", "weird.xyz", "dir.name/file.tar.gz",
            "u.doc",
        ]
        for p in cases:
            assert infer_doc_type_from_path(p) == \
                mod.infer_doc_type_from_path(p), p
    finally:
        for n in names:
            sys.modules.pop(n, None)


# ---------------------------------------------------------------------------
# Admin filter matching (_matches_simple: equality + tag_* flags)
# ---------------------------------------------------------------------------

def test_matches_simple_differential(ref_schema):
    stubs = {
        "rag": {},
        "rag.metadata": {
            "DocumentMetadata": ref_schema.DocumentMetadata,
        },
    }
    mod, names = _load_ref("rag/admin/manage.py", "_ref_manage", stubs)
    try:
        from classmate_rag_tpu.admin.manage import _matches_simple

        rng = random.Random(53)
        metas = []
        for _ in range(20):
            m = {}
            if rng.random() < 0.8:
                m["course"] = rng.choice(["cs101", "CS101 ", "", "math"])
            if rng.random() < 0.5:
                m["language"] = rng.choice(["en", "it"])
            for t in ("week1", "lab", "a_b"):
                if rng.random() < 0.4:
                    m[f"tag_{t}"] = True
            metas.append(m)
        wheres = [
            {}, {"course": "cs101"}, {"course": " cs101 "},
            {"course": None}, {"language": "en", "course": "cs101"},
            {"tags": "week1"}, {"tags": ["week1", "lab"]},
            {"tags": "Week1, LAB"}, {"tags": []},
            {"missing_field": "x"}, {"course": ""},
        ]
        for meta in metas:
            for where in wheres:
                assert _matches_simple(meta, where) == \
                    mod._matches_simple(meta, where), f"{meta} vs {where}"
    finally:
        for n in names:
            sys.modules.pop(n, None)


# ---------------------------------------------------------------------------
# Routing cascade (forced → query-confident → metadata → default,
# translation-intent guard)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_router():
    """Load the reference router AS part of a synthetic 'rag.routing'
    package (it uses relative imports), with the torch-backed classifier
    module stubbed and types/prototypes loaded live."""
    pkg_rag = types.ModuleType("rag")
    pkg_routing = types.ModuleType("rag.routing")
    pkg_routing.__path__ = [str(REF_ROOT / "rag" / "routing")]
    clf = types.ModuleType("rag.routing.classifier")
    clf.SubjectClassifier = object
    inserted = []
    for name, mod in [("rag", pkg_rag), ("rag.routing", pkg_routing),
                      ("rag.routing.classifier", clf)]:
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
    loaded = []
    try:
        for sub in ("types", "prototypes", "router"):
            name = f"rag.routing.{sub}"
            spec = importlib.util.spec_from_file_location(
                name, REF_ROOT / "rag" / "routing" / f"{sub}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            loaded.append(name)
            spec.loader.exec_module(mod)
        yield sys.modules["rag.routing.router"]
    finally:
        for n in inserted + loaded:
            sys.modules.pop(n, None)


class _StubClassifier:
    def __init__(self, scores):
        self.scores = scores

    def score_query(self, question):
        return dict(self.scores)


@pytest.fixture(scope="module")
def ref_classifier():
    """Load the reference classifier with rag.embeddings stubbed (its E5
    wrapper imports torch) and types/prototypes live."""
    pkg_rag = types.ModuleType("rag")
    pkg_routing = types.ModuleType("rag.routing")
    pkg_routing.__path__ = [str(REF_ROOT / "rag" / "routing")]
    emb = types.ModuleType("rag.embeddings")
    emb.E5MultilingualEmbedder = object
    inserted = []
    for name, mod in [("rag", pkg_rag), ("rag.routing", pkg_routing),
                      ("rag.embeddings", emb)]:
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
    loaded = []
    try:
        for sub in ("types", "prototypes", "classifier"):
            name = f"rag.routing.{sub}"
            spec = importlib.util.spec_from_file_location(
                name, REF_ROOT / "rag" / "routing" / f"{sub}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            loaded.append(name)
            spec.loader.exec_module(mod)
        yield sys.modules["rag.routing.classifier"]
    finally:
        for n in inserted + loaded:
            sys.modules.pop(n, None)


class _FakeEmbedder:
    """Deterministic per-(prefix, text) unit vectors — identical on both
    sides, so prototype construction/cosines/margins are comparable."""

    def _vec(self, prefix, text):
        import hashlib

        seed = int.from_bytes(
            hashlib.blake2b(f"{prefix}|{text}".encode(),
                            digest_size=4).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(32).astype(np.float32)
        return v / np.linalg.norm(v)

    def encode_queries(self, texts):
        return np.stack([self._vec("q", t) for t in texts])

    def encode_passages(self, texts):
        return np.stack([self._vec("p", t) for t in texts])


def test_prototype_seed_phrases_byte_equal(ref_classifier):
    """The seed phrases are behavioral constants (a paraphrase changes
    the E5 prototype vector and therefore routing decisions)."""
    ref_proto = sys.modules["rag.routing.prototypes"]
    from classmate_rag_tpu.routing.prototypes import (
        SUBJECT_PROTOTYPES, TRANSLATION_INTENT_KEYWORDS,
    )

    assert SUBJECT_PROTOTYPES == ref_proto.SUBJECT_PROTOTYPES
    assert tuple(TRANSLATION_INTENT_KEYWORDS) == tuple(
        ref_proto.TRANSLATION_INTENT_KEYWORDS
    )


def test_route_prompts_byte_equal():
    """The per-route prompt contracts are behavioral constants: the
    routed models answer against these exact strings and the unknown
    detector keys off the exact 'I don't know'/'Non lo so' phrasing."""
    pkg_rag = types.ModuleType("rag")
    pkg_routing = types.ModuleType("rag.routing")
    pkg_routing.__path__ = [str(REF_ROOT / "rag" / "routing")]
    inserted = []
    for name, mod in [("rag", pkg_rag), ("rag.routing", pkg_routing)]:
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
    loaded = []
    try:
        for sub in ("types", "prompts"):
            name = f"rag.routing.{sub}"
            spec = importlib.util.spec_from_file_location(
                name, REF_ROOT / "rag" / "routing" / f"{sub}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            loaded.append(name)
            spec.loader.exec_module(mod)
        ref = sys.modules["rag.routing.prompts"]
        from classmate_rag_tpu.routing.prompts import system_prompt_for

        for route in ("math", "code", "translation", "default"):
            for lang in ("en", "it", None, "xx"):
                assert system_prompt_for(route, language=lang or "en") == \
                    ref.system_prompt_for(route, language=lang), \
                    f"{route}/{lang}"
    finally:
        for n in inserted + loaded:
            sys.modules.pop(n, None)


def test_classifier_differential(ref_classifier):
    """Prototype means, cosine scoring, margin fallback, and the
    evenly-spaced chunk sampling must match the reference exactly."""
    from classmate_rag_tpu.routing.classifier import SubjectClassifier

    ref = ref_classifier.SubjectClassifier(embedder=_FakeEmbedder())
    ours = SubjectClassifier(_FakeEmbedder())

    rng = random.Random(29)
    words = ("integral matrix compile translate codice equazione "
             "ricetta train loop parse derivative").split()

    def rand_text():
        return " ".join(rng.choice(words) for _ in range(rng.randint(1, 9)))

    for _ in range(40):
        q = rand_text() if rng.random() < 0.9 else "   "
        assert ours.score_query(q) == pytest.approx(ref.score_query(q),
                                                    abs=1e-6)
        t = rand_text()
        assert ours.score_passage(t) == pytest.approx(
            ref.score_passage(t), abs=1e-6
        )
        for margin in (0.05, 0.3):
            a = ours.classify_text(t, min_margin=margin)
            b = ref.classify_text(t, min_margin=margin)
            assert a.subject == b.subject
            assert a.margin == pytest.approx(b.margin, abs=1e-6)

    for n_chunks in (0, 1, 5, 8, 9, 23, 40):
        chunks = [rand_text() for _ in range(n_chunks)]
        if chunks and rng.random() < 0.5:
            chunks[rng.randrange(len(chunks))] = ""  # blanks are skipped
        a = ours.classify_chunks(chunks)
        b = ref.classify_chunks(chunks)
        assert a.subject == b.subject, f"n={n_chunks}"
        assert a.scores == pytest.approx(b.scores, abs=1e-6)
        assert a.margin == pytest.approx(b.margin, abs=1e-6)


def test_router_cascade_differential(ref_router):
    from classmate_rag_tpu.routing.router import HybridRouter

    ref_proto = sys.modules["rag.routing.prototypes"]
    intent_words = list(ref_proto.TRANSLATION_INTENT_KEYWORDS)[:4]
    routes = ["math", "code", "translation", "default"]
    rng = random.Random(17)
    questions = [
        "solve the integral of x squared",
        f"please {intent_words[0]} this text",
        f"{intent_words[1]} in italiano",
        "какой-то вопрос",  # no intent keyword
        "",
    ]
    for trial in range(150):
        scores = {r: round(rng.uniform(0, 1), 3) for r in routes}
        scores["default"] = 0.0  # both sides score default by elimination
        metas = []
        for _ in range(rng.randint(0, 6)):
            metas.append(
                {"subject": rng.choice(routes + [None, "other"])}
                if rng.random() < 0.9 else {}
            )
        q = rng.choice(questions)
        forced = rng.choice([None, None, None, "math", "bogus"])
        margin = rng.choice([0.10, 0.30])
        thresh = rng.choice([0.60, 0.40])
        req_intent = rng.random() < 0.8

        ref = ref_router.HybridRouter(
            classifier=_StubClassifier(scores),
            query_margin=margin, metadata_threshold=thresh,
            translation_requires_intent=req_intent,
        ).decide(q, metas, forced_subject=forced)
        got = HybridRouter(
            classifier=_StubClassifier(scores),
            query_margin=margin, metadata_threshold=thresh,
            translation_requires_intent=req_intent,
        ).decide(q, metas, forced_subject=forced)
        assert got.route == ref.route, (
            f"trial {trial}: {got.route} vs {ref.route} "
            f"(scores={scores}, q={q!r}, forced={forced})"
        )
        assert got.reason == ref.reason, (
            f"trial {trial}: {got.reason} vs {ref.reason}"
        )
        assert abs(got.margin - ref.margin) < 1e-9
        assert got.meta_scores == ref.meta_scores


# ---------------------------------------------------------------------------
# Neighbor expansion + per-doc diversity
# ---------------------------------------------------------------------------

def test_expand_with_neighbors_differential(ref_expand, ref_ids, tmp_path):
    from classmate_rag_tpu.index.catalog import Catalog
    from classmate_rag_tpu.retrieval.expand import expand_with_neighbors

    rng = random.Random(31)
    # Build a catalog: 3 files × pages × chunk runs, written in the
    # reference JSONL layout (which is also ours).
    jsonl_dir = tmp_path / "indexes" / "bm25"
    jsonl_dir.mkdir(parents=True)
    entries = {}
    for f in range(3):
        sp = f"/docs/file{f}.txt"
        for page in range(1, 3):
            for ci in range(6):
                cid = ref_ids.stable_chunk_id(
                    source_path=sp, page=page, chunk_index=ci,
                    course="cs", unit=None,
                )
                meta = {
                    "source_path": sp, "page": page, "chunk_id": ci,
                    "course": "cs",
                }
                text = f"text f{f} p{page} c{ci}"
                if f == 2 and ci == 3:
                    text = "   "  # blank neighbor must be skipped
                entries[cid] = (text, meta)
    with (jsonl_dir / "bm25_index.jsonl").open("w") as fh:
        for cid, (text, meta) in entries.items():
            fh.write(json.dumps(
                {"id": cid, "text": text, "tokens": [], "metadata": meta}
            ) + "\n")

    catalog = Catalog.load_or_create(jsonl_dir)
    ids_list = list(entries)

    for trial in range(30):
        results = []
        for _ in range(rng.randint(1, 6)):
            cid = rng.choice(ids_list)
            text, meta = entries[cid]
            results.append({
                "id": cid, "document": text,
                "score": round(rng.random(), 3), "metadata": dict(meta),
            })
        for radius in (0, 1, 2):
            for cap in (None, 1, 3):
                want = ref_expand.expand_with_neighbors(
                    list(results), radius=radius, max_per_doc=cap,
                )
                got = expand_with_neighbors(
                    [dict(r) for r in results], catalog,
                    radius=radius, max_per_doc=cap,
                )
                assert [g["id"] for g in got] == [w["id"] for w in want], \
                    f"trial {trial} r={radius} cap={cap}"
                for g, w in zip(got, want):
                    assert abs(g["score"] - w["score"]) < 1e-9
                    assert g["document"] == w["document"]
                    assert g["metadata"] == w["metadata"]
