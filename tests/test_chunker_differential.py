"""Differential fuzz: our chunker vs the LIVE reference implementation.

The byte-compatibility invariant (CLAUDE.md: "Chunker output and stable
chunk IDs are byte-compatible with the reference") is enforced here by
importing the actual reference module (stdlib-pure, loaded by file path
so nothing else of the reference package is touched) and comparing
outputs over seeded random documents engineered to hit every boundary
rule: abbreviations, quotes, newlines, unicode uppercase, whitespace
soup, paragraph breaks, and the no-sentence fallback. Skips cleanly when
/root/reference is absent (e.g. a user checkout of this repo alone).
"""

import importlib.util
from pathlib import Path

import pytest

REF_CHUNKER = Path("/root/reference/rag/chunking/chunker.py")

pytestmark = pytest.mark.skipif(
    not REF_CHUNKER.exists(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref():
    import sys

    spec = importlib.util.spec_from_file_location("_ref_chunker", REF_CHUNKER)
    mod = importlib.util.module_from_spec(spec)
    # dataclasses resolves the defining module through sys.modules.
    sys.modules["_ref_chunker"] = mod
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.modules.pop("_ref_chunker", None)


WORDS_EN = (
    "the derivative of a function measures its instantaneous rate of change "
    "matrix multiplication composes linear transformations while eigenvalues "
    "characterize them integrals accumulate signed area under curves and the "
    "chain rule differentiates compositions"
).split()
WORDS_IT = (
    "la derivata di una funzione misura la velocità di cambiamento gli "
    "autovalori caratterizzano le trasformazioni lineari mentre gli integrali "
    "accumulano area perché il teorema fondamentale collega le due operazioni"
).split()
ABBREVS = ["Dr.", "Prof.", "e.g.", "i.e.", "etc.", "Sig.", "Ing.", "ecc."]
ENDINGS = [".", "!", "?", ".", ".", "?!", "..."]
OPENERS = ['"', "“", "‘", "(", ""]


def _random_sentence(rng):
    words = rng.choice([WORDS_EN, WORDS_IT])
    n = rng.randint(1, 18)
    toks = [rng.choice(words) for _ in range(n)]
    if rng.random() < 0.3:
        toks.insert(rng.randint(0, len(toks)), rng.choice(ABBREVS))
    if rng.random() < 0.2:
        toks[0] = toks[0].capitalize()
    sent = " ".join(toks) + rng.choice(ENDINGS)
    if rng.random() < 0.15:
        sent = rng.choice(OPENERS) + sent
    return sent[0].upper() + sent[1:] if sent else sent


def _random_doc(rng):
    kind = rng.random()
    if kind < 0.05:
        return rng.choice(["", "   ", "\n\n\n", "\t \n", "no boundary here"])
    paras = []
    for _ in range(rng.randint(1, 6)):
        sents = [_random_sentence(rng) for _ in range(rng.randint(1, 12))]
        sep = rng.choice([" ", "  ", "\n", " \n "])
        paras.append(sep.join(sents))
    joiner = rng.choice(["\n\n", "\n\n\n", "\n \n", "\n\n\n\n"])
    doc = joiner.join(paras)
    if rng.random() < 0.2:
        doc = "  \t" + doc + "\n\n  "
    return doc


@pytest.mark.parametrize("seed", range(4))
def test_chunk_text_byte_equal_over_random_docs(ref, seed):
    import random

    from classmate_rag_tpu.chunking.chunker import chunk_text

    rng = random.Random(1000 + seed)
    for _ in range(50):
        doc = _random_doc(rng)
        size = rng.choice([200, 500, 1000, 1500])
        overlap = rng.choice([0, 50, 150, 300])
        ours = chunk_text(doc, chunk_size=size, chunk_overlap=overlap,
                          page=3, starting_chunk_id=7)
        theirs = ref.chunk_text(doc, chunk_size=size, chunk_overlap=overlap,
                                page=3, starting_chunk_id=7)
        assert [(c.page, c.chunk_id, c.text) for c in ours] == [
            (c.page, c.chunk_id, c.text) for c in theirs
        ], f"divergence on doc {doc[:120]!r} size={size} overlap={overlap}"


def test_chunk_pages_byte_equal(ref):
    import random

    from classmate_rag_tpu.chunking.chunker import chunk_pages

    rng = random.Random(77)
    for _ in range(30):
        pages = [
            (p + 1, _random_doc(rng)) for p in range(rng.randint(1, 5))
        ]
        ours = chunk_pages(pages, chunk_size=600, chunk_overlap=100)
        theirs = ref.chunk_pages(pages, chunk_size=600, chunk_overlap=100)
        assert list(ours) == list(theirs)


def test_sentence_split_byte_equal(ref):
    import random

    from classmate_rag_tpu.chunking.chunker import sentence_split

    rng = random.Random(5)
    for _ in range(100):
        doc = _random_doc(rng)
        assert sentence_split(doc) == ref.sentence_split(doc)
