"""Chunker behavior: sentence splitting, overlap, oversize handling.

Mirrors the reference's own test coverage (tests/test_chunking.py in the
reference repo) plus byte-compat-critical invariants.
"""

from classmate_rag_tpu.chunking import chunk_pages, chunk_text, sentence_split


def test_sentence_split_basic():
    text = "This is one. This is two! Is this three? Yes."
    sents = sentence_split(text)
    assert sents == ["This is one.", "This is two!", "Is this three?", "Yes."]


def test_sentence_split_abbreviations_not_split():
    text = "We met Dr. smith yesterday. Prof. rossi agreed."
    sents = sentence_split(text)
    # "Dr." followed by lowercase must not split.
    assert any(s.startswith("We met Dr. smith") for s in sents)


def test_sentence_split_drops_punct_only():
    # A punctuation-only paragraph is dropped entirely.
    assert sentence_split("Hello there.\n\n???") == ["Hello there."]


def test_chunk_text_overlap_sentences():
    sents = [f"Sentence number {i} has a fixed length body." for i in range(20)]
    text = " ".join(sents)
    chunks = chunk_text(text, chunk_size=120, chunk_overlap=50)
    assert len(chunks) > 2
    # Every later chunk starts with the tail sentences of the previous one.
    for prev, cur in zip(chunks, chunks[1:]):
        first_sentence = cur.text.split(".")[0] + "."
        assert first_sentence in prev.text


def test_oversized_sentence_hard_split():
    body = "x" * 2500
    chunks = chunk_text(body + ".", chunk_size=1000, chunk_overlap=150)
    # 2501 chars -> exactly 3 slices, each its own chunk.
    assert len(chunks) == 3
    assert all(len(c.text) <= 1000 for c in chunks)


def test_chunk_ids_are_global_across_pages():
    pages = [(1, "One one one. Two two two."), (2, "Three three. Four four.")]
    out = chunk_pages(pages, chunk_size=15, chunk_overlap=0)
    cids = [cid for (_pg, cid, _t) in out]
    assert cids == sorted(cids)
    assert len(set(cids)) == len(cids)
    pages_seen = {pg for (pg, _c, _t) in out}
    assert pages_seen == {1, 2}


def test_empty_and_whitespace_only():
    assert chunk_text("") == []
    assert chunk_text("   \n\n  ") == []


def test_unsplittable_text_returned_whole():
    # no sentence boundaries at all
    text = "lowercase words without boundaries"
    chunks = chunk_text(text, chunk_size=1000, chunk_overlap=150)
    assert len(chunks) == 1
    assert chunks[0].text == text
