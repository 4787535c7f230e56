"""End-to-end over a mixed-format corpus (BASELINE config 4):
PDF + DOCX + HTML + MD ingest → hybrid retrieval with neighbor expansion
and near-duplicate filtering → cited ask. Exercises every layer together.
"""

import json

import pytest

from classmate_rag_tpu.metadata import normalize_cli_metadata

from test_loaders import make_docx, make_pdf  # fixture builders


@pytest.fixture()
def corpus(tmp_index_env, tmp_path, monkeypatch):
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime
    from classmate_rag_tpu.pipeline.ingest import ingest_file

    monkeypatch.setenv("DEDUP_CHUNKS", "true")
    reset_runtime()
    rt = get_runtime(reload=True)

    pdf = tmp_path / "lecture.pdf"
    make_pdf(pdf, [
        "The Fourier transform decomposes a signal into frequencies. "
        "It is invertible and linear.",
        "Convolution in time equals multiplication in frequency. "
        "This is the convolution theorem.",
    ], compress=True)

    docx = tmp_path / "notes.docx"
    make_docx(docx, [
        "Sampling above the Nyquist rate avoids aliasing.",
        "Sampling above the Nyquist rate avoids aliasing.",  # near-dup
        "The FFT computes the discrete Fourier transform in n log n time.",
    ])

    html = tmp_path / "page.html"
    html.write_text(
        "<html><body><nav>junk</nav><p>Window functions reduce spectral "
        "leakage when analyzing finite signals.</p></body></html>"
    )

    md = tmp_path / "recipe.md"
    md.write_text("Boil pasta nine minutes. Add tomato sauce and basil.")

    for path, course in [(pdf, "dsp"), (docx, "dsp"), (html, "dsp"),
                         (md, "cooking")]:
        ingest_file(
            path=path,
            doc_meta=normalize_cli_metadata(course=course, tags="week3"),
            runtime=rt,
        )
    yield rt, tmp_path
    reset_runtime()


def test_all_formats_indexed(corpus):
    rt, tmp_path = corpus
    paths = {e.metadata.get("source_path") for e in rt.catalog.entries()}
    assert len(paths) == 4
    doc_types = {e.metadata.get("doc_type") for e in rt.catalog.entries()}
    assert doc_types == {"pdf", "docx", "html", "md"}


def test_dedup_dropped_duplicate_paragraph(corpus):
    rt, tmp_path = corpus
    docx_entries = [
        e for e in rt.catalog.entries()
        if str(e.metadata.get("source_path", "")).endswith("notes.docx")
    ]
    texts = [e.text for e in docx_entries]
    assert len(texts) == len(set(texts))  # near-dup was suppressed


def test_cross_format_hybrid_ask(corpus):
    from classmate_rag_tpu.pipeline.ask import ask_question

    rt, _ = corpus
    res = ask_question(
        question="what does the Fourier transform do to a signal",
        filters=normalize_cli_metadata(course="dsp"),
        top_k=5,
        runtime=rt,
    )
    assert "[1]" in res.answer
    assert "fourier" in res.answer.lower() or "frequenc" in res.answer.lower()
    # Filter keeps the cooking doc out.
    for r in res.retrieved:
        assert r["metadata"].get("course") == "dsp"


def test_neighbor_expansion_across_pdf_pages(corpus):
    from classmate_rag_tpu.admin.inspect import retrieve_preview

    rt, _ = corpus
    out = retrieve_preview(
        question="convolution theorem frequency multiplication",
        filters=normalize_cli_metadata(doc_type="pdf"),
        top_k=2,
        runtime=rt,
    )
    assert out["items"]
    assert all(i["metadata"]["doc_type"] == "pdf" for i in out["items"])


def test_dump_format_reference_compatible(corpus, tmp_path):
    """A dump is readable as the reference's JSONL schema."""
    from classmate_rag_tpu.admin.backup import dump_index

    rt, _ = corpus
    out = tmp_path / "dump.jsonl"
    dump_index(out, runtime=rt)
    for line in out.read_text().splitlines():
        rec = json.loads(line)
        assert set(rec) == {"id", "text", "metadata", "text_sha1",
                            "embedding_model", "embedding_sha1"}
        assert rec["id"].startswith("cm_")
        meta = rec["metadata"]
        assert "source_path" in meta and "page" in meta and "chunk_id" in meta
