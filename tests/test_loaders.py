"""Loader tests over synthetic fixtures generated with stdlib only."""

import zipfile
import zlib

import pytest

from classmate_rag_tpu.loaders import (
    infer_doc_type_from_path,
    load_document_by_type,
)


# ---------------------------------------------------------------------------
# Fixture builders
# ---------------------------------------------------------------------------

def make_docx(path, paragraphs, table_rows=None):
    ns = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    if table_rows:
        rows = "".join(
            "<w:tr>" + "".join(
                f"<w:tc><w:p><w:r><w:t>{cell}</w:t></w:r></w:p></w:tc>"
                for cell in row
            ) + "</w:tr>"
            for row in table_rows
        )
        body += f"<w:tbl>{rows}</w:tbl>"
    doc = f'<?xml version="1.0"?><w:document {ns}><w:body>{body}</w:body></w:document>'
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)


def make_pptx(path, slides, notes=None):
    a = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    p = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        for i, shape_texts in enumerate(slides, start=1):
            bodies = "".join(
                f"<p:sp><p:txBody><a:p><a:r><a:t>{t}</a:t></a:r></a:p>"
                f"</p:txBody></p:sp>"
                for t in shape_texts
            )
            xml = f'<?xml version="1.0"?><p:sld {p} {a}><p:cSld><p:spTree>{bodies}</p:spTree></p:cSld></p:sld>'
            zf.writestr(f"ppt/slides/slide{i}.xml", xml)
        for i, note in (notes or {}).items():
            xml = (
                f'<?xml version="1.0"?><p:notes {p} {a}><p:cSld><p:spTree>'
                f"<p:sp><p:txBody><a:p><a:r><a:t>{note}</a:t></a:r></a:p>"
                f"</p:txBody></p:sp></p:spTree></p:cSld></p:notes>"
            )
            zf.writestr(f"ppt/notesSlides/notesSlide{i}.xml", xml)


def make_epub(path, chapters):
    items = "".join(
        f'<item id="ch{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="ch{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for i, ch in enumerate(chapters):
            zf.writestr(
                f"OEBPS/ch{i}.xhtml",
                f"<html><head><title>c</title></head><body><p>{ch}</p></body></html>",
            )


def make_pdf(path, pages, compress=False):
    """Handcrafted single-font PDF with one content stream per page."""
    objects = {}
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = f"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>"
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>"
        )
        lines = text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({esc}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        objects[content_num] = ("STREAM", stream)
    objects[font_num] = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.5\n")
    for num in sorted(objects):
        val = objects[num]
        out += f"{num} 0 obj\n".encode()
        if isinstance(val, tuple):
            data = val[1]
            if compress:
                data = zlib.compress(data)
                out += f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
            else:
                out += f"<< /Length {len(data)} >>\nstream\n".encode()
            out += data + b"\nendstream\n"
        else:
            out += val.encode() + b"\n"
        out += b"endobj\n"
    out += b"%%EOF\n"
    path.write_bytes(bytes(out))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_infer_doc_type():
    assert infer_doc_type_from_path("a/b/x.PDF") == "pdf"
    assert infer_doc_type_from_path("x.markdown") == "md"
    assert infer_doc_type_from_path("x.ppt") == "pptx"
    assert infer_doc_type_from_path("x.unknown") == "other"


def test_load_txt_md(tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("hello world\n")
    assert load_document_by_type(f, "txt") == [(1, "hello world")]

    m = tmp_path / "a.md"
    m.write_text("---\ntitle: x\n---\n# Heading\nBody text\n")
    pages = load_document_by_type(m, "md")
    assert pages[0][1].startswith("# Heading")


def test_load_html_drops_boilerplate(tmp_path):
    f = tmp_path / "a.html"
    f.write_text(
        "<html><head><script>var x=1;</script></head><body>"
        "<nav>menu menu</nav><p>Main content here.</p>"
        "<footer>footer junk</footer></body></html>"
    )
    pages = load_document_by_type(f, "html")
    assert pages == [(1, "Main content here.")]


def test_load_csv_bullets(tmp_path):
    f = tmp_path / "a.csv"
    f.write_text("name,score\nalice,10\nbob,20\n")
    pages = load_document_by_type(f, "csv")
    assert len(pages) == 1
    assert "- name: alice; score: 10" in pages[0][1]
    assert "- name: bob; score: 20" in pages[0][1]


def test_load_csv_paginates(tmp_path):
    f = tmp_path / "big.csv"
    rows = "\n".join(f"row{i},val{i}" for i in range(200))
    f.write_text("a,b\n" + rows + "\n")
    pages = load_document_by_type(f, "csv")
    assert len(pages) == 3  # 200 rows / 80 per page


def test_load_docx(tmp_path):
    f = tmp_path / "a.docx"
    make_docx(f, ["First paragraph.", "Second paragraph."],
              table_rows=[["cell1", "cell2"]])
    pages = load_document_by_type(f, "docx")
    assert len(pages) == 1
    text = pages[0][1]
    assert "First paragraph." in text
    assert "Second paragraph." in text
    assert "cell1\tcell2" in text


def test_load_pptx_slides_and_notes(tmp_path):
    f = tmp_path / "a.pptx"
    make_pptx(f, [["Title slide", "Subtitle"], ["Second slide"]],
              notes={2: "speaker notes here"})
    pages = load_document_by_type(f, "pptx")
    assert len(pages) == 2
    assert "Title slide" in pages[0][1]
    assert "Second slide" in pages[1][1]
    assert "speaker notes here" in pages[1][1]


def test_load_epub_chapters(tmp_path):
    f = tmp_path / "a.epub"
    make_epub(f, ["Chapter one text.", "Chapter two text."])
    pages = load_document_by_type(f, "epub")
    assert pages == [(1, "Chapter one text."), (2, "Chapter two text.")]


@pytest.mark.parametrize("compress", [False, True])
def test_load_pdf(tmp_path, compress):
    f = tmp_path / "a.pdf"
    make_pdf(f, ["Hello PDF world.\nSecond line.", "Page two content."],
             compress=compress)
    pages = load_document_by_type(f, "pdf")
    assert len(pages) == 2
    assert "Hello PDF world." in pages[0][1]
    assert "Second line." in pages[0][1]
    assert "Page two content." in pages[1][1]


def test_load_pdf_parens_escapes(tmp_path):
    f = tmp_path / "esc.pdf"
    make_pdf(f, ["Func(x) returns (a) and \\backslash."])
    pages = load_document_by_type(f, "pdf")
    assert "Func(x) returns (a)" in pages[0][1]


def test_unknown_type_falls_back_to_text(tmp_path):
    f = tmp_path / "a.xyz"
    f.write_text("raw content")
    assert load_document_by_type(f, "other") == [(1, "raw content")]


@pytest.mark.parametrize("ext", ["docx", "pptx", "epub"])
def test_corrupt_archive_raises_clean_valueerror(tmp_path, ext):
    f = tmp_path / f"fake.{ext}"
    f.write_bytes(b"not a zip archive")
    with pytest.raises(ValueError, match="cannot parse"):
        load_document_by_type(f, ext)


def test_zip_without_expected_parts_raises_clean(tmp_path):
    f = tmp_path / "empty.docx"
    zipfile.ZipFile(f, "w").writestr("nothing", "x")
    with pytest.raises(ValueError, match="cannot parse"):
        load_document_by_type(f, "docx")


class TestGarbageFuzz:
    """Random bytes into every format must fail CLEANLY: either empty/
    best-effort pages or ValueError — never an unhandled exception."""

    @pytest.mark.parametrize("ext", [
        "pdf", "docx", "pptx", "epub", "html", "md", "txt", "csv",
    ])
    def test_random_garbage(self, tmp_path, ext):
        import random

        from classmate_rag_tpu.loaders import load_document_by_type

        rng = random.Random(hash(ext) & 0xFFFF)
        for trial in range(12):
            path = tmp_path / f"junk{trial}.{ext}"
            n = rng.randint(0, 4096)
            payload = bytes(rng.getrandbits(8) for _ in range(n))
            if trial % 3 == 1:
                # Magic-bytes prefix + garbage body: the nastier case.
                magic = {
                    "pdf": b"%PDF-1.4\n", "docx": b"PK\x03\x04",
                    "pptx": b"PK\x03\x04", "epub": b"PK\x03\x04",
                    "html": b"<!DOCTYPE html><html>", "md": b"# ",
                    "txt": b"", "csv": b"a,b,c\n",
                }[ext]
                payload = magic + payload
            path.write_bytes(payload)
            try:
                pages = load_document_by_type(path, ext)
            except ValueError:
                continue  # clean, typed failure
            assert isinstance(pages, list)
            for page_no, text in pages:
                assert isinstance(page_no, int)
                assert isinstance(text, str)

    def test_truncated_real_docx(self, tmp_path):
        from classmate_rag_tpu.loaders import load_document_by_type

        src = tmp_path / "full.docx"
        make_docx(src, ["Hello world paragraph"])
        full = src.read_bytes()
        for cut in (10, len(full) // 2, len(full) - 4):
            p = tmp_path / f"cut{cut}.docx"
            p.write_bytes(full[:cut])
            try:
                load_document_by_type(p, "docx")
            except ValueError:
                pass  # clean failure is the contract
