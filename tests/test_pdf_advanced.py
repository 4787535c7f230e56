"""PDF extractor: object streams, CMaps, hex strings, filters."""

import zlib
from pathlib import Path

from classmate_rag_tpu.loaders.pdf import load_pdf


def _objstm_pdf(path: Path) -> None:
    """Catalog+Pages inside an /ObjStm; Type0 font with a 1-byte-codespace
    ToUnicode CMap (bfchar + bfrange); hex and literal strings."""
    inner = (
        "<< /Type /Catalog /Pages 2 0 R >> "
        "<< /Type /Pages /Count 1 /Kids [3 0 R] >>"
    )
    header = "1 0 2 33 "
    payload = (header + inner).encode()
    objstm = zlib.compress(payload)

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin begincmap\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <41> <0048> <42> <0069> endbfchar\n"
        b"1 beginbfrange <61> <63> <0061> endbfrange\n"
        b"endcmap end end"
    )
    content = b"BT /F1 12 Tf 72 720 Td <4142> Tj ( ) Tj (abc) Tj ET"

    parts = [b"%PDF-1.5\n"]
    parts.append(
        f"10 0 obj\n<< /Type /ObjStm /N 2 /First {len(header)} "
        f"/Length {len(objstm)} /Filter /FlateDecode >>\nstream\n".encode()
    )
    parts.append(objstm + b"\nendstream\nendobj\n")
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        f"4 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
    )
    parts.append(content + b"\nendstream\nendobj\n")
    parts.append(
        b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
        b"/ToUnicode 6 0 R >>\nendobj\n"
    )
    parts.append(f"6 0 obj\n<< /Length {len(cmap)} >>\nstream\n".encode())
    parts.append(cmap + b"\nendstream\nendobj\n")
    parts.append(b"%%EOF\n")
    path.write_bytes(b"".join(parts))


def test_objstm_and_cmap_decoding(tmp_path):
    pdf = tmp_path / "objstm.pdf"
    _objstm_pdf(pdf)
    pages = load_pdf(pdf)
    assert len(pages) == 1
    # <4142> → "Hi" via bfchar; (abc) → "abc" via bfrange; the
    # codespacerange (1 byte) must override the Type0 2-byte default.
    assert pages[0][1] == "Hi abc"


def test_asciihex_filter(tmp_path):
    content = b"BT (Hex filtered text works.) Tj ET"
    hex_payload = content.hex().encode() + b">"
    parts = [b"%PDF-1.4\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n")
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        f"4 0 obj\n<< /Length {len(hex_payload)} "
        f"/Filter /ASCIIHexDecode >>\nstream\n".encode()
    )
    parts.append(hex_payload + b"\nendstream\nendobj\n%%EOF\n")
    pdf = tmp_path / "hex.pdf"
    pdf.write_bytes(b"".join(parts))
    pages = load_pdf(pdf)
    assert pages == [(1, "Hex filtered text works.")]


def test_trusted_length_keeps_trailing_newline_bytes(tmp_path):
    # A deflate payload whose compressed bytes END in 0x0A must survive.
    text = b"BT (Stream tail bytes intact.) Tj ET"
    for level in range(1, 10):
        compressed = zlib.compress(text, level)
        if compressed.endswith((b"\n", b"\r")):
            break
    else:
        # Force the case: append an empty deflate block via flush trickery
        # not possible → fall back to any payload and assert roundtrip.
        compressed = zlib.compress(text)
    parts = [b"%PDF-1.4\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n")
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        f"4 0 obj\n<< /Length {len(compressed)} "
        f"/Filter /FlateDecode >>\nstream\n".encode()
    )
    parts.append(compressed + b"\nendstream\nendobj\n%%EOF\n")
    pdf = tmp_path / "tail.pdf"
    pdf.write_bytes(b"".join(parts))
    assert load_pdf(pdf) == [(1, "Stream tail bytes intact.")]


def test_truncated_bfrange_array_terminates():
    """A bfrange array form missing its ']' used to reset the parse
    cursor to 0 and loop forever (review finding r4, reproduced with a
    timeout). Must terminate and keep the mappings it could read."""
    from classmate_rag_tpu.loaders.pdf import FontDecoder

    fd = FontDecoder.__new__(FontDecoder)
    fd.code_len = 1
    fd.cmap = {}
    fd._parse_cmap(
        b"begincmap 1 begincodespacerange <00> <FF> endcodespacerange "
        b"1 beginbfrange <00> <05> [<0041> <0042> endbfrange endcmap"
    )
    assert fd.cmap.get(0) == "A"
    assert fd.cmap.get(1) == "B"


def test_inline_image_bytes_do_not_swallow_text():
    """BI...ID <binary> EI payloads must be skipped, not lexed: a '('
    byte inside the image data used to start a literal string that
    consumed the rest of the stream (review finding r4)."""
    from classmate_rag_tpu.loaders.pdf import extract_page_text

    content = (
        b"BT (before image) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x28\xff\x00\xfe EI "
        b"BT (after image) Tj ET"
    )
    text = extract_page_text(content, {})
    assert "before image" in text
    assert "after image" in text
