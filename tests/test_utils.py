"""Utils: stable IDs, dedup, language detection, normalization."""

from classmate_rag_tpu.utils import (
    dedup_text_blocks,
    detect_lang_tag,
    normalize_text,
    stable_chunk_id,
)


def test_stable_id_deterministic_and_sensitive():
    a = stable_chunk_id(source_path="/tmp/x.pdf", page=1, chunk_index=0, course="c1")
    b = stable_chunk_id(source_path="/tmp/x.pdf", page=1, chunk_index=0, course="c1")
    c = stable_chunk_id(source_path="/tmp/x.pdf", page=1, chunk_index=1, course="c1")
    assert a == b
    assert a != c
    assert a.startswith("cm_") and len(a) == 3 + 32


def test_stable_id_reference_compatible():
    # Fixed vector computed with the reference formula:
    # blake2b("<resolved>|page|idx|course|unit", digest_size=16)
    from hashlib import blake2b
    from pathlib import Path

    path = "/tmp/doc.txt"
    key = f"{Path(path).resolve()}|2|5|CS101|week1"
    expect = "cm_" + blake2b(key.encode(), digest_size=16).hexdigest()
    got = stable_chunk_id(
        source_path=path, page=2, chunk_index=5, course="CS101", unit="week1"
    )
    assert got == expect


def test_dedup_drops_near_duplicates_preserving_order():
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    different = "completely unrelated content about thermodynamics and entropy " * 5
    out = dedup_text_blocks([base, near, different], jaccard_threshold=0.5)
    assert out == [base, different]


def test_dedup_keeps_all_when_distinct():
    blocks = [f"unique sentence number {i} with extra words " * 4 for i in range(5)]
    assert dedup_text_blocks(blocks) == blocks


def test_lang_detect_english_and_italian():
    en = "The quick brown fox jumps over the lazy dog and runs away."
    it = ("Questo è un documento di prova per la classe di matematica. "
          "La lezione della settimana riguarda le equazioni differenziali.")
    assert detect_lang_tag(en) == "en"
    assert detect_lang_tag(it) == "it"


def test_lang_detect_defaults_to_english():
    assert detect_lang_tag("") == "en"
    assert detect_lang_tag("12345 67890 !!!") == "en"


def test_normalize_text_collapses_whitespace():
    raw = "a \t b\n\n\n\nc  d\n"
    assert normalize_text(raw) == "a b\n\nc d"
