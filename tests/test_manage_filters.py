"""_matches_simple filter semantics (mirrors the reference's
tests/test_manage_matches_simple.py — importable in a slim env)."""

from classmate_rag_tpu.admin.manage import _matches_simple


# Persisted metadata carries tag_<slug> flags (reference shape,
# rag/pipeline/rag.py:180-202) — not a tags list.
META = {
    "course": "cs101",
    "unit": "week1",
    "language": "en",
    "tag_exam": True,
    "tag_lab": True,
}


def test_empty_filter_matches():
    assert _matches_simple(META, None)
    assert _matches_simple(META, {})


def test_equality_fields():
    assert _matches_simple(META, {"course": "cs101"})
    assert not _matches_simple(META, {"course": "cs102"})
    assert not _matches_simple(META, {"semester": "2025S"})


def test_tags_require_all():
    assert _matches_simple(META, {"tags": ["exam"]})
    assert _matches_simple(META, {"tags": ["exam", "lab"]})
    assert not _matches_simple(META, {"tags": ["exam", "quiz"]})
    assert _matches_simple(META, {"tags": {"$contains": "lab"}})


def test_and_clauses():
    assert _matches_simple(
        META, {"$and": [{"course": "cs101"}, {"tags": ["lab"]}]}
    )
    assert not _matches_simple(
        META, {"$and": [{"course": "cs101"}, {"unit": "week2"}]}
    )


def test_none_valued_filters_ignored():
    assert _matches_simple(META, {"course": None, "unit": "week1"})


def test_tags_comma_string_and_case():
    assert _matches_simple(META, {"tags": "Exam, LAB"})
    assert not _matches_simple(META, {"tags": "exam, quiz"})


def test_unknown_key_matches_nothing():
    # Reference semantics: any unknown filter key compares as strings
    # against missing-field "" — it excludes rather than being ignored.
    assert not _matches_simple(META, {"bogus_field": "x"})


def test_whitespace_stripped_equality():
    assert _matches_simple(META, {"course": " cs101 "})
