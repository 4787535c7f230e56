"""_matches_simple filter semantics (mirrors the reference's
tests/test_manage_matches_simple.py — importable in a slim env)."""

from classmate_rag_tpu.admin.manage import _matches_simple


META = {
    "course": "cs101",
    "unit": "week1",
    "language": "en",
    "tags": ["exam", "lab"],
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
