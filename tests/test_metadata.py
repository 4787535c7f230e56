"""Metadata schema invariants: sentinel stripping, enum coercion, tags."""

import pytest

from classmate_rag_tpu.metadata import (
    DocTypeEnum,
    DocumentMetadata,
    LanguageEnum,
    normalize_cli_metadata,
    validate_cli_metadata,
)


def test_sentinels_never_leak_into_filters():
    meta = DocumentMetadata(language=LanguageEnum.auto, doc_type=DocTypeEnum.other)
    d = meta.to_dict()
    assert "language" not in d
    assert "doc_type" not in d
    assert "tags" not in d
    assert "subject" not in d


def test_real_values_survive_to_dict():
    meta = DocumentMetadata(
        course="algo", language=LanguageEnum.it, doc_type=DocTypeEnum.pdf,
        tags=["week1"], subject="math",
    )
    d = meta.to_dict()
    assert d["course"] == "algo"
    assert d["language"] == LanguageEnum.it
    assert d["doc_type"] == DocTypeEnum.pdf
    assert d["tags"] == ["week1"]
    assert d["subject"] == "math"


def test_normalize_language_aliases():
    assert normalize_cli_metadata(language="English").language == LanguageEnum.en
    assert normalize_cli_metadata(language="ITALIANO").language == LanguageEnum.it
    assert normalize_cli_metadata(language="klingon").language == LanguageEnum.auto
    assert normalize_cli_metadata(language=None).language == LanguageEnum.auto


def test_normalize_doc_type_aliases():
    assert normalize_cli_metadata(doc_type="ppt").doc_type == DocTypeEnum.pptx
    assert normalize_cli_metadata(doc_type="markdown").doc_type == DocTypeEnum.md
    assert normalize_cli_metadata(doc_type="weird").doc_type == DocTypeEnum.other


def test_tags_parsed_and_deduped_case_insensitively():
    meta = normalize_cli_metadata(tags="Week1, lab ,WEEK1,exam")
    assert meta.tags == ["week1", "lab", "exam"]


def test_subject_aliases():
    assert normalize_cli_metadata(subject="matematica").subject == "math"
    assert normalize_cli_metadata(subject="programming").subject == "code"
    assert normalize_cli_metadata(subject="nonsense").subject is None


# ---- validation ----------------------------------------------------------

def test_validate_strict_rejects_bad_language():
    with pytest.raises(ValueError):
        validate_cli_metadata({"language": "zz"}, fixup=False)


def test_validate_fixup_coerces_language():
    out = validate_cli_metadata({"language": "zz"}, fixup=True)
    assert out["language"] == "auto"


def test_validate_strict_rejects_bad_tag():
    with pytest.raises(ValueError):
        validate_cli_metadata({"tags": "has space"}, fixup=False)


def test_validate_fixup_slugifies_tags():
    out = validate_cli_metadata({"tags": "Has Space,OK-tag"}, fixup=True)
    assert out["tags"] == ["has_space", "ok_tag"]


def test_doc_type_inference_never_auto_other():
    out = validate_cli_metadata({}, fixup=False, inferred_doc_type="pdf")
    assert out["doc_type"] == "pdf"
    out2 = validate_cli_metadata({}, fixup=False, inferred_doc_type=None)
    assert out2["doc_type"] is None


def test_explicit_invalid_doc_type_errors_even_with_fixup():
    with pytest.raises(ValueError):
        validate_cli_metadata(
            {"doc_type": "exe"}, fixup=True, explicit_doc_type=True
        )
