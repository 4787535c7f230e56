"""Metadata schema + validation (host-side, dependency-light)."""

from classmate_rag_tpu.metadata.schema import (
    ChunkMetadata,
    DocTypeEnum,
    DocumentMetadata,
    FILTER_SIMPLE_FIELDS,
    LanguageEnum,
    METADATA_FIELDS,
    normalize_cli_metadata,
)
from classmate_rag_tpu.metadata.validation import slug_tag, validate_cli_metadata

__all__ = [
    "ChunkMetadata",
    "DocTypeEnum",
    "DocumentMetadata",
    "FILTER_SIMPLE_FIELDS",
    "LanguageEnum",
    "METADATA_FIELDS",
    "normalize_cli_metadata",
    "slug_tag",
    "validate_cli_metadata",
]
