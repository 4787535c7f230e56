"""Host-side utilities: normalization, language detection, IDs, dedup."""

from classmate_rag_tpu.utils.text import normalize_text
from classmate_rag_tpu.utils.lang import detect_lang_tag
from classmate_rag_tpu.utils.ids import stable_chunk_id
from classmate_rag_tpu.utils.dedup import dedup_text_blocks

__all__ = [
    "normalize_text",
    "detect_lang_tag",
    "stable_chunk_id",
    "dedup_text_blocks",
]
