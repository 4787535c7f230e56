from classmate_rag_tpu.generation.prompting import (
    build_general_messages,
    build_grounded_messages,
    format_context_blocks,
)
from classmate_rag_tpu.generation.post import enforce_citations
from classmate_rag_tpu.generation.runner import (
    ExtractiveRunner,
    LlamaCppRunner,
    TPUDecodeRunner,
    get_runner,
)

__all__ = [
    "ExtractiveRunner",
    "LlamaCppRunner",
    "TPUDecodeRunner",
    "build_general_messages",
    "build_grounded_messages",
    "enforce_citations",
    "format_context_blocks",
    "get_runner",
]
