from classmate_rag_tpu.chunking.chunker import (
    RagChunk,
    chunk_pages,
    chunk_text,
    sentence_split,
)

__all__ = ["RagChunk", "chunk_pages", "chunk_text", "sentence_split"]
