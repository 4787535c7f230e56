from classmate_rag_tpu.retrieval.hybrid import HybridRetriever
from classmate_rag_tpu.retrieval.expand import expand_with_neighbors

__all__ = ["HybridRetriever", "expand_with_neighbors"]
