from classmate_rag_tpu.ops.topk import masked_topk, topk_pallas, topk_xla
from classmate_rag_tpu.ops.mmr import mmr_order
from classmate_rag_tpu.ops.fusion import rrf_merge

__all__ = ["masked_topk", "topk_pallas", "topk_xla", "mmr_order", "rrf_merge"]
