from classmate_rag_tpu.parallel.mesh import corpus_mesh, training_mesh
from classmate_rag_tpu.parallel.sharded import (
    ShardedHybridResult,
    make_sharded_hybrid_fn,
    make_sharded_split_hybrid_fn,
)

__all__ = [
    "ShardedHybridResult",
    "corpus_mesh",
    "make_sharded_hybrid_fn",
    "make_sharded_split_hybrid_fn",
    "training_mesh",
]
