from classmate_rag_tpu.parallel.mesh import corpus_mesh, training_mesh
from classmate_rag_tpu.parallel.sharded import (
    ShardedHybridResult,
    make_sharded_hybrid_fn,
    make_sharded_split_hybrid_fn,
)


def __getattr__(name):
    # Lazy: serving pulls in the store/layout machinery, which light
    # mesh-only users don't need.
    if name == "ShardedHybridIndex":
        from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

        return ShardedHybridIndex
    raise AttributeError(name)


__all__ = [
    "ShardedHybridIndex",
    "ShardedHybridResult",
    "corpus_mesh",
    "make_sharded_hybrid_fn",
    "make_sharded_split_hybrid_fn",
    "training_mesh",
]
