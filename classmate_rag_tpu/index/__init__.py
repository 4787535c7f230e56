from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.store import IndexStore

__all__ = ["Catalog", "CatalogEntry", "IndexStore"]
