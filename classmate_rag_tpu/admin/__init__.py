"""Admin plane: backup/restore, curation, inspection.

Heavy imports (jax, device state) load lazily via ``__getattr__`` so the
CLI parser and slim tests import this package without pulling the device
stack (same discipline as the reference's rag/admin/__init__.py:14-19).
"""

from __future__ import annotations

_EXPORTS = {
    "dump_index": "classmate_rag_tpu.admin.backup",
    "restore_dump": "classmate_rag_tpu.admin.backup",
    "vacuum_indexes": "classmate_rag_tpu.admin.backup",
    "rebuild_embeddings": "classmate_rag_tpu.admin.backup",
    "list_entries": "classmate_rag_tpu.admin.manage",
    "show_entries_by_id": "classmate_rag_tpu.admin.manage",
    "resolve_ids": "classmate_rag_tpu.admin.manage",
    "delete_by_ids": "classmate_rag_tpu.admin.manage",
    "reingest_paths": "classmate_rag_tpu.admin.manage",
    "list_source_paths": "classmate_rag_tpu.admin.manage",
    "retrieve_preview": "classmate_rag_tpu.admin.inspect",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    module_name = _EXPORTS.get(name)
    if module_name is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(module_name), name)
