"""classmate_rag_tpu: a TPU-native rebuild of CLASSMATE-RAG.

Stable import surface mirrors the reference's
(rag/pipeline/__init__.py:32-50): ``ingest_file``, ``ask_question``,
``retrieve_preview``, ``index_stats``.
"""

from __future__ import annotations

__version__ = "0.1.0"

_EXPORTS = {
    "ingest_file": "classmate_rag_tpu.pipeline",
    "ask_question": "classmate_rag_tpu.pipeline",
    "retrieve_preview": "classmate_rag_tpu.pipeline",
    "index_stats": "classmate_rag_tpu.pipeline",
    "load_config": "classmate_rag_tpu.config",
}

__all__ = list(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    module_name = _EXPORTS.get(name)
    if module_name is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(module_name), name)
