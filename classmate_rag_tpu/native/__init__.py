"""ctypes bindings for the native host kernels (with pure-Python fallback).

Loads ``native/libclassmate_native.so``, building it on first use when a
compiler is available. Every entry point has identical semantics to its
Python twin (fuzz-tested); callers never need to know which ran — absence
of a toolchain just means the Python path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libclassmate_native.so"
_lock = threading.RLock()  # reentrant: get_native_tokenizer → _load
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _ensure_built() -> bool:
    if _LIB_PATH.exists():
        return True
    src = _NATIVE_DIR / "classmate_native.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", str(_LIB_PATH), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _ensure_built():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            _declare_symbols(lib)
        except (OSError, AttributeError):
            # AttributeError = a STALE .so missing newer entry points
            # (_ensure_built skips compilation when the file exists):
            # callers must degrade to the Python paths, not crash ingest
            # — and _load_failed must latch so we don't re-raise on
            # every subsequent call.
            _load_failed = True
            return None
        _lib = lib
        return _lib


def _declare_symbols(lib: ctypes.CDLL) -> None:
    lib.tokenizer_create.restype = ctypes.c_void_p
    lib.tokenizer_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
    ]
    lib.tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.tokenize_join.restype = ctypes.c_int64
    lib.tokenize_join.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.packer_create.restype = ctypes.c_void_p
    lib.packer_create.argtypes = []
    lib.packer_destroy.argtypes = [ctypes.c_void_p]
    lib.packer_vocab_size.restype = ctypes.c_int32
    lib.packer_vocab_size.argtypes = [ctypes.c_void_p]
    lib.packer_pack_batch.restype = ctypes.c_int32
    lib.packer_pack_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.packer_export_terms.restype = ctypes.c_int64
    lib.packer_export_terms.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.packer_import_terms.restype = ctypes.c_int32
    lib.packer_import_terms.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
    ]


class NativeTokenizer:
    """BM25 tokenizer backed by the C++ kernel."""

    def __init__(self, stop_en: List[str], stop_it: List[str]) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib

        def arr(words: List[str]):
            encoded = [w.encode("utf-8") for w in words]
            a = (ctypes.c_char_p * len(encoded))(*encoded)
            return a, encoded  # keep the bytes alive

        en_arr, self._keep_en = arr(stop_en)
        it_arr, self._keep_it = arr(stop_it)
        self._handle = lib.tokenizer_create(
            en_arr, len(stop_en), it_arr, len(stop_it)
        )
        self._buf_cap = 1 << 16
        self._buf = ctypes.create_string_buffer(self._buf_cap)
        # get_native_tokenizer returns ONE shared instance and the
        # serving daemon tokenizes from concurrent handler threads: the
        # output buffer (and its grow-and-retry reassignment) must not
        # interleave — a thread pairing the OLD small buffer with the
        # NEW larger capacity would let C write past the end.
        self._buf_lock = threading.Lock()

    def __del__(self) -> None:  # pragma: no cover - interpreter teardown
        try:
            if getattr(self, "_handle", None):
                self._lib.tokenizer_destroy(self._handle)
        except Exception:
            pass

    def tokenize(self, text: str, lang: Optional[str] = None) -> List[str]:
        data = (text or "").encode("utf-8")
        lang_it = 1 if (lang or "").lower().startswith("it") else 0
        with self._buf_lock:
            n = self._lib.tokenize_join(
                self._handle, data, len(data), lang_it,
                self._buf, self._buf_cap,
            )
            if n < 0:  # grow and retry
                self._buf_cap = max(self._buf_cap * 2, -n + 1)
                self._buf = ctypes.create_string_buffer(self._buf_cap)
                n = self._lib.tokenize_join(
                    self._handle, data, len(data), lang_it,
                    self._buf, self._buf_cap,
                )
                if n < 0:
                    raise RuntimeError("native tokenize buffer error")
            if n == 0:
                return []
            return self._buf.raw[:n].decode("utf-8").split(" ")


class NativePacker:
    """Batch term-frequency packer + vocabulary interner (C++ kernel).

    Owns the authoritative term→id interner; ``pack_batch`` mirrors newly
    created terms into the caller's Python dict so all existing lookup
    code (store.vocab) keeps working unchanged. Packing semantics are
    bit-identical to lexical.pack_tokens (fuzz-tested in test_native.py).
    """

    def __init__(self) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.packer_create()

    def __del__(self) -> None:  # pragma: no cover - interpreter teardown
        try:
            if getattr(self, "_handle", None):
                self._lib.packer_destroy(self._handle)
        except Exception:
            pass

    def pack_batch(self, tokens_list, vocab: dict, width: int):
        """Pack a batch of token lists → (term_ids [B, W] i32, tfs [B, W]
        u8, doc_len [B] f32), interning into the shared vocabulary and
        extending ``vocab`` with any new terms.

        Returns None (caller must fall back to the Python path) when a
        token contains the ' '/'\\n' separators — impossible for
        tokenizer output, possible for arbitrary caller-supplied tokens.
        """
        import numpy as np

        try:
            docs = []
            for tokens in tokens_list:
                joined = " ".join(tokens)
                if "\n" in joined:
                    return None
                docs.append(joined)
            # Tokens containing the separators (or empty tokens, which the
            # C++ splitter would silently drop while pack_tokens counts
            # them) must take the Python path: cheap structural check.
            for tokens, joined in zip(tokens_list, docs):
                n = len(tokens)
                if n and (not joined or joined.count(" ") != n - 1
                          or joined[0] == " " or joined[-1] == " "
                          or "  " in joined):
                    return None
            blob = "\n".join(docs).encode("utf-8")
        except TypeError:
            return None

        b = len(tokens_list)
        term_ids = np.empty((b, width), dtype=np.int32)
        tfs = np.empty((b, width), dtype=np.uint8)
        doc_len = np.empty(b, dtype=np.float32)
        rc = self._lib.packer_pack_batch(
            self._handle, blob, len(blob), b, width,
            term_ids.ctypes.data_as(ctypes.c_void_p),
            tfs.ctypes.data_as(ctypes.c_void_p),
            doc_len.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            return None
        self._sync_vocab(vocab)
        return term_ids, tfs, doc_len

    def _sync_vocab(self, vocab: dict) -> None:
        n_native = self._lib.packer_vocab_size(self._handle)
        start = len(vocab)
        if n_native <= start:
            return
        cap = 1 << 20
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.packer_export_terms(self._handle, start, buf, cap)
            if n >= 0:
                break
            cap = -n + 1
        new_terms = buf.raw[:n].decode("utf-8").split("\n") if n else []
        for i, term in enumerate(new_terms):
            vocab[term] = start + i

    def vocab_size(self) -> int:
        return int(self._lib.packer_vocab_size(self._handle))

    def import_vocab(self, vocab: dict) -> bool:
        """Seed a FRESH packer from a restored python vocab (terms append
        in id order so both interners agree). False on failure."""
        if self.vocab_size() != 0:
            return False
        terms = sorted(vocab, key=vocab.__getitem__)
        if any("\n" in t for t in terms):
            return False
        blob = "\n".join(terms).encode("utf-8")
        n = self._lib.packer_import_terms(self._handle, blob, len(blob))
        return n == len(vocab)


def make_native_packer() -> Optional[NativePacker]:
    """A fresh packer instance (one per IndexStore), or None."""
    try:
        return NativePacker()
    except (RuntimeError, OSError):
        return None


_tokenizer: Optional[NativeTokenizer] = None
_tokenizer_failed = False


def get_native_tokenizer() -> Optional[NativeTokenizer]:
    """Shared tokenizer instance, or None when native isn't available."""
    global _tokenizer, _tokenizer_failed
    if _tokenizer is not None or _tokenizer_failed:
        return _tokenizer
    with _lock:
        if _tokenizer is not None or _tokenizer_failed:
            return _tokenizer
        try:
            from classmate_rag_tpu.index.lexical import (
                STOPWORDS_EN, STOPWORDS_IT,
            )

            _tokenizer = NativeTokenizer(
                sorted(STOPWORDS_EN), sorted(STOPWORDS_IT)
            )
        except (RuntimeError, OSError):
            _tokenizer_failed = True
    return _tokenizer
