"""Native C++ tokenizer: availability, exact parity with Python, speed."""

import random
import time

import pytest

from classmate_rag_tpu.index.lexical import tokenize_py

native_mod = pytest.importorskip("classmate_rag_tpu.native")


@pytest.fixture(scope="module")
def native():
    tok = native_mod.get_native_tokenizer()
    if tok is None:
        pytest.skip("native library not buildable in this environment")
    return tok


def test_basic_parity(native):
    text = "The quick brown Fox! Perché l'università è così BELLA, no? x y"
    for lang in ("en", "it", None):
        assert native.tokenize(text, lang) == tokenize_py(text, lang)


def test_accents_and_case(native):
    text = "ÀÈÌÒÙ àèìòù Ångström naïve façade coöperate ÑOÑO"
    assert native.tokenize(text, "en") == tokenize_py(text, "en")


def test_fuzz_parity(native):
    rng = random.Random(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ "
        "àèéìòùÀÈÉÌÒÙ çÇ ñÑ 0123456789 .,;:!?()[]{}<>-_'\"\n\t"
        "的中文字 Ωωλ πρ €£¥ 🙂"
    )
    for trial in range(300):
        n = rng.randint(0, 400)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        lang = rng.choice(["en", "it", None])
        assert native.tokenize(text, lang) == tokenize_py(text, lang), (
            trial, text
        )


def test_long_text_grows_buffer(native):
    text = ("supercalifragilistic word " * 20000)
    out = native.tokenize(text, "en")
    assert out == tokenize_py(text, "en")
    assert len(out) == 40000


def test_native_is_faster(native):
    text = " ".join(f"word{i} the della perché running" for i in range(2000))
    t0 = time.perf_counter()
    for _ in range(10):
        a = native.tokenize(text, "en")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        b = tokenize_py(text, "en")
    t_py = time.perf_counter() - t0
    assert a == b
    # Soft perf bound: native should not be slower than python.
    assert t_native < t_py * 1.2, (t_native, t_py)


# ---------------------------------------------------------------------------
# Batch packer / interner
# ---------------------------------------------------------------------------

@pytest.fixture()
def packer():
    p = native_mod.make_native_packer()
    if p is None:
        pytest.skip("native library not buildable in this environment")
    return p


def test_packer_fuzz_parity(packer):
    """Native batch pack must be bit-identical to lexical.pack_tokens —
    ids (interning order), tfs, doc_len, and the shared vocab dict."""
    import numpy as np

    from classmate_rag_tpu.index.lexical import pack_tokens

    rng = np.random.default_rng(7)
    vocab_native, vocab_py = {}, {}
    words = [f"w{i}" for i in range(150)] + ["café", "perché", "übel"]
    for trial in range(120):
        b = int(rng.integers(1, 7))
        docs = []
        for _ in range(b):
            k = int(rng.integers(0, 40))
            docs.append([words[i] for i in rng.integers(0, len(words), k)])
        width = int(rng.integers(4, 20))
        ids_p = np.empty((b, width), np.int32)
        tfs_p = np.empty((b, width), np.uint8)
        dl_p = np.empty(b, np.float32)
        for i, d in enumerate(docs):
            ids_p[i], tfs_p[i], dl_p[i] = pack_tokens(d, vocab_py, width)
        out = packer.pack_batch(docs, vocab_native, width)
        assert out is not None
        ids_n, tfs_n, dl_n = out
        assert np.array_equal(ids_p, ids_n), (trial, docs)
        assert np.array_equal(tfs_p, tfs_n)
        assert np.array_equal(dl_p, dl_n)
        assert vocab_py == vocab_native


def test_packer_tf_clamp_and_overflow(packer):
    import numpy as np

    from classmate_rag_tpu.index.lexical import pack_tokens

    docs = [["x"] * 300 + ["y"], [f"t{i}" for i in range(30)] * 2]
    vocab_n, vocab_p = {}, {}
    ids_p = np.empty((2, 8), np.int32)
    tfs_p = np.empty((2, 8), np.uint8)
    dl_p = np.empty(2, np.float32)
    for i, d in enumerate(docs):
        ids_p[i], tfs_p[i], dl_p[i] = pack_tokens(d, vocab_p, 8)
    ids_n, tfs_n, dl_n = packer.pack_batch(docs, vocab_n, 8)
    assert np.array_equal(ids_p, ids_n)
    assert tfs_n[0, 0] == 255  # clamped
    assert np.array_equal(dl_p, dl_n)


def test_packer_separator_tokens_fall_back(packer):
    assert packer.pack_batch([["a b"]], {}, 4) is None
    assert packer.pack_batch([["a\nb"]], {}, 4) is None


def test_store_native_python_same_index():
    """A store built with the native packer and one built with the Python
    path produce identical lexical columns and vocab."""
    import tempfile
    from pathlib import Path

    import numpy as np

    from classmate_rag_tpu.index.store import IndexStore

    rng = np.random.default_rng(3)
    docs = [
        [f"w{i}" for i in rng.integers(0, 50, rng.integers(1, 20))]
        for _ in range(40)
    ]
    embs = rng.standard_normal((40, 8)).astype(np.float32)
    ids = [f"d{i}" for i in range(40)]

    stores = []
    for use_native in (True, False):
        st = IndexStore(8, Path(tempfile.mkdtemp()), slab_rows=16,
                        terms_per_chunk=12)
        if not use_native:
            st._packer_ok = False
        st.upsert(ids, embs, docs, [{}] * 40)
        stores.append(st)
    a, b = stores
    if a._packer is None:
        pytest.skip("native library not buildable in this environment")
    assert a.vocab == b.vocab
    assert np.array_equal(a.term_ids, b.term_ids)
    assert np.array_equal(a.tfs, b.tfs)
    assert np.array_equal(a.doc_len, b.doc_len)
