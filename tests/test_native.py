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
