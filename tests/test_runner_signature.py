"""Generation-runner public surfaces.

Mirrors the reference's mock-based runner-surface lock
(tests/test_runner_signature.py there): the llama.cpp shim's test is
skipped when llama_cpp isn't installed; the always-available backends'
surfaces are asserted directly.
"""

from unittest.mock import MagicMock, patch

import pytest

from classmate_rag_tpu.generation import ExtractiveRunner, get_runner


def test_extractive_surface():
    r = ExtractiveRunner()  # no-arg constructible
    out = r.chat([{"role": "user", "content": "hi"}])
    assert isinstance(out, str)
    assert isinstance(r.generate("hi"), str)
    assert r.model_name == "extractive"


def test_get_runner_offline_defaults_to_extractive(tmp_index_env):
    r = get_runner(tmp_index_env)
    assert isinstance(r, ExtractiveRunner)


def test_llama_cpp_shim_surface():
    llama_cpp = pytest.importorskip("llama_cpp")
    from classmate_rag_tpu.generation.runner import LlamaCppRunner

    fake = MagicMock()
    fake.create_chat_completion.return_value = {
        "choices": [{"message": {"content": "ok"}}]
    }
    fake.return_value = {"choices": [{"text": "ok"}]}
    with patch.object(llama_cpp, "Llama", return_value=fake), \
         patch("pathlib.Path.exists", return_value=True):
        runner = LlamaCppRunner(model_path="/tmp/fake.gguf")
        assert runner.chat([{"role": "user", "content": "q"}]) == "ok"
        assert hasattr(runner, "generate")


def test_tpu_decode_runner_surface():
    from classmate_rag_tpu.generation.runner import TPUDecodeRunner
    from classmate_rag_tpu.models.decoder import DecoderConfig

    r = TPUDecodeRunner(config=DecoderConfig.tiny_test(),
                        max_new_tokens=4, max_seq=64)
    out = r.chat([{"role": "user", "content": "hello"}], max_tokens=4)
    assert isinstance(out, str)  # gibberish with random weights, but a str
    assert r.eos_ids == [2]
