"""Prompting, citation enforcement, extractive runner, TPU decoder."""

import numpy as np

from classmate_rag_tpu.generation import (
    ExtractiveRunner,
    build_general_messages,
    build_grounded_messages,
    enforce_citations,
    format_context_blocks,
)


def _items(texts, source="src.txt"):
    return [
        {"document": t, "metadata": {"source_path": source}} for t in texts
    ]


class TestPrompting:
    def test_blocks_numbered_and_prov_aligned(self):
        ctx, prov = format_context_blocks(_items(["alpha", "beta"]))
        assert ctx == "[1] alpha\n\n[2] beta"
        assert prov == ["src.txt", "src.txt"]

    def test_budget_breaks_but_prov_already_appended(self):
        # Second block exceeds budget: loop breaks AFTER recording its prov.
        ctx, prov = format_context_blocks(
            _items(["short", "x" * 100]), max_total_chars=20
        )
        assert ctx == "[1] short"
        assert len(prov) == 2

    def test_empty_documents_skipped_but_numbered(self):
        ctx, prov = format_context_blocks(_items(["", "beta"]))
        assert ctx == "[2] beta"
        assert len(prov) == 2

    def test_grounded_messages_roles(self):
        msgs = build_grounded_messages("q?", "[1] ctx")
        assert [m["role"] for m in msgs] == ["system", "user"]
        assert "citations" in msgs[0]["content"].lower() or "[1]" in msgs[0]["content"]
        assert "Context:" in msgs[1]["content"]

    def test_general_messages(self):
        msgs = build_general_messages("hello")
        assert msgs[1]["content"] == "hello"


class TestCitations:
    def test_out_of_range_removed_and_adjacent_compacted(self):
        out = enforce_citations("True [1] and [7]. Also [1] [2].", ["a", "b"])
        assert "[7]" not in out
        assert "[1][2]" in out

    def test_sources_block_in_cite_order(self):
        out = enforce_citations(
            "claim [2] and [1]", ["first.txt", "second.txt"],
            add_sources_block=True,
        )
        lines = out.splitlines()
        assert lines[1] == "Sources"
        assert lines[2] == "[2] second.txt"
        assert lines[3] == "[1] first.txt"

    def test_empty_answer(self):
        assert enforce_citations("   ", ["a"]) == ""


class TestExtractiveRunner:
    CTX = (
        "[1] The derivative measures the rate of change. "
        "Unrelated filler sentence here.\n\n"
        "[2] Pasta should boil for nine minutes."
    )

    def _chat(self, question):
        msgs = [
            {"role": "system", "content": "sys"},
            {"role": "user",
             "content": f"Context:\n{self.CTX}\n\nQuestion:\n{question}\n\nAnswer:"},
        ]
        return ExtractiveRunner().chat(msgs)

    def test_answers_from_matching_block_with_citation(self):
        ans = self._chat("what is the derivative rate of change")
        assert "[1]" in ans
        assert "derivative" in ans.lower()
        assert "[2]" not in ans

    def test_unknown_when_no_overlap(self):
        ans = self._chat("quantum chromodynamics lagrangian")
        assert ans == "I don't know."

    def test_italian_unknown(self):
        msgs = [{"role": "user",
                 "content": "Context:\n[1] pasta\n\nQuestion:\nche cosa è la "
                            "meccanica quantistica relativistica\n\nAnswer:"}]
        ans = ExtractiveRunner().chat(msgs)
        assert ans == "Non lo so."

    def test_general_prompt_fallback(self):
        ans = ExtractiveRunner().chat([{"role": "user", "content": "just a question"}])
        assert "information" in ans or "informazioni" in ans

    def test_deterministic(self):
        a = self._chat("derivative rate of change")
        b = self._chat("derivative rate of change")
        assert a == b


class TestTPUDecoder:
    def test_generate_shapes_and_determinism(self):
        import jax.numpy as jnp

        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, init_params, make_generate_fn,
        )

        cfg = DecoderConfig.tiny_test()
        params = init_params(cfg, "t")
        gen = make_generate_fn(cfg, max_seq=64, max_new=6)
        prompts = jnp.asarray([[0, 0, 4, 5, 6, 7]], jnp.int32)
        plen = jnp.asarray([4], jnp.int32)
        a = np.asarray(gen(params, prompts, plen, 1, 0.0, 0.95, 2))
        b = np.asarray(gen(params, prompts, plen, 1, 0.0, 0.95, 2))
        assert a.shape == (1, 6)
        assert np.array_equal(a, b)

    def test_left_padding_invariance(self):
        import jax.numpy as jnp

        from classmate_rag_tpu.models.decoder import (
            DecoderConfig, init_params, make_generate_fn,
        )

        cfg = DecoderConfig.tiny_test()
        params = init_params(cfg, "t")
        gen6 = make_generate_fn(cfg, max_seq=64, max_new=5)
        gen10 = make_generate_fn(cfg, max_seq=64, max_new=5)
        short = gen6(params, jnp.asarray([[0, 0, 9, 8, 7, 6]], jnp.int32),
                     jnp.asarray([4], jnp.int32), 0, 0.0, 0.95, 2)
        longpad = gen10(
            params,
            jnp.asarray([[0, 0, 0, 0, 0, 0, 9, 8, 7, 6]], jnp.int32),
            jnp.asarray([4], jnp.int32), 0, 0.0, 0.95, 2,
        )
        assert np.array_equal(np.asarray(short), np.asarray(longpad))


class TestBatchedDecode:
    """chat_batch must produce exactly what per-prompt chat produces
    (greedy decode; left-padded batch shares the device loop)."""

    def test_tpu_runner_chat_batch_matches_chat(self):
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner
        from classmate_rag_tpu.models.decoder import DecoderConfig

        runner = TPUDecodeRunner(
            config=DecoderConfig.tiny_test(), max_new_tokens=6, max_seq=64,
        )
        convs = [
            [{"role": "user", "content": "what is a derivative"}],
            [{"role": "user", "content": "explain eigenvalues simply"}],
            [{"role": "user", "content": "ciao come stai oggi"}],
        ]
        singles = [runner.chat(c, temperature=0.0) for c in convs]
        batched = runner.chat_batch(convs, temperature=0.0)
        assert batched == singles

    def test_runner_clamps_window_to_model_max_seq(self):
        """A configured n_ctx beyond the checkpoint's trained positions
        must clamp (KV cache + RoPE run to max_seq), and get_runner must
        pass the configured window through (reference n_ctx parity — the
        old 1024 default truncated the 3500-char context budget)."""
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner
        from classmate_rag_tpu.models.decoder import DecoderConfig

        cfg = DecoderConfig.tiny_test()  # max_seq=128
        runner = TPUDecodeRunner(
            config=cfg, max_new_tokens=768, max_seq=4096,
        )
        assert runner.max_seq == cfg.max_seq == 128
        assert runner.max_new <= runner.max_seq - 16

    def test_generate_ids_batch_pads_to_pow2(self):
        from classmate_rag_tpu.generation.runner import TPUDecodeRunner
        from classmate_rag_tpu.models.decoder import DecoderConfig

        runner = TPUDecodeRunner(
            config=DecoderConfig.tiny_test(), max_new_tokens=4, max_seq=32,
        )
        outs = runner.generate_ids_batch([[5, 6], [7], [8, 9, 10]])
        assert len(outs) == 3
        for ids in outs:
            assert all(t not in runner.eos_ids for t in ids)

    def test_extractive_chat_batch(self):
        from classmate_rag_tpu.generation.runner import ExtractiveRunner

        r = ExtractiveRunner()
        convs = [
            [{"role": "user", "content":
              "Context:\n[1] The sky is blue because of Rayleigh "
              "scattering.\n\nQuestion:\nwhy is the sky blue\n\nAnswer:"}],
            [{"role": "user", "content": "no context here"}],
        ]
        assert r.chat_batch(convs) == [r.chat(c) for c in convs]


# ---------------------------------------------------------------------------
# Round-4 review regressions
# ---------------------------------------------------------------------------

def test_decode_stops_on_any_declared_eos():
    """A model that emits an EARLIER eos id (Llama-3's <|end_of_text|>
    when <|eot_id|> is the chat ender) must stop the row — the old loop
    only stopped on eos_ids[-1] and kept sampling past the eos (review
    finding r4)."""
    import jax.numpy as jnp

    from classmate_rag_tpu.models.decoder import (
        DecoderConfig, init_params, make_generate_fn,
    )

    config = DecoderConfig.tiny_test()
    params = init_params(config, "eos-fixture")
    gen = make_generate_fn(config, 32, 8)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    # Greedy output with a single declared eos that never fires:
    toks_free = np.asarray(
        gen(params, ids, lens, 0, 0.0, 0.95,
            jnp.asarray([9999], jnp.int32))
    )[0]
    first = int(toks_free[0])
    # Declare the FIRST emitted token as one of several eos ids: the row
    # must stop immediately — every later slot is the pad (eos) token.
    toks_stop = np.asarray(
        gen(params, ids, lens, 0, 0.0, 0.95,
            jnp.asarray([first, 9999], jnp.int32))
    )[0]
    assert int(toks_stop[0]) == first
    assert all(int(t) == first for t in toks_stop[1:]), toks_stop


def test_extractive_blocks_keep_multi_paragraph_chunks():
    """Chunk text may contain blank lines; splitting the context on
    '\\n\\n' dropped every continuation paragraph (review finding r4)."""
    from classmate_rag_tpu.generation.runner import ExtractiveRunner

    ctx = (
        "[1] Introductory framing sentence.\n\n"
        "The quagga zebra hybrid fact lives here.\n\n"
        "[2] Second block text."
    )
    blocks = ExtractiveRunner._split_blocks(ctx)
    assert [n for n, _ in blocks] == [1, 2]
    assert "quagga zebra hybrid" in blocks[0][1]
    ans = ExtractiveRunner().answer_grounded(
        "what about the quagga zebra hybrid", ctx
    )
    assert "[1]" in ans and "quagga" in ans


def test_tpu_runner_honors_max_tokens():
    from classmate_rag_tpu.generation.runner import TPUDecodeRunner
    from classmate_rag_tpu.models.decoder import DecoderConfig

    runner = TPUDecodeRunner(
        config=DecoderConfig.tiny_test(), max_seq=64, max_new_tokens=16,
    )
    full = runner.generate_ids_batch([[5, 6, 7]], temperature=0.0)
    capped = runner.generate_ids_batch(
        [[5, 6, 7]], temperature=0.0, max_tokens=3
    )
    assert len(capped[0]) <= 3
    assert capped[0] == full[0][:len(capped[0])]
