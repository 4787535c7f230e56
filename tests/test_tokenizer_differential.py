"""GGUF-embedded tokenizer differential vs the `tokenizers` library.

The GGUF decode path reconstructs tokenizers from `tokenizer.ggml.*`
metadata with from-scratch encoders (models/gguf.py: Viterbi unigram for
SPM-era llamas, byte-level BPE for Llama-3/Qwen — the reference's GGUF
lineup, rag/config.py:101-113). Tokenization bugs silently change
generated text, so both encoders are differentialed here against the
installed HuggingFace `tokenizers` implementations on synthetic vocabs
covering the same conventions:

- byte-level BPE: ByteLevel(add_prefix_space=False, use_regex=True) +
  rank-ordered merges — exact id-sequence agreement, including
  contractions, snake_case, digits, emoji/accents (multi-byte UTF-8),
  and whitespace runs; decode round-trips byte-exactly.
- unigram: Metaspace("▁", prepend_scheme="always", split=False) +
  score-based Viterbi — exact agreement on full-coverage vocabs (real
  SPM vocabs include every seen char + byte pieces, so the fallback
  conventions that differ between implementations never fire).
"""

import json
import random

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

from classmate_rag_tpu.models.gguf import GGUFTokenizer

BPE_CORPUS = [
    "Gradient descent minimizes the loss function iteratively.",
    "snake_case_identifiers and CamelCase appear in course_material.py",
    "The learning rate 0.001 controls step size; momentum=0.9 smooths!",
    "don't can't won't it's we're I'll they'd you've I'm",
    "  multiple   spaces\nand\nnewlines\ttabs",
]

HELD_OUT = [
    "unseen words zzz qqq float16 bf16 epsilon_rule!",
    "a.b.c(d)=e[f]; print('hello world')  # comment",
    "Mixed: don't touch snake_case 123 times...",
    "emoji \U0001f600 and accents: café naïve résumé",
    "numbers 3.14159 2e-5 0xFF 1_000_000",
    "",
    " ",
    "trailing space ",
]


def _bpe_pair():
    hf = Tokenizer(models.BPE(unk_token=None))
    hf.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True
    )
    hf.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=480, special_tokens=["<eos>"], show_progress=False,
        # Real Llama-3/Qwen vocabs carry the full 256-byte alphabet, so
        # every text is representable without unk fallback.
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    hf.train_from_iterator(BPE_CORPUS * 5, trainer)
    d = json.loads(hf.to_str())
    vocab = d["model"]["vocab"]
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    meta = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": [" ".join(m) for m in d["model"]["merges"]],
        "tokenizer.ggml.eos_token_id": vocab["<eos>"],
        "tokenizer.ggml.add_bos_token": False,
    }
    return hf, GGUFTokenizer(meta, max_length=4096)


def test_byte_bpe_matches_tokenizers_library():
    hf, ours = _bpe_pair()
    for text in BPE_CORPUS + HELD_OUT:
        assert ours.encode_raw(text) == hf.encode(text).ids, repr(text)


def test_byte_bpe_decode_round_trips():
    _, ours = _bpe_pair()
    for text in BPE_CORPUS + HELD_OUT:
        assert ours.decode(ours.encode_raw(text)) == text, repr(text)


def test_unigram_viterbi_matches_tokenizers_library():
    texts = [
        "the learning rate controls the step size",
        "gradient descent minimizes loss",
        "stepwise rates rating the the the",
        "a b c abc",
        "rates ratings",
        "the theater",
        "",
    ]
    chars = sorted({c for t in texts for c in t if c != " "})
    pieces = ["<unk>", "<s>", "</s>", "▁"]
    scores = [0.0, 0.0, 0.0, -9.5]
    rnd = random.Random(5)
    # Distinct scores everywhere: equal-score ties may legitimately
    # break differently between Viterbi implementations.
    for c in chars:
        pieces.append(c)
        scores.append(-10.0 + rnd.random() * 0.01)
        pieces.append("▁" + c)
        scores.append(-10.0 + rnd.random() * 0.01)
    for p in ["▁the", "▁lear", "ning", "rate", "▁rate", "step",
              "▁step", "size", "▁size", "ing", "ent", "▁grad",
              "desc", "loss", "▁loss", "es", "▁min", "imiz", "the"]:
        pieces.append(p)
        scores.append(-3.0 - rnd.random() * 2.0)

    hf = Tokenizer(models.Unigram(
        vocab=list(zip(pieces, scores)), unk_id=0, byte_fallback=False
    ))
    hf.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always", split=False
    )
    meta = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": pieces,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": False,
    }
    ours = GGUFTokenizer(meta, max_length=4096)
    for t in texts:
        assert ours.encode_raw(t) == hf.encode(t).ids, repr(t)
