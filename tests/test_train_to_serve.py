"""The training loop is closed: fine-tuned checkpoints feed the product.

Round-2 gap #4: tools/train_encoder.py wrote orbax checkpoints nobody
could consume. Now ``ENCODER_CHECKPOINT`` makes the product embedder
serve a fine-tune, and ``rebuild`` accepts a checkpoint directory as the
"new model" (the reference's model-swap migration,
/root/reference/rag/admin/backup.py:205-236, pointed at our own training
output). This test runs the whole loop on a tiny synthetic corpus:

  train (InfoNCE over the dp×tp mesh) → checkpoint → ENCODER_CHECKPOINT
  runtime → ingest → rebuild onto the trained weights → ask

and asserts held-out dense retrieval accuracy IMPROVES end-to-end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
from classmate_rag_tpu.embeddings.tokenizer import load_tokenizer
from classmate_rag_tpu.metadata import normalize_cli_metadata
from classmate_rag_tpu.parallel import training_mesh
from classmate_rag_tpu.training import make_train_step
from classmate_rag_tpu.training.checkpoint import (
    load_encoder_checkpoint,
    save_train_state,
)
from classmate_rag_tpu.training.data import encode_pairs

# 8 "courses". Doc words and query words are DISJOINT vocabularies: the
# training pairs (query_i, doc_i) are the only thing linking them, so
# retrieval with the query vocabulary cannot be solved by lexical
# overlap — a random-init encoder has nothing to go on. Held-out queries
# reuse a different template over a query-word subset AND carry a
# lexical DISTRACTOR word from the NEXT course's doc, so an untrained
# encoder is actively pulled to the wrong document; only the learned
# query↔doc alignment wins.
WORDS = [
    ["tensor", "gradient", "backprop", "optimizer", "softmax", "epoch"],
    ["sonnet", "stanza", "meter", "rhyme", "verse", "couplet"],
    ["glacier", "moraine", "crevasse", "icefall", "serac", "firn"],
    ["enzyme", "substrate", "catalysis", "kinase", "ligand", "protein"],
    ["fresco", "pigment", "plaster", "mural", "tempera", "gesso"],
    ["torque", "flywheel", "camshaft", "piston", "crankshaft", "valve"],
    ["sonata", "allegro", "crescendo", "tempo", "cadence", "fugue"],
    ["plankton", "krill", "baleen", "cetacean", "pod", "blowhole"],
]
QWORDS = [
    ["apple", "banana", "cherry"],
    ["delta", "echo", "foxtrot"],
    ["green", "harbor", "island"],
    ["jungle", "kitten", "lemon"],
    ["mango", "noodle", "orange"],
    ["pepper", "quartz", "river"],
    ["sunset", "turtle", "umbrella"],
    ["violet", "walnut", "yellow"],
]


def _doc_text(i):
    w = WORDS[i]
    return (
        f"Lecture notes on {w[0]} and {w[1]}. The {w[2]} interacts with "
        f"the {w[3]}. Remember that {w[4]} relates to {w[5]} in every "
        f"exercise about {w[0]}."
    )


def _train_query(i):
    q = QWORDS[i]
    return f"explain {q[0]} {q[1]} {q[2]}"


def _heldout_query(i):
    q = QWORDS[i]
    distractor = WORDS[(i + 1) % len(WORDS)][0]
    return f"overview of {q[1]} {q[2]} near {distractor}"


@pytest.fixture()
def checkpoints(tmp_path_factory):
    """Fine-tune the tiny encoder on (train-query, doc) pairs; return
    (untrained step_0 dir, trained dir) — both self-describing."""
    root = tmp_path_factory.mktemp("t2s")
    config = EncoderConfig.small_test()
    mesh = training_mesh(8)
    tok = load_tokenizer(None, max_length=48, vocab_size=config.vocab_size)

    init_state, train_step = make_train_step(
        config, mesh, learning_rate=3e-3,
    )
    state = init_state(init_params(config, "train-to-serve"))
    save_train_state(state, root / "ck_base", config=config)

    pairs = [(_train_query(i), _doc_text(i)) for i in range(len(WORDS))]
    batches = list(encode_pairs(pairs, tok, batch_size=8, seq_len=48))
    for _ in range(60):
        for batch in batches:
            state, loss = train_step(state, *batch)
    save_train_state(state, root / "ck_tuned", config=config)
    return root / "ck_base", root / "ck_tuned", float(loss)


def test_checkpoint_roundtrip_self_describing(checkpoints):
    base, tuned, _ = checkpoints
    params, config, tag = load_encoder_checkpoint(tuned)
    assert config.hidden == EncoderConfig.small_test().hidden
    assert tag.startswith("ckpt-")
    assert params["word_emb"].shape == (config.vocab_size, config.hidden)
    # Distinct fine-tunes must key the embedding cache distinctly.
    _, _, tag_base = load_encoder_checkpoint(base)
    assert tag_base != tag


def test_train_to_serve_improves_heldout_retrieval(
    checkpoints, tmp_index_env, tmp_path, monkeypatch
):
    base, tuned, final_loss = checkpoints
    assert final_loss < 0.5, "training must have overfit the tiny corpus"

    from classmate_rag_tpu.admin.backup import rebuild_embeddings
    from classmate_rag_tpu.config import load_config
    from classmate_rag_tpu.pipeline.ingest import ingest_file
    from classmate_rag_tpu.pipeline.runtime import get_runtime, reset_runtime

    # Product runtime serving the UNTRAINED checkpoint via the knob.
    monkeypatch.setenv("EMBEDDING_BACKEND", "e5")
    monkeypatch.setenv("ENCODER_CHECKPOINT", str(base))
    load_config(reload=True)
    reset_runtime()
    rt = get_runtime(reload=True)
    assert "@ckpt-" in rt.embedder.model_name

    for i in range(len(WORDS)):
        p = tmp_path / f"course{i}.txt"
        p.write_text(_doc_text(i))
        ingest_file(
            path=p, doc_meta=normalize_cli_metadata(course=f"c{i}"),
            runtime=rt,
        )

    def dense_accuracy():
        hits = 0
        for i in range(len(WORDS)):
            res = rt.retriever.retrieve(
                question=_heldout_query(i), top_k=1, hybrid=False,
            )
            if res and res[0]["metadata"].get("course") == f"c{i}":
                hits += 1
        return hits / len(WORDS)

    acc_before = dense_accuracy()

    # Migrate onto the trained weights through the product rebuild verb
    # (checkpoint dir as the "new model").
    out = rebuild_embeddings(str(tuned), runtime=rt)
    assert out["updated"] == len(WORDS)
    assert "@ckpt-" in rt.embedder.model_name
    acc_after = dense_accuracy()

    assert acc_after > acc_before, (
        f"held-out retrieval accuracy did not improve: "
        f"{acc_before} -> {acc_after}"
    )
    assert acc_after >= 0.75, f"trained accuracy too low: {acc_after}"

    # And the ask path serves through the swapped store end-to-end.
    from classmate_rag_tpu.pipeline.ask import ask_question

    res = ask_question(
        question=_heldout_query(0), filters=normalize_cli_metadata(),
        runtime=rt, top_k=2,
    )
    assert res.retrieved
