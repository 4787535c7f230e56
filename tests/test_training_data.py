"""Training-pair mining and end-to-end fine-tuning on mined pairs."""

import numpy as np
import pytest

import jax.numpy as jnp

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.training.data import encode_pairs, mine_pairs


@pytest.fixture()
def catalog(tmp_path):
    cat = Catalog.load_or_create(tmp_path)
    texts = [
        "The derivative measures instantaneous change. It is the limit of "
        "the difference quotient as the step shrinks to zero.",
        "Eigenvalues characterize how linear transformations stretch "
        "eigenvector directions. They solve the characteristic polynomial.",
        "Boil the pasta for nine minutes in salted water. Drain it and add "
        "the tomato sauce with fresh basil leaves.",
        "Gradient descent iteratively updates the parameters. The learning "
        "rate controls how large each update step becomes.",
    ] * 4
    for i, t in enumerate(texts):
        cat.upsert(CatalogEntry(f"id{i}", t, tokenize(t, "en"), {}))
    return cat


def test_mine_pairs_deterministic_and_nonempty(catalog):
    a = mine_pairs(catalog, max_pairs=100)
    b = mine_pairs(catalog, max_pairs=100)
    assert a == b
    assert len(a) == len(catalog)
    for q, p in a:
        assert q.strip() and p.strip()
        assert len(q) < len(p) + 200


def test_encode_pairs_shapes(catalog):
    from classmate_rag_tpu.embeddings.tokenizer import HashTokenizer

    pairs = mine_pairs(catalog)
    batches = list(encode_pairs(pairs, HashTokenizer(vocab_size=1024),
                                batch_size=8, seq_len=32))
    assert batches
    q_ids, q_mask, p_ids, p_mask = batches[0]
    assert q_ids.shape == (8, 32)
    assert q_mask.sum() > 0


def test_finetune_on_mined_pairs_improves_loss(catalog):
    from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
    from classmate_rag_tpu.embeddings.tokenizer import HashTokenizer
    from classmate_rag_tpu.parallel import training_mesh
    from classmate_rag_tpu.training import make_train_step

    cfg = EncoderConfig.small_test()
    mesh = training_mesh(8)
    init_state, step = make_train_step(cfg, mesh, learning_rate=3e-4)
    state = init_state(init_params(cfg, "mined"))

    pairs = mine_pairs(catalog)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    batch = next(iter(encode_pairs(pairs, tok, batch_size=8, seq_len=32)))
    arrays = [jnp.asarray(a) for a in batch]

    losses = []
    for _ in range(6):
        state, loss = step(state, *arrays)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
