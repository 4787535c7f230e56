"""E5 parity vs sentence-transformers — runs only when real weights exist.

BASELINE exit criterion for the encoder (SURVEY §7 step 2): cosine
agreement with sentence-transformers within 1e-2. This environment has no
downloaded weights (zero egress), so the test skips unless a local
snapshot of the model is found; on a machine with weights it validates the
whole JAX forward (tokenizer → layers → pooling → norm) against the
reference implementation.
"""

import numpy as np
import pytest

from classmate_rag_tpu.config import load_config
from classmate_rag_tpu.embeddings import _find_local_snapshot

SENTENCES = [
    "The derivative measures the instantaneous rate of change.",
    "La lezione di oggi riguarda le equazioni differenziali.",
    "query prefixes change the embedding",
]


@pytest.fixture(scope="module")
def snapshot():
    cfg = load_config()
    snap = _find_local_snapshot(cfg.embedding_model_name, cfg.embedding_model_dir)
    if snap is None:
        pytest.skip("no local E5 snapshot (offline environment)")
    return snap


def test_cosine_agreement_with_sentence_transformers(snapshot):
    st = pytest.importorskip("sentence_transformers")
    from classmate_rag_tpu.embeddings.encoder import E5Encoder

    enc = E5Encoder(model_dir=snapshot)
    if not enc.has_pretrained_weights:
        pytest.skip("snapshot found but weights failed to load")

    ref_model = st.SentenceTransformer(snapshot)
    ours_q = enc.encode_queries(SENTENCES)
    ref_q = ref_model.encode(
        [f"query: {s}" for s in SENTENCES], normalize_embeddings=True
    )
    cos = np.sum(ours_q * ref_q, axis=1)
    assert np.all(cos > 0.99), cos

    ours_p = enc.encode_passages(SENTENCES)
    ref_p = ref_model.encode(
        [f"passage: {s}" for s in SENTENCES], normalize_embeddings=True
    )
    cos_p = np.sum(ours_p * ref_p, axis=1)
    assert np.all(cos_p > 0.99), cos_p
