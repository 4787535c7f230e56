"""Embedding stack: tokenizer, JAX encoder, hashing backend, disk cache."""

import numpy as np
import pytest

from classmate_rag_tpu.embeddings.hashing import HashingEmbedder
from classmate_rag_tpu.embeddings.cache import CachingEmbedder
from classmate_rag_tpu.embeddings.tokenizer import (
    BOS_ID,
    EOS_ID,
    HashTokenizer,
    bucket_length,
    pad_to_bucket,
)


def test_hash_tokenizer_deterministic_and_bounded():
    tok = HashTokenizer()
    a = tok.encode("Hello, world! Ciao mondo.")
    b = tok.encode("Hello, world! Ciao mondo.")
    assert a == b
    assert a[0] == BOS_ID and a[-1] == EOS_ID
    assert all(0 <= i < tok.vocab_size for i in a)


def test_hash_tokenizer_truncates():
    tok = HashTokenizer()
    ids = tok.encode("word " * 2000, max_length=64)
    assert len(ids) == 64
    assert ids[-1] == EOS_ID


def test_bucketing_and_padding():
    assert bucket_length(10) == 32
    assert bucket_length(33) == 64
    assert bucket_length(1000) == 512
    ids, mask = pad_to_bucket([[0, 5, 2], [0, 2]], 8)
    assert ids.shape == (2, 8)
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    assert mask[1].tolist() == [1, 1, 0, 0, 0, 0, 0, 0]


def test_hashing_embedder_similarity_ordering():
    emb = HashingEmbedder(dim=256)
    vecs = emb.encode_passages([
        "the derivative measures the rate of change of a function",
        "derivatives and rates of change in calculus functions",
        "recipes for cooking pasta with tomato sauce",
    ])
    q = emb.encode_queries(["what is the derivative rate of change"])[0]
    sims = vecs @ q
    assert sims[0] > sims[2]
    assert sims[1] > sims[2]
    # All vectors unit-norm.
    norms = np.linalg.norm(vecs, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_jax_encoder_shapes_and_determinism():
    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    enc = E5Encoder(model_name="test-tiny", config=EncoderConfig.small_test())
    out1 = enc.encode_passages(["hello world", "a longer sentence about math"])
    out2 = enc.encode_passages(["hello world", "a longer sentence about math"])
    assert out1.shape == (2, enc.dim)
    np.testing.assert_allclose(out1, out2, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out1, axis=1), 1.0, atol=1e-4)
    # Query and passage prefixes must differ.
    q = enc.encode_queries(["hello world"])
    assert not np.allclose(q[0], out1[0])


def test_jax_encoder_batch_invariance():
    """Same text embeds identically alone or inside a larger batch."""
    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    enc = E5Encoder(model_name="test-tiny", config=EncoderConfig.small_test())
    alone = enc.encode_passages(["the same text"])[0]
    batch = enc.encode_passages(["other a", "the same text", "other b longer text here"])
    np.testing.assert_allclose(alone, batch[1], atol=1e-4)


def test_encode_queries_device_matches_host():
    """The device-resident query path must produce the host path's
    vectors exactly (same dispatches, just no intermediate fetch) —
    including when queries span multiple length buckets, which exercises
    the on-device order-restoring gather."""
    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    enc = E5Encoder(model_name="test-tiny", config=EncoderConfig.small_test())
    texts = [
        "short one",
        "a much longer question about the rate of change " * 8,
        "mid length question here",
        "tiny",
    ]
    host = enc.encode_queries(texts)
    dev = np.asarray(enc.encode_queries_device(texts), np.float32)
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_caching_embedder_device_path_gated(tmp_path):
    """CachingEmbedder exposes encode_queries_device iff its base does."""
    from classmate_rag_tpu.embeddings.cache import CachingEmbedder
    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.hashing import HashingEmbedder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    jax_enc = E5Encoder(
        model_name="test-tiny", config=EncoderConfig.small_test()
    )
    cached = CachingEmbedder(jax_enc, cache_dir=str(tmp_path / "a"))
    assert getattr(cached, "encode_queries_device", None) is not None
    out = np.asarray(cached.encode_queries_device(["hello"]), np.float32)
    np.testing.assert_allclose(out, cached.encode_queries(["hello"]), atol=1e-6)

    hash_cached = CachingEmbedder(
        HashingEmbedder(), cache_dir=str(tmp_path / "b")
    )
    assert getattr(hash_cached, "encode_queries_device", None) is None


def test_caching_embedder_device_path_honors_cache_reads(tmp_path):
    """When every query is already in the disk cache, the device path
    must serve the CACHED vectors (repeat-question workloads keep their
    cache benefit) without touching the encoder."""
    from classmate_rag_tpu.embeddings.cache import CachingEmbedder
    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    enc = E5Encoder(model_name="test-tiny", config=EncoderConfig.small_test())
    cached = CachingEmbedder(enc, cache_dir=str(tmp_path))
    warm = cached.encode_queries(["alpha beta", "gamma"])  # fills the cache

    calls = []
    orig = enc.encode_queries_device
    enc.encode_queries_device = lambda texts: calls.append(texts) or orig(texts)
    out = np.asarray(cached.encode_queries_device(["alpha beta", "gamma"]))
    assert calls == []  # all-hit: never reached the encoder
    np.testing.assert_allclose(out, warm, atol=1e-6)

    # A miss in the batch falls through to the device encoder.
    out2 = cached.encode_queries_device(["alpha beta", "NEW question"])
    assert len(calls) == 1
    np.testing.assert_allclose(
        np.asarray(out2)[0], warm[0], atol=1e-5
    )


def test_caching_embedder_roundtrip(tmp_path):
    base = HashingEmbedder(dim=64)
    calls = {"n": 0}
    orig = base.encode_passages

    def counting(texts):
        calls["n"] += len(texts)
        return orig(texts)

    base.encode_passages = counting
    cached = CachingEmbedder(base, cache_dir=str(tmp_path))
    texts = ["alpha beta", "gamma delta"]
    v1 = cached.encode_passages(texts)
    assert calls["n"] == 2
    v2 = cached.encode_passages(texts + ["epsilon zeta"])
    assert calls["n"] == 3  # only the new text is a miss
    np.testing.assert_allclose(v1, v2[:2])


def test_caching_embedder_corrupted_file_is_miss(tmp_path):
    base = HashingEmbedder(dim=32)
    cached = CachingEmbedder(base, cache_dir=str(tmp_path))
    v1 = cached.encode_queries(["text one"])
    # Corrupt the cache file.
    files = list(tmp_path.rglob("*.npy"))
    assert files
    files[0].write_bytes(b"garbage")
    v2 = cached.encode_queries(["text one"])
    np.testing.assert_allclose(v1, v2)


def test_data_parallel_encode_identity_and_placement():
    """Bulk encode sharded over the 8-device ("data",) mesh produces the
    SAME vectors as the single-device path (per-row math is batch
    independent), and the dispatched batches are actually sharded —
    every mesh device holds a batch slice, so ingest/rebuild throughput
    scales with chips instead of idling seven of them."""
    import jax

    from classmate_rag_tpu.embeddings.encoder import E5Encoder
    from classmate_rag_tpu.embeddings.model import EncoderConfig

    texts = [f"document number {i} about topic {i % 5}" for i in range(24)]
    single = E5Encoder(
        model_name="test-tiny", config=EncoderConfig.small_test(),
        data_parallel=1,
    )
    dp = E5Encoder(
        model_name="test-tiny", config=EncoderConfig.small_test(),
        data_parallel=0,   # auto → 8 virtual devices
    )
    assert dp._dp == 8

    want = single.encode_passages(texts)
    got = dp.encode_passages(texts)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # Placement proof: the dispatched device batch is split across the
    # mesh, one row-slice per device.
    ids, mask = np.ones((8, 16), np.int32), np.ones((8, 16), np.int32)
    out = dp._dispatch_bucket(ids, mask)
    devices = {s.device for s in out.addressable_shards}
    assert len(devices) == 8
    assert all(s.data.shape[0] == 1 for s in out.addressable_shards)

    # Query path stays bit-identical too (device and host variants).
    qw = single.encode_queries(texts[:4])
    qg = dp.encode_queries(texts[:4])
    np.testing.assert_allclose(qg, qw, atol=1e-6)
