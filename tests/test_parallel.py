"""Fused hybrid step, sharded SPMD retrieval, contrastive training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 64

DOCS = [
    "the derivative measures the rate of change of a function",
    "the integral accumulates the area under a curve",
    "matrix multiplication composes linear transformations",
    "eigenvalues and eigenvectors characterize linear maps",
    "derivative rules include the product rule and chain rule",
    "cooking pasta requires boiling water and adding salt",
    "gradient descent updates parameters against the gradient",
    "the chain rule differentiates composed functions",
]


@pytest.fixture(scope="module")
def built():
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp())
    rng = np.random.default_rng(11)
    store = IndexStore(DIM, tmp / "dense", slab_rows=16, terms_per_chunk=32)
    catalog = Catalog.load_or_create(tmp / "bm25")
    ids = [f"id{i}" for i in range(len(DOCS))]
    embs = rng.standard_normal((len(DOCS), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    tokens = [tokenize(t, "en") for t in DOCS]
    metas = [{"course": "math" if i < 5 else "misc"} for i in range(len(DOCS))]
    for i, cid in enumerate(ids):
        catalog.upsert(CatalogEntry(cid, DOCS[i], tokens[i], metas[i]))
    store.upsert(ids, embs, tokens, metas)
    return store, catalog, ids, embs, tokens


class TestFusedHybridStep:
    def test_matches_per_query_path(self, built):
        from classmate_rag_tpu.retrieval.hybrid import HybridRetriever
        from classmate_rag_tpu.embeddings.hashing import HashingEmbedder

        store, catalog, ids, embs, tokens = built

        class FixedEmbedder:
            model_name = "fixed"
            dim = DIM

            def encode_queries(self, texts):
                rng = np.random.default_rng(abs(hash(texts[0])) % 2**31)
                v = rng.standard_normal((len(texts), DIM)).astype(np.float32)
                return v / np.linalg.norm(v, axis=1, keepdims=True)

            encode_passages = encode_queries

        emb = FixedEmbedder()
        retriever = HybridRetriever(
            store=store, catalog=catalog, embedder=emb,
            k_vector=4, k_bm25=4, mmr_max_pool=6,
        )
        questions = [
            "derivative rate of change rule",
            "eigenvalues of linear maps",
        ]
        per_query = [
            retriever.retrieve(question=q, top_k=4) for q in questions
        ]

        q_vecs = np.stack([emb.encode_queries([q])[0] for q in questions])
        q_terms = [tokenize(q, "en") for q in questions]
        out = store.hybrid_topk_batch(
            q_vecs, q_terms, None, k_vector=4, k_bm25=4, top_k=4, pool=6,
        )
        rows = np.asarray(out.rows)
        for b, results in enumerate(per_query):
            batch_ids = [store.ids[r] for r in rows[b] if r >= 0]
            assert batch_ids == [r["id"] for r in results]
            fused = np.asarray(out.fused[b])[: len(batch_ids)]
            for j, r in enumerate(results):
                assert abs(fused[j] - r["scores"]["fused"]) < 1e-5

    def test_filtered_batch(self, built):
        store, _, ids, embs, _ = built
        q_vecs = embs[:1]
        out = store.hybrid_topk_batch(
            q_vecs, [tokenize("derivative", "en")], {"course": "math"},
            top_k=8,
        )
        rows = np.asarray(out.rows)[0]
        for r in rows:
            if r >= 0:
                assert r < 5  # only 'math' rows


class TestShardedHybrid:
    def test_matches_single_device(self, built):
        from classmate_rag_tpu.parallel import corpus_mesh, make_sharded_hybrid_fn
        from classmate_rag_tpu.ops.hybrid_step import hybrid_query_step
        from classmate_rag_tpu.index.lexical import device_fns

        store, _, ids, embs, tokens = built
        assert len(jax.devices()) >= 8
        dev = store._sync_device()
        bias = store._mask_bias(None)
        subset_df, _ = device_fns()
        vpad = store.vocab_pad
        df = subset_df(dev["term_ids"], dev["tfs"], jnp.asarray(store.valid), vpad)

        rng = np.random.default_rng(5)
        q_vecs = rng.standard_normal((2, DIM)).astype(np.float32)
        q_vecs /= np.linalg.norm(q_vecs, axis=1, keepdims=True)
        q_terms = np.full((2, 8), -1, np.int32)
        q_counts = np.zeros((2, 8), np.float32)
        for j, t in enumerate(tokenize("derivative rule", "en")[:8]):
            tid = store.vocab.get(t)
            if tid is not None:
                q_terms[0, j] = tid
                q_counts[0, j] = 1.0
        q_terms[1, 0] = store.vocab.get("pasta", -1)
        q_counts[1, 0] = 1.0

        single = hybrid_query_step(
            dev["emb"], dev["term_ids"], dev["tfs"], dev["doc_len"], df,
            bias, jnp.asarray(q_vecs), jnp.asarray(q_terms),
            jnp.asarray(q_counts),
            k_vector=3, k_bm25=3, top_k=4, pool=2, vocab_pad=vpad,
        )

        mesh = corpus_mesh(8)
        fn = make_sharded_hybrid_fn(
            mesh, k_vector=3, k_bm25=3, top_k=4, pool=2, vocab_pad=vpad,
        )
        # Shard-friendly sizes: capacity 16 over 8 shards = 2 rows each.
        sharded = fn(
            dev["emb"], dev["term_ids"], dev["tfs"], dev["doc_len"],
            bias, jnp.asarray(q_vecs), jnp.asarray(q_terms),
            jnp.asarray(q_counts),
        )
        assert np.array_equal(np.asarray(single.rows), np.asarray(sharded.rows))
        np.testing.assert_allclose(
            np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
        )


class TestShardedSplitHybrid:
    """The split-frequency BM25 formulation carried into the SPMD path:
    bit-identical to the single-device hybrid_query_step_split."""

    N_SHARDS = 8
    N = 64          # 8 rows per shard
    L = 12
    DIMS = 32
    VOCAB = 100
    VPAD = 4096

    def _corpus(self, seed=7):
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((self.N, self.DIMS)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        # Skewed term distribution so some terms clear the head threshold.
        term_ids = np.full((self.N, self.L), -1, np.int32)
        tfs = np.zeros((self.N, self.L), np.uint8)
        for r in range(self.N):
            terms = np.unique(
                (rng.zipf(1.6, self.L) - 1).clip(0, self.VOCAB - 1)
            ).astype(np.int32)
            term_ids[r, : len(terms)] = terms
            tfs[r, : len(terms)] = rng.integers(1, 5, len(terms))
        doc_len = tfs.sum(axis=1).astype(np.float32)
        return emb, term_ids, tfs, doc_len

    def _run_both(self, bias_np, seg_cap=512, head_df_threshold=4):
        from classmate_rag_tpu.index.lexical import (
            build_split_layout, device_fns, shard_postings,
            shard_tail_ranges, split_query_arrays,
        )
        from classmate_rag_tpu.ops.hybrid_step import hybrid_query_step_split
        from classmate_rag_tpu.parallel import (
            corpus_mesh, make_sharded_split_hybrid_fn,
        )

        emb, term_ids, tfs, doc_len = self._corpus()
        layout = build_split_layout(
            term_ids, tfs, self.VOCAB,
            head_bytes_budget=1 << 20, head_df_threshold=head_df_threshold,
            seg_cap=seg_cap,
        )
        if head_df_threshold <= 4:
            assert (layout["lut"] >= 0).any(), "need head terms for coverage"
        assert (layout["offsets"][-1] > 0), "need tail postings for coverage"

        rng = np.random.default_rng(3)
        B, M = 3, 6
        q_vecs = rng.standard_normal((B, self.DIMS)).astype(np.float32)
        q_vecs /= np.linalg.norm(q_vecs, axis=1, keepdims=True)
        q_tids = np.full((B, M), -1, np.int32)
        q_counts = np.zeros((B, M), np.float32)
        # Query 0: head-heavy (tail when the layout has no head terms);
        # query 1: mixed; query 2: no terms.
        head_terms = np.where(layout["lut"] >= 0)[0]
        tail_terms = np.where(
            (layout["lut"] < 0)
            & (np.diff(layout["offsets"]) > 0)
        )[0]
        pool0 = head_terms if len(head_terms) >= 3 else tail_terms
        q_tids[0, :3] = pool0[:3]
        q_counts[0, :3] = 1.0
        q_tids[1, 0] = head_terms[0] if len(head_terms) else tail_terms[2]
        q_tids[1, 1:3] = tail_terms[:2]
        q_counts[1, :3] = 1.0
        has_terms = np.any(q_tids >= 0, axis=1, keepdims=True)

        qa = split_query_arrays(
            layout["lut"], layout["offsets"], q_tids, q_counts,
            r_cap=layout["r_cap"],
        )
        subset_df, _ = device_fns()
        keep = bias_np == 0.0
        df = subset_df(
            jnp.asarray(term_ids), jnp.asarray(tfs), jnp.asarray(keep),
            self.VPAD,
        )
        emb_bf = jnp.asarray(emb, jnp.bfloat16)
        knobs = dict(k_vector=3, k_bm25=3, top_k=4, pool=4, vocab_pad=self.VPAD)

        single = hybrid_query_step_split(
            emb_bf, jnp.asarray(layout["tf_head"]),
            jnp.asarray(layout["post_rows"]), jnp.asarray(layout["post_tfs"]),
            jnp.asarray(doc_len), df, jnp.asarray(bias_np),
            jnp.asarray(q_vecs),
            jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
            jnp.asarray(qa["u_starts"]), jnp.asarray(qa["u_lens"]),
            jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
            jnp.asarray(q_tids), jnp.asarray(q_counts),
            jnp.asarray(has_terms),
            r_cap=layout["r_cap"], **knobs,
        )

        n_local = self.N // self.N_SHARDS
        post_rows_sh, post_tfs_sh, offsets_sh = shard_postings(
            layout["post_rows"], layout["post_tfs"], layout["offsets"],
            self.N_SHARDS, n_local, layout["r_cap"],
        )
        u_starts_sh, u_lens_sh = shard_tail_ranges(
            offsets_sh, qa["u_tids"], r_cap=layout["r_cap"]
        )
        mesh = corpus_mesh(self.N_SHARDS)
        fn = make_sharded_split_hybrid_fn(
            mesh, r_cap=layout["r_cap"], **knobs
        )
        sharded = fn(
            emb_bf, jnp.asarray(term_ids), jnp.asarray(tfs),
            jnp.asarray(layout["tf_head"]),
            jnp.asarray(post_rows_sh), jnp.asarray(post_tfs_sh),
            jnp.asarray(doc_len), jnp.asarray(bias_np), jnp.asarray(q_vecs),
            jnp.asarray(qa["h_slots"]), jnp.asarray(qa["h_tids"]),
            jnp.asarray(u_starts_sh), jnp.asarray(u_lens_sh),
            jnp.asarray(qa["u_cols"]), jnp.asarray(qa["t_tids"]),
            jnp.asarray(q_tids), jnp.asarray(q_counts),
            jnp.asarray(has_terms),
        )
        return single, sharded

    def test_matches_single_device(self):
        bias = np.zeros(self.N, np.float32)
        single, sharded = self._run_both(bias)
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )
        np.testing.assert_allclose(
            np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
        )

    def test_matches_single_device_filtered(self):
        """Subset-relative statistics survive sharding: psum'd df/avgdl
        under a row mask give the same subset idf/ε as the single device."""
        NEG = float(np.finfo(np.float32).min)
        bias = np.zeros(self.N, np.float32)
        bias[1::3] = NEG  # drop a third of the rows
        single, sharded = self._run_both(bias)
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )
        np.testing.assert_allclose(
            np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
        )

    def test_matches_single_device_segmented_tail(self):
        """Tail posting lists longer than seg_cap segment per shard and
        still merge bit-identically (threshold pushed up so every term —
        high-df ones included — lands in the segmented tail)."""
        bias = np.zeros(self.N, np.float32)
        single, sharded = self._run_both(
            bias, seg_cap=8, head_df_threshold=10**6
        )
        assert np.array_equal(
            np.asarray(single.rows), np.asarray(sharded.rows)
        )
        np.testing.assert_allclose(
            np.asarray(single.fused), np.asarray(sharded.fused), atol=1e-5
        )


class TestTraining:
    def test_contrastive_step_runs_and_improves(self):
        from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
        from classmate_rag_tpu.parallel import training_mesh
        from classmate_rag_tpu.training import make_train_step

        cfg = EncoderConfig.small_test()
        params = init_params(cfg, "train-test")
        mesh = training_mesh(8)  # 4 data x 2 model (or 2x4)
        init_state, step = make_train_step(cfg, mesh, learning_rate=1e-3)
        state = init_state(params)

        rng = np.random.default_rng(0)
        B, T = 8, 16
        q_ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
        p_ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
        mask = jnp.ones((B, T), jnp.int32)

        losses = []
        for _ in range(5):
            state, loss = step(state, q_ids, mask, p_ids, mask)
            losses.append(float(loss))
        assert losses[-1] < losses[0]  # optimizes the InfoNCE objective
        assert int(state.step) == 5


class TestTrainingKnobs:
    def _data(self, cfg):
        rng = np.random.default_rng(0)
        B, T = 8, 16
        q = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
        p = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, T)), jnp.int32)
        m = jnp.ones((B, T), jnp.int32)
        return q, m, p, m

    def test_schedule_clip_still_optimizes(self):
        from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
        from classmate_rag_tpu.parallel import training_mesh
        from classmate_rag_tpu.training import make_train_step

        cfg = EncoderConfig.small_test()
        mesh = training_mesh(8)
        init_state, step = make_train_step(
            cfg, mesh, learning_rate=1e-3, warmup_steps=2, total_steps=10,
            max_grad_norm=0.5,
        )
        state = init_state(init_params(cfg, "knobs"))
        data = self._data(cfg)
        losses = []
        for _ in range(6):
            state, loss = step(state, *data)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_gradient_accumulation_delays_update(self):
        from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
        from classmate_rag_tpu.parallel import training_mesh
        from classmate_rag_tpu.training import make_train_step

        cfg = EncoderConfig.small_test()
        mesh = training_mesh(8)
        init_state, step = make_train_step(cfg, mesh, learning_rate=1e-3,
                                           accum_steps=2)
        state = init_state(init_params(cfg, "accum"))
        w0 = np.asarray(state.params["layers"]["q_w"])
        data = self._data(cfg)
        state, _ = step(state, *data)
        w1 = np.asarray(state.params["layers"]["q_w"])
        assert np.array_equal(w0, w1)  # first micro-step only accumulates
        state, _ = step(state, *data)
        w2 = np.asarray(state.params["layers"]["q_w"])
        assert not np.array_equal(w1, w2)  # second applies the update

    def test_eval_step_loss_and_accuracy(self):
        from classmate_rag_tpu.embeddings.model import EncoderConfig, init_params
        from classmate_rag_tpu.parallel import training_mesh
        from classmate_rag_tpu.training import make_eval_step, make_train_step

        cfg = EncoderConfig.small_test()
        mesh = training_mesh(8)
        init_state, step = make_train_step(cfg, mesh, learning_rate=2e-3)
        eval_step = make_eval_step(cfg, mesh)
        state = init_state(init_params(cfg, "eval"))
        data = self._data(cfg)
        loss0, acc0 = eval_step(state.params, *data)
        for _ in range(8):
            state, _ = step(state, *data)
        loss1, acc1 = eval_step(state.params, *data)
        assert float(loss1) < float(loss0)
        assert 0.0 <= float(acc1) <= 1.0
        assert float(acc1) >= float(acc0)  # overfits the fixed batch
