"""Device ops vs numpy oracles: masked top-k, MMR, RRF fusion."""

import numpy as np
import pytest

import jax.numpy as jnp

from classmate_rag_tpu.ops.fusion import rrf_merge
from classmate_rag_tpu.ops.mmr import mmr_order
from classmate_rag_tpu.ops.topk import NEG_INF, topk_pallas, topk_xla


def _rand(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestMaskedTopk:
    def test_xla_matches_numpy_oracle(self):
        E = _rand(1000, 64)
        q = _rand(3, 64, seed=1)
        mask = np.ones(1000, bool)
        mask[::3] = False
        bias = np.where(mask, 0.0, NEG_INF).astype(np.float32)
        vals, idx = topk_xla(jnp.asarray(E), jnp.asarray(q), jnp.asarray(bias), 10)
        scores = q @ E.T
        scores[:, ~mask] = -np.inf
        oracle = np.argsort(-scores, axis=1, kind="stable")[:, :10]
        assert np.array_equal(np.asarray(idx), oracle)
        assert np.all(mask[np.asarray(idx)])

    def test_pallas_interpret_matches_xla(self):
        E = _rand(600, 128)
        q = _rand(2, 128, seed=2)
        bias = np.zeros(600, np.float32)
        bias[5:50] = NEG_INF
        v1, i1 = topk_xla(jnp.asarray(E, jnp.bfloat16), jnp.asarray(q),
                          jnp.asarray(bias), 8)
        v2, i2 = topk_pallas(jnp.asarray(E, jnp.bfloat16), jnp.asarray(q),
                             jnp.asarray(bias), 8, tile_n=256, interpret=True)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

    def test_pallas_cross_tile_ties_pick_lowest_index(self):
        """Duplicated rows land in DIFFERENT tiles; equal scores must
        resolve to the smallest global index both within a tile's top-k
        and in the cross-tile partial merge (the exactness contract the
        fused hybrid step relies on at >=150k rows)."""
        E = _rand(512, 64)
        # Rows 300..307 are exact copies of rows 10..17 (tiles of 256:
        # originals in tile 0, copies in tile 1).
        E[300:308] = E[10:18]
        q = E[10:12] + 0.0
        bias = np.zeros(512, np.float32)
        v1, i1 = topk_xla(jnp.asarray(E), jnp.asarray(q),
                          jnp.asarray(bias), 12)
        v2, i2 = topk_pallas(jnp.asarray(E), jnp.asarray(q),
                             jnp.asarray(bias), 12, tile_n=256,
                             interpret=True)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    def test_pallas_multi_tile_partial_merge(self):
        """k larger than any single tile's share: the final XLA merge over
        per-tile partials must reproduce the global order exactly."""
        E = _rand(1024, 64, seed=5)
        q = _rand(3, 64, seed=6)
        bias = np.zeros(1024, np.float32)
        bias[100:400] = NEG_INF
        v1, i1 = topk_xla(jnp.asarray(E), jnp.asarray(q),
                          jnp.asarray(bias), 24)
        v2, i2 = topk_pallas(jnp.asarray(E), jnp.asarray(q),
                             jnp.asarray(bias), 24, tile_n=128,
                             interpret=True)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_all_masked_returns_negative_inf(self):
        E = _rand(100, 32)
        q = _rand(1, 32)
        bias = np.full(100, NEG_INF, np.float32)
        vals, idx = topk_xla(jnp.asarray(E), jnp.asarray(q), jnp.asarray(bias), 5)
        assert np.all(np.asarray(vals) <= NEG_INF / 2)


class TestMMR:
    @staticmethod
    def _oracle(q, cands, k, lam=0.5):
        """Direct transcription of the published greedy MMR recurrence."""
        sims_q = cands @ q
        sims_cc = cands @ cands.T
        selected = [int(np.argmax(sims_q))]
        remaining = set(range(len(cands))) - set(selected)
        while remaining and len(selected) < k:
            best, best_s = None, -1e18
            for i in sorted(remaining):
                div = max(sims_cc[i, s] for s in selected)
                s = lam * sims_q[i] - (1 - lam) * div
                if s > best_s:
                    best, best_s = i, s
            selected.append(best)
            remaining.discard(best)
        return selected

    def test_matches_oracle(self):
        q = _rand(1, 32, seed=3)[0]
        cands = _rand(24, 32, seed=4)
        order = np.asarray(mmr_order(
            jnp.asarray(q), jnp.asarray(cands), jnp.ones(24, bool), 8
        ))
        assert order.tolist() == self._oracle(q, cands, 8)

    def test_small_pool_pads_with_minus_one(self):
        q = _rand(1, 16)[0]
        cands = _rand(3, 16, seed=5)
        valid = np.array([True, True, False])
        order = np.asarray(mmr_order(
            jnp.asarray(q), jnp.asarray(cands), jnp.asarray(valid), 5
        ))
        real = [o for o in order.tolist() if o >= 0]
        assert len(real) == len(set(real))
        assert 2 not in real  # invalid candidate never selected


class TestRRF:
    @staticmethod
    def _oracle_rrf(vec_ids, bm_ids, wv=1.0, wb=1.0, k0=60):
        scores = {}
        for lst, w in ((vec_ids, wv), (bm_ids, wb)):
            for r, i in enumerate(lst):
                if i >= 0:
                    scores[i] = scores.get(i, 0.0) + w / (k0 + r + 1)
        return scores

    def test_fused_scores_match_formula(self):
        vec = np.array([5, 3, 9, -1], dtype=np.int32)
        bm = np.array([3, 7, 5], dtype=np.int32)
        vdist = np.array([0.1, 0.2, 0.3, 0.0], dtype=np.float32)
        bsc = np.array([9.0, 8.0, 7.0], dtype=np.float32)
        rows, fused, vd, bs = rrf_merge(
            jnp.asarray(vec), jnp.asarray(bm), jnp.asarray(vdist),
            jnp.asarray(bsc), 1.0, 1.0, 60, 6,
        )
        rows = np.asarray(rows)
        fused = np.asarray(fused)
        oracle = self._oracle_rrf(vec.tolist(), bm.tolist())
        got = {int(r): float(f) for r, f in zip(rows, fused) if r >= 0}
        assert set(got) == set(oracle)
        for r, s in oracle.items():
            assert abs(got[r] - s) < 1e-6
        # Row 3 and 5 appear in both lists -> highest fused first.
        order = [int(r) for r in rows if r >= 0]
        assert order[0] in (3, 5)

    def test_dedup_keeps_branch_scores(self):
        vec = np.array([1, 2], dtype=np.int32)
        bm = np.array([2, 1], dtype=np.int32)
        rows, fused, vd, bs = rrf_merge(
            jnp.asarray(vec), jnp.asarray(bm),
            jnp.asarray(np.array([0.1, 0.2], np.float32)),
            jnp.asarray(np.array([5.0, 4.0], np.float32)),
            1.0, 1.0, 60, 4,
        )
        rows = np.asarray(rows)
        alive = rows[rows >= 0]
        assert sorted(alive.tolist()) == [1, 2]
        # Both rows have both branch scores populated.
        assert not np.any(np.isnan(np.asarray(vd)[:2]))
        assert not np.any(np.isnan(np.asarray(bs)[:2]))
