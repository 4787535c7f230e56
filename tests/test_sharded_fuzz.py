"""Stateful fuzz of the sharded wrapper's incremental journal refresh.

The O(delta) refresh tiers (bias-only, emb scatter, lexical scatter +
head-column scatter, structural rebuild) each have their own trigger
conditions; this fuzz drives a random mutation workload — overwrites,
appends, deletes, metadata edits, compactions — through a WRAPPED store
and asserts after every round that the incrementally-refreshed SPMD
engine answers exactly like the single-device fused step over the same
mutated store. Any divergence means a refresh tier failed to propagate
some state.
"""

import numpy as np
import pytest

from classmate_rag_tpu.index.store import IndexStore

DIM = 32
VOCAB = [f"w{i}" for i in range(60)]


def _doc(rng):
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(3, 12))]


def _emb(rng, n=1):
    e = rng.standard_normal((n, DIM)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.mark.parametrize("seed", [3, 17])
def test_incremental_refresh_matches_single_device(tmp_path, seed):
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    rng = np.random.default_rng(seed)
    store = IndexStore(DIM, tmp_path, slab_rows=8, terms_per_chunk=16,
                       rescore="on", rescore_pool=16)
    n0 = 24
    ids = [f"d{i}" for i in range(n0)]
    store.upsert(ids, _emb(rng, n0), [_doc(rng) for _ in range(n0)],
                 [{"course": f"c{i % 3}"} for i in range(n0)])
    idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
    next_id = n0
    live = set(ids)

    def check(tag):
        qv = _emb(rng, 2)
        terms = [_doc(rng)[:4], _doc(rng)[:4]]
        for where in (None, {"course": "c1"}):
            want = store.hybrid_topk_batch(qv, terms, where, top_k=6)
            idx.ensure_fresh()
            got = idx.query_batch(qv, terms, where)
            assert np.array_equal(
                np.asarray(want.rows), np.asarray(got.rows)
            ), f"{tag} (where={where})"
            np.testing.assert_allclose(
                np.asarray(want.fused), np.asarray(got.fused), atol=1e-5,
                err_msg=tag,
            )

    dead: set = set()
    for round_i in range(24):
        op = rng.integers(0, 6)
        if op == 5 and dead:  # resurrect a tombstoned id (upsert revives)
            cid = sorted(dead)[int(rng.integers(0, len(dead)))]
            store.upsert([cid], _emb(rng), [_doc(rng)],
                         [{"course": f"c{int(rng.integers(0, 3))}"}])
            dead.discard(cid)
            live.add(cid)
        if op == 0 and live:  # overwrite: new emb, same tokens (rebuild-ish)
            cid = sorted(live)[int(rng.integers(0, len(live)))]
            entry_row = store.id_to_row[cid]
            tokens = [
                VOCAB[t] for t, cnt in zip(*np.unique(
                    store.term_ids[entry_row][store.term_ids[entry_row] >= 0],
                    return_counts=True,
                )) for _ in range(cnt)
            ] or [VOCAB[0]]
            store.upsert([cid], _emb(rng), [tokens],
                         [{"course": f"c{int(rng.integers(0, 3))}"}])
        elif op == 1 and live:  # overwrite with NEW tokens (lexical tier)
            cid = sorted(live)[int(rng.integers(0, len(live)))]
            store.upsert([cid], _emb(rng), [_doc(rng)],
                         [{"course": "c1"}])
        elif op == 2:  # append (may grow capacity → structural)
            n_new = int(rng.integers(1, 4))
            new_ids = [f"d{next_id + j}" for j in range(n_new)]
            next_id += n_new
            store.upsert(new_ids, _emb(rng, n_new),
                         [_doc(rng) for _ in range(n_new)],
                         [{"course": f"c{j % 3}"} for j in range(n_new)])
            live.update(new_ids)
            # slab_rows=8 divides by the 8 shards, so every grown
            # capacity stays shardable — the divisibility contract the
            # runtime's _pick_n_shards guarantees in production.
        elif op == 3 and len(live) > 4:  # delete (bias tier)
            cid = sorted(live)[int(rng.integers(0, len(live)))]
            store.delete([cid])
            live.discard(cid)
            dead.add(cid)
        elif op == 4 and rng.random() < 0.4:  # compact (structural)
            store.compact()
        check(f"round {round_i} op {op}")


def test_mutation_storm_oracle_exact(tmp_path):
    """Long-haul storm over every mutation class (overwrite / append /
    delete / resurrect / compact), checking BOTH the exact-Okapi oracle
    on the valid subset and store<->sharded identity every 12 ops. A
    500-op version of this ran clean during round-4 review; this pins a
    120-op slice in CI."""
    from classmate_rag_tpu.index.lexical import bm25_oracle_scores
    from classmate_rag_tpu.parallel import corpus_mesh
    from classmate_rag_tpu.parallel.serving import ShardedHybridIndex

    rng = np.random.default_rng(123)
    store = IndexStore(DIM, tmp_path, slab_rows=8, terms_per_chunk=16,
                       rescore="on", rescore_pool=16)
    n0 = 40
    store.upsert([f"d{i}" for i in range(n0)], _emb(rng, n0),
                 [_doc(rng) for _ in range(n0)],
                 [{"course": f"c{i % 4}"} for i in range(n0)])
    idx = ShardedHybridIndex(store, corpus_mesh(8), top_k=6)
    live = {f"d{i}" for i in range(n0)}
    dead: set = set()
    next_id = n0

    def oracle_check(tag):
        inv = sorted(store.vocab, key=store.vocab.__getitem__)
        valid_rows = [r for r in range(store.n_rows) if store.valid[r]]
        toks = []
        for r in valid_rows:
            t = []
            for tid, tf in zip(store.term_ids[r], store.tfs[r]):
                if tid >= 0 and tf > 0:
                    t.extend([inv[tid]] * int(tf))
            toks.append(t)
        q = _doc(rng)[:4]
        oracle = dict(zip(valid_rows, bm25_oracle_scores(toks, q)))
        scores, rows = store.bm25_topk(q, None, 6)
        for r, s in zip(rows, scores):
            if r >= 0:
                assert store.valid[r], (tag, r)
                assert abs(s - oracle[r]) < 1e-3, (tag, r, s, oracle[r])
        qv = _emb(rng, 2)
        terms = [_doc(rng)[:4], q]
        for where in (None, {"course": "c2"}):
            want = store.hybrid_topk_batch(qv, terms, where, top_k=6)
            got = idx.query_batch(qv, terms, where)
            assert np.array_equal(
                np.asarray(want.rows), np.asarray(got.rows)
            ), (tag, where)

    for op_i in range(120):
        op = int(rng.integers(0, 7))
        if op in (0, 1) and live:
            cid = sorted(live)[int(rng.integers(0, len(live)))]
            store.upsert([cid], _emb(rng), [_doc(rng)],
                         [{"course": f"c{int(rng.integers(0, 4))}"}])
        elif op == 2:
            new = [f"n{next_id + j}"
                   for j in range(int(rng.integers(1, 3)))]
            next_id += len(new)
            store.upsert(new, _emb(rng, len(new)),
                         [_doc(rng) for _ in new],
                         [{"course": f"c{j % 4}"} for j in range(len(new))])
            live.update(new)
        elif op == 3 and len(live) > 6:
            cid = sorted(live)[int(rng.integers(0, len(live)))]
            store.delete([cid])
            live.discard(cid)
            dead.add(cid)
        elif op == 4 and dead:
            cid = sorted(dead)[int(rng.integers(0, len(dead)))]
            store.upsert([cid], _emb(rng), [_doc(rng)], [{}])
            dead.discard(cid)
            live.add(cid)
        elif op == 5 and rng.random() < 0.1:
            store.compact()
            dead.clear()
        if op_i % 12 == 11:
            oracle_check(f"op{op_i}")
