"""Stateful fuzz of the IndexStore: random mutation sequences vs oracle.

The unified row-space store carries several interacting invariants —
tombstones excluded from every search path, compaction re-packing rows
without changing results, the split-BM25 layout rebuilt after mutation,
metadata filters surviving re-ingestion — and most bugs live in the
transitions, not the steady state. This test drives a random sequence of
upsert / re-upsert / delete / compact operations and, after every step,
checks dense and BM25 top-k against a brute-force numpy/python oracle
over the live documents.
"""

import numpy as np
import pytest

from classmate_rag_tpu.index.lexical import bm25_oracle_scores
from classmate_rag_tpu.index.store import IndexStore

DIM = 12
VOCAB = [f"t{i}" for i in range(40)]


class Model:
    """Python mirror of the store's visible state."""

    def __init__(self):
        self.docs = {}          # id -> (emb, tokens, meta)

    def alive(self):
        return sorted(self.docs)

    def dense_topk(self, q, k, where=None):
        items = [
            (cid, float(e @ q))
            for cid, (e, _t, m) in self.docs.items()
            if self._match(m, where)
        ]
        items.sort(key=lambda kv: -kv[1])
        return [cid for cid, _ in items[:k]]

    def bm25_topk(self, q_tokens, k, where=None):
        ids = [cid for cid in sorted(self.docs)
               if self._match(self.docs[cid][2], where)]
        corpus = [self.docs[cid][1] for cid in ids]
        scores = bm25_oracle_scores(corpus, q_tokens)
        ranked = sorted(
            range(len(ids)), key=lambda i: (-scores[i], i)
        )
        return [(ids[i], scores[i]) for i in ranked[:k] if scores[i] > 0]

    @staticmethod
    def _match(meta, where):
        if not where:
            return True
        return all(meta.get(f) == v for f, v in where.items())


def _check(store: IndexStore, model: Model, rng):
    # Dense: a query aimed at a random live doc must rank it first, and
    # the full ranking must match the float oracle (store stores f16/bf16
    # so compare by id set at a safe margin: use well-separated vectors).
    alive = model.alive()
    assert len(store) == len(alive)
    if not alive:
        return
    target = alive[int(rng.integers(0, len(alive)))]
    q = model.docs[target][0]
    k = min(3, len(alive))
    want = model.dense_topk(q, k)
    vals, rows = store.dense_topk(q[None, :], None, k=k)
    got = [store.ids[r] for r in rows[0] if r >= 0]
    assert got[0] == want[0] == target
    # BM25 against the published-Okapi oracle (subset = live rows).
    tokens = model.docs[target][1]
    q_tokens = list(tokens[:3])
    _check_bm25(store, model, q_tokens, k, None)

    # FILTERED pass after every mutation: subset-relative df (and the
    # per-filter df LRU, which must be invalidated by ANY mutation) is
    # cross-mutation state the unfiltered checks never touch.
    where = {"course": str(rng.choice(["a", "b"]))}
    subset = [cid for cid in alive
              if model.docs[cid][2].get("course") == where["course"]]
    kf = min(3, len(subset))
    if subset:
        ftarget = subset[int(rng.integers(0, len(subset)))]
        fq = model.docs[ftarget][0]
        fwant = model.dense_topk(fq, kf, where)
        fvals, frows = store.dense_topk(fq[None, :], where, k=kf)
        fgot = [store.ids[r] for r in frows[0] if r >= 0]
        assert fgot[0] == fwant[0] == ftarget
        assert set(fgot) <= set(subset)        # mask never leaks
        _check_bm25(store, model,
                    list(model.docs[ftarget][1][:3]), kf, where)
    else:
        # Empty subset: the masked paths must return nothing, not leak.
        _, frows = store.dense_topk(q[None, :], where, k=1)
        assert all(r < 0 for r in frows[0])
        fvals_bm, frows_bm = store.bm25_topk(q_tokens, where, k=1)
        assert not [r for v, r in zip(fvals_bm, frows_bm)
                    if r >= 0 and v > 0]


def _check_bm25(store, model, q_tokens, k, where):
    if k == 0:
        return
    want_bm = model.bm25_topk(q_tokens, k, where)
    vals_bm, rows_bm = store.bm25_topk(q_tokens, where, k=k)
    if where:
        # Second identical filtered query: served from the per-filter
        # subset-df LRU (a hit), must be bit-identical to the miss.
        vals2, rows2 = store.bm25_topk(q_tokens, where, k=k)
        assert np.array_equal(np.asarray(vals_bm), np.asarray(vals2))
        assert np.array_equal(np.asarray(rows_bm), np.asarray(rows2))
    got_bm = [
        (store.ids[r], float(v))
        for v, r in zip(vals_bm, rows_bm) if r >= 0 and v > 0
    ]
    if where:
        assert all(
            model.docs[gid][2].get("course") == where["course"]
            for gid, _ in got_bm
        )
    # Scores must match rank for rank; ids must match wherever the score
    # separates them (ties/near-ties may legitimately order differently:
    # the oracle breaks ties by sorted id, the device by row order).
    assert len(got_bm) == len(want_bm)
    for (_, gv), (_, wv) in zip(got_bm, want_bm):
        assert abs(gv - wv) < 1e-3 * max(1.0, abs(wv))
    eps = 1e-3
    full = dict(model.bm25_topk(q_tokens, len(model.docs), where))
    for j, ((gid, gv), (wid, wv)) in enumerate(zip(got_bm, want_bm)):
        if gid == wid:
            continue
        # A swapped id must carry (approximately) the same oracle score —
        # i.e. a genuine tie, including ties across the top-k boundary.
        assert gid in full, (j, got_bm, want_bm)
        assert abs(full[gid] - gv) < eps * max(1.0, abs(gv)), (
            j, got_bm, want_bm
        )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_mutation_sequences(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    store = IndexStore(DIM, tmp_path / f"s{seed}", slab_rows=8,
                       terms_per_chunk=12)
    model = Model()
    next_id = 0

    def random_doc():
        k = int(rng.integers(2, 10))
        tokens = [VOCAB[i] for i in rng.integers(0, len(VOCAB), k)]
        emb = rng.standard_normal(DIM).astype(np.float32)
        emb /= np.linalg.norm(emb)
        meta = {"course": str(rng.choice(["a", "b"]))}
        return emb, tokens, meta

    for step in range(40):
        op = rng.choice(["add", "readd", "delete", "compact"],
                        p=[0.45, 0.2, 0.25, 0.1])
        if op == "add" or not model.docs:
            cid = f"d{next_id}"
            next_id += 1
            emb, tokens, meta = random_doc()
            store.upsert([cid], emb[None, :], [tokens], [meta])
            model.docs[cid] = (emb, tokens, meta)
        elif op == "readd":
            cid = str(rng.choice(model.alive()))
            emb, tokens, meta = random_doc()
            store.upsert([cid], emb[None, :], [tokens], [meta])
            model.docs[cid] = (emb, tokens, meta)
        elif op == "delete":
            cid = str(rng.choice(model.alive()))
            assert store.delete([cid]) == 1
            del model.docs[cid]
        elif op == "compact":
            store.compact()
        _check(store, model, rng)
