"""Headline benchmark: hybrid-query throughput, TPU engine vs CPU oracle.

Prints ONE JSON line:
  {"metric": "hybrid_query_qps", "value": <tpu qps>, "unit": "queries/s",
   "vs_baseline": <tpu qps / cpu oracle qps>, ...}

Setup: a synthetic 50k-chunk corpus (deterministic zipf word soup + unit
random embeddings) indexed by the real IndexStore. Both engines answer the
same hybrid queries (dense exact top-k + MMR + BM25 + RRF, reference
defaults k=8/8, rrf_k=60, pool=24).

Baseline: the CPU oracle prescribed by SURVEY §6 — numpy exact cosine scan
+ rank_bm25-style scoring (list-of-dicts doc freqs, per-term numpy math) +
the exact RRF formula + numpy greedy MMR. The oracle is STRONGER than the
actual reference stack: BM25 corpus statistics are precomputed once, where
the reference rebuilds BM25Okapi on every query (rag/retrieval/bm25.py:189)
— so vs_baseline is a conservative ratio.

TPU timing is honest through the remote-dispatch link: every batch blocks
on a host fetch (this environment's async dispatch otherwise reports
fantasy numbers).
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

import os

N_CHUNKS = int(os.getenv("BENCH_CHUNKS", "50000"))
# Second corpus scale recorded in the same JSON line (0 disables).
SCALE2_CHUNKS = int(os.getenv("BENCH_SCALE2", "200000"))
# Third, serving-scale corpus (TPU only; 0 disables). The scale that
# justifies the hardware: bf16 rescore active, ≥64 oracle queries.
SCALE3_CHUNKS = int(os.getenv("BENCH_SCALE3", "1000000"))
DIM = 768
N_QUERIES = int(os.getenv("BENCH_QUERIES", "1024"))
TPU_BATCH = int(os.getenv("BENCH_BATCH", "256"))
N_ORACLE = int(os.getenv("BENCH_ORACLE", "128"))
# Minimum seconds of measured work per timed pass: passes much shorter
# than the device link's load swings (~seconds) record link weather, not
# engine throughput.
MIN_PASS_S = float(os.getenv("BENCH_MIN_PASS_S", "2.0"))
K = 8
POOL = 24
RRF_K = 60


def build_corpus(rng, n_chunks: int = None):
    """Zipf-ish synthetic docs: realistic df spectrum for BM25."""
    n_chunks = n_chunks or N_CHUNKS
    vocab = [f"w{i}" for i in range(5000)]
    # Zipf ranks: p(i) ∝ 1/(i+1)
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    # One vectorized draw for all docs (a per-doc rng.choice loop costs
    # ~1 minute at 50k docs), sliced to per-doc lengths.
    lengths = rng.integers(40, 120, size=n_chunks)
    all_idx = rng.choice(len(vocab), size=int(lengths.sum()), p=weights)
    docs = []
    pos = 0
    for n_words in lengths:
        docs.append([vocab[i] for i in all_idx[pos : pos + n_words]])
        pos += n_words
    emb = rng.standard_normal((n_chunks, DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return docs, emb


def make_queries(rng, docs, emb):
    qs = []
    n_chunks = len(docs)
    for i in range(N_QUERIES):
        doc_i = int(rng.integers(0, n_chunks))
        qv = emb[doc_i] + 0.25 * rng.standard_normal(DIM).astype(np.float32)
        qv /= np.linalg.norm(qv)
        terms = list(rng.choice(docs[doc_i], size=min(5, len(docs[doc_i])),
                                replace=False))
        qs.append((qv.astype(np.float32), terms))
    return qs


# ---------------------------------------------------------------------------
# CPU oracle (reference-style)
# ---------------------------------------------------------------------------

class OracleBM25:
    """rank_bm25-style scoring with precomputed corpus statistics."""

    K1, B, EPS = 1.5, 0.75, 0.25

    def __init__(self, corpus_tokens):
        self.doc_freqs = []
        self.doc_len = np.array([len(d) for d in corpus_tokens], np.float32)
        self.avgdl = float(self.doc_len.mean())
        df = {}
        for doc in corpus_tokens:
            freqs = {}
            for t in doc:
                freqs[t] = freqs.get(t, 0) + 1
            self.doc_freqs.append(freqs)
            for t in freqs:
                df[t] = df.get(t, 0) + 1
        n = len(corpus_tokens)
        self.idf = {}
        neg, s = [], 0.0
        for t, f in df.items():
            v = math.log(n - f + 0.5) - math.log(f + 0.5)
            self.idf[t] = v
            s += v
            if v < 0:
                neg.append(t)
        avg = s / len(self.idf)
        for t in neg:
            self.idf[t] = self.EPS * avg

    def get_scores(self, query):
        score = np.zeros(len(self.doc_freqs), np.float32)
        denom_base = self.K1 * (1 - self.B + self.B * self.doc_len / self.avgdl)
        for q in query:
            q_freq = np.array(
                [doc.get(q, 0) for doc in self.doc_freqs], np.float32
            )
            score += (self.idf.get(q) or 0.0) * (
                q_freq * (self.K1 + 1) / (q_freq + denom_base)
            )
        return score


class FastOracleBM25:
    """The same Okapi math as :class:`OracleBM25` (identical idf/eps
    rule), vectorized over CSR postings so the oracle stays runnable at
    1M chunks with ≥64 queries (the dict-per-doc variant needs minutes
    per query there). Still a CPU oracle — and still strictly STRONGER
    than the reference stack, which rebuilds BM25Okapi per query."""

    K1, B, EPS = 1.5, 0.75, 0.25

    def __init__(self, corpus_tokens):
        self.n_docs = len(corpus_tokens)
        self.doc_len = np.array([len(d) for d in corpus_tokens], np.float32)
        self.avgdl = float(self.doc_len.mean())
        vocab = {}
        rows, tids, tfs = [], [], []
        for di, doc in enumerate(corpus_tokens):
            freqs = {}
            for t in doc:
                freqs[t] = freqs.get(t, 0) + 1
            for t, f in freqs.items():
                tid = vocab.setdefault(t, len(vocab))
                rows.append(di)
                tids.append(tid)
                tfs.append(f)
        self.vocab = vocab
        tids = np.asarray(tids, np.int64)
        order = np.argsort(tids, kind="stable")
        self.post_rows = np.asarray(rows, np.int64)[order]
        self.post_tfs = np.asarray(tfs, np.float32)[order]
        df = np.bincount(tids, minlength=len(vocab)).astype(np.float64)
        self.offsets = np.zeros(len(vocab) + 1, np.int64)
        np.cumsum(df.astype(np.int64), out=self.offsets[1:])
        idf = np.log(self.n_docs - df + 0.5) - np.log(df + 0.5)
        avg = idf.mean() if len(idf) else 0.0
        idf[idf < 0] = self.EPS * avg
        self.idf = idf.astype(np.float32)
        self._denom = self.K1 * (
            1 - self.B + self.B * self.doc_len / self.avgdl
        )

    def get_scores(self, query):
        score = np.zeros(self.n_docs, np.float32)
        for q in query:
            tid = self.vocab.get(q)
            if tid is None:
                continue
            s, e = self.offsets[tid], self.offsets[tid + 1]
            r = self.post_rows[s:e]
            f = self.post_tfs[s:e]
            score[r] += self.idf[tid] * (
                f * (self.K1 + 1) / (f + self._denom[r])
            )
        return score


def oracle_mmr(qv, cand_vecs, k, lam=0.5):
    sims_q = cand_vecs @ qv
    sims_cc = cand_vecs @ cand_vecs.T
    selected = [int(np.argmax(sims_q))]
    remaining = set(range(len(cand_vecs))) - set(selected)
    while remaining and len(selected) < k:
        best, best_s = None, -1e18
        for i in remaining:
            div = sims_cc[i, selected].max()
            s = lam * sims_q[i] - (1 - lam) * div
            if s > best_s:
                best, best_s = i, s
        selected.append(best)
        remaining.discard(best)
    return selected


def oracle_query(qv, terms, emb, bm25, k=K, sims=None):
    if sims is None:
        sims = emb @ qv
    pool_idx = np.argpartition(-sims, POOL)[:POOL]
    pool_idx = pool_idx[np.argsort(-sims[pool_idx], kind="stable")]
    order = oracle_mmr(qv, emb[pool_idx], k)
    vec_ids = [int(pool_idx[i]) for i in order]
    bscores = bm25.get_scores(terms)
    bm_ids = np.argsort(-bscores, kind="stable")[:k].tolist()
    fused = {}
    for rank, i in enumerate(vec_ids):
        fused[i] = fused.get(i, 0.0) + 1.0 / (RRF_K + rank + 1)
    for rank, i in enumerate(bm_ids):
        fused[i] = fused.get(i, 0.0) + 1.0 / (RRF_K + rank + 1)
    # Reference tie-break: (fused, -vector_distance) desc, where items the
    # dense branch did not return count distance 0 (fusion.py:159-164),
    # refined by ROW ID asc on residual exact ties — the same explicit
    # last key the device epilogue uses (ops/fusion.py rrf_merge), so
    # equal-(fused, dist) rows can never flip between engine and oracle.
    vec_set = set(vec_ids)
    ranked = sorted(
        fused.items(),
        key=lambda kv: (
            kv[1],
            -(1.0 - sims[kv[0]]) if kv[0] in vec_set else 0.0,
            -kv[0],
        ),
        reverse=True,
    )
    return [i for i, _ in ranked[:k]]


def oracle_query_masked(qv, terms, emb, sub_bm25, rows_sub, k=K):
    """Subset-relative oracle: dense cosine + Okapi (df/avgdl over the
    SUBSET, the reference's rebuild-on-filter semantics,
    rag/retrieval/bm25.py:175-212) + RRF + MMR, all confined to the
    filtered rows; returns GLOBAL row ids."""
    s = len(rows_sub)
    if s == 0:
        return []
    emb_sub = emb[rows_sub]
    sims_sub = emb_sub @ qv
    pool = min(POOL, s)
    if s > pool:
        pool_idx = np.argpartition(-sims_sub, pool - 1)[:pool]
    else:
        pool_idx = np.arange(s)
    pool_idx = pool_idx[np.argsort(-sims_sub[pool_idx], kind="stable")]
    order = oracle_mmr(qv, emb_sub[pool_idx], k)
    vec_sub = [int(pool_idx[i]) for i in order]
    bscores = sub_bm25.get_scores(terms)
    bm_sub = np.argsort(-bscores, kind="stable")[: min(k, s)].tolist()
    fused = {}
    for rank, i in enumerate(vec_sub):
        g = int(rows_sub[i])
        fused[g] = fused.get(g, 0.0) + 1.0 / (RRF_K + rank + 1)
    for rank, i in enumerate(bm_sub):
        g = int(rows_sub[i])
        fused[g] = fused.get(g, 0.0) + 1.0 / (RRF_K + rank + 1)
    vec_set = {int(rows_sub[i]) for i in vec_sub}
    sim_of = {int(rows_sub[i]): float(sims_sub[i]) for i in vec_sub}
    ranked = sorted(
        fused.items(),
        key=lambda kv: (
            kv[1],
            -(1.0 - sim_of[kv[0]]) if kv[0] in vec_set else 0.0,
            -kv[0],
        ),
        reverse=True,
    )
    return [i for i, _ in ranked[:k]]


# Filter cases for the filtered-recall oracle: device `where` dict +
# the arithmetic subset predicate mirroring _bench_meta. None predicate
# = the filter must yield an EMPTY result set. Sentinels (language=auto,
# doc_type=other) must not narrow; an unknown tag is unsatisfiable.
_FILTER_CASES = [
    ("course", {"course": "c3"}, lambda i: i % 7 == 3),
    ("language", {"language": "it"}, lambda i: i % 2 == 1),
    ("course+lang", {"course": "c1", "language": "en"},
     lambda i: (i % 7 == 1) & (i % 2 == 0)),
    ("tag", {"tags": "tag2"}, lambda i: (i % 3 != 0) & (i % 5 == 2)),
    ("sentinels", {"language": "auto", "doc_type": "other"},
     lambda i: np.ones(len(np.atleast_1d(i)), bool)),
    ("unknown-course", {"course": "no-such-course"}, None),
    ("unsatisfiable-tag", {"tags": "tag1,no-such-tag"}, None),
]


def run_filtered_checks(store, docs, emb, queries, n_queries: int) -> dict:
    """recall@8 of the engine's FILTERED hybrid path vs the
    subset-relative oracle, per filter case (VERDICT r4: the mask-fused
    scoring + subset df were never recall-validated at scale)."""
    n = len(docs)
    out = {}
    for name, where, pred in _FILTER_CASES:
        q_slice = queries[:n_queries]
        q_vecs = np.stack([q for (q, _t) in q_slice])
        q_terms = [t for (_q, t) in q_slice]
        res = store.hybrid_topk_batch(
            q_vecs, q_terms, where, k_vector=K, k_bm25=K, top_k=K,
            pool=POOL,
        )
        got_rows = np.asarray(res.rows)
        if pred is None:
            # Empty/unsatisfiable subset: every slot must be dead.
            out[name] = {
                "recall@8": 1.0 if bool((got_rows < 0).all()) else 0.0,
                "subset_rows": 0,
            }
            continue
        rows_sub = np.nonzero(pred(np.arange(n)))[0]
        sub_docs = [docs[i] for i in rows_sub]
        bm25_cls = FastOracleBM25 if len(sub_docs) > 100_000 else OracleBM25
        sub_bm25 = bm25_cls(sub_docs)
        overlaps = []
        for j, (qv, terms) in enumerate(q_slice):
            want = set(oracle_query_masked(
                qv, terms, emb, sub_bm25, rows_sub
            ))
            got = {int(r) for r in got_rows[j] if r >= 0}
            overlaps.append(len(got & want) / max(len(want), 1))
            if got - set(rows_sub.tolist()):
                # A row OUTSIDE the filter leaked through the mask.
                overlaps[-1] = 0.0
        out[name] = {
            "recall@8": round(float(np.mean(overlaps)), 4),
            "subset_rows": int(len(rows_sub)),
            "n_queries": len(q_slice),
        }
    return out


# ---------------------------------------------------------------------------

def _bench_meta(i: int) -> dict:
    """Deterministic metadata mix for the filtered-recall oracle:
    7 courses, 2 languages, a 5-way tag cycle with a tagless stratum —
    selectivities from ~1/7 to ~1/14 so subset-relative df is exercised
    at every scale."""
    meta = {
        "course": f"c{i % 7}",
        "language": "it" if i % 2 else "en",
        "doc_type": "txt",
    }
    if i % 3 != 0:
        meta[f"tag_tag{i % 5}"] = True
    return meta


def run_scale(n_chunks: int, n_oracle: int, *,
              filtered_oracle: bool = False) -> dict:
    """Build a fresh index at ``n_chunks`` and measure TPU QPS, the CPU
    oracle QPS, and recall@8 over ``n_oracle`` queries."""
    # There are only N_QUERIES queries to score: an oracle count above it
    # would IndexError after the expensive build + timed passes.
    n_oracle = min(n_oracle, N_QUERIES)
    rng = np.random.default_rng(42)
    docs, emb = build_corpus(rng, n_chunks)
    queries = make_queries(rng, docs, emb)

    # ---- build the TPU index -----------------------------------------
    from classmate_rag_tpu.index.store import IndexStore

    tmp = Path(tempfile.mkdtemp(prefix="bench_idx_"))
    store = IndexStore(
        DIM, tmp, slab_rows=4096, terms_per_chunk=128,
        # Honor the product knobs so DENSE_RESCORE/_POOL/DENSE_SELECT
        # sweeps drive the bench exactly like a deployed runtime.
        rescore=os.getenv("DENSE_RESCORE", "auto"),
        rescore_pool=int(os.getenv("DENSE_RESCORE_POOL", "32")),
        select=os.getenv("DENSE_SELECT", "auto"),
    )
    ids = [f"c{i}" for i in range(n_chunks)]
    batch = 8192
    for s in range(0, n_chunks, batch):
        e = min(s + batch, n_chunks)
        store.upsert(
            ids[s:e], emb[s:e], docs[s:e],
            [_bench_meta(i) for i in range(s, e)],
        )

    def run_tpu_batch(q_slice):
        q_vecs = np.stack([q for (q, _t) in q_slice])
        q_terms = [t for (_q, t) in q_slice]
        out = store.hybrid_topk_batch(
            q_vecs, q_terms, None, k_vector=K, k_bm25=K, top_k=K, pool=POOL,
        )
        return np.asarray(out.rows)  # host fetch = honest sync

    # Warmup (compile), then a post-compile batch timing for the repeat
    # count (the first call's wall time is dominated by XLA compile).
    run_tpu_batch(queries[:TPU_BATCH])
    t0 = time.perf_counter()
    run_tpu_batch(queries[:TPU_BATCH])
    t_one_batch = time.perf_counter() - t0
    batch_starts = list(range(0, N_QUERIES, TPU_BATCH))
    # Each timed pass must hold ≥ MIN_PASS_S of WALL time: sub-second
    # passes record the link's moment-to-moment load swings, not
    # throughput. timed_pass dispatches with BENCH_WORKERS concurrent
    # workers whose round trips overlap, so the serial per-batch time
    # overestimates pass wall by ~workers× — size the repeat count for
    # the CONCURRENT wall or the floor silently shrinks to ~0.5 s.
    workers = int(os.getenv("BENCH_WORKERS", "4"))
    pass_wall_est = t_one_batch * len(batch_starts) / max(workers, 1)
    repeats = max(
        1, int(math.ceil(MIN_PASS_S / max(pass_wall_est, 1e-3)))
    )

    def timed_pass():
        """Throughput with concurrent batch dispatch (a small thread pool,
        as the serving daemon's handler threads produce): host prep and
        the device link's round trips for batch i+1 overlap batch i's
        execution. Every result is materialized on host. Measured here:
        a single synchronous dispatcher spends ~4/5 of its wall time in
        link round trips, so serial timing measures the link, not the
        engine."""
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(workers) as ex:
            futures = [
                ex.submit(run_tpu_batch, queries[s : s + TPU_BATCH])
                for _ in range(repeats)
                for s in batch_starts
            ]
            results = [f.result() for f in futures]
        return results[: len(batch_starts)], time.perf_counter() - t0

    # Best of several passes on top of the ≥2 s floor: the recorded
    # number should reflect the engine, not one pass's link weather.
    n_passes = int(os.getenv("BENCH_PASSES", "4"))
    tpu_results, tpu_time = timed_pass()
    for _ in range(max(n_passes - 1, 0)):
        _, t = timed_pass()
        tpu_time = min(tpu_time, t)
    qps_tpu = repeats * N_QUERIES / tpu_time

    # Device-limited ceiling: chained-scan device time for one batch
    # (one host fetch closes the timing), independent of link weather.
    # wall ≪ ceiling in the artifact = the link, not the engine, bounded
    # the wall number that run.
    dev_s = store.device_seconds_per_batch(
        np.stack([q for (q, _t) in queries[:TPU_BATCH]]),
        [t for (_q, t) in queries[:TPU_BATCH]],
        iters=max(4, int(math.ceil(MIN_PASS_S / max(t_one_batch, 1e-3)))),
        k_vector=K, k_bm25=K, top_k=K, pool=POOL,
    )
    qps_device_ceiling = TPU_BATCH / dev_s

    # ---- CPU oracle --------------------------------------------------
    # Timing: per-query, like the reference serves queries. The sparse
    # FastOracle keeps 1M-scale oracles tractable; at small scale the
    # dict-per-doc OracleBM25 (bit-faithful rank_bm25 shape) is used.
    bm25 = (FastOracleBM25 if n_chunks > 100_000 else OracleBM25)(docs)
    n_timed = min(n_oracle, 16 if n_chunks > 100_000 else n_oracle)
    t0 = time.perf_counter()
    oracle_results = [
        oracle_query(q, t, emb, bm25) for (q, t) in queries[:n_timed]
    ]
    oracle_time = time.perf_counter() - t0
    qps_cpu = n_timed / oracle_time
    if n_timed < n_oracle:
        # Recall needs more oracle answers than the timing loop ran; the
        # dense scan batches across the remaining queries (results
        # identical, just not naively timed).
        rest = queries[n_timed:n_oracle]
        sims_all = emb @ np.stack([q for (q, _t) in rest]).T  # [N, R]
        oracle_results += [
            oracle_query(q, t, emb, bm25, sims=sims_all[:, j])
            for j, (q, t) in enumerate(rest)
        ]

    # ---- recall: TPU top-k vs oracle top-k overlap --------------------
    overlaps = []
    tpu_flat = np.concatenate(tpu_results, axis=0)
    for i in range(n_oracle):
        got = {int(r) for r in tpu_flat[i] if r >= 0}
        want = set(oracle_results[i])
        overlaps.append(len(got & want) / max(len(want), 1))
    recall = float(np.mean(overlaps))

    out = {
        "value": round(qps_tpu, 2),
        "vs_baseline": round(qps_tpu / qps_cpu, 2),
        "baseline_qps": round(qps_cpu, 3),
        "device_ceiling_qps": round(qps_device_ceiling, 2),
        "recall_vs_oracle@8": round(recall, 4),
        "n_oracle_queries": n_oracle,
        "corpus_chunks": n_chunks,
        "rescore": store.rescore_enabled,
        "timed_pass_s": round(tpu_time, 3),
    }
    if filtered_oracle:
        n_fq = int(os.getenv(
            "BENCH_FILTERED_QUERIES",
            "16" if n_chunks > 100_000 else "32",
        ))
        out["filtered"] = run_filtered_checks(
            store, docs, emb, queries, n_fq
        )
        out["recall_filtered@8"] = round(float(np.mean([
            c["recall@8"] for c in out["filtered"].values()
        ])), 4)
    return out


# ---------------------------------------------------------------------------
# Product stage: the END-TO-END path at serving scale — Runtime.ask with
# the real catalog (disk-backed), persisted store, neighbor expansion and
# generation tail, measured in a FRESH process so cold-start seconds and
# host RSS are the product's, not this builder process's.
# ---------------------------------------------------------------------------

PRODUCT_CHUNKS = int(os.getenv("BENCH_PRODUCT_CHUNKS", "1000000"))
PRODUCT_ASKS = int(os.getenv("BENCH_PRODUCT_ASKS", "32"))
_CHUNKS_PER_DOC = 10


def _build_product_corpus(root: Path, n_chunks: int) -> float:
    """Materialize a persisted product index: catalog JSONL in the
    canonical on-disk format + a fully saved IndexStore with lexical
    snapshot. Ids are real stable_chunk_ids over synthetic doc/chunk
    coordinates so neighbor expansion reconstructs them arithmetically
    and fetches real catalog entries."""
    import gc

    from classmate_rag_tpu.index.catalog import Catalog
    from classmate_rag_tpu.index.store import IndexStore
    from classmate_rag_tpu.utils.ids import stable_chunk_id

    t0 = time.perf_counter()
    rng = np.random.default_rng(42)
    docs, emb = build_corpus(rng, n_chunks)
    bm25 = root / "bm25"
    dense = root / "dense"
    bm25.mkdir(parents=True, exist_ok=True)
    ids, metas = [], []
    with (bm25 / "bm25_index.jsonl").open("w", encoding="utf-8") as f:
        for i, toks in enumerate(docs):
            d, c = divmod(i, _CHUNKS_PER_DOC)
            sp = f"/bench/doc_{d}.txt"
            cid = stable_chunk_id(
                source_path=Path(sp), page=1, chunk_index=c,
                course="bench", unit=None,
            )
            meta = {
                "course": "bench", "language": "en", "doc_type": "txt",
                "source_path": sp, "page": 1, "chunk_id": c,
            }
            f.write(json.dumps(
                {"id": cid, "text": " ".join(toks), "tokens": toks,
                 "metadata": meta},
                ensure_ascii=False,
            ) + "\n")
            ids.append(cid)
            metas.append(meta)
    catalog = Catalog.load_or_create(bm25)
    # Shape parameters MUST match what get_runtime() will construct in
    # the child (config defaults), or the lexical snapshot is rejected
    # on term_width mismatch and the child cold-rebuilds from the
    # catalog instead of taking the fast path.
    store = IndexStore(
        DIM, dense, slab_rows=4096,
        terms_per_chunk=min(int(os.getenv("BM25_TERMS_PER_CHUNK", "256")),
                            512),
    )
    batch = 8192
    for s in range(0, n_chunks, batch):
        e = min(s + batch, n_chunks)
        store.upsert(ids[s:e], emb[s:e], docs[s:e], metas[s:e])
    store.save(catalog_fingerprint=catalog.fingerprint())
    del store, catalog, docs, emb, ids, metas
    gc.collect()
    return time.perf_counter() - t0


def _warm_product_cache(root: Path, timeout_s: int = 1800) -> float:
    """Deployment prep: `warmup` in a child process against the built
    index compiles the ask executables into the persistent XLA cache
    (the AOT-executable-ships-with-the-snapshot story) — a fresh serving
    process then deserializes in seconds instead of paying minutes of
    remote compile on its first answer. Returns prep seconds (one-time
    per machine/shape; re-runs are cache hits)."""
    import subprocess

    env = dict(os.environ)
    env.update(
        INDEX_DIR=str(root),
        BM25_DIR=str(root / "bm25"),
        DENSE_DIR=str(root / "dense"),
        EMBEDDING_BACKEND=env.get("EMBEDDING_BACKEND", "hash"),
        PYTHONPATH=str(Path(__file__).resolve().parent)
        + os.pathsep + env.get("PYTHONPATH", ""),
    )
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "cli.main", "warmup"],
        capture_output=True, text=True, env=env, timeout=timeout_s,
        cwd=str(Path(__file__).resolve().parent),
    )
    return time.perf_counter() - t0


def _run_product_child(root: Path, n_asks: int, timeout_s: int = 3600):
    import subprocess

    env = dict(os.environ)
    env.update(
        INDEX_DIR=str(root),
        BM25_DIR=str(root / "bm25"),
        DENSE_DIR=str(root / "dense"),
        EMBEDDING_BACKEND=env.get("EMBEDDING_BACKEND", "hash"),
    )
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "product-child",
         str(n_asks)],
        capture_output=True, text=True, env=env, timeout=timeout_s,
    )
    # The child prints its report as the LAST act of the run, so a
    # marker + nonzero rc means a teardown-time crash: surface the rc in
    # the artifact instead of silently recording clean numbers (and
    # instead of discarding a completed stage over an exit-path hiccup).
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("PRODUCT_CHILD_JSON:"):
            report = json.loads(line[len("PRODUCT_CHILD_JSON:"):])
            if proc.returncode != 0:
                report["child_rc"] = int(proc.returncode)
            return report
    raise RuntimeError(
        f"product child failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def _rss_mb() -> dict:
    out = {}
    try:
        for line in Path("/proc/self/status").read_text().splitlines():
            if line.startswith(("VmRSS", "VmHWM")):
                k, v = line.split(":", 1)
                out[k] = round(int(v.split()[0]) / 1024, 1)  # kB -> MB
    except OSError:
        pass
    return out


def product_child_main(n_asks: int) -> None:
    """Runs inside the fresh child process: cold-start the Runtime from
    disk, answer questions end-to-end, probe one /add + persist."""
    from classmate_rag_tpu.metadata import DocumentMetadata
    from classmate_rag_tpu.pipeline.ask import ask_question
    from classmate_rag_tpu.pipeline.runtime import get_runtime

    t0 = time.perf_counter()
    rt = get_runtime(reload=True)
    load_s = time.perf_counter() - t0
    report = {
        "runtime_load_s": round(load_s, 3),
        # catalog_s = offset scan or sidecar restore; store_s = slab
        # read + device placement (includes the host->device upload over
        # the link, which varies with link weather and OS page-cache
        # state — the dominant variance between child runs).
        "load_split_s": rt.load_timings,
        "n_rows": rt.store.n_rows,
        "rss_after_load_mb": _rss_mb(),
    }
    # Readiness: the runtime's background precompile places the slabs
    # and materializes the ask executables. At 1M this is dominated by
    # a ONE-TIME per-process cost in the remote device relay (first
    # big-program materialization: minutes, measured irreducible with
    # all local caches warm — tools/probe_cold_start.py decomposes it);
    # the serve daemon joins it before announcing readiness, so it is
    # reported as ready_s here, with first_ask_s the first answer a
    # caller of a READY process sees.
    if n_asks > 0:
        t0 = time.perf_counter()
        if rt.warmup_thread is not None:
            rt.warmup_thread.join()
        else:
            rt.warmup()
        report["ready_s"] = round(time.perf_counter() - t0, 3)

    if n_asks > 0:
        rng = np.random.default_rng(7)
        weights = 1.0 / np.arange(1, 5001)
        weights /= weights.sum()

        def make_question():
            words = [f"w{i}" for i in
                     rng.choice(5000, size=4, p=weights)]
            return "what about " + " ".join(words)

        filters = DocumentMetadata()
        t0 = time.perf_counter()
        first = ask_question(question=make_question(), filters=filters,
                             top_k=8, runtime=rt)
        # First answer of a READY process (readiness itself is ready_s
        # above — the serve daemon's startup gate).
        report["first_ask_s"] = round(time.perf_counter() - t0, 3)
        report["answer_nonempty"] = bool(first.answer)
        report["retrieved_k"] = len(first.retrieved)
        for _ in range(2):  # absorb residual compiles
            ask_question(question=make_question(), filters=filters,
                         top_k=8, runtime=rt)
        lat = []
        for _ in range(n_asks):
            q = make_question()
            t0 = time.perf_counter()
            ask_question(question=q, filters=filters, top_k=8, runtime=rt)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        report["ask_p50_ms"] = round(float(np.percentile(lat_ms, 50)), 1)
        report["ask_p95_ms"] = round(float(np.percentile(lat_ms, 95)), 1)
        report["ask_mean_ms"] = round(float(lat_ms.mean()), 1)
        report["n_asks"] = n_asks

        # /add probe: ingest ONE new document end-to-end and persist.
        # With the O(delta) catalog journal + store deltas this must
        # write KBs, not rewrite the multi-GB base.
        import tempfile as _tf

        from classmate_rag_tpu.pipeline.ingest import ingest_file

        sizes_before = {
            p: p.stat().st_size
            for d in (rt.cfg.bm25_dir, rt.cfg.dense_dir)
            for p in Path(d).iterdir()
        }
        doc = Path(_tf.mkdtemp()) / "new_doc.txt"
        doc.write_text(
            "A freshly added benchmark document about w1 w2 w3. "
            "It provides additional context for the product add probe.",
            encoding="utf-8",
        )
        t0 = time.perf_counter()
        ingest_file(
            path=doc, doc_meta=DocumentMetadata(course="bench"),
            runtime=rt,
        )
        add_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        rt.persist()
        persist_s = time.perf_counter() - t0
        delta_bytes = 0
        base_rewritten = False
        for d in (rt.cfg.bm25_dir, rt.cfg.dense_dir):
            for p in Path(d).iterdir():
                old = sizes_before.get(p)
                if old is None:
                    delta_bytes += p.stat().st_size
                elif p.stat().st_size != old:
                    if p.name in ("embeddings.npy", "bm25_index.jsonl",
                                  "lexical.npz"):
                        base_rewritten = True
                    delta_bytes += abs(p.stat().st_size - old)
        report["add_s"] = round(add_s, 3)
        report["persist_s"] = round(persist_s, 3)
        report["persist_delta_bytes"] = int(delta_bytes)
        report["persist_rewrote_base"] = base_rewritten

        # Mutation-under-serving: asks AFTER the /add must stay at
        # steady-state latency — the O(delta) device sync + split
        # overlay replaces what used to be a full re-upload + O(N·L)
        # layout rebuild (minutes at 1M) on the first query after a
        # mutation. The full-path counters prove the incremental route.
        lat = []
        for _ in range(4):
            q = make_question()
            t0 = time.perf_counter()
            ask_question(question=q, filters=filters, top_k=8, runtime=rt)
            lat.append(time.perf_counter() - t0)
        report["ask_after_add_first_ms"] = round(lat[0] * 1e3, 1)
        report["ask_after_add_p50_ms"] = round(
            float(np.percentile(np.asarray(lat[1:]) * 1e3, 50)), 1
        )
        report["device_full_uploads"] = rt.store.device_full_uploads
        report["split_full_builds"] = rt.store.split_full_builds
        report["split_snapshot_restores"] = rt.store.split_snapshot_restores
        report["df_full_builds"] = rt.store.df_full_builds
        report["rss_final_mb"] = _rss_mb()

    print("PRODUCT_CHILD_JSON:" + json.dumps(report), flush=True)


def run_product_stage(n_chunks: int) -> dict:
    """Build a persisted product index, then measure cold start + asks
    in fresh child processes (A: catalog sidecar removed -> full binary
    scan; B: warm sidecar -> the steady-state cold start)."""
    import shutil

    root = Path(tempfile.mkdtemp(prefix="bench_product_"))
    try:
        build_s = _build_product_corpus(root, n_chunks)
        warmup_s = _warm_product_cache(root)
        sidecar = root / "bm25" / "catalog.offsets.npz"
        sidecar.unlink(missing_ok=True)
        cold = _run_product_child(root, n_asks=0)
        warm = _run_product_child(root, n_asks=PRODUCT_ASKS)
        return {
            "corpus_chunks": n_chunks,
            "build_s": round(build_s, 1),
            "warmup_s": round(warmup_s, 1),
            "cold_scan_start_s": cold["runtime_load_s"],
            "cold_scan_split_s": cold.get("load_split_s"),
            "warm_start_s": warm["runtime_load_s"],
            "warm_split_s": warm.get("load_split_s"),
            "rss_after_load_mb": warm["rss_after_load_mb"],
            **{k: v for k, v in warm.items()
               if k not in ("runtime_load_s", "rss_after_load_mb")},
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import gc

    import jax

    backend = jax.default_backend()
    primary = run_scale(N_CHUNKS, n_oracle=N_ORACLE, filtered_oracle=True)
    out = {
        "metric": "hybrid_query_qps",
        "unit": "queries/s",
        **primary,
        "backend": backend,
    }

    def stage(key, fn):
        # A later stage dying (device-link hiccup, OOM in a child, …)
        # must not discard the COMPLETED stages: record the failure in
        # the artifact instead of losing the whole JSON line.
        import traceback

        gc.collect()
        try:
            out[key] = fn()
        except Exception as exc:
            traceback.print_exc(file=sys.stderr)
            out[key] = {"error": f"{type(exc).__name__}: {exc}"}

    if SCALE2_CHUNKS and SCALE2_CHUNKS != N_CHUNKS:
        # Fewer oracle queries at the large scale: the numpy oracle costs
        # ~0.4 s/query at 200k chunks.
        stage("scale2", lambda: run_scale(
            SCALE2_CHUNKS, n_oracle=max(N_ORACLE // 2, 8)
        ))
    if SCALE3_CHUNKS and backend == "tpu":
        # Serving scale (1M): f16 rescore active, ≥64-query oracle. TPU
        # only — the exact CPU scan at this size would take hours.
        # ≥64-query oracle floor at serving scale (BENCH_ORACLE can raise
        # it; the old max(min(x, 64), 64) pinned it to exactly 64).
        stage("scale3", lambda: run_scale(
            SCALE3_CHUNKS, n_oracle=max(N_ORACLE, 64), filtered_oracle=True
        ))
    if PRODUCT_CHUNKS and backend == "tpu":
        # End-to-end PRODUCT path at serving scale: Runtime.ask with the
        # disk-backed catalog, measured in fresh child processes
        # (cold-start seconds, host RSS, ask p50/p95, /add persist
        # delta) — the engine stages above bypass the catalog layer.
        stage("product", lambda: run_product_stage(PRODUCT_CHUNKS))
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "product-child":
        product_child_main(int(sys.argv[2]) if len(sys.argv) > 2 else 0)
    else:
        main()
