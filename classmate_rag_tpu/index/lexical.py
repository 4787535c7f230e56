"""BM25 tokenization and the on-device scoring formulation.

Tokenizer parity with the reference (rag/retrieval/bm25.py:34-70): unicode
latin-letter words (diacritics kept), lowercased, per-document-language
stopword removal (EN/IT sets), 1-character tokens dropped. Scoring parity
with rank_bm25's BM25Okapi as used there (rag/retrieval/bm25.py:145,191-197):
k1=1.5, b=0.75, idf = ln((N−df+0.5)/(df+0.5)) with negative idfs replaced
by ε·mean(idf) (ε=0.25), and — the reference's defining quirk — all corpus
statistics (df, avgdl, vocabulary) computed over the *filtered subset* per
query (rag/retrieval/bm25.py:175-212 rebuilds BM25 on the subset).

The TPU formulation replaces the per-query index rebuild with packed
[N, L] unique-term/term-frequency arrays scored in one gather pass:

    score(n) = Σ_l  w[term_ids[n, l]] · sat(tfs[n, l], dl_n)

where ``w`` is a [V]-sized vector holding idf·multiplicity for the query's
terms (scattered per query, zero elsewhere) and ``sat`` is the BM25 tf
saturation. Subset df for the ε rule comes from one scatter-add pass over
the masked rows; the unfiltered case uses a cached full-corpus df.
"""

from __future__ import annotations

import functools
import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

K1 = 1.5
B = 0.75
EPSILON = 0.25

_TOKEN_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ]+")

# High-frequency function words; matching the reference's intent (and EN/IT
# coverage) — removal must agree between index and query time for parity.
STOPWORDS_EN = frozenset(
    """a an the and or but if then else for to of in on at by with from as is
    are was were be been being it its this that these those i you he she we
    they them his her their my your our me us not no yes do does did doing
    can could should would may might will shall about into over under again
    further there here when where why how what which who whom""".split()
)
STOPWORDS_IT = frozenset(
    """un uno una le la il lo gli i l e o ma se allora altrimenti per di a da
    in su con come è era sono siamo siete fui fu furono essere stato questo
    questa questi queste quello quella quelli quelle ciò cio io tu lui lei
    noi voi loro mio mia tuo tua suo sua nostro vostro non no si sia fare fa
    fatto posso può puo puoi possono dovrebbe potrebbe sarà sara sarebbe
    saremmo sarete siano che perché perche quando dove cosa quale chi""".split()
)


def stopwords_for(lang: Optional[str]) -> frozenset:
    lang = (lang or "").lower()
    if lang.startswith("it"):
        return STOPWORDS_IT
    return STOPWORDS_EN


def tokenize_py(text: str, lang: Optional[str] = None) -> List[str]:
    """Pure-Python tokenizer (reference implementation / fallback)."""
    sw = stopwords_for(lang)
    return [
        t for t in (m.group(0).lower() for m in _TOKEN_RE.finditer(text or ""))
        if len(t) > 1 and t not in sw
    ]


_NATIVE_CHECKED = False
_NATIVE = None


def tokenize(text: str, lang: Optional[str] = None) -> List[str]:
    """Lowercased unicode-letter tokens minus stopwords and 1-char tokens.

    Dispatches to the C++ kernel (classmate_rag_tpu/native) when the
    library is available; identical semantics either way (fuzz-tested in
    tests/test_native.py)."""
    global _NATIVE_CHECKED, _NATIVE
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from classmate_rag_tpu.native import get_native_tokenizer

            _NATIVE = get_native_tokenizer()
        except Exception:
            _NATIVE = None
    if _NATIVE is not None:
        return _NATIVE.tokenize(text, lang)
    return tokenize_py(text, lang)


def pack_tokens(
    tokens: Sequence[str],
    vocab: Dict[str, int],
    width: int,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Count term frequencies, intern terms, pack into fixed-width arrays.

    Returns (term_ids i32 [width] −1-padded, tfs u8 [width], doc_len).
    When a chunk has more distinct terms than ``width`` the highest-tf terms
    win (first-seen order breaks ties). doc_len counts all tokens (matching
    BM25Okapi's ``len(document)``).
    """
    counts: Dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    items = list(counts.items())
    if len(items) > width:
        items.sort(key=lambda kv: -kv[1])  # stable: first-seen wins ties
        items = items[:width]
    ids = np.full(width, -1, dtype=np.int32)
    tfs = np.zeros(width, dtype=np.uint8)
    for j, (term, tf) in enumerate(items):
        tid = vocab.get(term)
        if tid is None:
            tid = len(vocab)
            vocab[term] = tid
        ids[j] = tid
        tfs[j] = min(tf, 255)
    return ids, tfs, float(len(tokens))


# ---------------------------------------------------------------------------
# Device scoring
# ---------------------------------------------------------------------------
# The three device entry points (single-query path below, the fused batch
# step in ops/hybrid_step.py, and the sharded SPMD step in
# parallel/sharded.py) all build on these helpers — the Okapi idf/epsilon
# rule and saturation are load-bearing parity invariants and must have
# exactly one implementation.

def okapi_idf(df, n_sub):
    """idf per BM25Okapi incl. the negative-idf ε replacement (subset
    semantics: ``df``/``n_sub`` are over the active row mask)."""
    import jax.numpy as jnp

    raw_idf = jnp.log(n_sub - df + 0.5) - jnp.log(df + 0.5)
    in_vocab = df > 0
    n_terms = jnp.maximum(jnp.sum(in_vocab.astype(jnp.float32)), 1.0)
    avg_idf = jnp.sum(jnp.where(in_vocab, raw_idf, 0.0)) / n_terms
    eps = EPSILON * avg_idf
    return jnp.where(in_vocab, jnp.where(raw_idf < 0, eps, raw_idf), 0.0)


def okapi_query_weights(idf, q_terms, q_counts, vocab_pad: int):
    """[vocab_pad+1] vector holding idf × multiplicity at the query's
    terms, zero elsewhere (slot vocab_pad is the padding sink)."""
    import jax.numpy as jnp

    q_safe = jnp.where(q_terms >= 0, q_terms, vocab_pad)
    return jnp.zeros(vocab_pad + 1, jnp.float32).at[q_safe].add(
        jnp.where(q_terms >= 0, q_counts, 0.0) * idf[q_safe]
    ).at[vocab_pad].set(0.0)


def okapi_sat(tf, doc_len, avgdl):
    """BM25 term-frequency saturation; ``tf`` broadcastable against
    ``doc_len`` (caller shapes them)."""
    import jax.numpy as jnp

    tf = tf.astype(jnp.float32)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doc_len / avgdl))


def okapi_score_rows(term_ids, tfs, doc_len, avgdl, w, vocab_pad: int):
    """scores [N] = Σ_l w[term_ids] · sat(tf, dl) — the one gather pass."""
    import jax.numpy as jnp

    gathered = w[jnp.where(term_ids >= 0, term_ids, vocab_pad)]
    sat = okapi_sat(tfs, doc_len[:, None], avgdl)
    return jnp.sum(gathered * jnp.where(term_ids >= 0, sat, 0.0), axis=1)


def _bm25_split_fns():
    """Split-frequency BM25 scoring: the TPU-native formulation.

    The per-query gather pass (okapi_score_rows) re-reads the whole [N, L]
    packed matrix per query — the dominant cost of the fused hybrid step at
    large batch. Measured on this hardware, data-dependent random
    gather/scatter runs ~50x below bandwidth, so the reformulation routes
    everything through dense matmuls over batch-shared matrices:

    - HEAD terms (df > threshold; a few hundred cover most query-term
      mass): tf prebuilt as a dense [N, C] u8 matrix at index build; a
      batch scores as ``W_head [B, C] @ sat(tf_head, dl) [C, N]``.
    - TAIL terms: term-major postings. Per batch, the *distinct* tail
      terms (U of them) materialize as a [N, U] tf matrix — contiguous
      posting-slice reads plus one small scatter (≤ U·r_cap elements,
      with r_cap bounded by the head threshold) — then score as a second
      matmul ``W_tail [B, U] @ sat(tf_tail, dl) [U, N]``.

    Exactly the same Okapi math (idf/ε/avgdl shared with okapi_idf), just
    reorganized around the MXU. Both stages honor the row mask.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("vocab_pad", "r_cap"))
    def bm25_split_scores(
        tf_head,      # u8 [C, N] — dense tf of head terms, TERM-major
        post_rows,    # i32 [P] — tail postings: row ids (term-major)
        post_tfs,     # u8 [P]
        doc_len,      # f32 [N]
        mask_bias,    # f32 [N]
        df,           # f32 [vocab_pad+1] — subset df
        h_slots,      # i32 [H] — distinct head slots in this batch (-1 pad)
        h_tids,       # i32 [H] — their vocab ids (-1 pad)
        qh_h,         # i32 [B, M] — index into H per query term (-1 = none)
        q_counts_h,   # f32 [B, M]
        u_starts,     # i32 [U] — posting range start per distinct tail term
        u_lens,       # i32 [U] (0 = padding slot)
        u_tids,       # i32 [U] vocab ids (-1 pad)
        qr_u,         # i32 [B, M] — index into U per query term (-1 = none)
        q_counts_r,   # f32 [B, M]
        vocab_pad: int,
        r_cap: int,
    ):
        keep = mask_bias == 0.0
        n_sub = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
        idf = okapi_idf(df, n_sub)
        avgdl = jnp.sum(jnp.where(keep, doc_len, 0.0)) / n_sub
        bq, m = qh_h.shape
        h = h_slots.shape[0]
        u = u_starts.shape[0]
        n = tf_head.shape[1]
        b_idx = jnp.broadcast_to(jnp.arange(bq)[:, None], (bq, m))

        # ---- head: gather only the batch's head-term rows, then matmul.
        # tf_head is term-major so each needed term is one contiguous
        # [N]-row DMA; per-batch cost scales with the batch's distinct
        # head terms, not the full head capacity.
        tf_sub = tf_head[jnp.maximum(h_slots, 0)]                # [H, N] u8
        sat_sub = okapi_sat(tf_sub, doc_len[None, :], avgdl)
        sat_sub = sat_sub * (tf_sub > 0) * keep[None, :]
        sat_sub = sat_sub * (h_slots >= 0)[:, None]              # [H, N] f32

        h_tid_safe = jnp.where(h_tids >= 0, h_tids, vocab_pad)
        h_idf = idf[h_tid_safe]                                  # [H]
        w_head = jnp.zeros((bq, h + 1), jnp.float32)
        qh_safe = jnp.where(qh_h >= 0, qh_h, h)
        w_head = w_head.at[b_idx, qh_safe].add(
            jnp.where(qh_h >= 0, q_counts_h, 0.0)
        )[:, :h]
        w_head = w_head * h_idf[None, :]
        # HIGHEST precision: TPU f32 matmuls default to single-pass bf16,
        # a 0.2% relative error that visibly perturbs BM25 rankings.
        scores = jnp.einsum(
            "bh,hn->bn", w_head, sat_sub,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # ---- tail: batch-union tf matrix + second matmul ---------------
        # Contiguous posting slices per distinct tail term.
        def slice_one(start):
            return (
                jax.lax.dynamic_slice(post_rows, (start,), (r_cap,)),
                jax.lax.dynamic_slice(post_tfs, (start,), (r_cap,)),
            )

        rows_u, tfs_u = jax.vmap(slice_one)(
            jnp.maximum(u_starts, 0)
        )                                                         # [U, R]
        r_iota = jnp.arange(r_cap, dtype=jnp.int32)
        valid_u = (u_lens[:, None] > 0) & (r_iota[None, :] < u_lens[:, None])
        u_iota = jnp.broadcast_to(
            jnp.arange(u, dtype=jnp.int32)[:, None], (u, r_cap)
        )
        tf_tail = jnp.zeros((n, u + 1), jnp.float32).at[
            jnp.where(valid_u, rows_u, 0),
            jnp.where(valid_u, u_iota, u),
        ].add(jnp.where(valid_u, tfs_u.astype(jnp.float32), 0.0))[:, :u]
        sat_tail = okapi_sat(tf_tail, doc_len[:, None], avgdl)
        sat_tail = sat_tail * (tf_tail > 0) * keep[:, None]       # [N, U]

        u_tid_safe = jnp.where(u_tids >= 0, u_tids, vocab_pad)
        u_idf = idf[u_tid_safe]                                   # [U]
        w_tail = jnp.zeros((bq, u + 1), jnp.float32)
        qu_safe = jnp.where(qr_u >= 0, qr_u, u)
        w_tail = w_tail.at[b_idx, qu_safe].add(
            jnp.where(qr_u >= 0, q_counts_r, 0.0)
        )[:, :u]
        w_tail = w_tail * u_idf[None, :]
        scores = scores + jnp.einsum(
            "bu,nu->bn", w_tail, sat_tail,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return scores * keep[None, :]

    @functools.partial(
        jax.jit, static_argnames=("vocab_pad", "r_cap", "top_k")
    )
    def bm25_split_topk(*args, vocab_pad: int, r_cap: int, top_k: int):
        mask_bias = args[4]
        scores = bm25_split_scores(
            *args, vocab_pad=vocab_pad, r_cap=r_cap
        )
        vals, idx = jax.lax.top_k(scores + mask_bias[None, :], top_k)
        return vals, idx.astype(jnp.int32)

    return bm25_split_scores, bm25_split_topk


_SPLIT_FNS = None


def split_fns():
    global _SPLIT_FNS
    if _SPLIT_FNS is None:
        _SPLIT_FNS = _bm25_split_fns()
    return _SPLIT_FNS


def _bm25_device_fns():
    """Deferred jax import so host-only paths never pull in jax."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("vocab_pad",))
    def subset_df(term_ids, tfs, keep, vocab_pad: int):
        """df over masked rows: scatter-add of term presence → [vocab_pad+1]."""
        present = (term_ids >= 0) & (tfs > 0) & keep[:, None]
        scatter_idx = jnp.where(present, term_ids, vocab_pad)
        df = jnp.zeros(vocab_pad + 1, jnp.float32).at[scatter_idx].add(
            jnp.where(present, 1.0, 0.0)
        )
        return df.at[vocab_pad].set(0.0)

    @functools.partial(jax.jit, static_argnames=("top_k", "vocab_pad"))
    def bm25_scores_topk(
        term_ids,      # i32 [N, L]
        tfs,           # u8  [N, L]
        doc_len,       # f32 [N]
        mask_bias,     # f32 [N] (0 keep / -inf drop)
        df,            # f32 [vocab_pad+1] — subset df
        q_terms,       # i32 [M] (-1 padded)
        q_counts,      # f32 [M] query-term multiplicity
        top_k: int,
        vocab_pad: int,
    ):
        keep = mask_bias == 0.0
        n_sub = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
        idf = okapi_idf(df, n_sub)
        w = okapi_query_weights(idf, q_terms, q_counts, vocab_pad)
        avgdl = jnp.sum(jnp.where(keep, doc_len, 0.0)) / n_sub
        scores = okapi_score_rows(term_ids, tfs, doc_len, avgdl, w, vocab_pad)
        vals, idx = jax.lax.top_k(scores + mask_bias, top_k)
        return vals, idx.astype(jnp.int32)

    return subset_df, bm25_scores_topk


_DEVICE_FNS = None


def device_fns():
    global _DEVICE_FNS
    if _DEVICE_FNS is None:
        _DEVICE_FNS = _bm25_device_fns()
    return _DEVICE_FNS


# ---------------------------------------------------------------------------
# Pure-python oracle (tests + tiny corpora): exact BM25Okapi semantics
# ---------------------------------------------------------------------------

def bm25_oracle_scores(
    corpus_tokens: Sequence[Sequence[str]],
    query_tokens: Sequence[str],
) -> List[float]:
    """Reference implementation of the published BM25Okapi formula."""
    n = len(corpus_tokens)
    if n == 0:
        return []
    df: Dict[str, int] = {}
    doc_freqs: List[Dict[str, int]] = []
    total_len = 0
    for doc in corpus_tokens:
        freqs: Dict[str, int] = {}
        for t in doc:
            freqs[t] = freqs.get(t, 0) + 1
        doc_freqs.append(freqs)
        total_len += len(doc)
        for t in freqs:
            df[t] = df.get(t, 0) + 1
    avgdl = total_len / n
    idf: Dict[str, float] = {}
    negatives = []
    idf_sum = 0.0
    for t, f in df.items():
        v = math.log(n - f + 0.5) - math.log(f + 0.5)
        idf[t] = v
        idf_sum += v
        if v < 0:
            negatives.append(t)
    avg_idf = idf_sum / len(idf) if idf else 0.0
    for t in negatives:
        idf[t] = EPSILON * avg_idf
    out = []
    for freqs, doc in zip(doc_freqs, corpus_tokens):
        dl = len(doc)
        s = 0.0
        for q in query_tokens:
            tf = freqs.get(q, 0)
            if tf == 0 or q not in idf:
                continue
            s += idf[q] * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        out.append(s)
    return out
