"""E5 encoder: batched, bucketed, jitted TPU forward with E5 semantics.

Replaces the reference's SentenceTransformer wrapper
(rag/embeddings/__init__.py:36-105): "query: "/"passage: " prefixes,
L2-normalized float32 output. Differences are all TPU-first:

- inputs are grouped into length buckets (32..512) and padded, so XLA
  compiles a handful of static shapes once and reuses them;
- batch size scales inversely with bucket length to keep tokens/step
  constant (one compile per (bucket, batch) pair, MXU kept busy);
- the forward is a single jitted function; weights are device-resident.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from classmate_rag_tpu.embeddings.model import (
    EncoderConfig,
    Params,
    encode,
    encoder_flops,
    init_params,
    load_params_from_hf,
)
from classmate_rag_tpu.embeddings.tokenizer import (
    bucket_length,
    load_tokenizer,
    pad_to_bucket,
)

# Target tokens per device step; batch = budget / bucket_len.
_TOKENS_PER_STEP = 16384


class E5Encoder:
    """JAX E5 encoder with query/passage prefixes and length bucketing."""

    # Forwards kept in flight during bulk encoding (1 = synchronous).
    # Measured on the remote-attached v5e at seq-256 passages:
    # depth 1 -> 760 chunks/s, 2 -> 1,040, 3 -> 1,270, 4 -> 1,200.
    PIPELINE_DEPTH = 3

    def __init__(
        self,
        model_name: str = "intfloat/multilingual-e5-base",
        model_dir: Optional[str] = None,
        config: Optional[EncoderConfig] = None,
        max_length: int = 512,
        params: Optional[Params] = None,
        data_parallel: int = 1,
    ) -> None:
        self.model_name = model_name
        self.config = config or EncoderConfig.for_model_name(model_name)
        self.dim = self.config.hidden
        self.max_length = min(max_length, self.config.max_positions - 2)
        self.tokenizer = load_tokenizer(
            model_dir, max_length=self.max_length,
            vocab_size=self.config.vocab_size,
        )
        self.has_pretrained_weights = False

        if params is not None:
            self.params = params
        else:
            loaded = load_params_from_hf(model_dir, self.config) if model_dir else None
            if loaded is not None:
                self.params = loaded
                self.has_pretrained_weights = True
            else:
                self.params = init_params(self.config, seed_key=model_name)

        self._jit_encode = jax.jit(partial(encode, config=self.config))
        self.last_flops = 0.0
        # Batch data parallelism over a ("data",) mesh — the SURVEY §2.3
        # note made real: bulk encode (ingest/rebuild/dump, the
        # reference's #1 hot loop, rag/pipeline/rag.py:410) shards its
        # padded batches across chips; params replicate once. Per-row
        # math is batch-independent, so outputs are IDENTICAL to the
        # single-device path. dp clamps to the largest power of two ≤
        # min(devices, 8) so every padded batch size (8/64/2^k) divides.
        self._dp = 1
        self._jit_encode_dp = None
        self._params_dp = None
        if data_parallel != 1:
            avail = len(jax.devices())
            want = avail if data_parallel <= 0 else min(data_parallel, avail)
            dp = 1 << (min(want, 8).bit_length() - 1) if want > 1 else 1
            if dp > 1:
                self._init_data_parallel(dp)

    def _init_data_parallel(self, dp: int) -> None:
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(_np.array(jax.devices()[:dp]), ("data",))
        rep = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P("data", None))
        self._dp = dp
        self._mesh = mesh
        self._params_dp = jax.device_put(
            self.params, jax.tree.map(lambda _: rep, self.params)
        )
        # The replicated copy serves BOTH paths (a fully-replicated array
        # is a valid input to the non-dp jit as well): keeping the
        # original single-device tree alongside it doubled the encoder's
        # HBM footprint (~1.1 GB extra for e5-base f32) for nothing.
        self.params = self._params_dp
        self._jit_encode_dp = jax.jit(
            partial(encode, config=self.config),
            in_shardings=(
                jax.tree.map(lambda _: rep, self.params), batch, batch,
            ),
            out_shardings=batch,
        )

    # ------------------------------------------------------------------
    def _dispatch_bucket(self, ids: np.ndarray, mask: np.ndarray):
        """Enqueue one forward; returns the device array (not fetched)."""
        if self._jit_encode_dp is not None and ids.shape[0] % self._dp == 0:
            out = self._jit_encode_dp(
                self._params_dp, jnp.asarray(ids), jnp.asarray(mask)
            )
        else:
            out = self._jit_encode(
                self.params, jnp.asarray(ids), jnp.asarray(mask)
            )
        self.last_flops += encoder_flops(self.config, ids.shape[0], ids.shape[1])
        return out

    def _forward_bucket(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.asarray(self._dispatch_bucket(ids, mask), dtype=np.float32)

    def _dispatch_groups(self, texts: Sequence[str], prefix: str):
        """Tokenize, bucket, and ENQUEUE one forward per padded batch.

        Yields ``(group_indices, device_vecs)`` pairs where device_vecs
        is the un-fetched device array sliced to the group. This is the
        single source of truth for the bounded-shape dispatch policy —
        the host and device encode paths must produce IDENTICAL
        dispatches (same buckets, same padded batch shapes), differing
        only in how they consume the results.
        """
        prefixed = [f"{prefix}{t or ''}" for t in texts]
        encoded = self.tokenizer.encode_batch(prefixed, self.max_length)

        by_bucket: dict[int, List[int]] = {}
        for i, ids in enumerate(encoded):
            by_bucket.setdefault(bucket_length(len(ids)), []).append(i)

        for bucket, indices in sorted(by_bucket.items()):
            max_batch = max(8, _TOKENS_PER_STEP // bucket)
            max_batch = 2 ** int(math.ceil(math.log2(max_batch)))
            for start in range(0, len(indices), max_batch):
                group = indices[start : start + max_batch]
                rows = [encoded[i] for i in group]
                # Static shapes for XLA with a BOUNDED shape set: batch pads
                # to the smallest of {8, 64, max_batch} that fits. Arbitrary
                # power-of-two padding minimizes waste but each new shape
                # costs a full XLA compile (~30s via remote compile) —
                # three steps per bucket caps compiles while keeping a
                # single query from paying a 512-row forward.
                for candidate in (8, 64, max_batch):
                    if len(rows) <= candidate:
                        batch_size = min(candidate, max_batch)
                        break
                n_pad = batch_size - len(rows)
                ids_arr, mask_arr = pad_to_bucket(rows + [[0]] * n_pad, bucket)
                yield group, self._dispatch_bucket(ids_arr, mask_arr)[: len(group)]

    def _encode_texts(self, texts: Sequence[str], prefix: str) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        out = np.zeros((len(texts), self.dim), dtype=np.float32)

        # Pipelined dispatch (depth 3): on a remote-attached device each
        # synchronous batch pays the link round trip; keeping a few
        # forwards in flight overlaps transfer/compute across batches —
        # the bulk-ingest hot loop.
        in_flight: List[tuple] = []

        def drain_one():
            group, dev = in_flight.pop(0)
            out[np.asarray(group)] = np.asarray(dev, dtype=np.float32)

        for group, dev in self._dispatch_groups(texts, prefix):
            in_flight.append((group, dev))
            if len(in_flight) >= self.PIPELINE_DEPTH:
                drain_one()
        while in_flight:
            drain_one()
        return out

    def _encode_texts_device(self, texts: Sequence[str], prefix: str):
        """Like ``_encode_texts`` but the result STAYS ON DEVICE.

        Returns a jax array [n, dim] f32 in input order. Through the
        remote device link every host fetch is a round trip; retrieval
        consumes the query vectors in the very next dispatch, so fetching
        them to host between encode and the fused hybrid step wastes a
        full round trip per ask. Order restoration is a device gather —
        enqueued, never synced.
        """
        import jax.numpy as jnp

        if not texts:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        groups: List[List[int]] = []
        devs: List = []
        for group, dev in self._dispatch_groups(texts, prefix):
            groups.append(group)
            devs.append(dev)
        if len(devs) == 1 and groups[0] == list(range(len(texts))):
            return devs[0]
        flat = np.concatenate([np.asarray(g, np.int64) for g in groups])
        inverse = np.empty(len(texts), np.int64)
        inverse[flat] = np.arange(len(texts))
        return jnp.concatenate(devs, axis=0)[jnp.asarray(inverse)]

    # Public surface (matches the reference embedder).
    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return self._encode_texts(texts, "query: ")

    def encode_passages(self, texts: Sequence[str]) -> np.ndarray:
        return self._encode_texts(texts, "passage: ")

    def encode_queries_device(self, texts: Sequence[str]):
        """Device-resident query encoding (see ``_encode_texts_device``)."""
        return self._encode_texts_device(texts, "query: ")
