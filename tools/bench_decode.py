"""Decoder generation throughput: tokens/sec for the TPU decode loop.

Runs the jitted KV-cache generate loop (prefill + lax.scan decode) on the
configured decoder size with deterministic random weights — the compute
shape of real generation.

``--preset llama3-8b --int8`` runs the reference's actual model class on
ONE chip: the reference serves 7-8B Q4_K_M GGUFs under an 8 GB VRAM
constraint (rag/routing/loader.py:1-12, rag/config.py:101-113); here the
int8 tree (~8 GB) plus KV cache lives inside a single chip's HBM, with
occupancy read back from device memory_stats.

Usage: python tools/bench_decode.py [--preset llama3-8b] [--batch 8]
       [--prompt 256] [--new 128] [--int8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _hbm_stats() -> dict:
    import jax

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key] = int(stats[key])
    return out


def _rss_mb() -> dict:
    out = {}
    try:
        for line in Path("/proc/self/status").read_text().splitlines():
            if line.startswith(("VmRSS", "VmHWM")):
                k, v = line.split(":", 1)
                out[k] = round(int(v.split()[0]) / 1024, 1)
    except OSError:
        pass
    return out


def main() -> int:
    from classmate_rag_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None,
                    choices=["llama3-8b", "qwen2-7b", "qwen3-8b"],
                    help="real model shapes from the reference lineup")
    ap.add_argument("--batch", default="8",
                    help="batch size, or comma list to share one "
                         "param transfer across runs (e.g. 1,8)")
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 weight-only quantized decode")
    ap.add_argument("--gguf", default=None,
                    help="decode from a .gguf FILE via the lazy-mmap "
                         "loader (the reference's exact serving input, "
                         "rag/generation/llama_cpp_runner.py:37-60)")
    ap.add_argument("--emit-gguf", default=None, metavar="PATH",
                    help="write the preset geometry (random weights, "
                         "zero egress) as a GGUF at PATH and exit — "
                         "pairs with a later --gguf run")
    ap.add_argument("--quant", default="q8_0",
                    choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q6_k"],
                    help="GGUF quantization for --emit-gguf")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from classmate_rag_tpu.models.decoder import (
        DecoderConfig, init_params, make_generate_fn,
        quantize_decoder_params, quantize_decoder_params_host,
    )

    if args.preset:
        base = {
            "llama3-8b": DecoderConfig.llama3_8b,
            "qwen2-7b": DecoderConfig.qwen2_7b,
            "qwen3-8b": DecoderConfig.qwen3_8b,
        }[args.preset]()
        config = dataclasses.replace(base, max_seq=args.prompt + args.new)
    elif args.gguf:
        config = None   # geometry comes from the file's metadata
    else:
        config = DecoderConfig(
            hidden=args.hidden,
            heads=max(4, args.hidden // 64),
            kv_heads=max(2, args.hidden // 192),
            ffn=args.hidden * 3,
            layers=12,
            max_seq=args.prompt + args.new,
        )

    if args.emit_gguf:
        # Materialize the preset geometry as a real on-disk GGUF
        # (random weights — this rig is zero-egress) so --gguf can
        # drive the exact file->mmap->dequant->int8->decode chain the
        # reference serves (rag/model_fetch.py:33-109 resolves a .gguf;
        # llama_cpp_runner.py:37-45 loads it).
        from classmate_rag_tpu.models import gguf as gg

        qmap = {"f32": gg.GGML_F32, "f16": gg.GGML_F16,
                "q8_0": gg.GGML_Q8_0, "q4_0": gg.GGML_Q4_0,
                "q4_k": gg.GGML_Q4_K, "q6_k": gg.GGML_Q6_K}
        assert config is not None, "--emit-gguf needs --preset/--hidden"
        t0 = time.perf_counter()
        params = init_params(config, "bench-decode", host=True)
        gg.export_decoder_to_gguf(
            args.emit_gguf, params, config, quant_type=qmap[args.quant]
        )
        print(json.dumps({
            "emitted": args.emit_gguf,
            "quant": args.quant,
            "file_bytes": Path(args.emit_gguf).stat().st_size,
            "seconds": round(time.perf_counter() - t0, 1),
            "rss_mb": _rss_mb(),
        }), flush=True)
        return 0

    batches = [int(b) for b in str(args.batch).split(",")]
    if args.gguf:
        from classmate_rag_tpu.models.gguf import load_params_from_gguf

        t0 = time.perf_counter()
        config, params = load_params_from_gguf(args.gguf, host=True)
        config = dataclasses.replace(
            config, max_seq=args.prompt + args.new
        )
        load_s = time.perf_counter() - t0
        big = config.hidden >= 2048
        if args.int8:
            params = quantize_decoder_params_host(params, config)
    else:
        load_s = None
        big = config.hidden >= 2048
        # Big trees init on the host: an 8B f32 tree (~30 GB) must never
        # stage through HBM; only the int8 bytes are transferred.
        params = init_params(config, "bench-decode", host=big)
    if args.gguf:
        pass    # quantization handled above (host path)
    elif args.int8:
        if big:
            params = quantize_decoder_params_host(params, config)
        else:
            params = quantize_decoder_params(params, config)
    elif big:
        # bf16 on host, halving the transfer bytes of the fp tree.
        import ml_dtypes

        params = jax.tree.map(
            lambda x: np.asarray(x).astype(ml_dtypes.bfloat16)
            if getattr(x, "ndim", 0) >= 2 else x, params,
        )
    # Time ONLY the host->device transfer (the metric's name): host RNG
    # init + quantization of an ~8-30 GB tree used to be folded in.
    t_init = time.perf_counter()
    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t_init
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    gen = make_generate_fn(config, args.prompt + args.new, args.new)

    rng = np.random.default_rng(0)
    for batch in batches:
        prompts = jnp.asarray(
            rng.integers(4, config.vocab_size, (batch, args.prompt)),
            jnp.int32,
        )
        plen = jnp.full((batch,), args.prompt, jnp.int32)

        np.asarray(gen(params, prompts, plen, 0, 0.0, 0.95, 2))  # compile
        t0 = time.perf_counter()
        np.asarray(gen(params, prompts, plen, 1, 0.0, 0.95, 2))
        dt = time.perf_counter() - t0

        new_tokens = batch * args.new
        out = {
            "preset": args.preset,
            "gguf": args.gguf,
            "gguf_load_s": round(load_s, 1) if load_s is not None else None,
            "layers": config.layers,
            "hidden": config.hidden,
            "batch": batch,
            "prompt_len": args.prompt,
            "new_tokens": args.new,
            "int8": bool(args.int8),
            "param_bytes": param_bytes,
            "transfer_seconds": round(init_s, 1),
            "seconds": round(dt, 3),
            # Conservative: the timed call includes ONE batch prefill
            # over prompt_len tokens (a single weight pass) on top of
            # new_tokens decode steps, so the reported rate slightly
            # UNDERSTATES pure decode.
            "decode_tokens_per_sec": round(new_tokens / dt, 1),
        }
        out["rss_mb"] = _rss_mb()   # peak host RSS: the memory-safe-load claim
        out.update(_hbm_stats())
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
