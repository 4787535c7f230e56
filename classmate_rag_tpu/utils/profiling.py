"""Profiling helpers: jax.profiler traces + throughput accounting.

``trace(dir)`` wraps ``jax.profiler.trace`` for TensorBoard-viewable device
traces of any code region (ingest, a query batch, decode). ``Throughput``
turns (bytes, flops, seconds) into GB/s / TFLOP/s / MFU against a device
peak table — the counters the bench and kernel work report.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass
from typing import Iterator, Optional

# Published peak numbers per chip (bf16 matmul TFLOP/s, HBM GB/s).
_DEVICE_PEAKS = {
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6e": (918.0, 1640.0),
    "cpu": (1.0, 50.0),
}


def _detect_chip() -> str:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "cpu"
    for key in _DEVICE_PEAKS:
        if key in kind.replace(" ", ""):
            return key
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    if "v6 lite" in kind or "v6lite" in kind:
        return "v6e"  # device_kind says "TPU v6 lite", not "v6e"
    return "cpu"


@dataclass
class Throughput:
    seconds: float
    bytes_accessed: float = 0.0
    flops: float = 0.0
    chip: Optional[str] = None

    def report(self) -> dict:
        chip = self.chip or _detect_chip()
        peak_tflops, peak_gbs = _DEVICE_PEAKS.get(chip, _DEVICE_PEAKS["cpu"])
        gbs = self.bytes_accessed / self.seconds / 1e9 if self.seconds else 0.0
        tflops = self.flops / self.seconds / 1e12 if self.seconds else 0.0
        return {
            "chip": chip,
            "seconds": round(self.seconds, 6),
            "gb_per_s": round(gbs, 1),
            "hbm_utilization": round(gbs / peak_gbs, 3) if peak_gbs else None,
            "tflop_per_s": round(tflops, 2),
            "mfu": round(tflops / peak_tflops, 4) if peak_tflops else None,
        }


@contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
