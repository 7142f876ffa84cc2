"""Per-callsite memory profiler.

Equivalent of GSLAM/GSLAM/core/MemoryMetric.h/.inc (malloc/free
interposition with per-callsite statistics, dumped by count or size —
enabled via ENABLE_MEMORYCHECK, gui/pislam.cpp:44-47,172-178). Python has
no malloc hook to interpose, so this wraps the stdlib `tracemalloc`
snapshot machinery behind the same surface: enable/disable, usage counters,
and by-count / by-size callsite dumps. Device (HBM) memory is XLA-managed
and observable via jax.live_arrays(), summarized by `device_usage`.
"""
from __future__ import annotations

import tracemalloc
from typing import List, Tuple

_enabled = False


def enable(nframes: int = 5):
    """MemoryMetric::enable."""
    global _enabled
    if not _enabled:
        tracemalloc.start(nframes)
        _enabled = True


def disable():
    global _enabled
    if _enabled:
        tracemalloc.stop()
        _enabled = False


def is_enabled() -> bool:
    return _enabled


def used_bytes() -> int:
    """Current traced host allocation (MemoryMetric::usage)."""
    return tracemalloc.get_traced_memory()[0] if _enabled else 0


def peak_bytes() -> int:
    return tracemalloc.get_traced_memory()[1] if _enabled else 0


def _stats(key: str) -> List[Tuple[str, int, int]]:
    snap = tracemalloc.take_snapshot()
    out = []
    for st in snap.statistics("lineno"):
        frame = st.traceback[0]
        out.append((f"{frame.filename}:{frame.lineno}", st.count, st.size))
    out.sort(key=lambda r: -r[1] if key == "count" else -r[2])
    return out


def dump_by_count(top: int = 20) -> str:
    """Per-callsite dump sorted by allocation count (dumpByCount)."""
    if not _enabled:
        return "(memory metric disabled)"
    lines = [f"{'callsite':<64} {'count':>8} {'bytes':>12}"]
    for site, count, size in _stats("count")[:top]:
        lines.append(f"{site:<64} {count:>8} {size:>12}")
    return "\n".join(lines)


def dump_by_size(top: int = 20) -> str:
    """Per-callsite dump sorted by bytes (dumpBySize)."""
    if not _enabled:
        return "(memory metric disabled)"
    lines = [f"{'callsite':<64} {'count':>8} {'bytes':>12}"]
    for site, count, size in _stats("size")[:top]:
        lines.append(f"{site:<64} {count:>8} {size:>12}")
    return "\n".join(lines)


def device_usage() -> dict:
    """HBM-side live-buffer summary (no reference analogue needed there —
    CUDA was implicit; XLA tracks it for us)."""
    import jax
    per_device: dict = {}
    try:
        arrays = jax.live_arrays()
    except Exception:
        return {}
    for a in arrays:
        try:
            for shard in a.addressable_shards:
                d = str(shard.device)
                per_device.setdefault(d, [0, 0])
                per_device[d][0] += 1
                per_device[d][1] += shard.data.nbytes
        except Exception:
            continue
    return {d: dict(arrays=v[0], bytes=v[1]) for d, v in per_device.items()}
