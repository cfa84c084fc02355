"""HBM admission control: device-payload budgeting + OOM-spill-to-host.

The reference never dies on memory pressure: caches are sized against
server memory at startup (programs/server/Server.cpp:1312-1335) and index
builds run under a memory governor with retry
(src/VectorIndex/Common/VIBuildMemoryUsageHelper.h,
VIBuilderUpdater.cpp:639-657). The TPU analogue guards the one resource
the reference does not have — a fixed 16 GB HBM pool shared with
co-tenants — at the engine's widest ingress: segment payload uploads.

Policy:
  * every payload upload is ADMITTED against a budget first — live device
    memory stats when the backend exposes them (in_use + bytes must stay
    under ratio x capacity), or an explicit byte budget tracked across
    live payloads (works on stat-less backends, e.g. the CPU test mesh);
  * an admitted upload that still hits RESOURCE_EXHAUSTED (co-tenant
    pressure) is retried once after a gc, then DEGRADES to the host tier
    (the disk-mode analogue, Search::DiskIOManager / VICommon.h:132)
    instead of propagating a process-killing exception — the round-4
    failure mode where one segment upload killed an entire benchmark run.

Spilled float payloads store the SAME bf16-rounded values the HBM tier
would have scored against, so a spill is semantically invisible: exact
scans over the host tier return bit-identical distances.
"""

from __future__ import annotations

import gc
import threading
import weakref
from typing import Optional, Sequence, Tuple


def device_memory_stats() -> Optional[Tuple[int, int]]:
    """(bytes_in_use, bytes_limit) of the default device, or None when the
    backend exposes no stats (CPU, some tunnels)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        in_use = stats.get("bytes_in_use")
        cap = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if in_use is None or not cap:
            return None
        return int(in_use), int(cap)
    except Exception:  # noqa: BLE001
        return None


def is_device_oom(exc: BaseException) -> bool:
    """True when `exc` is a device allocation failure (any backend)."""
    msg = str(exc)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "ResourceExhausted" in msg
        or "Out of memory" in msg
        or "OOM" in msg.split(":")[0]
    )


class HbmGovernor:
    """Process-wide admission control for device payload uploads."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._tracked = 0  # bytes of live tracked payloads (budget mode)

    @property
    def tracked_bytes(self) -> int:
        with self._lock:
            return self._tracked

    def admit(self, nbytes: int, server=None) -> bool:
        """Should an `nbytes` payload go to HBM? False => host tier."""
        budget = getattr(server, "device_payload_budget_bytes", None)
        if budget is not None:
            with self._lock:
                return self._tracked + nbytes <= budget
        stats = device_memory_stats()
        if stats is None:
            return True
        in_use, cap = stats
        ratio = getattr(server, "vector_storage_budget_ratio", 0.92) or 0.92
        return in_use + nbytes <= ratio * cap

    def register(self, owner, nbytes: int) -> None:
        """Count `nbytes` against the tracked budget for `owner`'s
        lifetime (released when the payload is garbage collected — merge
        swaps and table drops free budget without explicit hooks)."""
        with self._lock:
            self._tracked += nbytes

        def _release(self_ref=weakref.ref(self), n=nbytes):
            g = self_ref()
            if g is not None:
                with g._lock:
                    g._tracked -= n

        weakref.finalize(owner, _release)

    def guarded_put(self, arrays: Sequence[Tuple[object, object]]):
        """Upload host arrays to device: [(np_array, dtype_or_None), ...]
        -> list of jax arrays, or None after a retried device OOM. Partial
        uploads are dropped before the retry so the gc actually frees HBM."""
        import jax
        import jax.numpy as jnp

        for attempt in (0, 1):
            out = []
            try:
                for arr, dtype in arrays:
                    out.append(
                        jnp.asarray(arr, dtype=dtype)
                        if dtype is not None
                        else jnp.asarray(arr)
                    )
                jax.block_until_ready(out)
                return out
            except Exception as e:  # noqa: BLE001 — inspect, re-raise non-OOM
                if not is_device_oom(e):
                    raise
                del out
                gc.collect()
                if attempt == 1:
                    return None
        return None


GOVERNOR = HbmGovernor()
