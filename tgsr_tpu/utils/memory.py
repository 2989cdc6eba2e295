"""Compile-time memory accounting + batch capacity planning.

Every batch-size ceiling in docs/PERF.md (training B=160 OOM, x16 serving
B=320 OOM) was found by paying a full compile-and-crash on the device.
XLA already knows the answer at COMPILE time: the AOT executable exposes
its HBM plan (temp/argument/output bytes) without running a single step.
These helpers productize that:

    mem = program_memory(fn, *args)          # bytes, no execution
    b   = max_feasible_batch(make, budget)   # bisect the largest batch

The reference has no analogue (PyTorch discovers OOM at runtime).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax


def program_memory(fn: Callable, *args, static_argnums=(),
                   **kwargs) -> Dict[str, Optional[int]]:
    """AOT-compile `fn(*args, **kwargs)` and return XLA's memory plan in
    bytes: {temp, arguments, output, generated_code, total}. Nothing is
    executed; args only contribute shapes/dtypes (jax.ShapeDtypeStruct
    works). Fields the backend does not report come back as None.

    An already-jitted `fn` is lowered as-is — re-wrapping would silently
    drop its donate_argnums and overstate the plan (donated inputs alias
    outputs); pass the production jit to measure the production plan."""
    target = fn if hasattr(fn, "lower") else jax.jit(
        fn, static_argnums=static_argnums)
    lowered = target.lower(*args, **kwargs)
    analysis = lowered.compile().memory_analysis()

    def grab(*names):
        for n in names:
            v = getattr(analysis, n, None)
            if v is not None:
                return int(v)
        return None

    temp = grab("temp_size_in_bytes")
    arguments = grab("argument_size_in_bytes")
    output = grab("output_size_in_bytes")
    code = grab("generated_code_size_in_bytes")
    alias = grab("alias_size_in_bytes") or 0
    known = [v for v in (temp, arguments, output, code) if v is not None]
    total = sum(known) - alias if known else None
    return {"temp": temp, "arguments": arguments, "output": output,
            "generated_code": code, "total": total}


# Per-chip HBM for device kinds whose PJRT client does not report
# memory_stats() (the axon tunnel backend returns None for a real v5e).
# Values are the published per-chip capacities in the UNIT each spec
# sheet actually uses: v5e/v5p/v6e are quoted in decimal GB (v5p is
# 95 GB ~ 88.5 GiB — a 96*2**30 entry would overstate it ~8% and eat
# the entire 0.92-fraction headroom), while v4 is quoted as 32 GiB.
# device_kind strings as reported by jax.Device.device_kind.
KNOWN_CAPACITY_BYTES = {
    "TPU v5 lite": int(16e9),   # v5e (16 GB)
    "TPU v4": 32 * 2**30,       # v4 (32 GiB HBM2)
    "TPU v5": int(95e9),        # v5p (95 GB)
    "TPU v6 lite": int(32e9),   # v6e / Trillium (32 GB)
}


def device_memory_budget(device=None, fraction: float = 0.92
                         ) -> Optional[int]:
    """Usable accelerator memory in bytes (`fraction` of the reported
    capacity, leaving headroom for the runtime's reserved segment — the
    v5e OOM report shows ~258 MB reserved). Falls back to the
    KNOWN_CAPACITY_BYTES table when the backend doesn't report
    memory_stats (the axon tunnel backend); None when the kind is
    unknown too (e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = {}
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    cap = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if not cap:
        cap = KNOWN_CAPACITY_BYTES.get(getattr(device, "device_kind", ""))
    return int(cap * fraction) if cap else None


def max_feasible_batch(
    make: Callable[[int], Tuple[Callable, tuple]],
    budget_bytes: Optional[int] = None,
    lo: int = 1,
    hi: int = 4096,
    measure: Optional[Callable[[int], Optional[int]]] = None,
    quantum: int = 1,
) -> Tuple[int, Dict[int, Any]]:
    """Largest batch b in [lo, hi] whose compiled program fits
    `budget_bytes`, by bisection on compile-time memory (each probe is a
    compile, not a run — minutes of crash-retry become seconds).

    `make(b)` -> (fn, args) for batch size b (ShapeDtypeStructs are
    enough). `measure(b)` overrides the probe (tests; or a backend whose
    analysis is unreliable) and returns total bytes or None for
    "infeasible". `quantum` rounds candidate batches down to a multiple
    (e.g. 64 keeps the XLA shape set small, matching sr_batched's plan).
    Returns (best_b, {b: measured_total}); best_b == 0 if even `lo`
    does not fit."""
    if budget_bytes is None:
        budget_bytes = device_memory_budget()
    if budget_bytes is None:
        raise ValueError("no budget_bytes and the device reports no "
                         "memory capacity")

    def probe(b: int) -> Optional[int]:
        if measure is not None:
            return measure(b)
        try:
            fn, args = make(b)
            return program_memory(fn, *args)["total"]
        except Exception:  # XLA raises on compile-time OOM
            return None

    def fits(b: int) -> Tuple[bool, Optional[int]]:
        t = probe(b)
        return (t is not None and t <= budget_bytes), t

    history: Dict[int, Any] = {}
    q = max(1, quantum)
    lo_q = max(1, lo)
    ok, t = fits(lo_q)
    history[lo_q] = t
    if not ok:
        return 0, history
    best = lo_q
    lo_b, hi_b = lo_q, max(lo_q, hi)
    while True:
        mid = (lo_b + hi_b + 1) // 2
        if mid - mid % q >= lo_q:
            mid -= mid % q  # snap down to the shape quantum
        if mid <= lo_b or mid > hi_b:
            break
        ok, t = fits(mid)
        history[mid] = t
        if ok:
            best, lo_b = mid, mid
        else:
            hi_b = mid - 1
        if lo_b >= hi_b:
            break
    return best, history
