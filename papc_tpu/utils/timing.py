"""Relay-sound device timing — the ONE timing primitive for benchmarks.

``jax.Array.block_until_ready()`` does NOT block through this image's
axon relay: it returns in ~0.1 ms while seconds of device work are still
in flight, so any timer built on it measures host *dispatch* rate, not
device compute (established by experiment in round 2: a chained 64×
8192³ bf16 matmul — ≥0.36 s of work at v5e peak — "blocked" in 0.09 ms;
forcing the value took ~439 ms). The only trustworthy clock edge is a
VALUE FETCH (``np.asarray`` / ``float``), which cannot complete before
the producing computation has.

:func:`fetch_forced_time` is therefore the timing primitive everything
else (``bench.py``, :class:`papc_tpu.utils.profiling.StepTimer`, perf
docs) builds on: run K chained steps, force the final value, and take
the slope between a small and a large K — the constant fetch+dispatch
overhead cancels, leaving per-step device time. The two window sizes
make the estimate self-checking: if the windows don't scale with K the
slope collapses toward zero and :func:`fetch_forced_time` falls back to
the conservative whole-window bound.

:func:`check_physical` is the physics guard: a measured step time that
implies more FLOP/s than the chip's peak is *proof* of a broken timer
(this exact check would have caught every invalid round-1/2 number).

The reference has no analog — its timers
(``detect/train.py:208-226``) accumulate raw wall-clock deltas without
even accounting for ordinary CUDA async dispatch.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field

import jax
import numpy as np

# TPU v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s fp32 (MXU half rate).
V5E_PEAK_FLOPS = {"bf16": 1.97e14, "fp32": 9.85e13}


def force(x, *, all_leaves: bool = False):
    """Force a concrete value fetch — the only relay-sound barrier.

    Fetches the smallest array leaf of ``x`` (or every leaf when
    ``all_leaves``). For outputs of a single jitted step (the donated
    train-step pattern) the executable completes as a unit before any
    output can transfer, so one leaf is a barrier for the whole step.

    Returns ``x`` so it can wrap expressions.
    """
    leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(x)
        if hasattr(leaf, "__array__") or hasattr(leaf, "addressable_shards")
    ]
    if not leaves:
        return x
    if not all_leaves:
        leaves = [min(leaves, key=lambda leaf: getattr(leaf, "size", 0))]
    for leaf in leaves:
        np.asarray(leaf)
    return x


@dataclass
class TimingResult:
    """Per-step time plus the evidence it was derived from."""

    step_s: float
    method: str  # "k-slope" | "window-bound"
    k_small: int
    k_large: int
    windows_small: list = field(default_factory=list)
    windows_large: list = field(default_factory=list)

    @property
    def step_ms(self) -> float:
        return self.step_s * 1e3


def fetch_forced_time(
    step,
    *,
    k_small: int = 10,
    k_large: int = 40,
    repeats: int = 3,
    warmup: bool = True,
) -> TimingResult:
    """Per-step device time of ``step`` via fetch-forced K-chain slope.

    ``step()`` must advance its own state (holder pattern, chained
    through donated buffers) and return something whose value depends on
    the step — typically the loss. Each window dispatches K steps and
    then FORCES the final value; per-step time is the slope between the
    best small and best large window, cancelling the constant
    fetch+dispatch overhead. Using the best (min) window per K is
    deliberate: relay congestion inflates whole windows at once, and the
    fastest sustained window is the steadiest estimate of device
    capability across rounds.

    Falls back to the whole-window upper bound ``min(T_large)/k_large``
    (marked ``method="window-bound"``) if congestion noise swamps the
    slope — that bound still contains the real step time and can only
    overstate it.
    """
    if k_large <= k_small:
        raise ValueError("k_large must exceed k_small")
    if warmup:
        force(step())

    def window(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = step()
        force(out)
        return time.perf_counter() - t0

    ws, wl = [], []
    for _ in range(repeats):
        ws.append(window(k_small))
        wl.append(window(k_large))
    slope = (min(wl) - min(ws)) / (k_large - k_small)
    bound = min(wl) / k_large
    if slope <= 0 or not math.isfinite(slope):
        return TimingResult(bound, "window-bound", k_small, k_large, ws, wl)
    return TimingResult(slope, "k-slope", k_small, k_large, ws, wl)


def scan_slope(time_for_k, k_small: int, k_large: int) -> TimingResult:
    """Per-step time from whole-call times of K-step scanned programs.

    ``time_for_k(k)`` returns the (already fetch-forced, best-of) whole
    call time of a program that runs ``k`` steps inside one jit. The
    per-step estimate is the slope between the two K's — constant
    per-call overhead (dispatch, fetch) cancels. Shares
    :func:`fetch_forced_time`'s self-check: relay congestion can make
    the windows non-monotone in K, in which case the slope is
    non-positive and we fall back to the conservative whole-window
    bound ``time_for_k(k_large)/k_large`` (method="window-bound"),
    which contains the true step time and can only overstate it. A
    non-positive number must never enter the record.
    """
    if k_large <= k_small:
        raise ValueError("k_large must exceed k_small")
    t_small = time_for_k(k_small)
    t_large = time_for_k(k_large)
    slope = (t_large - t_small) / (k_large - k_small)
    if slope <= 0 or not math.isfinite(slope):
        return TimingResult(
            t_large / k_large, "window-bound", k_small, k_large,
            [t_small], [t_large],
        )
    return TimingResult(
        slope, "k-slope", k_small, k_large, [t_small], [t_large]
    )


def calibration_probe(
    dim: int = 2048,
    k_small: int = 16,
    k_large: int = 64,
    repeats: int = 3,
) -> tuple[TimingResult, float]:
    """Fixed-workload drift probe: scanned bf16 ``dim³`` matmul chain.

    The same program every round, timed by scan-slope (K matmuls inside
    ONE jit, slope between K=16 and K=64 whole-call bests) — so its
    number moves ONLY with the environment (chip allocation, relay
    service state, host contention), never with framework code. Bench
    records it as ``calib_matmul_ms``; comparing rounds r(N) → r(N+1)
    divides out this row first, separating environment drift from real
    regressions (VERDICT r4: several rows moved 10–25% with no code
    change; the r3→r4 SSG 14.28→16.08 ms "regression" reproduced
    bit-identically on the r3-equivalent code — pure drift).

    Returns ``(TimingResult, implied_mfu)``; the MFU also serves as a
    plausibility check (a healthy v5e runs a 2048³ bf16 chain at
    ~50–90% of peak — far outside that means the measurement itself is
    suspect).
    """
    import jax.numpy as jnp
    from jax import lax

    w = (
        jax.random.normal(
            jax.random.PRNGKey(0), (dim, dim), jnp.float32
        )
        / np.sqrt(dim)
    ).astype(jnp.bfloat16)
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (dim, dim), jnp.float32
    ).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        def step(c, _):
            return (
                lax.dot(c, w, preferred_element_type=jnp.bfloat16),
                (),
            )

        c, _ = lax.scan(step, x, None, length=k)
        return c

    def time_for_k(k: int) -> float:
        force(chain(x0, k))  # compile + warm outside the window
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            force(chain(x0, k))
            best = min(best, time.perf_counter() - t0)
        return best

    res = scan_slope(time_for_k, k_small, k_large)
    u = check_physical(
        res.step_s, 2.0 * dim**3, "calibration_probe", "bf16"
    )
    return res, u


def compiled_flops(fn, *args, **kwargs) -> float | None:
    """FLOPs of ``fn(*args, **kwargs)`` per XLA ``cost_analysis``.

    ``fn`` may already be jitted; returns None when the backend offers
    no cost model (e.g. some CPU builds).
    """
    try:
        lowered = (fn if hasattr(fn, "lower") else jax.jit(fn)).lower(
            *args, **kwargs
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        flops = cost.get("flops")
        return float(flops) if flops else None
    except Exception:  # noqa: BLE001 — cost model is best-effort
        return None


def mfu(
    flops_per_step: float | None,
    step_s: float,
    precision: str = "bf16",
) -> float | None:
    """Model FLOP utilization vs the v5e peak for ``precision``."""
    if not flops_per_step or step_s <= 0:
        return None
    return flops_per_step / step_s / V5E_PEAK_FLOPS[precision]


def check_physical(
    step_s: float,
    flops_per_step: float | None,
    label: str = "",
    precision: str = "bf16",
) -> float:
    """Refuse physically impossible timings (the broken-timer guard).

    A step time implying >100% of chip peak cannot be a measurement;
    raises so a broken timer can never put a number in the record.
    Returns the implied MFU (0.0 when FLOPs are unknown).
    """
    if step_s <= 0 or not math.isfinite(step_s):
        raise RuntimeError(
            f"physically impossible timing for {label or 'step'}: "
            f"non-positive/non-finite step time {step_s!r} s implies "
            "infinite throughput — the timer (or a K-slope without its "
            "window-bound fallback) is broken"
        )
    u = mfu(flops_per_step, step_s, precision)
    if u is None:
        return 0.0
    if u > 1.0:
        raise RuntimeError(
            f"physically impossible timing for {label or 'step'}: "
            f"{step_s * 1e3:.3f} ms at {flops_per_step:.3g} FLOPs implies "
            f"{u * 100:.0f}% of v5e {precision} peak — the timer is broken "
            "(is block_until_ready being trusted through the relay?)"
        )
    return u
