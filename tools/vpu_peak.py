"""Measure the ACHIEVABLE VPU rate on this chip and pin the MFU number.

VERDICT r3 weak #1: PERF.md reports utilization as a 2x range because a
jaxpr op count cannot see which mul+add pairs Mosaic fuses into FMAs.
The XLA dump path is unavailable here (the axon service compiles
server-side; --xla_dump_to stays empty), so this tool pins the range
EMPIRICALLY instead: two Pallas microkernels with exactly known jaxpr op
counts and the same (rows, 128) f32 block geometry as the megakernel —

  fma   alternating  a = a*b + c  chains: every op pair is fusable, so
        its sustained jaxpr-ops/s IS the chip's fused-issue ceiling for
        mul/add mixes;
  nofma interleaved adds on independent accumulators with no adjacent
        mul+add pairing: the unfused ceiling.

The production kernel's op mix (selects, compares, int ops, rsqrts) lies
between, but both ceilings are MEASURED on the same hardware, same block
shape, same loop structure — so "sustained / measured fma ceiling" is a
defensible single utilization number, and the fma:nofma ratio says how
much fusion headroom the chip actually exposes (2.0 = every pair fuses).

Measured on this v5e (2026-08-19): fma 7.096e12, nofma 7.093e12 — ratio
1.00. Both mixes sustain 1.84x the MODELED issue peak (3.85e12), so the
4-ALU×0.94GHz model underestimates the chip and pairing does not matter;
7.1e12 jaxpr-ops/s is the real ceiling for mul/add-class vector work.

Run (tunnel up):  python3 tools/vpu_peak.py [--rows 16] [--iters 2000000]
(~70 ms/call at peak: the 4-call chain swamps the ~30 ms tunnel sync)
Writes nothing; paste the JSON line into PERF.md's header via
tools/perf_report.py --write (which imports measure_peaks when present).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS_PER_ITER = 64  # jaxpr ops per element per loop iteration (both kernels)


def _build(kind: str, rows: int, iters: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NACC = 8  # independent accumulators: ILP so the chains are
    #   throughput-bound, not latency-bound (a single serial a=a*b+c
    #   chain would measure FMA latency, the wrong ceiling)
    reps = OPS_PER_ITER // 2 // NACC

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, carry):
            accs, b, c = carry[:NACC], carry[NACC], carry[NACC + 1]
            accs = list(accs)
            for _ in range(reps):
                for k in range(NACC):
                    if kind == "fma":
                        # mul+add adjacent: the fusable mix
                        accs[k] = accs[k] * b + c
                    else:
                        # two adds, no mul partner: the unfused mix
                        accs[k] = (accs[k] + b) + c
            # data-dependent perturbation so no pass folds across
            # iterations; i enters via a cheap int->float convert
            accs[0] = accs[0] + i.astype(jnp.float32) * 1e-9
            return tuple(accs) + (b, c)

        b = x * 0.9999999
        c = x * 1e-7
        init = tuple(x + 1e-6 * k for k in range(NACC)) + (b, c)
        out = jax.lax.fori_loop(0, iters, body, init)
        acc = out[0]
        for k in range(1, NACC):
            acc = acc + out[k]
        o_ref[:] = acc

    x = jnp.full((rows, 128), 1.0000001, jnp.float32)
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    )
    return jax.jit(fn), x


def measure(kind: str, rows: int = 16, iters: int = 2_000_000, repeats: int = 5):
    """Sustained jaxpr-ops/s for one microkernel."""
    import jax

    fn, x = _build(kind, rows, iters)
    y = fn(x)
    jax.block_until_ready(y)  # compile
    # fresh input values each repeat (the axon service memoizes identical
    # executions ACROSS PROCESSES) — perturbations must be large enough
    # to be representable on x (1e-9 vanished below f32 resolution and
    # the service memoized everything: a 2.7e13 "rate", 7x the VPU issue
    # peak); chain 4 calls per timed region (tunnel sync ~1 RTT)
    base = float(int.from_bytes(os.urandom(2), "little")) * 1e-7
    # block_until_ready on a bare jit result RETURNS EARLY under axon
    # (observed: 0-1 ms "waits" right after dispatch; a first cut of this
    # tool measured a 550x-over-peak "rate" that way). Force a SCALAR
    # FETCH inside the timed region and subtract the measured fetch RTT.
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(fn(x + base * 0.5).mean())
        rtts.append(time.time() - t0)
    rtt = min(rtts)  # includes one kernel execution: subtracting it makes
    #   the reported rate conservative (never flattering)
    rates = []
    for i in range(repeats):
        t0 = time.time()
        acc = None
        for p in range(4):
            y = fn(x + (base + (i * 4 + p) * 1e-3))
            acc = y if acc is None else acc + y
        float(acc.mean())  # the real synchronization point
        dt = max(time.time() - t0 - rtt, 1e-6)
        # +3: the per-iteration perturbation (convert + mul + add)
        ops = 4.0 * rows * 128 * (OPS_PER_ITER + 3) * iters
        rates.append(ops / dt)
    rates.sort()
    return rates[len(rates) // 2], max(rates)


def measure_peaks(rows: int = 16, iters: int = 2_000_000) -> dict:
    fma_med, fma_best = measure("fma", rows, iters)
    add_med, add_best = measure("nofma", rows, iters)
    return {
        "rows": rows,
        "iters": iters,
        "fma_ops_per_sec": f"{fma_med:.3e}",
        "nofma_ops_per_sec": f"{add_med:.3e}",
        "fusion_ratio": round(fma_med / add_med, 2),
        "fma_ops_per_sec_best": f"{fma_best:.3e}",
    }


if __name__ == "__main__":
    rows = int(sys.argv[sys.argv.index("--rows") + 1]) if "--rows" in sys.argv else 16
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 2_000_000
    print(json.dumps(measure_peaks(rows, iters)))
