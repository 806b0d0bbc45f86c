"""Isolated in-Mosaic MXU throughput of the dense-grid fetch dot vs N.

The dense-grid fetch issues [128, 512] x [512, N] bf16 dot_generals
(N = lanes per chunk; production: two N=2048 chunks per 32-row block,
ops/volume._density_operand). The 3-point probe measured 55% MXU
utilization DURING the dot inside the production megakernel
(docs/ROUND4_NOTES.md), leaving two rival explanations:

  a. the (128x512)x(512xN) SHAPE is the ceiling (weight-load latency /
     pipeline fill amortized over too-small N)  -> a bigger N (fetching
     k march steps per dot) would raise FLOP/s;
  b. N=2048 already runs near peak in ISOLATION -> the production gap
     is cross-unit scheduling around the dot, and batching march steps
     cannot help;
  c. the dot is VMEM-BANDWIDTH-bound on the [K, N] one-hot stream
     (arithmetic intensity vs the one-hot is only M FLOP per 2 bytes =
     64 FLOP/B at bf16; 55% of the 1.97e14 bf16 peak corresponds to a
     ~1.7 TB/s stream) -> util is FLAT in N and HALVES with an f32
     one-hot at the same N. The --dtype f32 control tests exactly this
     signature; production's measured f32->bf16 +34% end-to-end is
     consistent with it.

This kernel times the dot alone: a fori_loop of iters dot_generals in
DEFAULT precision (bf16 in, f32 accumulation — the production class)
with a data-dependent bf16 perturbation on one operand row per
iteration so no two iterations fold. Honest-timing rules from
tools/vpu_peak.py apply verbatim: fresh operand values per repeat (the
axon service memoizes identical executions across processes), a scalar
fetch inside the timed region as the only trusted sync, fetch RTT
subtracted conservatively.

Run (tunnel up, nothing else on the host):
    python3 tools/mxu_shape_probe.py [--iters 3000] [--ns 1024,2048,4096,8192]
Prints one JSON line; paste into docs/ROUND4_NOTES.md.

MEASURED (v5e, 2026-08-19, --iters 20000): N=1024 96.5% of bf16 peak,
N=2048 103% (the peak constant / rtt subtraction carry a few % of
error), bf16/f32 ratio 1.06. Both rivals (a) and (c) are REFUTED: the
production shape reaches the MXU peak in isolation, and doubling the
one-hot stream bytes (f32) costs only 6%. The production kernel's 55%
during-dot utilization is therefore (b): in-kernel cross-unit overhead
around the dot — the freshly-VPU-built one-hot must stage into the MXU
and the result relayout back every iteration, and adjacent dependent
VPU phases leave the array idle. ops/volume.VOL_FETCH_OVERLAP (defer
the trilinear apply + scatter decision past the independent shade
block) tested the schedulable remedy and measured NEUTRAL (interleaved
on/off: 517.1/516.2 vs 517.5/513.9 Mrays/s) — so the gap is
operand-staging cost intrinsic to a per-iteration vreg-built operand,
and dense_cloud's ~519 Mrays/s is the floor of this formulation.

Timing notes that shaped this tool (kept for the next probe author):
iters must make the timed chain >> the ~30 ms fetch RTT (N<=512 at 2k
iters read 290% of peak — pure RTT-jitter noise); and the per-iteration
perturbation must take a DIFFERENT value every iteration (a 2-valued
i%2 version let the compiler hoist both dots out of the loop and
select — "best" rates hit 3.1e14 > the 1.97e14 hardware peak).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, K = 128, 512  # the brick-table fetch shape (125 -> 128 padded, NB=512)


def _build(n: int, iters: int, dtype_name: str = "bf16"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    def kernel(tab_ref, oh_ref, o_ref):
        tab = tab_ref[:]  # [M, K]
        oh = oh_ref[:]  # [K, n]

        def body(i, acc):
            # perturb the SMALL operand via the loop index so every
            # iteration's dot has fresh inputs without touching the
            # [K, n] stream under test (M*K add = 64K elements,
            # negligible vs M*K*n MACs and vs the K*n one-hot stream).
            # All arithmetic stays f32-VECTOR + one vector cast to dt:
            # Mosaic cannot legalize SCALAR bf16 arith (arith.mulf on
            # bf16 scalars fails), but vector f32->bf16 truncation is fine.
            # The perturbation must take a DIFFERENT value every iteration:
            # a 2-valued (i % 2) version let the compiler hoist both dots
            # out of the loop and select — measured "rates" above the
            # hardware peak (3.1e14 > 1.97e14). i-scaled cannot be LICM'd,
            # and iterations stay independent (i is known ahead), so the
            # MXU can pipeline — this measures throughput, not latency.
            pert = i.astype(jnp.float32) * 1e-6
            tab_i = (tab.astype(jnp.float32) + pert).astype(dt)
            d = jax.lax.dot_general(
                tab_i, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [M, n] f32, DEFAULT precision — the production class
            return acc + d

        acc = jnp.zeros((M, n), jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, acc)

    tab = jnp.full((M, K), 0.5, dt)
    oh = jnp.full((K, n), 0.25, dt)
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32)
    )
    return jax.jit(fn), tab, oh, dt


def measure(n: int, iters: int = 3000, repeats: int = 5, dtype_name: str = "bf16"):
    """Median sustained MXU FLOP/s for the [M,K]x[K,n] dot chain."""
    import jax

    fn, tab, oh, dt = _build(n, iters, dtype_name)
    jax.block_until_ready(fn(tab, oh))  # compile
    base = float(int.from_bytes(os.urandom(2), "little")) * 1e-5
    # fetch RTT includes one kernel execution -> subtracting it is
    # conservative (never flatters the rate)
    rtts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(tab, (oh + dt(base * 0.7)).astype(dt)).mean())
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    rates = []
    for i in range(repeats):
        t0 = time.time()
        acc = None
        for p in range(4):
            pert = dt(base + (i * 4 + p) * 1e-2)
            y = fn(tab, (oh + pert).astype(dt))
            acc = y if acc is None else acc + y
        float(acc.mean())  # the only trusted sync under axon
        dt_s = max(time.time() - t0 - rtt, 1e-6)
        rates.append(4.0 * iters * 2.0 * M * K * n / dt_s)
    return statistics.median(rates), max(rates)


def main():
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 3000
    ns = (
        [int(x) for x in sys.argv[sys.argv.index("--ns") + 1].split(",")]
        if "--ns" in sys.argv
        else [1024, 2048, 4096, 8192]
    )
    PEAK = 1.97e14  # v5e bf16 MXU peak FLOP/s
    out = {"M": M, "K": K, "iters": iters, "peak_flops": f"{PEAK:.2e}"}
    for n in ns:
        try:
            med, best = measure(n, iters)
        except Exception as e:  # e.g. VMEM overflow at large N
            out[f"n{n}_error"] = str(e)[:160]
            print(f"N={n}: FAILED ({str(e)[:120]})", file=sys.stderr)
            continue
        out[f"n{n}_flops"] = f"{med:.3e}"
        out[f"n{n}_util"] = round(med / PEAK, 3)
        print(f"N={n}: {med:.3e} FLOP/s ({med / PEAK:.1%} of bf16 peak, "
              f"best {best:.3e})", file=sys.stderr)
    # f32 control at the production chunk width: under DEFAULT precision
    # f32 inputs truncate to bf16 on the fly, so arithmetic is the SAME —
    # only the stream doubles. ratio bf16/f32 ~2 = bandwidth-bound on the
    # one-hot stream; ~1 = compute/fill-bound.
    med32, _ = measure(2048, iters, dtype_name="f32")
    out["f32_n2048_flops"] = f"{med32:.3e}"
    if "n2048_flops" in out:
        out["bf16_f32_ratio_n2048"] = round(float(out["n2048_flops"]) / med32, 2)
        print(f"f32 N=2048: {med32:.3e} FLOP/s (bf16/f32 ratio "
              f"{out['bf16_f32_ratio_n2048']})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
