"""Measure the binned Pallas z-buffer merge vs the XLA scatter-min.

The decision record behind splat._use_splat_pallas's default and the test
of VERDICT r4 weak #5: the ARCHITECTURE roofline prices the flagship splat
scatter at XLA's ~8.5 ns/elem serial-issue rate (2.77 ms for 327k points)
and calls it "the floor the hardware sets" — this benchmark measures
whether a coherence-exploiting Pallas merge (ops/splat_pallas.py) beats
that floor at the production shape, under three depth regimes:

- coherent: world-consistent smooth depth (the trained-weight realistic
  case) — narrow target-row spans, the kernel's best case;
- noisy: random depth in the codec range (the random-weight bench
  worst case) — spans widen to the epipolar bound;
- adversarial: rows deliberately shuffled so chunk spans cover the whole
  image — the kernel's pathological bound (XLA scatter should win here).

Usage: python tools/bench_splat_pallas.py  (real TPU; one line per case)

DECISION RECORD (v5e, 2026-08-20, round 5): this microbench's XLA column
is NOT representative — the isolated scatter-min with make_case's ~130k
invalid points sanitized to pixel 0 hits XLA:TPU's catastrophic
duplicate-combining path (~38 SECONDS per call at B=1, vs 2.77 ms for the
same-shape scatter inside the fused production unroll, where the compiler
chooses the serial-issue lowering). The kernel itself ran 5.68 ms at B=1
on the synthetic 'coherent' (+-5-row sinusoid) case — slower than the
production scatter, as its cost model predicts (~w*(1+2*span) VPU ops per
point). The decision therefore came from the PRODUCTION benchmark, where
real unroll geometry has much narrower spans: `SGAM_TPU_SPLAT_PALLAS=1
python bench.py --config flythrough` measured 103.7 -> 118.1 fps (+14%),
so the kernel is default-ON for the TPU backend (geometry/splat.py).
Keep using the production bench for this decision; the synthetic regimes
below only bound the kernel's degradation, not XLA's true cost.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sgam_neurips22_tpu.ops.splat_pallas import zbuffer_min

IMAX = np.iinfo(np.int32).max


def timed(fn, *args, n=10):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # checksum readback per NOTES.md (block_until_ready under-reported
    # through the tunnel once)
    int(np.asarray(out).sum())
    return (time.perf_counter() - t0) / n


@jax.jit
def xla_scatter(pix, key, *, h=256, w=256):
    b = pix.shape[0]

    def one(p, k):
        return jnp.full((h * w,), IMAX, jnp.int32).at[p].min(k, mode="drop")

    # the production path folds the batch into ONE scatter (splat.py);
    # replicate that here
    n_pix = h * w
    off = (jnp.arange(b, dtype=jnp.int32) * n_pix)[:, None]
    flat = (
        jnp.full((b * n_pix,), IMAX, jnp.int32)
        .at[(pix + off).reshape(-1)]
        .min(key.reshape(-1), mode="drop")
    )
    return flat.reshape(b, n_pix)


def make_case(kind: str, b: int, n_src: int = 5, h: int = 256, w: int = 256):
    """Synthesize (pix, key) with the production flattening (source-major,
    scanline order) and the given coherence regime."""
    rng = np.random.default_rng(7)
    p = n_src * h * w
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    pixs, keys = [], []
    for _ in range(b):
        pk, kk = [], []
        for s in range(n_src):
            if kind == "coherent":
                # smooth warp: a few-pixel sinusoidal drift (trained-depth)
                dv = (3 * np.sin(u / 37.0 + s) + 2 * np.cos(v / 53.0)).astype(int)
                du = (4 * np.cos(u / 41.0 - s)).astype(int)
            elif kind == "noisy":
                # epipolar-bounded jitter (random-weight depth in codec
                # range: ~16 px of vertical displacement, NOTES round 4)
                dv = rng.integers(-16, 17, (h, w))
                du = rng.integers(-16, 17, (h, w))
            elif kind == "adversarial":
                dv = rng.integers(-h, h, (h, w))
                du = rng.integers(-w, w, (h, w))
            else:
                raise ValueError(kind)
            vi = np.clip(v + dv, 0, h - 1)
            ui = np.clip(u + du, 0, w - 1)
            pk.append((vi * w + ui).reshape(-1))
            zq = rng.integers(0, 4096, h * w)
            idx = np.arange(s * h * w, (s + 1) * h * w)
            kk.append(((zq << 19) | (idx & ((1 << 19) - 1))).astype(np.int64))
        pixs.append(np.concatenate(pk))
        keys.append(np.concatenate(kk))
    pix = np.stack(pixs).astype(np.int32)
    key = np.stack(keys).astype(np.int32)
    # ~10% invalid, sanitized like splat.py does
    invalid = rng.random((b, p)) < 0.1
    pix = np.where(invalid, 0, pix)
    key = np.where(invalid, IMAX, key)
    return jnp.asarray(pix), jnp.asarray(key)


def main() -> None:
    pallas = jax.jit(lambda p, k: zbuffer_min(p, k, 256, 256))
    for b in (1, 8):
        for kind in ("coherent", "noisy", "adversarial"):
            pix, key = make_case(kind, b)
            # n=1: the isolated XLA scatter hits the ~38 s/call duplicate-
            # combining path here (see DECISION RECORD) — not worth averaging
            t_x = timed(xla_scatter, pix, key, n=1)
            t_p = timed(pallas, pix, key)
            same = bool(
                np.array_equal(
                    np.asarray(xla_scatter(pix, key)),
                    np.asarray(pallas(pix, key)),
                )
            )
            print(
                f"B={b} {kind:12s}: xla {t_x * 1e3:7.3f} ms  "
                f"pallas {t_p * 1e3:7.3f} ms  speedup {t_x / t_p:5.2f}x  "
                f"bit-identical {same}",
                flush=True,
            )


if __name__ == "__main__":
    main()
