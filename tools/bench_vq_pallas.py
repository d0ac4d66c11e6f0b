"""Measure the fused Pallas nearest-codeword kernel vs the XLA path.

The decision record behind quantize._use_vq_pallas's default (VERDICT r3
#4: a kernel that exists only in tests is inventory, not capability).
Shapes: the flagship inference step (P=256 latents = one 16x16 frame,
n_embed=16384 CLEVR conditional / 4096 GE) and the batched-scene /
training shapes (P up to 16*256).

Usage: python tools/bench_vq_pallas.py  (real TPU; prints one line/shape)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sgam_neurips22_tpu.models.vqgan.quantize import codeword_distances
from sgam_neurips22_tpu.ops.vq_pallas import nearest_codeword


def timed(fn, *args, n=50):
    fn(*args)[0].block_until_ready()
    # checksum readback per NOTES.md (block_until_ready under-reported
    # through the tunnel once)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out[0]).sum())
    return (time.perf_counter() - t0) / n


def main() -> None:
    xla = jax.jit(
        lambda z, e: (jnp.argmin(codeword_distances(z, e), axis=1).astype(jnp.int32),)
    )
    pallas = jax.jit(lambda z, e: (nearest_codeword(z, e)[0],))
    rng = np.random.default_rng(0)
    for p in (256, 2048, 4096):
        for k in (4096, 16384):
            d = 256
            z = jnp.asarray(rng.normal(size=(p, d)).astype(np.float32))
            e = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
            t_x = timed(xla, z, e)
            t_p = timed(pallas, z, e)
            ix = np.asarray(xla(z, e)[0])
            ip = np.asarray(pallas(z, e)[0])
            match = (ix == ip).mean()
            print(
                f"P={p:5d} K={k:5d} D={d}: xla {t_x * 1e6:8.1f} us  "
                f"pallas {t_p * 1e6:8.1f} us  speedup {t_x / t_p:5.2f}x  "
                f"indices match {match:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
