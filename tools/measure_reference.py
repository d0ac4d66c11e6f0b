"""Measure the REFERENCE implementation's throughput on this machine.

BASELINE.md's first benchmarking task: the reference repo publishes no
numbers, so we run its OWN code (imported from /root/reference — not
copied) and time the per-frame inference compute path:

    conv_in (5->4 1x1) -> Encoder -> quant_conv -> nearest-codeword
    quantize -> post_quant_conv -> Decoder

which is VQModel.encode/decode (reference model.py:106-139) minus the
Lightning wrapper (pytorch_lightning is not installed here, and the wrapper
adds no compute). Flagship CLEVR conditional-generation architecture
(configs/conditional_generation/clevr-infinite.yaml): ch=128,
ch_mult=[1,1,2,2,4], attn@16, z=256, n_embed=16384. Random weights — weight
values do not change the compute graph or its speed.

Hardware context: this container has no CUDA device, so the measurement is
torch CPU (the reference targets cuda:0). It anchors a like-for-like
comparison only when our bench is also run on CPU; against the TPU bench it
documents the gap a user migrating from the reference's CPU fallback sees.

    python tools/measure_reference.py [--frames 5] [--image-size 256]

Prints one JSON line; paste the result into BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--threads", type=int, default=0, help="0 = torch default")
    args = p.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    from sgam.generative_sensing_module.modules.diffusionmodules.model import (
        Decoder,
        Encoder,
    )
    from sgam.generative_sensing_module.modules.vqvae.quantize import (
        VectorQuantizer2,
    )

    # resolution=64 verbatim from the reference configs (configs/
    # conditional_generation/clevr-infinite.yaml:22) — taming tracks
    # attention against THIS value, not the input size: attn_resolutions
    # [16] fires after 2 downsamples, i.e. at ACTUAL 64x64 (4096 tokens)
    # for 256^2 inputs. Building with resolution=image_size would place
    # the attention at 16x16 and benchmark a much cheaper architecture.
    dd = dict(
        double_z=False, z_channels=256, resolution=64,
        in_channels=4, out_ch=4, ch=128, ch_mult=[1, 1, 2, 2, 4],
        num_res_blocks=2, attn_resolutions=[16], dropout=0.0,
    )
    torch.manual_seed(0)
    encoder = Encoder(**dd).eval()
    decoder = Decoder(**dd).eval()
    quantize = VectorQuantizer2(16384, 256, beta=0.25).eval()
    conv_in = torch.nn.Conv2d(5, 4, 1).eval()  # extrapolation-mask fold (model.py:53-54)
    quant_conv = torch.nn.Conv2d(256, 256, 1).eval()
    post_quant_conv = torch.nn.Conv2d(256, 256, 1).eval()

    s = args.image_size
    x = torch.rand(1, 4, s, s) * 2 - 1
    mask = torch.zeros(1, 1, s, s)

    def step():
        h = conv_in(torch.cat([x, mask], 1))
        h = encoder(h)
        h = quant_conv(h)
        quant, _, _ = quantize(h)
        return decoder(post_quant_conv(quant))

    with torch.no_grad():
        step()  # warm-up (allocator, thread pool)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = step()
            float(out.abs().sum())
            times.append(time.perf_counter() - t0)

    dt = min(times)
    print(
        json.dumps(
            {
                "metric": "reference VQModel forward frames/sec (torch, CPU)",
                "value": round(1.0 / dt, 4),
                "unit": "frames/sec",
                "per_frame_ms": round(dt * 1e3, 1),
                "threads": torch.get_num_threads(),
                "method": "reference Encoder/Decoder/VectorQuantizer2 imported "
                          "from /root/reference, random weights, batch 1, "
                          "min over runs",
            }
        )
    )


if __name__ == "__main__":
    main()
