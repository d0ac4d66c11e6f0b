"""Benchmark: generated 256^2 RGB-D frames/sec on one chip.

Runs the flagship CLEVR-Infinite conditional-generation unroll (splat
conditioning, topk=1, num_src=5 — BASELINE.json config #2/#4) as the fused
whole-scene XLA program and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}
vs_baseline is measured against the driver's north-star target of 20
frames/sec/chip (BASELINE.md; the reference repo publishes no throughput
numbers of its own).

Random weights are used when no converted checkpoint is present — weight
values do not change the compute graph or its speed.

Flags: --frames N (default 64), --rgbd_integration, --per_step (unfused
host-driven loop), --profile <dir> (XProf trace).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

NORTH_STAR_FPS = 20.0
# v5e peak: 197 TFLOP/s bf16 (f32 conv/matmul decomposes into bf16 MXU
# passes, so bf16 peak is the honest MFU denominator)
V5E_PEAK_FLOPS = 197e12


def _cost_flops(compiled) -> float:
    """Total FLOPs from XLA's compiled cost analysis (0.0 if unavailable)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0

def _enable_compilation_cache():
    """Persistent XLA compilation cache (first compile of the flagship
    unroll is minutes; repeats become seconds)."""
    try:
        from sgam_neurips22_tpu.core.platform import apply_platform_env

        apply_platform_env()
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass



def bench_vqgan_roundtrip() -> dict:
    """BASELINE.json config #1: encode/quantize/decode one 256^2 RGB-D frame."""
    import time

    import jax.numpy as jnp

    from sgam_neurips22_tpu.models import init_vqmodel
    from sgam_neurips22_tpu.models.vqgan.model import forward
    from __graft_entry__ import _flagship_configs

    cfg = _flagship_configs()
    params = init_vqmodel(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 4), minval=-1, maxval=1)
    fn = jax.jit(lambda p, x: forward(p, cfg, x).xrec)
    float(abs(fn(params, x)).sum())
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(params, x)
    float(abs(out).sum())
    dt = (time.perf_counter() - t0) / n
    return {
        "metric": "VQGAN encode/quantize/decode 256^2 RGB-D frames/sec",
        "value": round(1.0 / dt, 3),
        "unit": "frames/sec",
        "vs_baseline": round(1.0 / dt / NORTH_STAR_FPS, 3),
    }


def bench_train(phase: str, bs_override: int = 0, dtype: str = "float32",
                profile: str | None = None) -> dict:
    """Training throughput: the full two-optimizer GAN step (L1 + LPIPS +
    adaptive-weight GAN + codebook loss) on the flagship model with
    level-remat, reference batch sizes (codebook bs 8; conditional bs 16
    with n_src=2 splat conditioning, configs/conditional_generation)."""
    from dataclasses import replace

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from sgam_neurips22_tpu.training.lpips import init_lpips
    from sgam_neurips22_tpu.training.losses import LossConfig
    from sgam_neurips22_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )

    model = _flagship_configs()
    model = replace(
        model,
        phase=phase,
        n_embed=2048 if phase == "codebook" else 16384,
        # flash_attention=True is the shipped production training recipe
        # (configs/*/*.yaml): measured 36.2 vs 31.6 img/s bf16 / 30.7 vs
        # 28.2 f32 on the conditional step (the naive [B, 4096, 4096]
        # attention einsums + their backward dominate at bs 16)
        ddconfig=replace(
            model.ddconfig, remat=True, compute_dtype=dtype,
            flash_attention=True,
        ),
    )
    cfg = TrainConfig(model=model, loss=LossConfig(disc_start=0), learning_rate=1e-4)
    lp = init_lpips(jax.random.PRNGKey(1))
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    bs = bs_override or (8 if phase == "codebook" else 16)
    if phase == "codebook":
        batch = {
            "image": jax.random.uniform(
                jax.random.PRNGKey(2), (bs, 256, 256, 4), minval=-1, maxval=1
            )
        }
    else:
        rng = np.random.default_rng(2)
        n, h, w = 2, 256, 256
        k = np.array([[355.5555, 0, 128.0], [0, 355.5555, 128.0], [0, 0, 1.0]], np.float32)
        batch = {
            "dst_img": jnp.asarray(rng.uniform(-1, 1, (bs, h, w, 3)).astype(np.float32)),
            "dst_depth": jnp.asarray(rng.uniform(8, 14, (bs, h, w)).astype(np.float32)),
            "src_imgs": jnp.asarray(rng.uniform(-1, 1, (bs, n, h, w, 3)).astype(np.float32)),
            "src_depths": jnp.asarray(rng.uniform(8, 14, (bs, n, h, w)).astype(np.float32)),
            "Ks": jnp.broadcast_to(jnp.asarray(k), (bs, n, 3, 3)),
            "R_rels": jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (bs, n, 3, 3)),
            "t_rels": jnp.zeros((bs, n, 3), jnp.float32),
            "src_masks": jnp.ones((bs, n), jnp.float32),
        }
    flops = 0.0
    try:  # train_step is already jitted (donating state) — lower directly
        flops = _cost_flops(train_step.lower(state, batch, lp, cfg).compile())
    except Exception as e:
        print(f"# cost analysis unavailable: {e}", flush=True)
    state, logs = train_step(state, batch, lp, cfg)
    float(logs["aeloss"])  # compile + settle
    from contextlib import nullcontext

    if profile:
        from sgam_neurips22_tpu.utils.profiling import trace as xprof
    times = []
    with xprof(profile) if profile else nullcontext():
        for _ in range(4):
            t0 = time.perf_counter()
            state, logs = train_step(state, batch, lp, cfg)
            float(logs["aeloss"])
            times.append(time.perf_counter() - t0)
    dt = min(times)
    tag = "" if dtype == "float32" else f", {dtype}"
    if profile:
        # trace-inflated timings must not masquerade as clean records
        tag += ", profiled"
    record = {
        "metric": f"train images/sec/chip ({phase} phase, GAN+LPIPS step, bs {bs}, remat{tag})",
        "value": round(bs / dt, 3),
        "unit": "images/sec",
        "vs_baseline": round(bs / dt / NORTH_STAR_FPS, 3),
    }
    if flops > 0:
        record["mfu"] = round(flops / dt / V5E_PEAK_FLOPS, 4)
        record["flops_per_image"] = round(flops / bs / 1e9, 2)  # GFLOP
    return record


def bench_data_loader(n_images: int = 512, bs: int = 16) -> dict:
    """Host data-path throughput: packed SGPK shard + native C++ batch
    assembly vs the per-PNG decode pipeline (the reference's torch
    DataLoader equivalent). Runs on a synthetic 256^2 RGB-D dataset;
    vs_baseline = speedup over the PNG path on the same host."""
    import shutil
    import tempfile

    from PIL import Image

    from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
    from sgam_neurips22_tpu.training.data.datamodule import Loader
    from sgam_neurips22_tpu.training.data.packed import (
        PackedCodebookDataset,
        shard_path,
    )

    tmp = tempfile.mkdtemp(prefix="sgam_loader_bench_")
    try:
        rng = np.random.default_rng(0)
        scene = os.path.join(tmp, "train", "scene")
        os.makedirs(scene)
        np.save(
            os.path.join(tmp, "K.npy"),
            np.array([[355.5, 0, 128.0], [0, 355.5, 128.0], [0, 0, 1.0]]),
        )
        paths = []
        base = rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8)
        dm = rng.uniform(8, 14, (256, 256)).astype(np.float32)
        for i in range(n_images):
            img = np.roll(base, i, axis=1)  # distinct but cheap to synthesize
            Image.fromarray(img).save(os.path.join(scene, f"im_{i:05d}.png"))
            np.save(os.path.join(scene, f"dm_{i:05d}.npy"), dm)
            paths.append(os.path.join(scene, f"im_{i:05d}.png"))
        with open(os.path.join(tmp, "train.txt"), "w") as f:
            f.write("\n".join(paths))

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from pack_dataset import pack_split

        png_ds = CodebookDataset("train", tmp, "clevr-infinite", (256, 256))
        pack_split(png_ds, shard_path(tmp, "train", (256, 256)), use_depth=True)
        packed_ds = PackedCodebookDataset(shard_path(tmp, "train", (256, 256)))

        def epoch_rate(ds) -> float:
            n = 0
            t0 = time.perf_counter()
            for batch in Loader(ds, batch_size=bs, shuffle=True, seed=1):
                n += len(batch["image"])
            return n / (time.perf_counter() - t0)

        # best-of-2: a transient stall (cold page cache, CPU contention) in
        # either pipeline must not bias the ratio
        png_rate = max(epoch_rate(png_ds), epoch_rate(png_ds))
        packed_rate = max(epoch_rate(packed_ds), epoch_rate(packed_ds))
        packed_ds.close()
        return {
            "metric": "packed-shard loader images/sec (native C++ assembly, "
                      "256^2 RGB-D, host CPU)",
            "value": round(packed_rate, 1),
            "unit": "images/sec",
            "vs_baseline": round(packed_rate / png_rate, 2),
            "png_pipeline_images_per_sec": round(png_rate, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# the full measurement matrix behind `bench.py --all`: every secondary
# config the round-to-round regression story depends on (the round-3 bbox
# scatter episode regressed map-requery for several commits because only
# the headline number was recorded — see VERDICT r3 weak #6). One JSONL row
# per config lands in bench_matrix.jsonl + a BENCH_MATRIX.md table.
MATRIX = [
    ("flythrough", []),
    ("flythrough_splat_stride2", ["--splat_stride", "2"]),
    ("google_earth", ["--config", "google_earth"]),
    ("integration_clevr", ["--config", "integration"]),
    ("integration_clevr_stride2", ["--config", "integration", "--tsdf_stride", "2"]),
    ("integration_google_earth",
     ["--config", "google_earth", "--rgbd_integration", "--frames", "100"]),
    ("integration_google_earth_stride2",
     ["--config", "google_earth", "--rgbd_integration", "--frames", "100",
      "--tsdf_stride", "2"]),
    # coherent-depth companions: generated depth is world-consistent (the
    # trained-weight realistic case) so pool growth must converge — the
    # random-weight rows above are the worst-case bound (VERDICT r3 #6)
    ("integration_clevr_coherent",
     ["--rgbd_integration", "--coherent", "--frames", "63"]),
    ("integration_google_earth_coherent",
     ["--config", "google_earth", "--rgbd_integration", "--frames", "100",
      "--coherent"]),
    ("batched_8_scenes", ["--batch_scenes", "8", "--frames", "48"]),
    # batched map-requery: 8 per-scene TSDF volumes in ONE batched state
    # (VERDICT r4 #3 — the serving mode the mapping subsystem exists for)
    ("batched_8_scenes_tsdf",
     ["--batch_scenes", "8", "--frames", "48", "--rgbd_integration"]),
    ("vqgan_roundtrip", ["--config", "vqgan"]),
    ("train_codebook", ["--config", "train_codebook"]),
    ("train_conditional", ["--config", "train_conditional"]),
    # bf16 compute on the same step: the measured-best training recipe
    # (configs ship flash+f32 for reference-parity numerics; bf16 is the
    # documented opt-in, NOTES round-4 flash-training table)
    ("train_conditional_bf16",
     ["--config", "train_conditional", "--train_dtype", "bfloat16"]),
    ("data_loader", ["--config", "data_loader"]),
]


def run_matrix(out_md: str = "BENCH_MATRIX.md",
               out_jsonl: str = "bench_matrix.jsonl") -> int:
    """Run every MATRIX config in a fresh subprocess (isolated backend +
    memory; the persistent compilation cache keeps repeats fast) and commit
    the results as one table. Returns the number of failed configs."""
    import subprocess

    rows, failures = [], 0
    for name, extra in MATRIX:
        cmd = [sys.executable, os.path.abspath(__file__)] + extra
        print(f"# bench --all: {name}: {' '.join(cmd[1:])}", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = next(
                (ln for ln in reversed(proc.stdout.strip().splitlines())
                 if ln.startswith("{")), None,
            )
            if proc.returncode != 0 or line is None:
                failures += 1
                rows.append({"config": name, "error":
                             (proc.stderr or proc.stdout).strip()[-400:]})
                print(f"# bench --all: {name} FAILED (rc={proc.returncode})",
                      flush=True)
                continue
            rec = json.loads(line)
        except subprocess.TimeoutExpired:
            failures += 1
            rows.append({"config": name, "error": "timeout (3600s)"})
            print(f"# bench --all: {name} TIMED OUT", flush=True)
            continue
        rec = {"config": name, **rec,
               "wall_s": round(time.perf_counter() - t0, 1)}
        rows.append(rec)
        print(f"# bench --all: {name}: {rec['value']} {rec['unit']}", flush=True)

    with open(out_jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    lines = [
        "# Bench matrix",
        "",
        "Regenerate with `python bench.py --all` (one subprocess per config; "
        "~30-60 min cold, minutes with a warm XLA compilation cache). "
        "Raw rows: `bench_matrix.jsonl`.",
        "",
        f"Recorded: {time.strftime('%Y-%m-%d %H:%M')} on "
        f"{jax.devices()[0].device_kind} x{jax.device_count()}",
        "",
        "| config | value | unit | vs_baseline | mfu | notes |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(
                f"| {r['config']} | ERROR | | | | {r['error'][:120]} |")
        else:
            lines.append(
                f"| {r['config']} | {r['value']} | {r['unit']} | "
                f"{r.get('vs_baseline', '')} | {r.get('mfu', '')} | "
                f"{r['metric']} |"
            )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"# bench --all: wrote {out_md} + {out_jsonl} "
          f"({failures} failures)", flush=True)
    return failures


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true",
                   help="run the full measurement matrix (one subprocess per "
                        "config) and write BENCH_MATRIX.md + bench_matrix.jsonl")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--rgbd_integration", action="store_true")
    p.add_argument("--per_step", action="store_true")
    p.add_argument("--batch_scenes", type=int, default=0,
                   help="throughput mode: unroll N scenes concurrently")
    p.add_argument("--train_bs", type=int, default=0,
                   help="train_* configs: batch-size override (0 = default)")
    p.add_argument("--train_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="train_* configs: activation compute dtype")
    p.add_argument("--model_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="unroll configs: model activation compute dtype. "
                        "bfloat16 (default, the production serving mode) "
                        "keeps group-norm stats and the VQ codeword path "
                        "f32; measured vs the f32 unroll on the reference "
                        "template: PSNR 43.5 dB / SSIM 0.995 over 20 "
                        "autoregressive frames (no compounding divergence). "
                        "float32 = checkpoint-parity mode.")
    p.add_argument("--tsdf_stride", type=int, default=1,
                   help="map-requery: fuse every s-th ray (1 = exact/reference)")
    p.add_argument("--splat_stride", type=int, default=1,
                   help="splat conditioning: splat every s-th source pixel "
                        "with per-source phase offsets (1 = reference)")
    p.add_argument("--tsdf_chunk", type=int, default=0,
                   help="map-requery: pool-splat render-chunk granularity "
                        "(0 = library default; finer sharpens pool-count/frustum "
                        "culls at a per-chunk fixed cost — do not set below "
                        "the per-frame integrate ray count)")
    p.add_argument("--tsdf_pool", type=int, default=0,
                   help="map-requery: surface-pool capacity override "
                        "(0 = auto); with recycling the pool is a cache of "
                        "the newest surface and the splat cost is linear in "
                        "this")
    p.add_argument("--tsdf_cells", type=int, default=0,
                   help="map-requery: spatial pool cells (0 = auto)")
    p.add_argument("--coherent", action="store_true",
                   help="map-requery with WORLD-CONSISTENT generated depth "
                        "(analytic plane; the model still runs every step): "
                        "frames agree, TSDF dedup converges the surface pool "
                        "the way trained weights do — the realistic-case "
                        "companion to the random-weight worst case")
    p.add_argument("--tsdf_band", type=int, default=0,
                   help="map-requery: fused band half-width in voxels "
                        "(0 = auto from sdf_trunc; the band scatter is the "
                        "dominant integrate cost and scales linearly)")
    p.add_argument("--profile", default=None)
    p.add_argument("--matmul_precision", default=None,
                   choices=["bfloat16", "default", "float32", "highest"],
                   help="jax default_matmul_precision for the whole run")
    p.add_argument("--config", default="flythrough",
                   choices=["flythrough", "vqgan", "step", "integration",
                            "google_earth", "train_codebook",
                            "train_conditional", "data_loader"],
                   help="BASELINE.json benchmark config: vqgan=#1 roundtrip, "
                        "step=#2 single conditional step (frames=2), "
                        "integration=#3 8-pose RGB-D integration, "
                        "flythrough=#4 CLEVR unroll, google_earth=#5; "
                        "train_* = GAN training step throughput")
    args = p.parse_args()

    if getattr(args, "all"):
        sys.exit(1 if run_matrix() else 0)

    _enable_compilation_cache()

    # fail FAST and loudly if the (remote) backend is unreachable — a hung
    # device init otherwise stalls the caller with no artifact at all
    # (observed: the axon tunnel wedged server-side; jax.devices() blocked
    # indefinitely). Tunable via SGAM_BENCH_INIT_TIMEOUT seconds.
    import threading

    _init_done = threading.Event()
    _budget = int(os.environ.get("SGAM_BENCH_INIT_TIMEOUT", "900"))

    def _bail():
        if not _init_done.is_set():
            print(
                f"bench: backend unreachable after {_budget}s "
                "(jax.devices() never returned)", file=sys.stderr, flush=True,
            )
            os._exit(17)

    _t = threading.Timer(_budget, _bail)
    _t.daemon = True
    _t.start()
    jax.devices()
    _init_done.set()

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    if args.config == "vqgan":
        print(json.dumps(bench_vqgan_roundtrip()))
        return
    if args.config == "data_loader":
        print(json.dumps(bench_data_loader()))
        return
    if args.config.startswith("train_"):
        phase = {"codebook": "codebook", "conditional": "conditional_generation"}[
            args.config[len("train_"):]
        ]
        print(json.dumps(
            bench_train(phase, args.train_bs, args.train_dtype, args.profile)
        ))
        return
    if args.config == "step":
        args.frames, args.per_step = 8, True
    elif args.config == "integration":
        args.frames, args.rgbd_integration = 8, True

    from sgam_neurips22_tpu.models import init_vqmodel
    from sgam_neurips22_tpu.pipeline.scene_generation import (
        InfiniteSceneGeneration,
        SceneGenConfig,
    )
    from __graft_entry__ import _flagship_configs

    model_cfg = _flagship_configs()
    if args.model_dtype != "float32":
        from dataclasses import replace as _replace

        model_cfg = _replace(
            model_cfg,
            ddconfig=_replace(model_cfg.ddconfig, compute_dtype=args.model_dtype),
        )
    dataset = "clevr-infinite"
    depth_lo, depth_hi = 8.0, 14.0
    if args.config == "google_earth":
        from dataclasses import replace

        dataset = "google_earth"
        model_cfg = replace(
            model_cfg, n_embed=4096, dataset=dataset,
            depth_range=(0.099975586, 4.765625),
        )
        depth_lo, depth_hi = 0.5, 4.0
    params = init_vqmodel(jax.random.PRNGKey(0), model_cfg)
    # reference-layout trained checkpoint, when present (weight values do
    # not change the compute graph or its speed; this makes the bench's
    # output frames meaningful when the published ckpts are available)
    ckpt_path = f"trained_models/{dataset}/last.ckpt"
    if os.path.exists(ckpt_path):
        from sgam_neurips22_tpu.core.torch_convert import (
            convert_checkpoint,
            init_from_ckpt,
        )

        model_np, _, _ = convert_checkpoint(ckpt_path)
        params = init_from_ckpt(params, model_np)
        print(f"# loaded weights from {ckpt_path}", flush=True)

    if args.config == "google_earth":
        rows, cols = args.frames + 1, 1  # long aerial trajectory (ref 100x1)
    elif args.config == "flythrough" and not args.rgbd_integration:
        # BASELINE config #4 verbatim: a 100-frame CLEVR fly-through —
        # a straight camera line, sources = the previous num_src frames
        rows, cols = args.frames + 1, 1
    else:
        rows = int(np.ceil((args.frames + 1) ** 0.5))
        cols = rows
    cfg = SceneGenConfig(
        dataset=dataset,
        output_dim=(rows, cols),
        topk=1,
        use_rgbd_integration=args.rgbd_integration,
        tsdf_integrate_stride=args.tsdf_stride,
        tsdf_band_voxels=args.tsdf_band or None,
        tsdf_render_chunk=args.tsdf_chunk or None,
        tsdf_pool_capacity=args.tsdf_pool or None,
        tsdf_pool_cells=args.tsdf_cells or None,
        splat_stride=args.splat_stride,
        coherent_plane_depth=args.coherent,
    )
    if args.coherent and not args.rgbd_integration:
        print("# --coherent only affects map-requery; pass --rgbd_integration",
              file=sys.stderr)
    # use the reference's real seed template when its checkout is present
    # (realistic depth statistics for the map/pool); random fallback
    template_dir = f"/root/reference/templates/{dataset}"
    seeds = None
    if os.path.isdir(template_dir):
        try:
            from generate import load_seed_frames

            seeds = load_seed_frames(template_dir, dataset, 0, (256, 256))
            seeds = [seeds[0]] if dataset == "clevr-infinite" else seeds
            seeds = [((0, 0), seeds[0][1], seeds[0][2])]
            print(f"# seeding from {template_dir}", flush=True)
        except Exception as e:
            print(f"# template load failed ({e}); using a random seed", flush=True)
    rng = np.random.default_rng(0)
    if seeds is None:
        seed_rgb = rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32)
        seed_depth = rng.uniform(depth_lo, depth_hi, (256, 256)).astype(np.float32)
        seeds = [((0, 0), seed_rgb, seed_depth)]
    gen = InfiniteSceneGeneration(params, model_cfg, cfg, seeds=seeds)
    if args.coherent:
        # the seed frame must lie on the same world plane the generated
        # depth will (plane_depth_at needs the built grid, hence the reset)
        seeds = [
            (coord, rgb, gen.plane_depth_at(gen.grid.index(*coord)))
            for coord, rgb, _ in seeds
        ]
        gen.reset(seeds)
    n_frames = gen.grid.size - 1
    fused = not args.per_step

    if args.batch_scenes:
        s = args.batch_scenes
        seeds_batch = [
            [((0, 0),
              rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32),
              rng.uniform(8, 14, (256, 256)).astype(np.float32))]
            for _ in range(s)
        ]
        out = gen.scene_expansion_batched(seeds_batch, jax.random.PRNGKey(3))
        float(abs(out[0]).sum())

        def timed_run():
            t0 = time.perf_counter()
            out = gen.scene_expansion_batched(seeds_batch, jax.random.PRNGKey(3))
            float(abs(out[0]).sum())
            return (time.perf_counter() - t0) / s

    else:
        # XLA-counted FLOPs per generation step, for the MFU line. The
        # fused unroll is a fori_loop whose body XLA's cost analysis counts
        # ONCE (not x trip count), so lower the equivalent SINGLE-step
        # program and multiply by the frame count instead.
        total_flops = 0.0
        if fused:
            try:
                plan = gen.build_plan()
                ks = jax.numpy.asarray(
                    np.tile(gen.grid.K.astype(np.float32), (cfg.effective_num_src, 1, 1))
                )
                rng0 = jax.random.PRNGKey(3)
                # .lower() on the jit-wrapped method does not apply the
                # instance binding — pass the (static) self explicitly
                if args.rgbd_integration:
                    step_lowered = type(gen)._map_requery_step.lower(
                        gen, gen.params, gen.rgb_buf, gen.depth_buf, gen.volume,
                        plan["src_idx"][0], plan["src_mask"][0],
                        plan["tgt_w2c"][0], plan["t_tgt2srcs"][0], ks, rng0,
                    )
                    fuse_lowered = type(gen)._integrate_jit.lower(
                        gen, gen.volume, gen.depth_buf[0], gen.rgb_buf[0],
                        ks[0], plan["tgt_w2c"][0],
                    )
                    step_flops = _cost_flops(step_lowered.compile()) + _cost_flops(
                        fuse_lowered.compile()
                    )
                else:
                    step_lowered = type(gen)._splat_step.lower(
                        gen, gen.params, gen.rgb_buf, gen.depth_buf,
                        plan["src_idx"][0], plan["src_mask"][0],
                        plan["r_rels"][0], plan["t_rels"][0], ks, rng0,
                    )
                    step_flops = _cost_flops(step_lowered.compile())
                total_flops = step_flops * n_frames
            except Exception as e:
                print(f"# cost analysis unavailable: {e}", flush=True)

        # warm-up/compile
        gen.scene_expansion(jax.random.PRNGKey(3), fused=fused)
        jax.block_until_ready(gen.rgb_buf)

        def timed_run():
            gen.reset()
            t0 = time.perf_counter()
            gen.scene_expansion(jax.random.PRNGKey(3), fused=fused)
            # checksum forces a device->host readback: block_until_ready
            # alone proved unreliable through the remote-TPU tunnel
            float(abs(gen.rgb_buf).sum())
            return time.perf_counter() - t0

    if args.profile:
        from sgam_neurips22_tpu.utils.profiling import trace

        with trace(args.profile):
            dt = timed_run()
    else:
        dt = min(timed_run() for _ in range(3))

    fps = n_frames / dt
    mode = "map-requery" if args.rgbd_integration else "splat"
    if not args.rgbd_integration and args.splat_stride != 1:
        mode += f" stride {args.splat_stride}"
    if args.rgbd_integration and args.tsdf_stride != 1:
        mode += f", stride {args.tsdf_stride}"
    if args.coherent:
        mode += ", coherent depth"
    if args.model_dtype != "float32":
        mode += f", {args.model_dtype} model"
    if args.batch_scenes:
        mode += f", {args.batch_scenes} scenes batched"
    record = {
        "metric": f"generated 256^2 RGB-D frames/sec/chip ({dataset} conditional unroll, {mode}, topk=1, {cfg.effective_num_src} srcs)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
    }
    if not args.batch_scenes and fused and total_flops > 0:
        record["mfu"] = round(total_flops / dt / V5E_PEAK_FLOPS, 4)
        record["flops_per_frame"] = round(total_flops / n_frames / 1e9, 2)  # GFLOP
    if args.rgbd_integration and gen.volume is not None:
        # surface-pool telemetry: live slots show whether the map CONVERGED
        # (coherent/trained-weight depth) or grew worst-case (random
        # weights); drops/recycles surface capacity pressure in the record
        # itself instead of prose (VERDICT r3 weak #5/#6)
        counts = np.asarray(gen.volume.cell_counts)
        stats = np.asarray(gen.volume.stats)
        record["pool_live_slots"] = int(
            np.minimum(counts, gen.tsdf_cfg.cell_cap).sum()
        )
        record["pool_lifetime_slots"] = int(counts.sum())
        record["pool_dropped"] = int(stats[2])
        record["pool_recycled"] = int(stats[3])
    print(json.dumps(record))


if __name__ == "__main__":
    main()
