"""Serving: flagship configs, the per-frame inference step, and the daemon.

Three layers, smallest first:
- `flagship_config` / `build_inference_step`: single source for what
  `__graft_entry__.entry()` (the driver's compile check), `bench.py`, and
  `tools/export_aot.py` all need — the full-size conditional-generation
  model (reference configs/conditional_generation/*.yaml) and the jittable
  per-frame step: warp-conditioned encode -> top-k sample -> decode ->
  metric depth (reference model.py:141-167 + one_step_prediction).
- `SceneServer`: a resident model + compiled whole-scene unroll that
  serves generation requests compile-once/run-many (the
  InfiniteSceneGeneration jit caches key on the live instance;
  `reset(seeds)` swaps request seeds without invalidating them).
- `run_http_server` (CLI: serve.py): a stdlib ThreadingHTTPServer JSON API
  around SceneServer — /healthz, /metrics, /warmup, /generate. The
  reference has no serving stack at all (SURVEY.md section 7 lists it as
  out of its scope); production deployment needs one.
"""
from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import replace
from typing import Any, Dict, Optional


def flagship_config(dataset: str = "clevr-infinite", compute_dtype: str = "float32"):
    """Full-size conditional-generation VQModelConfig for either dataset
    (reference configs/conditional_generation/{clevr-infinite,
    google_earth_vqgan}.yaml)."""
    from sgam_neurips22_tpu.models import DDConfig, VQModelConfig

    dd = DDConfig(
        ch=128, out_ch=4, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
        attn_resolutions=(16,), resolution=64, z_channels=256, in_channels=4,
    )
    cfg = VQModelConfig(
        ddconfig=dd, n_embed=16384, embed_dim=256,
        phase="conditional_generation", dataset="clevr-infinite",
        depth_range=(7.0, 16.0),
    )
    if dataset == "google_earth":
        cfg = replace(
            cfg, n_embed=4096, dataset="google_earth",
            depth_range=(0.099975586, 4.765625),
        )
    elif dataset != "clevr-infinite":
        raise ValueError(f"unknown dataset {dataset!r}")
    if compute_dtype != "float32":
        cfg = replace(cfg, ddconfig=replace(cfg.ddconfig, compute_dtype=compute_dtype))
    return cfg


def load_inference_params(path: str, params_init: Any) -> Any:
    """Inference weights from ANY checkpoint this framework touches:

    - reference torch ``.ckpt`` (zip state_dict) via the converter
    - a params pickle (``.pkl``)
    - an orbax checkpoint tree from our own train.py: a run dir
      (``<logdir>/<run>`` containing ``checkpoints/``), the checkpoints
      dir itself, or a single step dir — latest step wins, and the params
      subtree is extracted from the saved train state.

    params_init provides the target structure (init_vqmodel output); torch
    conversion grafts onto it, orbax trees replace it wholesale.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if os.path.isdir(path):
        from sgam_neurips22_tpu.core.checkpoint import restore_raw_from_path

        state = restore_raw_from_path(path)
        params = state.get("params") if isinstance(state, dict) else None
        if params is None:
            raise ValueError(f"no 'params' subtree in checkpoint at {path}")
        if params_init is not None:
            # fail at LOAD time on a config/checkpoint mismatch (wrong
            # dataset's n_embed, codebook-phase conv_in, ...) instead of
            # minutes later inside XLA compile of the first request
            import jax

            flat_i = jax.tree_util.tree_flatten_with_path(params_init)[0]
            flat_c = jax.tree_util.tree_flatten_with_path(params)[0]
            want = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in flat_i}
            got = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in flat_c}
            for k, shape in want.items():
                if k not in got or got[k] != shape:
                    raise ValueError(
                        f"checkpoint at {path} does not match the model "
                        f"config: {k} wants {shape}, checkpoint has "
                        f"{got.get(k)}"
                    )
        return params
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)
    from sgam_neurips22_tpu.core.torch_convert import (
        convert_checkpoint,
        init_from_ckpt,
    )

    model_np, _, _ = convert_checkpoint(path)
    return init_from_ckpt(params_init, model_np)


def build_inference_step(model_cfg, topk: int = 1, num_src: int = 5,
                         image_size: int = 256):
    """(fn, example_args) for one conditional-generation inference step on
    `model_cfg`: fn(params, batch, rng) -> (rgb [B,H,W,3], metric depth)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dataclasses import replace

    from sgam_neurips22_tpu.geometry.codec import get_codec
    from sgam_neurips22_tpu.models import forward, get_x, init_vqmodel

    # batch-1 serving: flash attention is measured slower at B=1, so a
    # training YAML's flash_attention: true must not leak in (see
    # InfiniteSceneGeneration.__init__; SGAM_TPU_FLASH_ATTN still wins)
    model_cfg = replace(
        model_cfg, ddconfig=replace(model_cfg.ddconfig, flash_attention=None)
    )
    codec = get_codec(model_cfg.dataset)
    params = init_vqmodel(jax.random.PRNGKey(0), model_cfg)
    b, n, h, w = 1, num_src, image_size, image_size
    rng = np.random.default_rng(0)
    lo, hi = model_cfg.depth_range
    k = np.array(
        [[355.5555, 0, w / 2.0], [0, 355.5555, h / 2.0], [0, 0, 1.0]], np.float32
    )
    batch = {
        "dst_img": jnp.zeros((b, h, w, 3), jnp.float32),
        "dst_depth": jnp.full((b, h, w), (lo + hi) / 2, jnp.float32),
        "src_imgs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "src_depths": jnp.asarray(
            rng.uniform(lo, hi, (b, n, h, w)).astype(np.float32)
        ),
        "Ks": jnp.broadcast_to(jnp.asarray(k), (b, n, 3, 3)),
        "R_rels": jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, n, 3, 3)),
        "t_rels": jnp.zeros((b, n, 3), jnp.float32),
        "src_masks": jnp.ones((b, n), jnp.float32),
    }
    sample_rng = jax.random.PRNGKey(3)

    def fn(params, batch, sample_rng):
        cond = get_x(batch, model_cfg.dataset, depth_range=None)
        res = forward(
            params, model_cfg, cond.x,
            extrapolation_mask=cond.extrapolation_mask,
            topk=topk, rng=sample_rng, sample_number=1,
        )
        xrec = res.xrec[:, 0]
        rgb = jnp.clip(xrec[..., :3], -1.0, 1.0)
        depth = codec.decode(xrec[..., 3])
        return rgb, depth

    return fn, (params, batch, sample_rng)


class SceneServer:
    """Resident scene-generation service: load once, compile once, serve.

    One `InfiniteSceneGeneration` instance is kept per scene shape so its
    jitted fused unroll stays cached across requests; requests with a new
    seed_index reuse it via `reset(seeds)`. TPU work is serialized by a
    lock (one unroll owns the chip; concurrent requests queue).
    """

    def __init__(
        self,
        params,
        model_cfg,
        scene_cfg,
        template_dir: str,
        output_root: str = "serve_out",
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.scene_cfg = scene_cfg
        self.template_dir = template_dir
        self.output_root = output_root
        self._lock = threading.Lock()
        self._gen = None
        self._compiled = False
        self.stats: Dict[str, Any] = {
            "requests": 0, "frames": 0, "busy_seconds": 0.0,
            "last_fps": None, "started": time.time(),
        }

    # ------------------------------------------------------------ internals
    def _load_seeds(self, seed_index: int):
        from sgam_neurips22_tpu.pipeline.templates import load_seed_frames

        return load_seed_frames(
            self.template_dir, self.scene_cfg.dataset, seed_index,
            self.scene_cfg.image_resolution,
        )

    def _generator(self, seeds):
        from sgam_neurips22_tpu.pipeline.scene_generation import (
            InfiniteSceneGeneration,
        )

        if self._gen is None:
            self._gen = InfiniteSceneGeneration(
                self.params, self.model_cfg, self.scene_cfg, seeds=seeds
            )
        else:
            self._gen.reset(seeds)
        return self._gen

    # ------------------------------------------------------------ public API
    def warmup(self) -> Dict[str, Any]:
        """Compile + run the full unroll once on the template seeds (the
        first /generate would otherwise pay minutes of XLA compile)."""
        t0 = time.time()
        self.generate({"seed_index": 0, "export": False})
        self._compiled = True
        return {"warmup_seconds": round(time.time() - t0, 2)}

    def generate(self, req: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Serve one scene-generation request.

        Request keys (all optional):
          seed_index (int, default 0) — which seed template
          rng_seed   (int, default 3) — unroll sampling seed (reference
                     main_scene_generation.py:47-49 uses fixed seeds)
          export     (bool, default True) — write frames + point clouds
          output_dir (str) — overrides <output_root>/<request id>
        """
        import jax

        req = req or {}
        seed_index = int(req.get("seed_index", 0))
        rng_seed = int(req.get("rng_seed", 3))
        export = bool(req.get("export", True))
        seeds = self._load_seeds(seed_index)
        with self._lock:
            rid = self.stats["requests"]
            self.stats["requests"] = rid + 1
            t0 = time.time()
            gen = self._generator(seeds)
            rgb, depth = gen.scene_expansion(jax.random.PRNGKey(rng_seed))
            jax.block_until_ready(depth)
            # force a real device->host readback before timing (NOTES.md:
            # block_until_ready under-reported through the remote tunnel)
            checksum = float(jax.numpy.sum(depth[-1]))
            dt = time.time() - t0
            n_frames = gen.grid.size - len(seeds)
            out_dir = None
            if export:
                out_dir = req.get("output_dir") or os.path.join(
                    self.output_root,
                    f"req{rid:04d}_{self.scene_cfg.dataset}_seed{seed_index}",
                )
                # confine client-supplied paths to output_root: /generate is
                # an unauthenticated endpoint and must not be an arbitrary-
                # filesystem-write primitive
                root = os.path.realpath(self.output_root)
                resolved = os.path.realpath(out_dir)
                if not (resolved == root or resolved.startswith(root + os.sep)):
                    raise ValueError(
                        f"output_dir must be under output_root ({self.output_root})"
                    )
                out_dir = resolved
                gen.export_frames(out_dir)
                gen.export_point_clouds(out_dir)
            self.stats["frames"] += n_frames
            self.stats["busy_seconds"] += dt
            fps = n_frames / dt if dt > 0 else 0.0
            self.stats["last_fps"] = round(fps, 2)
            self._compiled = True
        return {
            "request": rid,
            "seed_index": seed_index,
            "frames": n_frames,
            "seconds": round(dt, 3),
            "frames_per_second": round(fps, 2),
            "output_dir": out_dir,
            "depth_checksum": checksum,
        }

    def health(self) -> Dict[str, Any]:
        # device info is cached after the first successful query: /healthz
        # is the liveness probe and must stay responsive even if the
        # (remote) backend wedges mid-run — jax.device_count() blocks
        # indefinitely exactly then (observed live on the tunnel)
        if not hasattr(self, "_device_info"):
            import jax

            self._device_info = {
                "devices": jax.device_count(),
                "backend": jax.default_backend(),
            }
        return {
            "status": "ok",
            "dataset": self.scene_cfg.dataset,
            "grid": list(self.scene_cfg.output_dim),
            **self._device_info,
            "compiled": self._compiled,
            "uptime_seconds": round(time.time() - self.stats["started"], 1),
        }

    def metrics(self) -> Dict[str, Any]:
        up = time.time() - self.stats["started"]
        return {
            **{k: v for k, v in self.stats.items() if k != "started"},
            "utilization": round(self.stats["busy_seconds"] / up, 4) if up else 0.0,
        }


def run_http_server(server: SceneServer, host: str = "127.0.0.1",
                    port: int = 8000, warmup: bool = True):
    """Blocking JSON-over-HTTP front end (stdlib only).

    GET  /healthz  -> liveness + model/backend info (always responsive —
                      requests run on worker threads, the chip lock only
                      serializes /generate)
    GET  /metrics  -> request/frame counters, utilization, last fps
    POST /warmup   -> compile + run the unroll once (also done at startup)
    POST /generate -> body = generate() request dict; returns its result
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._reply(200, server.health())
            elif self.path == "/metrics":
                self._reply(200, server.metrics())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"bad request body: {e}"})
                return
            try:
                if self.path == "/generate":
                    self._reply(200, server.generate(req))
                elif self.path == "/warmup":
                    self._reply(200, server.warmup())
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # surface, don't kill the daemon
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}", flush=True)

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"[serve] listening on http://{host}:{httpd.server_address[1]}", flush=True)
    if warmup:
        threading.Thread(target=server.warmup, daemon=True).start()
    return httpd
