"""Serving daemon: SceneServer (resident compiled unroll) + the HTTP API."""
import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from sgam_neurips22_tpu.models import DDConfig, VQModelConfig, init_vqmodel
from sgam_neurips22_tpu.pipeline.scene_generation import SceneGenConfig
from sgam_neurips22_tpu.serving import SceneServer, run_http_server

TINY = VQModelConfig(
    ddconfig=DDConfig(
        ch=32, out_ch=4, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), resolution=16, z_channels=32, in_channels=4,
    ),
    n_embed=32, embed_dim=16, phase="conditional_generation",
    dataset="clevr-infinite", depth_range=(7.0, 16.0),
)
H = W = 32


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    tpl = root / "templates"
    os.makedirs(tpl)
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    Image.fromarray(img).save(tpl / "im_00000_0_0.png")
    np.save(tpl / "dm_00000_0_0.npy", rng.uniform(8, 14, (H, W)).astype(np.float32))
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(3, 3), num_src=3, topk=1,
        image_resolution=(H, W),
    )
    params = init_vqmodel(jax.random.PRNGKey(0), TINY)
    return SceneServer(
        params, TINY, cfg, str(tpl), output_root=str(root / "out")
    )


def test_generate_is_deterministic_and_reuses_the_generator(server, tmp_path):
    r1 = server.generate({"export": False, "rng_seed": 3})
    gen1 = server._gen
    r2 = server.generate({"export": False, "rng_seed": 3})
    assert server._gen is gen1  # resident generator (compile-once) reused
    assert r1["frames"] == r2["frames"] == 8  # 3x3 grid minus the seed
    # topk=1 unrolls are deterministic: same request -> bit-equal scene
    assert r1["depth_checksum"] == r2["depth_checksum"]
    assert server.metrics()["requests"] == 2

    out = os.path.join(server.output_root, "exported")
    r3 = server.generate({"output_dir": out, "rng_seed": 3})
    assert r3["output_dir"] == os.path.realpath(out)
    files = os.listdir(out)
    assert any(f.startswith("im_") and f.endswith(".png") for f in files)
    assert "merged_pcds.ply" in files

    # client-supplied paths outside output_root are rejected (unauthenticated
    # endpoint must not be an arbitrary-filesystem-write primitive)
    with pytest.raises(ValueError, match="output_root"):
        server.generate({"output_dir": str(tmp_path / "escape")})
    with pytest.raises(ValueError, match="output_root"):
        server.generate({"output_dir": os.path.join(server.output_root, "..", "up")})


def test_server_map_requery_mode(tmp_path):
    """SceneServer in use_rgbd_integration mode: the TSDF volume is rebuilt
    per request (reset) and generation stays deterministic across requests."""
    tpl = tmp_path / "tpl"
    os.makedirs(tpl)
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    Image.fromarray(img).save(tpl / "im_00000_0_0.png")
    np.save(tpl / "dm_00000_0_0.npy", rng.uniform(8, 14, (H, W)).astype(np.float32))
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=3, topk=1,
        image_resolution=(H, W), use_rgbd_integration=True,
    )
    params = init_vqmodel(jax.random.PRNGKey(0), TINY)
    srv = SceneServer(params, TINY, cfg, str(tpl), output_root=str(tmp_path / "o"))
    r1 = srv.generate({"export": False})
    r2 = srv.generate({"export": False})
    assert r1["frames"] == r2["frames"] == 3
    assert r1["depth_checksum"] == r2["depth_checksum"]


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(port, path, body, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_api(server, tmp_path):
    httpd = run_http_server(server, port=0, warmup=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        code, health = _get(port, "/healthz")
        assert code == 200 and health["status"] == "ok"
        assert health["dataset"] == "clevr-infinite" and health["grid"] == [3, 3]

        out = os.path.join(server.output_root, "http_out")
        code, res = _post(port, "/generate", {"output_dir": out, "rng_seed": 3})
        assert code == 200, res
        assert res["frames"] == 8 and os.path.isdir(out)

        # path escape over HTTP -> 500 with the confinement error surfaced
        code, err = _post(port, "/generate", {"output_dir": str(tmp_path / "esc")})
        assert code == 500 and "output_root" in err["error"]

        code, m = _get(port, "/metrics")
        assert code == 200 and m["requests"] >= 1 and m["frames"] >= 8

        code, err = _post(port, "/nope", {})
        assert code == 404 and "error" in err
    finally:
        httpd.shutdown()
        t.join(timeout=5)
