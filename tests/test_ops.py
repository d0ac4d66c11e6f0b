"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from sgam_neurips22_tpu.models.vqgan.quantize import codeword_distances
from sgam_neurips22_tpu.ops.vq_pallas import nearest_codeword


def test_nearest_codeword_matches_xla():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(1500, 64)).astype(np.float32))  # non-multiple of tile
    idx, dist = nearest_codeword(z, cb, tile_k=512, interpret=True)
    ref = codeword_distances(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(jnp.argmin(ref, axis=1)))
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(jnp.min(ref, axis=1)), rtol=1e-4, atol=1e-4
    )


def test_flash_attention_matches_xla():
    from sgam_neurips22_tpu.ops.attention_pallas import flash_attention

    rng = np.random.default_rng(2)
    b, s, c = 2, 300, 128  # non-multiple of block sizes
    q = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    ours = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    scale = 1.0 / np.sqrt(c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k) * scale
    ref = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_attention_grads_match_xla():
    """The custom VJP (FlashAttention-style backward) must produce the same
    dQ/dK/dV as differentiating the naive softmax attention — this is what
    lets training use the kernel (nn._use_flash_attention)."""
    from sgam_neurips22_tpu.ops.attention_pallas import flash_attention

    rng = np.random.default_rng(4)
    b, s, c = 2, 300, 128  # non-multiple of block sizes exercises padding
    q = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))

    def ours(q, k, v):
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(out * cot)

    def ref(q, k, v):
        scale = 1.0 / np.sqrt(c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) * scale
        out = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(logits, axis=-1), v)
        return jnp.sum(out * cot)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_vq_pallas_flag_routes_production_quantize(monkeypatch):
    """SGAM_TPU_VQ_PALLAS=1 must route quantize() and quantize_topk(topk=1)
    through the fused kernel with identical indices/outputs to the XLA
    path (the wiring, not just the kernel)."""
    from sgam_neurips22_tpu.models.vqgan import quantize as q

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))
    base = q.quantize(cb, z)
    base_topk = q.quantize_topk(cb, z, jax.random.PRNGKey(0), topk=1)
    monkeypatch.setenv("SGAM_TPU_VQ_PALLAS", "1")
    assert q._use_vq_pallas()
    flagged = q.quantize(cb, z)
    flagged_topk = q.quantize_topk(cb, z, jax.random.PRNGKey(0), topk=1)
    np.testing.assert_array_equal(np.asarray(base.indices), np.asarray(flagged.indices))
    np.testing.assert_allclose(np.asarray(base.z_q), np.asarray(flagged.z_q))
    np.testing.assert_array_equal(
        np.asarray(base_topk.indices), np.asarray(flagged_topk.indices)
    )


def test_vq_pallas_flag_differentiates(monkeypatch):
    """quantize() runs inside the differentiated training forward; with
    SGAM_TPU_VQ_PALLAS=1 the Pallas branch must not leak tangents into
    pallas_call (no VJP rule) — jax.grad must work and match the XLA path
    (indices are non-differentiable, so stop_gradient is exact)."""
    from sgam_neurips22_tpu.models.vqgan import quantize as q

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(1, 4, 4, 32)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))

    def loss(cb, z):
        res = q.quantize(cb, z)
        return res.loss + jnp.sum(res.z_q**2)

    g_base = jax.grad(loss, argnums=(0, 1))(cb, z)
    monkeypatch.setenv("SGAM_TPU_VQ_PALLAS", "1")
    assert q._use_vq_pallas()
    g_flag = jax.grad(loss, argnums=(0, 1))(cb, z)
    for a, b_ in zip(g_flag, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)


def test_nearest_codeword_unaligned_p():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(13, 32)).astype(np.float32))  # P not multiple of 8
    cb = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
    idx, _ = nearest_codeword(z, cb, tile_k=128, interpret=True)
    ref = jnp.argmin(codeword_distances(z, cb), axis=1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def _xla_zbuffer_min(pix, key, h, w):
    imax = jnp.iinfo(jnp.int32).max
    b = pix.shape[0]

    def one(p, k):
        return jnp.full((h * w,), imax, jnp.int32).at[p].min(k, mode="drop")

    return jax.vmap(one)(pix, key)


def test_splat_pallas_zbuffer_matches_xla_scatter():
    """The binned Pallas z-buffer merge must be BIT-identical to the XLA
    scatter-min it replaces (min over the same unique-key multiset), across
    collisions, invalid points, and chunk padding."""
    from sgam_neurips22_tpu.ops.splat_pallas import zbuffer_min

    rng = np.random.default_rng(5)
    h, w, b, p = 16, 128, 2, 700  # p not a multiple of chunk*group
    imax = np.iinfo(np.int32).max
    # coherent-ish rows plus hard collisions on a few pixels
    pix = rng.integers(0, h * w, (b, p), dtype=np.int32)
    pix[:, :50] = 7  # 50-way collision on one pixel
    key = rng.integers(0, 2**30, (b, p), dtype=np.int32)
    valid = rng.random((b, p)) < 0.8
    key = np.where(valid, key, imax)
    pix = np.where(valid, pix, 0)
    ours = zbuffer_min(
        jnp.asarray(pix), jnp.asarray(key), h, w, chunk=128, group=4,
        interpret=True,
    )
    ref = _xla_zbuffer_min(jnp.asarray(pix), jnp.asarray(key), h, w)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_splat_pallas_all_invalid_and_empty_rows():
    from sgam_neurips22_tpu.ops.splat_pallas import zbuffer_min

    imax = np.iinfo(np.int32).max
    h, w, p = 8, 128, 256
    pix = np.zeros((1, p), np.int32)
    key = np.full((1, p), imax, np.int32)
    out = zbuffer_min(
        jnp.asarray(pix), jnp.asarray(key), h, w, chunk=128, group=2,
        interpret=True,
    )
    assert (np.asarray(out) == imax).all()


def test_splat_pallas_flag_routes_production_splat(monkeypatch):
    """SGAM_TPU_SPLAT_PALLAS=1 routes the nearest-collision splat through
    the Pallas kernel (interpret mode off-TPU) and the output matches the
    XLA scatter path exactly."""
    import sgam_neurips22_tpu.geometry.splat as splat_mod

    rng = np.random.default_rng(11)
    b, n, h, w, c = 1, 2, 16, 128, 3
    feats = rng.uniform(-1, 1, (b, n, h, w, c)).astype(np.float32)
    depths = rng.uniform(2, 6, (b, n, h, w)).astype(np.float32)
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    ks = np.tile(k, (b, n, 1, 1))
    t = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    t[:, 1, 0, 3] = 0.3
    args = (
        jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(k)[None],
        jnp.asarray(ks), jnp.asarray(t),
    )
    monkeypatch.delenv("SGAM_TPU_SPLAT_PALLAS", raising=False)
    base = splat_mod.render_projection_from_srcs(*args)
    monkeypatch.setenv("SGAM_TPU_SPLAT_PALLAS", "1")
    ours = splat_mod.render_projection_from_srcs(*args)
    np.testing.assert_array_equal(np.asarray(base.depth), np.asarray(ours.depth))
    np.testing.assert_array_equal(
        np.asarray(base.features), np.asarray(ours.features)
    )
