"""Hash-grid encoding unit tests vs a plain-numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.config import EncodingConfig
from avr_tpu.models import hashgrid

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_encode(table, static, x):
    """Straight-line trilinear hash encoding oracle."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    N = x.shape[0]
    out = np.zeros((N, static.n_levels * static.n_features), np.float64)
    tab = np.asarray(table, np.float64)
    for l in range(static.n_levels):
        res = static.resolutions[l]
        scaled = x * res
        p0 = np.minimum(np.floor(scaled).astype(np.int64), res - 1)
        p0 = np.maximum(p0, 0)
        frac = scaled - p0
        acc = np.zeros((N, static.n_features), np.float64)
        for c in range(8):
            off = np.array([(c >> d) & 1 for d in range(3)])
            coords = np.minimum(p0 + off, res)
            if static.hashed[l]:
                h = (
                    (coords[:, 0].astype(np.uint64) * PRIMES[0])
                    ^ (coords[:, 1].astype(np.uint64) * PRIMES[1])
                    ^ (coords[:, 2].astype(np.uint64) * PRIMES[2])
                ) & np.uint64(0xFFFFFFFF)
                idx = (h % np.uint64(static.sizes[l])).astype(np.int64)
            else:
                stride = res + 1
                idx = coords[:, 0] + coords[:, 1] * stride + coords[:, 2] * stride**2
            w = np.prod(np.where(off, frac, 1.0 - frac), axis=-1)
            acc += tab[static.offsets[l] + idx] * w[:, None]
        out[:, l * static.n_features : (l + 1) * static.n_features] = acc
    return out


def make(cfg=None):
    cfg = cfg or EncodingConfig(
        n_levels=6, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.7,
    )
    static = hashgrid.build_static(cfg)
    table = hashgrid.init(jax.random.PRNGKey(0), static)
    return static, table


def test_static_levels():
    static, _ = make()
    assert static.resolutions[0] == 3
    assert all(
        static.resolutions[i] <= static.resolutions[i + 1]
        for i in range(len(static.resolutions) - 1)
    )
    # coarse levels dense, fine levels hashed at 2^7=128 entries
    assert not static.hashed[0]
    assert static.hashed[-1]
    assert static.sizes[-1] == 128
    assert static.total_entries == sum(static.sizes)


def test_encode_matches_numpy_oracle(rng):
    static, table = make()
    x = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    got = np.asarray(hashgrid.encode(table, static, jnp.asarray(x)))
    want = numpy_encode(table, static, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_encode_handles_boundaries(rng):
    static, table = make()
    x = np.array(
        [[0, 0, 0], [1, 1, 1], [0, 1, 0.5], [1e-8, 1 - 1e-8, 0.999]], np.float32
    )
    got = np.asarray(hashgrid.encode(table, static, jnp.asarray(x)))
    want = numpy_encode(table, static, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)
    assert np.all(np.isfinite(got))
    # out-of-range inputs are clamped, not garbage
    x_oob = np.array([[-0.5, 1.5, 0.3]], np.float32)
    got_oob = np.asarray(hashgrid.encode(table, static, jnp.asarray(x_oob)))
    got_cl = np.asarray(
        hashgrid.encode(table, static, jnp.asarray([[0.0, 1.0, 0.3]], jnp.float32))
    )
    np.testing.assert_allclose(got_oob, got_cl, atol=1e-7)


def test_encode_gradients_scatter_to_table(rng):
    static, table = make()
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)), jnp.float32)

    def loss(tab):
        return jnp.sum(hashgrid.encode(tab, static, x) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
    # finite-difference spot check on one touched entry
    gn = np.asarray(g)
    i = int(np.argmax(np.abs(gn).sum(axis=-1)))
    eps = 1e-4
    tp = table.at[i, 0].add(eps)
    tm = table.at[i, 0].add(-eps)
    fd = (loss(tp) - loss(tm)) / (2 * eps)
    np.testing.assert_allclose(float(fd), gn[i, 0], rtol=2e-2, atol=1e-5)


def test_interpolation_is_continuous():
    static, table = make()
    # walk across a cell boundary of the coarsest level: no jumps
    xs = np.stack(
        [np.linspace(0.3301, 0.3367, 64)] * 3, axis=-1
    ).astype(np.float32)
    enc = np.asarray(hashgrid.encode(table, static, jnp.asarray(xs)))
    jumps = np.abs(np.diff(enc, axis=0)).max()
    assert jumps < 5e-4  # features are ~1e-4 scale; continuity


def make_simplex():
    cfg = EncodingConfig(
        n_levels=6, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.7, interpolation="simplex",
    )
    static = hashgrid.build_static(cfg)
    table = hashgrid.init(jax.random.PRNGKey(0), static)
    return static, table


def test_simplex_weights_are_barycentric(rng):
    static, _ = make_simplex()
    x = jnp.asarray(rng.uniform(0, 1, size=(100, 3)), jnp.float32)
    idx, w = hashgrid._indices_weights(static, x)
    assert idx.shape == (100, static.n_levels, 4)
    wn = np.asarray(w)
    assert wn.shape == (100, static.n_levels, 4)
    np.testing.assert_allclose(wn.sum(-1), 1.0, atol=1e-5)
    assert (wn >= -1e-6).all()


def test_simplex_reproduces_linear_functions(rng):
    """Barycentric interpolation over a dense grid is exact on linear
    fields: load each dense-level entry with a*x+b*y+c*z of its vertex
    and check the encoding returns the same linear function of x."""
    cfg = EncodingConfig(
        n_levels=2, n_features_per_level=2, log2_hashmap_size=16,
        base_resolution=4, per_level_scale=2.0, interpolation="simplex",
    )
    static = hashgrid.build_static(cfg)
    assert not any(static.hashed)
    coef = np.array([[0.3, -0.7], [1.1, 0.2], [-0.5, 0.9]])  # [3, F]
    tab = np.zeros((static.total_entries, 2), np.float32)
    for l in range(static.n_levels):
        res = static.resolutions[l]
        s = res + 1
        zz, yy, xx = np.meshgrid(*( [np.arange(s)] * 3 ), indexing="ij")
        verts = np.stack([xx, yy, zz], -1).reshape(-1, 3) / res  # x fastest
        tab[static.offsets[l] : static.offsets[l] + s**3] = verts @ coef
    x = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    enc = np.asarray(hashgrid.encode(jnp.asarray(tab), static, jnp.asarray(x)))
    want = x @ coef  # every level reproduces the same linear field
    for l in range(static.n_levels):
        np.testing.assert_allclose(enc[:, 2 * l : 2 * l + 2], want, atol=1e-5)


def test_simplex_is_continuous():
    static, table = make_simplex()
    # walk along the main diagonal (tetrahedron boundaries everywhere:
    # all fracs tie) and across cell boundaries; no jumps
    xs = np.stack([np.linspace(0.30, 0.37, 512)] * 3, axis=-1).astype(np.float32)
    enc = np.asarray(hashgrid.encode(table, static, jnp.asarray(xs)))
    assert np.abs(np.diff(enc, axis=0)).max() < 5e-4
    # and along an off-diagonal line crossing face boundaries
    t = np.linspace(0.30, 0.37, 512, dtype=np.float32)
    xs2 = np.stack([t, 0.5 * t + 0.1, t * t + 0.05], axis=-1)
    enc2 = np.asarray(hashgrid.encode(table, static, jnp.asarray(xs2)))
    assert np.abs(np.diff(enc2, axis=0)).max() < 5e-4


def test_simplex_gradients_match_xla_scatter(rng, monkeypatch):
    static, table = make_simplex()
    x = jnp.asarray(rng.uniform(0.05, 0.95, size=(32, 3)), jnp.float32)

    def loss(tab):
        return jnp.sum(hashgrid.encode(tab, static, x) ** 2)

    monkeypatch.setenv("AVR_TPU_SCATTER", "xla")
    g_xla = np.asarray(jax.grad(loss)(table))
    assert np.isfinite(g_xla).all() and np.abs(g_xla).sum() > 0
    # finite-difference spot check
    i = int(np.argmax(np.abs(g_xla).sum(axis=-1)))
    eps = 1e-4
    fd = (loss(table.at[i, 0].add(eps)) - loss(table.at[i, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(fd), g_xla[i, 0], rtol=2e-2, atol=1e-5)


def test_encode_pair_simplex_matches_two_singles(rng):
    static, table = make_simplex()
    tb = hashgrid.init(jax.random.PRNGKey(1), static)
    x = jnp.asarray(rng.uniform(0, 1, size=(40, 3)), jnp.float32)
    ea, eb = hashgrid.encode_pair(table, tb, static, x)
    np.testing.assert_allclose(
        np.asarray(ea), np.asarray(hashgrid.encode(table, static, x)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(eb), np.asarray(hashgrid.encode(tb, static, x)),
        rtol=1e-5, atol=1e-6,
    )


def test_frequency_encoding_shape():
    x = jnp.asarray([[0.1, 0.5, 0.9]], jnp.float32)
    enc = hashgrid.frequency_encode(x, 4)
    assert enc.shape == (1, 24)


def test_level_major_matches_point_major_all_paths(rng, monkeypatch):
    """Bit-exact equality of the two encode layouts, incl. grads and the
    g=1 fallback for point counts not divisible by the gather group."""
    for interp in ("trilinear", "simplex"):
        cfg = EncodingConfig(
            n_levels=5, n_features_per_level=2, log2_hashmap_size=11,
            base_resolution=4, per_level_scale=1.6, interpolation=interp,
        )
        static = hashgrid.build_static(cfg)
        table = jnp.asarray(
            rng.normal(size=(static.padded_entries, 2)), jnp.float32
        )
        for n in (64, 37):  # 37: not divisible by the group size → g=1
            x = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

            def run(layout):
                monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", layout)
                e = hashgrid.encode(table, static, x)
                g = jax.grad(
                    lambda t: jnp.sum(jnp.cos(hashgrid.encode(t, static, x)))
                )(table)
                return np.asarray(e), np.asarray(g)

            e_p, g_p = run("point")
            e_l, g_l = run("level")
            np.testing.assert_array_equal(e_p, e_l)
            np.testing.assert_allclose(g_p, g_l, rtol=0, atol=1e-6)


def test_level_major_bf16_interp_close_to_fp32(rng, monkeypatch):
    """bf16 interpolation arithmetic (production path) stays within
    bf16-grade tolerance of exact fp32 interpolation."""
    monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", "level")
    cfg = EncodingConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=4, per_level_scale=1.7,
    )
    static = hashgrid.build_static(cfg)
    table = jnp.asarray(rng.normal(size=(static.padded_entries, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (48, 3)), jnp.float32)
    exact = np.asarray(hashgrid.encode(table, static, x), np.float64)
    approx = np.asarray(
        hashgrid.encode(table, static, x, compute_dtype=jnp.bfloat16), np.float64
    )
    scale = np.abs(exact).max()
    assert np.abs(exact - approx).max() < 2e-2 * scale


def test_dense_onehot_levels_match_gather(rng, monkeypatch):
    """The factored one-hot matmul path for small coarse levels is
    bit-identical to the row gather forward and allclose in the table
    gradient (summation order differs), for both interpolation modes,
    a partial (D < L) and a full (D == L) level split, and both fp32
    and bf16 compute dtypes."""
    monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", "klm")
    for interp in ("trilinear", "simplex"):
        cfg = EncodingConfig(
            n_levels=5, n_features_per_level=2, log2_hashmap_size=11,
            base_resolution=4, per_level_scale=1.6, interpolation=interp,
        )
        static = hashgrid.build_static(cfg)
        table = jnp.asarray(
            rng.normal(size=(static.padded_entries, 2)), jnp.float32
        )
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)

        def run(spec, dt=None):
            monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", spec)
            e = hashgrid.encode(table, static, x, compute_dtype=dt)
            g = jax.grad(
                lambda t: jnp.sum(
                    jnp.cos(hashgrid.encode(t, static, x, compute_dtype=dt))
                )
            )(table)
            return np.asarray(e, np.float64), np.asarray(g, np.float64)

        # partial split: only levels below 200 rows take the matmul path
        sizes = static.sizes
        assert sizes[0] < 200 < sizes[-1]
        e0, g0 = run("0")
        for spec in ("200", str(max(sizes))):
            e1, g1 = run(spec)
            np.testing.assert_array_equal(e0, e1)
            np.testing.assert_allclose(g0, g1, rtol=0, atol=1e-5)

        # bf16 compute dtype: forward stays bit-identical (both paths
        # read the same bf16-cast rows), gradient bf16-grade
        e0b, g0b = run("0", jnp.bfloat16)
        e1b, g1b = run("200", jnp.bfloat16)
        np.testing.assert_array_equal(e0b, e1b)
        scale = max(np.abs(g0b).max(), 1e-30)
        assert np.abs(g0b - g1b).max() < 2e-2 * scale


def test_pack2_gather_matches_default_path(rng, monkeypatch):
    """AVR_TPU_GATHER_PACK2=1 (flat packed-f32 gather + per-feature
    planes) must match the default bf16 gather path: identical forward
    values (both read the same bf16-cast rows) and XLA-scatter-grade
    gradients, for both interpolation modes."""
    monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", "klm")
    monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", "0")
    for interp in ("trilinear", "simplex"):
        cfg = EncodingConfig(
            n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=4, per_level_scale=1.7, interpolation=interp,
        )
        static = hashgrid.build_static(cfg)
        table = jnp.asarray(
            rng.normal(size=(static.padded_entries, 2)), jnp.float32
        )
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)

        def run(pk2):
            monkeypatch.setenv("AVR_TPU_GATHER_PACK2", pk2)
            e = hashgrid.encode(table, static, x, compute_dtype=jnp.bfloat16)
            g = jax.grad(
                lambda t: jnp.sum(jnp.cos(
                    hashgrid.encode(t, static, x, compute_dtype=jnp.bfloat16)
                ))
            )(table)
            return np.asarray(e, np.float64), np.asarray(g, np.float64)

        e0, g0 = run("0")
        e1, g1 = run("1")
        np.testing.assert_allclose(e0, e1, rtol=0, atol=1e-6)
        np.testing.assert_allclose(g0, g1, rtol=0, atol=1e-5)

        # pack2 composes with the dense one-hot split (D > 0)
        monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", "200")
        e2, g2 = run("1")
        monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", "0")
        np.testing.assert_allclose(e0, e2, rtol=0, atol=1e-6)
        np.testing.assert_allclose(g0, g2, rtol=0, atol=1e-5)


def test_onehot_chunked_matches_monolithic(rng, monkeypatch):
    """AVR_TPU_ONEHOT_CHUNK (lax.map over point chunks — the K=8
    compile-scaling fix) is exact: same forward bits and allclose table
    gradient as the monolithic one-hot."""
    monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", "klm")
    for interp in ("trilinear", "simplex"):
        cfg = EncodingConfig(
            n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=4, per_level_scale=1.7, interpolation=interp,
        )
        static = hashgrid.build_static(cfg)
        table = jnp.asarray(
            rng.normal(size=(static.padded_entries, 2)), jnp.float32
        )
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
        monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", str(max(static.sizes)))

        def run(chunk):
            monkeypatch.setenv("AVR_TPU_ONEHOT_CHUNK", chunk)
            e = hashgrid.encode(table, static, x)
            g = jax.grad(
                lambda t: jnp.sum(jnp.cos(hashgrid.encode(t, static, x)))
            )(table)
            return np.asarray(e, np.float64), np.asarray(g, np.float64)

        # M = 64 points x K corners; chunk 64 divides both 256 and 512
        e0, g0 = run("0")
        e1, g1 = run("64")
        np.testing.assert_array_equal(e0, e1)
        np.testing.assert_allclose(g0, g1, rtol=0, atol=1e-5)


def test_pack4_gather_matches_default_path(rng, monkeypatch):
    """AVR_TPU_GATHER_PACK4=1 (complex64-packed F=4 gather) matches the
    default path on a pair-fused [rows, 4] table through encode_pair."""
    monkeypatch.setenv("AVR_TPU_ENCODE_LAYOUT", "klm")
    monkeypatch.setenv("AVR_TPU_DENSE_ONEHOT", "0")
    cfg = EncodingConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=4, per_level_scale=1.7, interpolation="simplex",
    )
    static = hashgrid.build_static(cfg)
    fused = jnp.asarray(rng.normal(size=(static.padded_entries, 4)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)

    def run(pk4):
        monkeypatch.setenv("AVR_TPU_GATHER_PACK4", pk4)
        a, b = hashgrid.encode_pair_fused(
            fused, static, x, compute_dtype=jnp.bfloat16
        )
        g = jax.grad(
            lambda t: sum(
                jnp.sum(jnp.cos(e)) for e in hashgrid.encode_pair_fused(
                    t, static, x, compute_dtype=jnp.bfloat16
                )
            )
        )(fused)
        return (np.asarray(a, np.float64), np.asarray(b, np.float64),
                np.asarray(g, np.float64))

    a0, b0, g0 = run("0")
    a1, b1, g1 = run("1")
    np.testing.assert_allclose(a0, a1, rtol=0, atol=1e-6)
    np.testing.assert_allclose(b0, b1, rtol=0, atol=1e-6)
    np.testing.assert_allclose(g0, g1, rtol=0, atol=1e-5)


# ----------------------------------------------------------------------
# Hybrid (per-level mixed) interpolation — round-4 lever: trilinear on
# the finest levels (where the quality A/B localized simplex's phase
# loss), simplex below (dropping most of the dominant K=8 row stream).
# ----------------------------------------------------------------------
def _hybrid_cfg(interp, n_levels=6):
    return EncodingConfig(
        n_levels=n_levels, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.7, interpolation=interp,
    )


def test_parse_interp_canonicalization():
    L = 6
    assert hashgrid.build_static(_hybrid_cfg("hybrid:0")).interp == "simplex"
    assert hashgrid.build_static(_hybrid_cfg("hybrid:6")).interp == "trilinear"
    assert hashgrid.build_static(_hybrid_cfg("hybrid:2")).interp == "levels:sssstt"
    # default split = half the levels, rounded up, on the fine end
    assert hashgrid.build_static(_hybrid_cfg("hybrid")).interp == "levels:sssttt"
    assert hashgrid.build_static(_hybrid_cfg("levels:tttttt")).interp == "trilinear"
    assert hashgrid.build_static(_hybrid_cfg("levels:ssssss")).interp == "simplex"
    assert hashgrid.build_static(_hybrid_cfg("levels:tsstst")).interp == "levels:tsstst"
    import pytest

    with pytest.raises(ValueError):
        hashgrid.build_static(_hybrid_cfg("levels:ts"))  # wrong length
    with pytest.raises(ValueError):
        hashgrid.build_static(_hybrid_cfg("hybrid:2")).n_corners


def test_hybrid_matches_pure_modes_per_level(rng):
    """hybrid:N output columns equal the pure-mode encodings level-wise."""
    n_tri, L, F = 2, 6, 2
    st_h = hashgrid.build_static(_hybrid_cfg(f"hybrid:{n_tri}"))
    st_s = hashgrid.build_static(_hybrid_cfg("simplex"))
    st_t = hashgrid.build_static(_hybrid_cfg("trilinear"))
    table = hashgrid.init(jax.random.PRNGKey(3), st_h)
    x = jnp.asarray(rng.uniform(0, 1, (96, 3)), jnp.float32)

    out_h = np.asarray(hashgrid.encode(table, st_h, x))
    out_s = np.asarray(hashgrid.encode(table, st_s, x))
    out_t = np.asarray(hashgrid.encode(table, st_t, x))
    split = (L - n_tri) * F
    np.testing.assert_allclose(out_h[:, :split], out_s[:, :split], atol=1e-6)
    np.testing.assert_allclose(out_h[:, split:], out_t[:, split:], atol=1e-6)


def test_hybrid_gradients_finite_diff(rng):
    st, _ = None, None
    static = hashgrid.build_static(_hybrid_cfg("hybrid:3"))
    table = hashgrid.init(jax.random.PRNGKey(1), static)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (24, 3)), jnp.float32)

    def loss(tab):
        return jnp.sum(jnp.sin(hashgrid.encode(tab, static, x)))

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    gn = np.asarray(g)
    assert np.isfinite(gn).all() and np.abs(gn).sum() > 0
    i = int(np.argmax(np.abs(gn).sum(axis=-1)))
    eps = 1e-4
    fd = (loss(table.at[i, 0].add(eps)) - loss(table.at[i, 0].add(-eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(fd), gn[i, 0], rtol=2e-2, atol=1e-5)


def test_hybrid_pair_fused_matches_pure(rng):
    n_tri = 2
    st_h = hashgrid.build_static(_hybrid_cfg(f"hybrid:{n_tri}", n_levels=4))
    st_s = hashgrid.build_static(_hybrid_cfg("simplex", n_levels=4))
    st_t = hashgrid.build_static(_hybrid_cfg("trilinear", n_levels=4))
    fused = jnp.asarray(
        rng.normal(size=(st_h.padded_entries, 4)), jnp.float32
    )
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
    ah, bh = hashgrid.encode_pair_fused(fused, st_h, x)
    as_, bs = hashgrid.encode_pair_fused(fused, st_s, x)
    at, bt = hashgrid.encode_pair_fused(fused, st_t, x)
    split = (4 - n_tri) * 2
    for h, s, t in ((ah, as_, at), (bh, bs, bt)):
        np.testing.assert_allclose(
            np.asarray(h)[:, :split], np.asarray(s)[:, :split], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(h)[:, split:], np.asarray(t)[:, split:], atol=1e-6
        )


def test_hybrid_is_continuous():
    static = hashgrid.build_static(_hybrid_cfg("hybrid:3"))
    table = hashgrid.init(jax.random.PRNGKey(2), static)
    xs = np.stack([np.linspace(0.3301, 0.3367, 64)] * 3, axis=-1).astype(
        np.float32
    )
    out = np.asarray(hashgrid.encode(table, static, jnp.asarray(xs)))
    step = np.abs(np.diff(out, axis=0)).max()
    assert step < 5e-3, f"jump {step} across cell boundary"


def test_parse_hybridc_coarse_trilinear():
    """hybridc:N = trilinear on the N COARSEST levels (the attribution
    winner: phase/DoA quality localizes to the coarse levels)."""
    assert hashgrid.build_static(_hybrid_cfg("hybridc:4")).interp == "levels:ttttss"
    assert hashgrid.build_static(_hybrid_cfg("hybridc:0")).interp == "simplex"
    assert hashgrid.build_static(_hybrid_cfg("hybridc:6")).interp == "trilinear"
    st = hashgrid.build_static(_hybrid_cfg("hybridc:2"))
    groups = hashgrid._hybrid_groups(st)
    assert [g.interp for g in groups] == ["trilinear", "simplex"]
    assert groups[0].n_levels == 2 and groups[1].n_levels == 4


def test_split_levels_cap_parity(rng, monkeypatch):
    """AVR_TPU_SPLIT_LEVELS (gather-fusion splitting, r4): capped group
    encoding must reproduce the monolithic outputs and gradients exactly
    — the knob changes program structure, never math. Covers pure and
    hybrid statics and the recursive halving."""
    cfg = EncodingConfig(
        n_levels=9, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.5, interpolation="hybridc:4",
    )
    for interp in ("trilinear", "hybridc:4"):
        cfg.interpolation = interp
        static = hashgrid.build_static(cfg)
        table = hashgrid.init(jax.random.PRNGKey(0), static)
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)

        def run(cap):
            monkeypatch.setenv("AVR_TPU_SPLIT_LEVELS", cap)
            out = np.asarray(hashgrid.encode(table, static, x))
            g = jax.grad(
                lambda t: jnp.sum(jnp.sin(hashgrid.encode(t, static, x)))
            )(table)
            return out, np.asarray(g)

        o0, g0 = run("0")
        o2, g2 = run("2")  # recursive halving engages (groups of <=2)
        np.testing.assert_allclose(o0, o2, atol=1e-6)
        np.testing.assert_allclose(g0, g2, atol=1e-5)


def test_split_auto_rules():
    """The auto split rule's measured boundaries: no split on CPU, no
    split for small streams, cap 10 for large narrow streams, halve for
    large pair-fused pure statics, none for their hybrid groups."""
    f = hashgrid._split_max_levels
    # CPU (default backend in tests) → always 0
    assert f(2, True, 20, 1_000_000) == 0
    import unittest.mock as mock

    with mock.patch.object(hashgrid.hash_scatter, "on_tpu", lambda: True):
        assert f(2, True, 20, 50) == 0            # small stream: never
        assert f(2, True, 20, 1_000_000) == 10    # narrow large: cap 10
        assert f(4, True, 20, 1_000_000) == 10    # wide pure: halve
        assert f(4, False, 20, 1_000_000) == 0    # wide hybrid: never


def test_group_gather_single_scatter_parity(rng, monkeypatch):
    """AVR_TPU_GROUP_GATHER=1 (r5): the split-group encode routes all
    groups through ONE multi-stream gather VJP whose backward runs one
    scatter over the concatenated per-group streams. Groups cover
    disjoint table segments, so outputs AND table gradients must equal
    the per-group path EXACTLY (same sums, different program)."""
    cfg = EncodingConfig(
        n_levels=8, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.5,
    )
    monkeypatch.setenv("AVR_TPU_SPLIT_LEVELS", "3")
    for interp in ("trilinear", "hybridc:4"):
        cfg.interpolation = interp
        static = hashgrid.build_static(cfg)
        table = hashgrid.init(jax.random.PRNGKey(1), static)
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)

        def run(flag):
            monkeypatch.setenv("AVR_TPU_GROUP_GATHER", flag)
            out = np.asarray(hashgrid.encode(table, static, x))
            g = jax.grad(
                lambda t: jnp.sum(jnp.sin(hashgrid.encode(t, static, x)))
            )(table)
            return out, np.asarray(g)

        o_multi, g_multi = run("1")
        o_per, g_per = run("0")
        np.testing.assert_array_equal(o_multi, o_per)
        np.testing.assert_array_equal(g_multi, g_per)


def test_group_gather_pair_fused_parity(rng, monkeypatch):
    """Same invariant through encode_pair_fused (the flagship's pos/tx
    pair tables), which shares _encode_klm_groups."""
    cfg = EncodingConfig(
        n_levels=6, n_features_per_level=2, log2_hashmap_size=7,
        base_resolution=3, per_level_scale=1.5, interpolation="hybridc:3",
    )
    static = hashgrid.build_static(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    fused = jnp.concatenate(
        [hashgrid.init(k1, static), hashgrid.init(k2, static)], axis=-1
    )
    x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
    monkeypatch.setenv("AVR_TPU_SPLIT_LEVELS", "2")

    def run(flag):
        monkeypatch.setenv("AVR_TPU_GROUP_GATHER", flag)
        a, b = hashgrid.encode_pair_fused(fused, static, x)
        g = jax.grad(
            lambda t: jnp.sum(
                jnp.sin(hashgrid.encode_pair_fused(t, static, x)[0])
            )
            + jnp.sum(jnp.cos(hashgrid.encode_pair_fused(t, static, x)[1]))
        )(fused)
        return np.asarray(a), np.asarray(b), np.asarray(g)

    a1, b1, g1 = run("1")
    a0, b0, g0 = run("0")
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(b1, b0)
    np.testing.assert_array_equal(g1, g0)


def test_gather_rows_lmajor_multi_matches_per_group(rng):
    """The multi-stream gather op itself: outputs match per-group
    gather_rows_lmajor; the summed table cotangent matches the per-group
    VJPs' sum exactly (disjoint segments — no fp32 order ambiguity)."""
    from avr_tpu.ops import hash_scatter as hs

    E, F = 96, 2
    table = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)
    idx1 = jnp.asarray(rng.integers(0, 40, size=(2, 8, 4)), jnp.int32)
    idx2 = jnp.asarray(rng.integers(40, E, size=(3, 8, 4)), jnp.int32)

    outs = hs.gather_rows_lmajor_multi(table, (idx1, idx2), None)
    np.testing.assert_array_equal(
        np.asarray(outs[0]), np.asarray(hs.gather_rows_lmajor(table, idx1, None))
    )
    np.testing.assert_array_equal(
        np.asarray(outs[1]), np.asarray(hs.gather_rows_lmajor(table, idx2, None))
    )

    def loss_multi(t):
        a, b = hs.gather_rows_lmajor_multi(t, (idx1, idx2), None)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(b))

    def loss_per(t):
        return jnp.sum(
            jnp.sin(hs.gather_rows_lmajor(t, idx1, None))
        ) + jnp.sum(jnp.cos(hs.gather_rows_lmajor(t, idx2, None)))

    g_multi = np.asarray(jax.grad(loss_multi)(table))
    g_per = np.asarray(jax.grad(loss_per)(table))
    np.testing.assert_array_equal(g_multi, g_per)
