"""Fused PSA softmax+bmm Pallas kernel vs the XLA reference.

Runs in Pallas interpreter mode on CPU; on real TPU hardware the same
kernel compiles via Mosaic (exercised by bench.py / TPU smoke runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semseg_tpu.ops.psa_pallas import (
    psa_softmax_bmm,
    psa_softmax_bmm_flash,
    psa_softmax_bmm_reference,
)


@pytest.mark.parametrize(
    "n,c,hw,tile_j",
    [
        (1, 16, 36, 16),     # unaligned everything (pad paths)
        (2, 8, 128, 128),    # exact lane tile
        (1, 24, 100, 32),    # hw % tile_j != 0
    ],
)
def test_fused_forward_matches_reference(rng, n, c, hw, tile_j):
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    a = jnp.asarray(rng.randn(n, hw, hw).astype(np.float32) * 3)
    got = psa_softmax_bmm(x, a, 1.7, tile_j, True)
    want = psa_softmax_bmm_reference(x, a, 1.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_bf16_operands(rng):
    """bf16 x/a (the perf-path container dtype): forward matches the f32
    reference on the bf16-quantized values; VJP returns bf16 cotangents."""
    n, c, hw, tile_j = 1, 8, 40, 16
    x32 = rng.randn(n, c, hw).astype(np.float32)
    a32 = (rng.randn(n, hw, hw) * 3).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    a = jnp.asarray(a32).astype(jnp.bfloat16)
    got = psa_softmax_bmm(x, a, 1.5, tile_j, True)
    want = psa_softmax_bmm_reference(
        x.astype(jnp.float32), a.astype(jnp.float32), 1.5
    )
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def fused(xx, aa):
        return psa_softmax_bmm(xx, aa, 1.5, tile_j, True)

    g = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    _, vjp_f = jax.vjp(fused, x, a)
    dx, da = vjp_f(g)
    assert dx.dtype == jnp.bfloat16 and da.dtype == jnp.bfloat16

    def ref(xx, aa):
        return psa_softmax_bmm_reference(
            xx.astype(jnp.float32), aa.astype(jnp.float32), 1.5
        )

    _, vjp_r = jax.vjp(ref, x, a)
    dx_r, da_r = vjp_r(g)
    np.testing.assert_allclose(
        np.asarray(dx, dtype=np.float32), np.asarray(dx_r, dtype=np.float32),
        rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(da, dtype=np.float32), np.asarray(da_r, dtype=np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_fused_vjp_matches_reference(rng):
    n, c, hw, tile_j = 1, 8, 40, 16
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    a = jnp.asarray(rng.randn(n, hw, hw).astype(np.float32))
    g = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))

    def fused(xx, aa):
        return psa_softmax_bmm(xx, aa, 2.0, tile_j, True)

    def ref(xx, aa):
        return psa_softmax_bmm_reference(xx, aa, 2.0)

    _, vjp_f = jax.vjp(fused, x, a)
    _, vjp_r = jax.vjp(ref, x, a)
    dx_f, da_f = vjp_f(g)
    dx_r, da_r = vjp_r(g)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da_f), np.asarray(da_r),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "n,c,hw,cap_i,cap_j",
    [
        (1, 16, 40, 16, 128),    # 3 source tiles, 1 query tile
        (2, 8, 100, 32, 32),     # multi-tile both axes, hw % tiles != 0
        (1, 24, 36, 64, 128),    # single source tile (degenerates to
                                 # resident-style softmax, i==0==last)
    ],
)
def test_flash_forward_matches_reference(rng, n, c, hw, cap_i, cap_j):
    """Source-tiled online softmax == full softmax (multi-tile running
    max/denominator path exercised with small tile caps)."""
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    a = jnp.asarray(rng.randn(n, hw, hw).astype(np.float32) * 3)
    got = psa_softmax_bmm_flash(x, a, 1.7, True, cap_i, cap_j)
    want = psa_softmax_bmm_reference(x, a, 1.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_vjp_matches_reference(rng):
    """Flash backward (saved m/l + delta identity) == autodiff of the XLA
    reference, with multi-tile grids on both axes."""
    n, c, hw = 1, 8, 70
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    a = jnp.asarray((rng.randn(n, hw, hw) * 2).astype(np.float32))
    g = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))

    def fused(xx, aa):
        return psa_softmax_bmm_flash(xx, aa, 2.0, True, 32, 128)

    def ref(xx, aa):
        return psa_softmax_bmm_reference(xx, aa, 2.0)

    _, vjp_f = jax.vjp(fused, x, a)
    _, vjp_r = jax.vjp(ref, x, a)
    dx_f, da_f = vjp_f(g)
    dx_r, da_r = vjp_r(g)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da_f), np.asarray(da_r),
                               rtol=1e-4, atol=1e-5)


def test_flash_bf16_operands(rng):
    """bf16 x/a through the flash kernel: f32 output, bf16 cotangents."""
    n, c, hw = 1, 8, 48
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32)).astype(
        jnp.bfloat16)
    a = jnp.asarray((rng.randn(n, hw, hw) * 3).astype(np.float32)).astype(
        jnp.bfloat16)
    got = psa_softmax_bmm_flash(x, a, 1.5, True, 16, 128)
    want = psa_softmax_bmm_reference(
        x.astype(jnp.float32), a.astype(jnp.float32), 1.5)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def fused(xx, aa):
        return psa_softmax_bmm_flash(xx, aa, 1.5, True, 16, 128)

    g = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    _, vjp_f = jax.vjp(fused, x, a)
    dx, da = vjp_f(g)
    assert dx.dtype == jnp.bfloat16 and da.dtype == jnp.bfloat16

    def ref(xx, aa):
        return psa_softmax_bmm_reference(
            xx.astype(jnp.float32), aa.astype(jnp.float32), 1.5)

    _, vjp_r = jax.vjp(ref, x, a)
    dx_r, da_r = vjp_r(g)
    np.testing.assert_allclose(
        np.asarray(dx, dtype=np.float32), np.asarray(dx_r, dtype=np.float32),
        rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(da, dtype=np.float32), np.asarray(da_r, dtype=np.float32),
        rtol=1e-2, atol=1e-2)


def test_flash_matches_resident_kernel(rng):
    """The two fused kernels agree with each other (same contract)."""
    n, c, hw = 1, 16, 52
    x = jnp.asarray(rng.randn(n, c, hw).astype(np.float32))
    a = jnp.asarray((rng.randn(n, hw, hw) * 3).astype(np.float32))
    flash = psa_softmax_bmm_flash(x, a, 1.0, True, 16, 128)
    resident = psa_softmax_bmm(x, a, 1.0, 32, True)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(resident),
                               rtol=1e-5, atol=1e-6)


def test_auto_dispatch_picks_by_vmem_model():
    from semseg_tpu.ops.psa_pallas import select_psa_kernel, vmem_budget

    assert select_psa_kernel(512, 900, 2) == "resident"
    assert select_psa_kernel(512, 2025, 4) == "resident"
    assert select_psa_kernel(512, 7921, 2) == "flash"
    assert select_psa_kernel(512, 7921, 4) == "flash"
    assert vmem_budget() == 16 * 2 ** 20
