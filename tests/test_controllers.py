"""Progressive-controller state-machine tests (pure pytree transitions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.models import controllers as C
from sin_inn_tpu.models.inr import build_inr


def make_spec(key):
    cfg = FlowConfig(num_frequencies=8, hidden_dim=16, num_layers=2)
    spec, _, _ = build_inr(key, "PFF", cfg)
    return spec


def test_linear_controller_ramps_and_completes(key):
    spec = make_spec(key)
    cfg = C.LinearConfig.create(spec, max_iteration=80)
    state = C.linear_init(cfg)
    m0 = float(state.mask.sum())
    assert m0 == cfg.block_size

    big_loss = jnp.asarray(1.0)
    update = jax.jit(lambda s: C.linear_update(cfg, s, big_loss))
    masses = [m0]
    for _ in range(cfg.progress_iterations + cfg.block_iterations):
        state = update(state)
        masses.append(float(state.mask.sum()))
    # monotone unlock up to the full encoding
    assert all(b >= a - 1e-5 for a, b in zip(masses, masses[1:]))
    assert masses[-1] == pytest.approx(cfg.encoding_dim)


def test_linear_early_freezes_on_low_loss(key):
    spec = make_spec(key)
    cfg = C.LinearConfig.create(spec, max_iteration=100, epsilon=1e-3)
    state = C.linear_init(cfg)
    tiny_loss = jnp.asarray(1e-6)
    state = C.linear_update(cfg, state, tiny_loss)
    frozen_mask = np.asarray(state.mask)
    for _ in range(20):
        state = C.linear_update(cfg, state, tiny_loss)
    np.testing.assert_array_equal(np.asarray(state.mask), frozen_mask)


def test_linear_state_is_jit_compatible(key):
    spec = make_spec(key)
    cfg = C.LinearConfig.create(spec, max_iteration=40)
    state = C.linear_init(cfg)

    @jax.jit
    def run(s, loss):
        return C.linear_update(cfg, s, loss)

    s2 = run(state, jnp.asarray(0.5))
    assert int(s2.iteration) == 1


def make_spatial(key, res=4):
    spec = make_spec(key)
    cfg = C.SpatialConfig.create(spec, res=res, block_iterations=5,
                                 epsilon=1e-3, mask_dim=3)
    return spec, cfg, C.spatial_init(cfg)


def test_spatial_point_mask_shapes(key, rng):
    spec, cfg, state = make_spatial(key)
    pts = jnp.asarray(rng.rand(11, 3).astype(np.float32) * 2 - 1)
    mask, inds, alphas = C.spatial_point_mask(cfg, state, pts)
    assert mask.shape == (11, cfg.encoding_dim)
    assert inds.shape == (11, 8)
    assert alphas.shape == (11, 8)
    # multilinear weights sum to 1
    np.testing.assert_allclose(np.asarray(alphas).sum(1), 1.0, atol=1e-4)
    assert int(inds.max()) < cfg.cells


def test_spatial_progress_gates_low_loss_cells(key, rng):
    spec, cfg, state = make_spatial(key)
    pts = jnp.asarray(rng.rand(256, 3).astype(np.float32) * 2 - 1)
    _, inds, alphas = C.spatial_point_mask(cfg, state, pts)
    # everything converged: tiny per-point loss -> all cells leave progress
    tiny = jnp.full((256,), 1e-8)
    for _ in range(cfg.block_iterations):
        state = C.spatial_update(cfg, state, tiny, inds, alphas)
    assert not bool(np.asarray(state.in_progress).any())
    # once out of progress, mask stops growing
    frozen = np.asarray(state.mask).sum()
    for _ in range(cfg.block_iterations):
        state = C.spatial_update(cfg, state, tiny, inds, alphas)
    assert np.asarray(state.mask).sum() == pytest.approx(frozen)


def test_spatial_progress_advances_high_loss_cells(key, rng):
    spec, cfg, state = make_spatial(key)
    pts = jnp.asarray(rng.rand(512, 3).astype(np.float32) * 2 - 1)
    _, inds, alphas = C.spatial_point_mask(cfg, state, pts)
    big = jnp.full((512,), 10.0)
    m0 = float(np.asarray(state.mask).sum())
    update = jax.jit(lambda s, l: C.spatial_update(cfg, s, l, inds, alphas))
    for _ in range(cfg.block_iterations + 1):
        state = update(state, big)
    assert bool(np.asarray(state.in_progress).all())
    assert float(np.asarray(state.mask).sum()) > m0
    assert int(state.cur_block) > cfg.block_size


def test_adaptive_controller_state_machine(key):
    spec = make_spec(key)
    cfg = C.AdaptiveConfig.create(spec, max_iteration=200)
    state = C.adaptive_init(cfg)
    update = jax.jit(lambda s, l: C.adaptive_update(cfg, s, l))
    # constant (non-decreasing) loss: slope ~0 > -grad_eps -> controller
    # should eventually trigger Increasing and unlock blocks
    m0 = float(np.asarray(state.mask).sum())
    for i in range(3 * cfg.block_iterations + 4):
        state = update(state, jnp.asarray(1.0))
    assert float(np.asarray(state.mask).sum()) > m0
    assert int(state.iteration) == 3 * cfg.block_iterations + 4


def test_fixed_spatial_gates_per_sample(key):
    spec = make_spec(key)
    n = 16  # 4x4 grid, domain_dim 2 path exercised via mask blur
    cfg = C.FixedSpatialConfig.create(spec, num_samples=n, max_iteration=40,
                                      epsilon=1e-3)
    state = C.fixed_spatial_init(cfg)
    # half the samples have converged (tiny loss), half still learning
    loss = jnp.concatenate([jnp.full((n // 2,), 1e-8),
                            jnp.full((n // 2,), 1.0)])
    update = jax.jit(lambda s, l: C.fixed_spatial_update(cfg, s, l))
    for _ in range(cfg.buffer_size + 1):
        state = update(state, loss)
    prog = np.asarray(state.in_progress)
    assert not prog[0]          # converged sample left progress
    assert prog[-1]             # high-loss sample still in progress
    mask = np.asarray(C.fixed_spatial_mask(cfg, state))
    assert mask.shape == (n, cfg.encoding_dim)


def test_spatial_grid_paths_match_point_paths(key):
    """The separable grid fast paths (spatial_grid_mask/update) must equal
    the generic per-point gather/scatter paths on a dense pose grid."""
    import numpy as np

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.models.inr import build_inr
    from sin_inn_tpu.train.flow import pose_grid

    cfg_f = FlowConfig(net="PFF", num_frequencies=6, hidden_dim=8,
                       num_layers=2, spatially_adaptive=True)
    spec, _, _ = build_inr(key, "PFF", cfg_f)
    cfg = C.SpatialConfig.create(spec, res=5, block_iterations=4)
    state = C.spatial_init(cfg)
    # make the mask non-trivial so interpolation is exercised
    state = state._replace(mask=state.mask.at[:, :].set(
        jnp.linspace(0, 1, cfg.cells)[:, None]
        * jnp.linspace(1, 0.5, cfg.encoding_dim)[None, :]))

    b, h, w = 2, 7, 9
    times = jnp.linspace(-1, 1, b)
    pts = pose_grid(times, h, w).reshape(-1, 3)

    m_pt, inds, alphas = C.spatial_point_mask(cfg, state, pts)
    m_grid = C.spatial_grid_mask(cfg, state, times, h, w)
    np.testing.assert_allclose(np.asarray(m_grid), np.asarray(m_pt),
                               atol=1e-5)

    pl = jnp.asarray(np.random.RandomState(0).rand(b * h * w)
                     .astype(np.float32))
    s_pt = C.spatial_update(cfg, state, pl, inds, alphas)
    s_grid = C.spatial_grid_update(cfg, state, pl, times, h, w)
    for a, bb in zip(s_pt, s_grid):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)
