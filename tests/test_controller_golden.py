"""Golden-trace tests pinning the controller schedules to hand-computed
mask trajectories (VERDICT round-1 weak #7: invariant tests alone would let
schedule-math regressions pass).

References: LinearController (progressive_controller.py:95-132),
LinearControllerEarly (:135-157), AdaptiveController (:394-458).
"""

import jax.numpy as jnp
import numpy as np

from sin_inn_tpu.models import controllers as C


def LCFG(eps=0.0):
    # encoding_dim 12, block_size 4 => 2 blocks; block_iterations 6
    return C.LinearConfig(encoding_dim=12, block_size=4, num_blocks=2,
                          block_iterations=6, progress_iterations=12,
                          epsilon=eps)


def blocks(*vals):
    """Mask of 3 blocks of 4 channels with the given values."""
    return np.repeat(np.asarray(vals, np.float32), 4)


def test_linear_controller_golden_trace():
    cfg = LCFG()
    s = C.linear_init(cfg)
    np.testing.assert_allclose(np.asarray(s.mask), blocks(1, 0, 0))

    expect = {
        # it -> (mask after update, cur_block, next_block)
        1: (blocks(1, 1 / 3, 0), 4, 8),
        2: (blocks(1, 2 / 3, 0), 4, 8),
        3: (blocks(1, 1, 0), 4, 8),
        4: (blocks(1, 1, 0), 4, 8),       # alpha clamps at 1
        5: (blocks(1, 1, 0), 4, 8),
        6: (blocks(1, 1, 0), 8, 12),      # boundary: block set, pointers move
        7: (blocks(1, 1, 1 / 3), 8, 12),
        9: (blocks(1, 1, 1), 8, 12),
        12: (blocks(1, 1, 1), 12, 12),    # final boundary
        13: (blocks(1, 1, 1), 12, 12),    # frozen past schedule
    }
    for it in range(1, 14):
        s = C.linear_update(cfg, s, jnp.asarray(1.0))
        if it in expect:
            m, cur, nxt = expect[it]
            np.testing.assert_allclose(np.asarray(s.mask), m, atol=1e-6,
                                       err_msg=f"mask at it={it}")
            assert int(s.cur_block) == cur, f"cur_block at it={it}"
            assert int(s.next_block) == nxt, f"next_block at it={it}"


def test_linear_early_freezes_below_epsilon():
    """LinearControllerEarly (:148-151): once best loss < epsilon the mask
    never advances."""
    cfg = LCFG(eps=1e-3)
    s = C.linear_init(cfg)
    for _ in range(10):
        s = C.linear_update(cfg, s, jnp.asarray(1e-4))
    np.testing.assert_allclose(np.asarray(s.mask), blocks(1, 0, 0))
    assert int(s.cur_block) == 4

    # and with loss above epsilon it ramps exactly like the plain controller
    s2 = C.linear_init(cfg)
    for _ in range(3):
        s2 = C.linear_update(cfg, s2, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(s2.mask), blocks(1, 1, 0), atol=1e-6)


def test_adaptive_controller_golden_trace():
    """Constant (flat) loss: STABILIZING for block_iterations steps ->
    WAITING -> zero slope triggers INCREASING -> ramp 1/4, 2/4, 3/4 ->
    block set + pointers advance (progressive_controller.py:405-448)."""
    cfg = C.AdaptiveConfig(encoding_dim=12, block_size=4, num_blocks=2,
                           block_iterations=4, max_iteration=64)
    s = C.adaptive_init(cfg)
    np.testing.assert_allclose(np.asarray(s.mask), blocks(1, 0, 0))
    assert int(s.status) == cfg.STABILIZING

    trace = {}
    for it in range(1, 11):
        s = C.adaptive_update(cfg, s, jnp.asarray(1.0))
        trace[it] = (np.asarray(s.mask).copy(), int(s.status),
                     int(s.cur_block))

    # stabilizing phase: mask untouched
    for it in range(1, 5):
        np.testing.assert_allclose(trace[it][0], blocks(1, 0, 0))
        assert trace[it][1] == cfg.STABILIZING
    # in_iteration hits block_iterations -> WAITING
    assert trace[5][1] == cfg.WAITING
    # flat loss => slope 0 > -grad_epsilon => INCREASING; alpha starts at 0
    assert trace[6][1] == cfg.INCREASING
    np.testing.assert_allclose(trace[6][0], blocks(1, 0, 0))
    # ramp of the second block at 1/4 per step
    np.testing.assert_allclose(trace[7][0], blocks(1, 0.25, 0), atol=1e-6)
    np.testing.assert_allclose(trace[8][0], blocks(1, 0.5, 0), atol=1e-6)
    np.testing.assert_allclose(trace[9][0], blocks(1, 0.75, 0), atol=1e-6)
    # increasing phase completes: block snaps to 1, pointers advance
    np.testing.assert_allclose(trace[10][0], blocks(1, 1, 0), atol=1e-6)
    assert trace[10][1] == cfg.STABILIZING
    assert trace[10][2] == 8


def test_adaptive_low_loss_never_triggers():
    """epsilon guard (:416): loss below epsilon while WAITING never starts
    an INCREASING phase."""
    cfg = C.AdaptiveConfig(encoding_dim=12, block_size=4, num_blocks=2,
                           block_iterations=4, max_iteration=64)
    s = C.adaptive_init(cfg)
    for _ in range(20):
        s = C.adaptive_update(cfg, s, jnp.asarray(1e-7))
    np.testing.assert_allclose(np.asarray(s.mask), blocks(1, 0, 0))
    assert int(s.status) == cfg.WAITING
