"""Scene-space multi-view gather: reproject, frustum-filter, bilateral merge.

TPU-native re-design of /root/reference/scene-space/gather_3d.py (notebook
code): the per-frame Python loops (gather_3d.py:106-108, :145-149) become
vmapped gathers over the frame axis, and the whole pipeline is jittable.
Pipeline (per reference cell order):

  1. per-pixel patch-frustum corners of the reference frame (8 homogeneous
     points at near/far, gather_3d.py:27-58);
  2. lift to scene space, project into all N views (:69-78);
  3. bounding-box candidate gather around the projections (:81-100) — the
     box size is computed host-side so shapes stay static under jit;
  4. depth-lift candidates to 3D (:103-115);
  5. frustum-plane filtering with the 4 side-plane normals (:122-140);
  6. joint bilateral weighting over (rgb, xyz, t) with diagonal sigma and a
     masked weighted average (:144-158).

Note (documented divergence): the reference projects ``scene_pts[..., 4:]``
for both the near and far candidate sets (gather_3d.py:71-72) — the intended
near-set projection of ``[..., :4]`` is used here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def unpack_matrices(poses: np.ndarray):
    """(N, 3, 5|6) poses -> (K, K_inv, c2w, w2c) (gather_3d.py:16-25).

    6-column poses carry COLMAP's TRUE principal point in column 5, rows
    [cx, cy, k] (the layout reference pose_utils.py:97-102,125 writes).
    Camera coordinates here are (y, x, 1, 1/z) — see pack_frustum_corners —
    so K[0,2] (the row-0 offset) is **cy** and K[1,2] is **cx**. Documented
    divergence: the reference notebook assigns them unswapped
    (gather_3d.py:20-21), which misplaces the center whenever cx != cy; the
    intended geometry is used here. Legacy 5-column poses fall back to the
    image-center approximation (h/2, w/2).
    """
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = poses[0, 2, 4]
    K[1, 1] = poses[0, 2, 4]
    if poses.shape[-1] >= 6:
        K[0, 2] = poses[0, 1, 5]        # cy — the y/row offset
        K[1, 2] = poses[0, 0, 5]        # cx — the x/col offset
    else:
        K[0, 2] = poses[0, 0, 4] / 2.0  # h/2
        K[1, 2] = poses[0, 1, 4] / 2.0  # w/2
    c2w = np.zeros((poses.shape[0], 4, 4), dtype=np.float32)
    c2w[:, :3, :] = poses[..., :4]
    c2w[:, 3, 3] = 1.0
    return K, np.linalg.inv(K), c2w, np.linalg.inv(c2w)


def pack_frustum_corners(h: int, w: int, near: float, far: float,
                         l: int = 3) -> jnp.ndarray:
    """(h, w, 8, 4) per-pixel patch-frustum corners, coords (y, x, 1, 1/z)
    (gather_3d.py:27-58)."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    y0 = jnp.maximum(yy - l // 2, 0)
    y1 = jnp.minimum(yy + l // 2, h - 1)
    x0 = jnp.maximum(xx - l // 2, 0)
    x1 = jnp.minimum(xx + l // 2, w - 1)
    ones = jnp.ones_like(yy)
    corners = []
    for inv_z in (1.0 / near, 1.0 / far):
        for cy, cx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1)):
            corners.append(jnp.stack([cy, cx, ones, ones * inv_z], -1))
    return jnp.stack(corners, axis=-2)  # (h, w, 8, 4)


def _project(mat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(4,4) @ (..., 4) -> (..., 4)."""
    return jnp.einsum("ij,...j->...i", mat, pts)


def project_bounding_boxes(poses: np.ndarray, bds: np.ndarray, h: int,
                           w: int, patch: int = 3,
                           ref_frame: int = 0) -> jnp.ndarray:
    """2-D (depth-free) candidate bounding boxes — the live portion of the
    reference's 2D variant (gather_2d_torch.py:16-118).

    Unlike :func:`gather_scene` (the 3D path, gather_3d.py), no per-candidate
    depth is used: the reference-frame patch-frustum corners are lifted with
    their homogeneous 1/z coordinate only (gather_2d_torch.py:48-49),
    projected into every view (:95-96), rounded and clamped (:96-98), and
    reduced to per-pixel (y_min, x_min, y_max, x_max) boxes (:101-104). The
    rest of the reference file is commented-out WIP; its intended candidate
    gather over these boxes is exactly ``gather_scene``'s candidate-grid step
    (gather.py steps 3-6), which is why the full 2D pipeline is subsumed by
    the 3D path (see tests/test_scene_space.py::test_2d_boxes_*).

    Returns (N, h, w, 4) float boxes.
    """
    K, K_inv, c2w, w2c = unpack_matrices(poses)
    near, far = float(bds.min()), float(bds.max())
    corners = pack_frustum_corners(h, w, near, far, patch)      # (h,w,8,4)

    # lift via c2w @ K_inv, keeping homogeneous coords (no near/far scaling
    # — gather_2d_torch.py:48-49, the 2D variant's defining difference)
    c2wK = jnp.asarray(c2w[ref_frame] @ K_inv)
    scene = _project(c2wK, corners)                             # (h,w,8,4)

    Kw2c = jnp.asarray(K[None] @ w2c)                           # (N,4,4)
    cam = jax.vmap(lambda M: _project(M, scene))(Kw2c)          # (N,h,w,8,4)
    cam = cam / cam[..., 2:3]
    cy = jnp.clip(jnp.round(cam[..., 0]), 0, h - 1)
    cx = jnp.clip(jnp.round(cam[..., 1]), 0, w - 1)
    return jnp.stack([cy.min(-1), cx.min(-1), cy.max(-1), cx.max(-1)], -1)


def gather_scene(imgs: jnp.ndarray, depths: jnp.ndarray, poses: np.ndarray,
                 bds: np.ndarray, patch: int = 3,
                 sigma: Tuple[float, ...] = (40, 40, 40, 10, 10, 10, 6),
                 ref_frame: int = 0) -> jnp.ndarray:
    """Denoise ``ref_frame`` by gathering across all views.

    imgs: (N, h, w, 3) float; depths: (N, h, w); poses: (N, 3, 5);
    bds: (N, 2) depth bounds. Returns (h, w, 3).
    """
    K, K_inv, c2w, w2c = unpack_matrices(poses)
    near, far = float(bds.min()), float(bds.max())
    n_frames, h, w = depths.shape

    cam_pts = pack_frustum_corners(h, w, near, far, patch)     # (h,w,8,4)

    # reference-frame frustum corners in scene space (gather_3d.py:69-70)
    c2wK = jnp.asarray(c2w[ref_frame] @ K_inv)
    scene_near = near * _project(c2wK, cam_pts[..., :4, :])
    scene_far = far * _project(c2wK, cam_pts[..., 4:, :])
    scene_pts = jnp.concatenate([scene_near, scene_far], axis=-2)  # (h,w,8,4)

    # project into every view (intended :71-72; see module docstring)
    Kw2c = jnp.asarray(K[None] @ w2c)                           # (N,4,4)
    cam_in = jax.vmap(lambda M: _project(M, scene_pts))(Kw2c)   # (N,h,w,8,4)
    cam_in = cam_in / cam_in[..., 2:3]
    ci_y = jnp.clip(jnp.round(cam_in[..., 0]), 0, h - 1)
    ci_x = jnp.clip(jnp.round(cam_in[..., 1]), 0, w - 1)

    # candidate boxes around the 8 projections (:96-99), fixed sample grid
    y_min = ci_y.min(-1)
    x_min = ci_x.min(-1)
    y_max = ci_y.max(-1)
    x_max = ci_x.max(-1)
    m = patch  # static candidate-grid side (box clipped to patch x patch)
    gy, gx = jnp.meshgrid(jnp.arange(m, dtype=jnp.float32),
                          jnp.arange(m, dtype=jnp.float32), indexing="ij")

    # frustum side planes from the reference frame (:122-129)
    sp = scene_pts[..., :3]
    normal1 = jnp.cross(sp[..., 2, :] - sp[..., 0, :], sp[..., 4, :] - sp[..., 0, :])
    offset1 = -jnp.sum(normal1 * sp[..., 0, :], -1)
    normal2 = jnp.cross(sp[..., 3, :] - sp[..., 1, :], sp[..., 5, :] - sp[..., 1, :])
    offset2 = -jnp.sum(normal2 * sp[..., 1, :], -1)
    normal3 = jnp.cross(sp[..., 1, :] - sp[..., 0, :], sp[..., 5, :] - sp[..., 0, :])
    offset3 = -jnp.sum(normal3 * sp[..., 0, :], -1)
    normal4 = jnp.cross(sp[..., 3, :] - sp[..., 2, :], sp[..., 6, :] - sp[..., 2, :])
    offset4 = -jnp.sum(normal4 * sp[..., 2, :], -1)

    c2wK_all = jnp.asarray(c2w @ K_inv[None])                   # (N,4,4)
    sigma_inv2 = jnp.asarray(1.0 / np.asarray(sigma, np.float32)) ** 2

    def frame_candidates(img_f, depth_f, ymin_f, xmin_f, ymax_f, xmax_f,
                         c2wK_f):
        """One frame's candidate gather/lift/filter -> (h,w,mm) pieces."""
        cand_y = ymin_f[..., None, None] + gy                   # (h,w,m,m)
        cand_x = xmin_f[..., None, None] + gx
        in_box = (cand_y <= ymax_f[..., None, None] + 1e-6) & \
                 (cand_x <= xmax_f[..., None, None] + 1e-6) & \
                 (cand_y <= h - 1) & (cand_x <= w - 1)
        cand_y = jnp.clip(cand_y, 0, h - 1).reshape(h, w, m * m)
        cand_x = jnp.clip(cand_x, 0, w - 1).reshape(h, w, m * m)
        valid = in_box.reshape(h, w, m * m)
        # ONE anchor gather instead of m*m scattered per-candidate gathers:
        # the candidate grid is a contiguous m x m patch at integer anchor
        # (ymin, xmin), so stack the m*m shifted copies of the (rgb, depth)
        # planes on channels and gather 4*m*m channels at the anchor. TPU
        # gathers serialize per indexed POINT (CLAUDE.md resample2d record),
        # so cutting points m*m-fold dominates the extra stack build. Taps
        # past the image edge read pad ZEROS here where the old form read
        # edge-clamped values — both are masked invalid by `in_box`'s
        # cand <= h-1 / w-1 terms, so the output is unchanged.
        pad = m - 1
        planes = jnp.concatenate([img_f, depth_f[..., None]], -1)
        planes = jnp.pad(planes, ((0, pad), (0, pad), (0, 0)))
        stack = jnp.concatenate([planes[a:a + h, b:b + w]
                                 for a in range(m)
                                 for b in range(m)], -1)        # (h,w,mm*4)
        ay = jnp.clip(ymin_f, 0, h - 1).astype(jnp.int32)
        ax = jnp.clip(xmin_f, 0, w - 1).astype(jnp.int32)
        g = stack[ay, ax].reshape(h, w, m * m, 4)
        rgb = g[..., :3]                                        # (h,w,mm,3)
        d = g[..., 3]                                           # (h,w,mm)
        valid = valid & (d > 0)
        homog = jnp.stack([cand_y * d, cand_x * d, d,
                           jnp.ones_like(d)], -1)
        sc = _project(c2wK_f, homog)[..., :3]                   # (h,w,mm,3)
        side = lambda nrm, off: (jnp.sum(sc * nrm[:, :, None, :], -1)
                                 + off[:, :, None])
        outside = ((side(normal1, offset1) * side(normal2, offset2) >= 0)
                   | (side(normal3, offset3) * side(normal4, offset4) >= 0))
        return rgb, sc, valid & ~outside

    # reference features: frame-0 pixel rgb + its center candidate xyz, t=0.
    # Only the CENTER candidate's scene point is needed, so compute it
    # directly (one 1-channel gather) instead of running frame_candidates
    # standalone — the scan below re-runs the ref frame anyway, and XLA does
    # not CSE across the scan-body boundary (a full duplicate frame's
    # gather/lift/filter, ~1/N of the hot path). Bit-identical to
    # frame_candidates' candidate n_samp//2: same (gy, gx) offset via
    # divmod (== (m//2, m//2) only for odd m), same clipped homog coords,
    # and the depth read reproduces the zero-padded stack (an out-of-range
    # tap reads d = 0, giving the same degenerate-but-deterministic xyz the
    # old path produced at border pixels — NOT the clamped edge depth).
    dy0, dx0 = divmod((m * m) // 2, m)
    ay0 = jnp.clip(y_min[ref_frame], 0, h - 1).astype(jnp.int32)  # (h,w)
    ax0 = jnp.clip(x_min[ref_frame], 0, w - 1).astype(jnp.int32)
    in_pad = (ay0 + dy0 <= h - 1) & (ax0 + dx0 <= w - 1)
    d0 = jnp.where(in_pad,
                   depths[ref_frame][jnp.minimum(ay0 + dy0, h - 1),
                                     jnp.minimum(ax0 + dx0, w - 1)], 0.0)
    cy0 = jnp.clip(y_min[ref_frame] + dy0, 0, h - 1)
    cx0 = jnp.clip(x_min[ref_frame] + dx0, 0, w - 1)
    homog0 = jnp.stack([cy0 * d0, cx0 * d0, d0, jnp.ones_like(d0)], -1)
    sc0_center = _project(c2wK_all[ref_frame], homog0)[..., :3]  # (h,w,3)
    ref = jnp.concatenate([imgs[ref_frame], sc0_center,
                           jnp.zeros((h, w, 1))], axis=-1)      # (h,w,7)

    # accumulate over frames with lax.scan: the frame axis is a pure sum
    # reduction, so peak memory is ONE frame's candidate set instead of the
    # reference notebook's all-frames materialization (gather_3d.py:145-149
    # loops in Python for the same reason) — this is what lets the gather
    # run at real scene sizes (N >= 20 dense frames) in 16 GB HBM
    def step(acc, inp):
        t, img_f, depth_f, ymin_f, xmin_f, ymax_f, xmax_f, c2wK_f = inp
        rgb, sc, valid = frame_candidates(img_f, depth_f, ymin_f, xmin_f,
                                          ymax_f, xmax_f, c2wK_f)
        feats = jnp.concatenate(
            [rgb, sc, jnp.broadcast_to(t, rgb.shape[:3])[..., None]], -1)
        diff2 = (ref[:, :, None, :] - feats) ** 2
        weights = jnp.exp(-0.5 * jnp.sum(diff2 * sigma_inv2, -1))
        weights = weights * valid.astype(weights.dtype)         # (h,w,mm)
        wsum, rgb_accum = acc
        return (wsum + weights.sum(-1),
                rgb_accum + jnp.sum(weights[..., None] * rgb, -2)), None

    ts = jnp.arange(n_frames, dtype=jnp.float32)
    (wsum, rgb_accum), _ = jax.lax.scan(
        step, (jnp.zeros((h, w)), jnp.zeros((h, w, 3))),
        (ts, imgs, depths, y_min, x_min, y_max, x_max, c2wK_all))
    out = jnp.where(wsum[..., None] > 1e-8,
                    rgb_accum / jnp.maximum(wsum[..., None], 1e-8),
                    imgs[ref_frame])
    return out
