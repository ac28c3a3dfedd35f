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


def _supports_host_callbacks() -> bool:
    """jax.debug.print lowers to PJRT host send/recv callbacks, which the
    axon relay backend (this environment's tunneled TPU) does not implement
    — a program containing one fails with UNIMPLEMENTED at compile time.
    The drift guard below degrades to silent on that backend (the CPU test
    suite keeps exercising the loud path). The plugin registers its devices
    as plain 'tpu', so detection goes through the PJRT platform_version
    string (".. axon 0.1.0; ..") with the configured-platforms list as the
    no-device fallback."""
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = str(getattr(jax.config, "jax_platforms", "") or "")
    return "axon" not in version.lower()


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


def _project(mat: jnp.ndarray, pts: jnp.ndarray,
             precision=None) -> jnp.ndarray:
    """(4,4) @ (..., 4) -> (..., 4)."""
    return jnp.einsum("ij,...j->...i", mat, pts, precision=precision)


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


# Mirror-vs-graph anchor slack, px each side. gather_scene runs its box
# projections at Precision.HIGHEST (true f32), so in-graph anchors differ
# from this mirror's numpy f32 by accumulation-order ulps at most — a
# round() flip at an exact .5 boundary is the worst case, and 3 px covers
# several simultaneous flips. (With default-precision bf16-pass projections
# the drift would scale ~4e-3 * |coord| — px-level at 1080p — which is why
# the HIGHEST pin in gather_scene is load-bearing for this constant.)
_WINDOW_MARGIN = 3


def _host_window_geometry(poses: np.ndarray, bds: np.ndarray, h: int, w: int,
                          patch: int, ref_frame: int, row_chunk: int,
                          col_chunk: int, force: bool):
    """Static window geometry for the windowed candidate read, or None.

    Numpy mirror of gather_scene's in-graph box math (pose-only inputs, so it
    runs host-side at trace time): per-(row_chunk x col_chunk)-block spreads
    of the clipped candidate anchors (y_min, x_min). The anchors are a clip
    of a function that is continuous in the pixel index, so the per-block
    spread stays ~(chunk + true depth/parallax deviation) even at frame
    borders where the PER-FRAME spread blows up to |mean shift| (the clip
    pins anchors to 0 there). The in-graph per-block bases are exact mins;
    only the static window SIZES come from this mirror, and the in-graph
    projections run at HIGHEST precision so the residual drift is ulp-level
    — absorbed by ``_WINDOW_MARGIN`` on each side. Keep this function in
    lock-step with gather_scene's box math (both cite gather_3d.py:69-99).
    """
    m = patch
    if h < row_chunk or w < col_chunk:
        return None
    K, K_inv, c2w, w2c = unpack_matrices(poses)
    near, far = float(bds.min()), float(bds.max())
    n = poses.shape[0]
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    y0 = np.maximum(yy - m // 2, 0)
    y1 = np.minimum(yy + m // 2, h - 1)
    x0 = np.maximum(xx - m // 2, 0)
    x1 = np.minimum(xx + m // 2, w - 1)
    ones = np.ones_like(yy)
    corners = np.stack([np.stack([cy, cx, ones, iz * ones], -1)
                        for iz in (1.0 / near, 1.0 / far)
                        for (cy, cx) in ((y0, x0), (y0, x1),
                                         (y1, x0), (y1, x1))],
                       -2).astype(np.float32)                   # (h,w,8,4)
    c2wK = (c2w[ref_frame] @ K_inv).astype(np.float32)
    scene = np.concatenate([near * (corners[..., :4, :] @ c2wK.T),
                            far * (corners[..., 4:, :] @ c2wK.T)], -2)
    ay = np.empty((n, h, w), np.float32)
    ax = np.empty((n, h, w), np.float32)
    for f in range(n):          # frame loop bounds host memory to (h,w,8,4)
        cam = scene @ (K @ w2c[f]).T.astype(np.float32)
        cam = cam / cam[..., 2:3]
        ay[f] = np.clip(np.round(cam[..., 0]), 0, h - 1).min(-1)
        ax[f] = np.clip(np.round(cam[..., 1]), 0, w - 1).min(-1)

    h_pad = (h + row_chunk - 1) // row_chunk * row_chunk
    w_pad = (w + col_chunk - 1) // col_chunk * col_chunk
    ay = np.pad(ay, ((0, 0), (0, h_pad - h), (0, w_pad - w)), mode="edge")
    ax = np.pad(ax, ((0, 0), (0, h_pad - h), (0, w_pad - w)), mode="edge")
    sr, sc = h_pad // row_chunk, w_pad // col_chunk
    ayb = ay.reshape(n, sr, row_chunk, sc, col_chunk)
    axb = ax.reshape(n, sr, row_chunk, sc, col_chunk)
    spread_y = int((ayb.max((2, 4)) - ayb.min((2, 4))).max())
    spread_x = int((axb.max((2, 4)) - axb.min((2, 4))).max())

    k0 = spread_y + 1 + 2 * _WINDOW_MARGIN
    kx0 = spread_x + 1 + 2 * _WINDOW_MARGIN
    kw_, kxw = k0 + m - 1, kx0 + m - 1
    # (kxw > w is normal — absolute column anchors track the pixel index at
    # slope 1, so KX0 ~ col_chunk + deviation; the saving is in the rows.
    # A window larger than the frame is merely a non-saving, which the
    # cost model below prices in.)
    geo = {"row_chunk": row_chunk, "col_chunk": col_chunk,
           "h_pad": h_pad, "w_pad": w_pad,
           "K0": k0, "KW": kw_, "KX0": kx0, "KXW": kxw}
    if force:
        return geo
    # engage only when the padded-FLOP cost model beats the measured
    # serialized-gather cost (~12.5 ns/point on v5e, CLAUDE.md; padded dims
    # per the MXU's 128-lane tiling; 40 TFLOP/s effective is conservative
    # for the one-hot contractions, PERF.md windowed-op record)
    pad128 = lambda v: (v + 127) // 128 * 128
    flops_per_point = 2.0 * pad128(kx0) * pad128(kw_ * m * 4)
    windowed_s = flops_per_point * n * h_pad * w_pad / 40e12
    gather_s = 12.5e-9 * n * h * w
    return geo if windowed_s < gather_s else None


def _windowed_candidate_read(planes_pad: jnp.ndarray, ay: jnp.ndarray,
                             ax: jnp.ndarray, by: jnp.ndarray,
                             bx: jnp.ndarray, geo: dict, m: int,
                             h: int, w: int) -> jnp.ndarray:
    """All m*m candidate taps of one frame as windowed one-hot MXU matmuls.

    The TPU-native answer to the serialized anchor gather (the same
    gather-pathology record as ops/warp.py resample2d): per
    (row_chunk x col_chunk) block of output pixels, one dynamic_slice pulls
    the (KW, KXW, 4) source window at the block's exact anchor minimum, a
    column one-hot contracts it against an m-column-shifted window stack
    (one (P, KX0) @ (KX0, KW*m*4) matmul), and a shifted row one-hot
    reduction recovers all m*m taps — FLOPs scale with the per-block anchor
    DEVIATION, not the frame (the flow pipeline's local-window argument,
    ops/pallas/offsets.py). Selection via one-hot matmul is exact up to the
    MXU's bf16-pass rounding of the VALUES (f32-exact on CPU).

    planes_pad: (h+KW, w+KXW, 4) zero-padded [rgb|depth] planes; ay/ax:
    (h_pad, w_pad) integer-valued f32 anchors; by/bx: (steps,) int32
    per-block anchor minima. Returns (h, w, m*m, 4).
    """
    rc, cw = geo["row_chunk"], geo["col_chunk"]
    h_pad, w_pad = geo["h_pad"], geo["w_pad"]
    k0, kw_, kx0, kxw = geo["K0"], geo["KW"], geo["KX0"], geo["KXW"]
    sr, sc = h_pad // rc, w_pad // cw
    p = rc * cw
    dtype = planes_pad.dtype

    def to_chunks(a):
        a = a.reshape(sr, rc, sc, cw).transpose(0, 2, 1, 3)
        return a.reshape(sr * sc, p)

    ks = jnp.arange(k0, dtype=dtype)
    js = jnp.arange(kx0, dtype=dtype)

    def blk(_, inp):
        ayb, axb, byb, bxb = inp
        win = jax.lax.dynamic_slice(planes_pad, (byb, bxb, 0),
                                    (kw_, kxw, 4))
        # column one-hot x m-shifted window stack: tmp[p,k,b,:] =
        # win[k, (ax-bx)+b, :]
        cx1h = (axb[:, None] - bxb.astype(dtype) == js[None]).astype(dtype)
        rhs = jnp.stack([win[:, b:b + kx0, :] for b in range(m)], 1)
        rhs = rhs.transpose(2, 0, 1, 3).reshape(kx0, kw_ * m * 4)
        tmp = (cx1h @ rhs).reshape(p, kw_, m, 4)
        # shifted row one-hots: taps[p,a,b,:] = tmp[p, (ay-by)+a, b, :]
        ry1h = (ayb[:, None] - byb.astype(dtype) == ks[None]).astype(dtype)
        taps = jnp.stack([jnp.einsum("pk,pkbc->pbc", ry1h, tmp[:, a:a + k0])
                          for a in range(m)], 1)                # (P,m,m,4)
        return None, taps.reshape(p, m * m, 4)

    _, taps = jax.lax.scan(blk, None,
                           (to_chunks(ay), to_chunks(ax), by, bx))
    taps = taps.reshape(sr, sc, rc, cw, m * m, 4).transpose(0, 2, 1, 3, 4, 5)
    return taps.reshape(h_pad, w_pad, m * m, 4)[:h, :w]


def gather_scene(imgs: jnp.ndarray, depths: jnp.ndarray, poses: np.ndarray,
                 bds: np.ndarray, patch: int = 3,
                 sigma: Tuple[float, ...] = (40, 40, 40, 10, 10, 10, 6),
                 ref_frame: int = 0, window: str = "auto",
                 row_chunk: int = 32, col_chunk: int = 112,
                 _plane_filter: bool = True) -> jnp.ndarray:
    """Denoise ``ref_frame`` by gathering across all views.

    imgs: (N, h, w, 3) float; depths: (N, h, w); poses: (N, 3, 5);
    bds: (N, 2) depth bounds. Returns (h, w, 3).

    ``window``: 'auto' replaces the per-frame anchor gather with the
    windowed one-hot matmul read (:func:`_windowed_candidate_read`) when the
    host-side cost model says it wins (measured 129 -> 69 ms at the
    N=24 @ 480x640 bench scene); 'off' forces the exact gather; 'on' forces
    the windowed read (testing). Outputs agree to f32/bf16-pass rounding.

    ``row_chunk=32`` is the measured optimum at the bench scene (86.6 /
    72.8 / 69.1 / 76.6 ms at 8/16/32/64): smaller chunks cut the padded
    contraction but double the block-scan step count, larger ones grow K
    faster than they amortize. A bf16 compute mode was measured SLOWER
    (72.3 vs 69.1 — cast overhead beats the traffic saving, the splat-einsum
    record again) and NOT kept: value rounding also flips patch-frustum
    side-plane signs, which are near zero by construction.
    """
    K, K_inv, c2w, w2c = unpack_matrices(poses)
    near, far = float(bds.min()), float(bds.max())
    n_frames, h, w = depths.shape

    cam_pts = pack_frustum_corners(h, w, near, far, patch)     # (h,w,8,4)

    # reference-frame frustum corners in scene space (gather_3d.py:69-70).
    # The box projections run at HIGHEST precision (true f32): the windowed
    # read's static window sizes come from a numpy mirror of this math, so
    # the in-graph anchors must not drift by more than the _WINDOW_MARGIN
    # from the mirror's — a default-precision bf16 pass errs ~4e-3 * |coord|
    # (several px at 1080p scale), HIGHEST is ulp-level. The 4x4 dots are
    # ~2 GFLOP at bench scale — invisible next to the candidate math.
    prec = jax.lax.Precision.HIGHEST
    c2wK = jnp.asarray(c2w[ref_frame] @ K_inv)
    scene_near = near * _project(c2wK, cam_pts[..., :4, :], prec)
    scene_far = far * _project(c2wK, cam_pts[..., 4:, :], prec)
    scene_pts = jnp.concatenate([scene_near, scene_far], axis=-2)  # (h,w,8,4)

    # project into every view (intended :71-72; see module docstring)
    Kw2c = jnp.asarray(K[None] @ w2c)                           # (N,4,4)
    cam_in = jax.vmap(lambda M: _project(M, scene_pts, prec))(Kw2c)  # (N,h,w,8,4)
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

    def read_exact(img_f, depth_f, ymin_f, xmin_f):
        """ONE anchor gather instead of m*m scattered per-candidate gathers:
        the candidate grid is a contiguous m x m patch at integer anchor
        (ymin, xmin), so stack the m*m shifted copies of the (rgb, depth)
        planes on channels and gather 4*m*m channels at the anchor. TPU
        gathers serialize per indexed POINT (CLAUDE.md resample2d record),
        so cutting points m*m-fold dominates the extra stack build. Taps
        past the image edge read pad ZEROS here where the old form read
        edge-clamped values — both are masked invalid by `in_box`'s
        cand <= h-1 / w-1 terms, so the output is unchanged."""
        pad = m - 1
        planes = jnp.concatenate([img_f, depth_f[..., None]], -1)
        planes = jnp.pad(planes, ((0, pad), (0, pad), (0, 0)))
        stack = jnp.concatenate([planes[a:a + h, b:b + w]
                                 for a in range(m)
                                 for b in range(m)], -1)        # (h,w,mm*4)
        ay = jnp.clip(ymin_f, 0, h - 1).astype(jnp.int32)
        ax = jnp.clip(xmin_f, 0, w - 1).astype(jnp.int32)
        return stack[ay, ax].reshape(h, w, m * m, 4)

    def frame_candidates(g, ymin_f, xmin_f, ymax_f, xmax_f, c2wK_f):
        """One frame's candidate lift/filter from the read taps ``g``
        (h, w, mm, 4) -> (h,w,mm) pieces."""
        cand_y = ymin_f[..., None, None] + gy                   # (h,w,m,m)
        cand_x = xmin_f[..., None, None] + gx
        in_box = (cand_y <= ymax_f[..., None, None] + 1e-6) & \
                 (cand_x <= xmax_f[..., None, None] + 1e-6) & \
                 (cand_y <= h - 1) & (cand_x <= w - 1)
        cand_y = jnp.clip(cand_y, 0, h - 1).reshape(h, w, m * m)
        cand_x = jnp.clip(cand_x, 0, w - 1).reshape(h, w, m * m)
        valid = in_box.reshape(h, w, m * m)
        rgb = g[..., :3]                                        # (h,w,mm,3)
        d = g[..., 3]                                           # (h,w,mm)
        valid = valid & (d > 0)
        homog = jnp.stack([cand_y * d, cand_x * d, d,
                           jnp.ones_like(d)], -1)
        sc = _project(c2wK_f, homog)[..., :3]                   # (h,w,mm,3)
        if not _plane_filter:
            # test-only escape hatch (tests/test_bench.py): the reference
            # frame's own patch-corner candidates lie exactly ON its frustum
            # side planes (the planes contain those corner rays at every
            # depth), so the >=0 sign test below is a knife-edge f32 tie
            # there — any independent reimplementation flips ~10% of
            # frame-0 taps. Cross-implementation parity is therefore pinned
            # with the filter off (exact) + the filter math compared
            # separately; production always filters.
            return rgb, sc, valid
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

    # static window geometry (host-side pose-only mirror); None = exact path
    if window not in ("auto", "on", "off"):
        raise ValueError(f"window must be auto|on|off, got {window!r}")
    geo = None
    if window in ("auto", "on"):
        geo = _host_window_geometry(poses, bds, h, w, patch, ref_frame,
                                    row_chunk, col_chunk,
                                    force=(window == "on"))
    if window == "on" and geo is None:
        raise ValueError("window='on' but the derived window does not fit "
                         f"the {h}x{w} frame")

    # accumulate over frames with lax.scan: the frame axis is a pure sum
    # reduction, so peak memory is ONE frame's candidate set instead of the
    # reference notebook's all-frames materialization (gather_3d.py:145-149
    # loops in Python for the same reason) — this is what lets the gather
    # run at real scene sizes (N >= 20 dense frames) in 16 GB HBM
    def step(acc, inp):
        if geo is None:
            t, img_f, depth_f, ymin_f, xmin_f, ymax_f, xmax_f, c2wK_f = inp
            g = read_exact(img_f, depth_f, ymin_f, xmin_f)
        else:
            (t, img_f, depth_f, by_f, bx_f,
             ymin_f, xmin_f, ymax_f, xmax_f, c2wK_f) = inp
            planes_f = jnp.concatenate([img_f, depth_f[..., None]], -1)
            planes_f = jnp.pad(planes_f, ((0, geo["KW"]),
                                          (0, geo["KXW"]), (0, 0)))
            pad_f = ((0, geo["h_pad"] - h), (0, geo["w_pad"] - w))
            g = _windowed_candidate_read(
                planes_f, jnp.pad(ymin_f, pad_f, mode="edge"),
                jnp.pad(xmin_f, pad_f, mode="edge"), by_f, bx_f,
                geo, m, h, w)
        rgb, sc, valid = frame_candidates(g, ymin_f, xmin_f, ymax_f, xmax_f,
                                          c2wK_f)
        feats = jnp.concatenate(
            [rgb, sc, jnp.broadcast_to(t, rgb.shape[:3])[..., None]], -1)
        diff2 = (ref[:, :, None, :] - feats) ** 2
        weights = jnp.exp(-0.5 * jnp.sum(diff2 * sigma_inv2, -1))
        weights = weights * valid.astype(weights.dtype)         # (h,w,mm)
        wsum, rgb_accum = acc
        return (wsum + weights.sum(-1),
                rgb_accum + jnp.sum(weights[..., None] * rgb, -2)), None

    ts = jnp.arange(n_frames, dtype=jnp.float32)
    if geo is None:
        xs = (ts, imgs, depths, y_min, x_min, y_max, x_max, c2wK_all)
    else:
        hp, wp = geo["h_pad"], geo["w_pad"]
        sr, scb = hp // row_chunk, wp // col_chunk
        pad_hw = ((0, 0), (0, hp - h), (0, wp - w))
        # per-block anchor minima (exact, in-graph), block order == the
        # read's row-major (sr, sc) to_chunks order; the edge-padded anchor
        # maps themselves are rebuilt per frame inside step() so the scan
        # carries no padded copies of the image/anchor payload
        ay_pad = jnp.pad(y_min, pad_hw, mode="edge")
        ax_pad = jnp.pad(x_min, pad_hw, mode="edge")
        ayb = ay_pad.reshape(n_frames, sr, row_chunk, scb, col_chunk)
        axb = ax_pad.reshape(n_frames, sr, row_chunk, scb, col_chunk)
        by_all = ayb.min((2, 4)).reshape(n_frames, sr * scb).astype(jnp.int32)
        bx_all = axb.min((2, 4)).reshape(n_frames, sr * scb).astype(jnp.int32)
        # in-graph drift guard: the one-hot read covers offsets 0..K0-1 /
        # 0..KX0-1 from the per-block minimum; if the IN-GRAPH per-block
        # spread ever reaches the static window derived from the host numpy
        # mirror (_host_window_geometry), candidates are silently zeroed and
        # dropped by the d>0 filter. The lock-step contract is enforced by
        # convention, so degrade LOUDLY instead: one tiny reduction + a
        # cond-gated debug.print (round-4 advisor finding).
        sy_g = (ayb.max((2, 4)) - ayb.min((2, 4))).max()
        sx_g = (axb.max((2, 4)) - axb.min((2, 4))).max()
        if _supports_host_callbacks():
            jax.lax.cond(
                (sy_g >= geo["K0"]) | (sx_g >= geo["KX0"]),
                lambda: jax.debug.print(
                    "gather_scene WARNING: in-graph anchor spread (y={sy}, "
                    "x={sx}) reaches the static window (K0={k0}, "
                    "KX0={kx0}) — host mirror drift; candidates are being "
                    "silently dropped. Re-run with window='off'.",
                    sy=sy_g, sx=sx_g, k0=geo["K0"], kx0=geo["KX0"]),
                lambda: None)
        xs = (ts, imgs, depths, by_all, bx_all,
              y_min, x_min, y_max, x_max, c2wK_all)
    (wsum, rgb_accum), _ = jax.lax.scan(
        step, (jnp.zeros((h, w)), jnp.zeros((h, w, 3))), xs)
    out = jnp.where(wsum[..., None] > 1e-8,
                    rgb_accum / jnp.maximum(wsum[..., None], 1e-8),
                    imgs[ref_frame])
    return out
