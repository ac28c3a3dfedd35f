"""Flow-pipeline media datasets: frame dirs, video clips, GT flow.

Equivalent of /root/reference/video-interpolation/data.py:10-119, host-side:
  * ``Images`` — ``frame_%04d.png`` directory, resized to a target short
    side, with Sintel ``.flo`` GT auto-loaded from ``../../flow/<scene>`` and
    rescaled (data.py:67-89, including the ``flow_scale = W/5`` heuristic);
  * ``VideoClip`` — frames from a video file. The reference synthesizes
    pseudo-GT by running an external RAFT checkout at train time
    (data.py:32-62); per SURVEY §7 hard-part 5 this framework instead accepts
    precomputed flow files (``--flow-dir`` with .flo/.npy), keeping the
    heavy CNN out of the single-video training loop.

Samples mirror BaseMedia.__getitem__ (data.py:14-18):
(frame1, frame2, t, flow_scale[, gt_flow]); batches are NHWC float32 arrays.
"""

from __future__ import annotations

import os
import os.path as path
from typing import Dict, Iterator, Optional

import numpy as np

from sin_inn_tpu.data.flo import read_flo


def _resize_frames(frames: np.ndarray, size: int) -> np.ndarray:
    """Resize (N, H, W, C) so the short (height) side == size, AA like
    torchvision Resize(size, antialias=True)."""
    import cv2

    n, h, w, c = frames.shape
    if h == size:
        return frames
    scale = size / h
    new_w = int(round(w * scale))
    out = np.stack([cv2.resize(f, (new_w, size), interpolation=cv2.INTER_AREA
                               if scale < 1 else cv2.INTER_LINEAR)
                    for f in frames])
    return out.reshape(n, size, new_w, c)


class FlowMedia:
    """Host-cached frames (N, H, W, 3) float32 + optional GT flow."""

    def __init__(self, video: np.ndarray, flow: Optional[np.ndarray] = None,
                 flow_scale: float = None):
        self.video = video.astype(np.float32)
        self.flow = flow.astype(np.float32) if flow is not None else None
        n = video.shape[0]
        self.times = np.linspace(-1.0, 1.0, n).astype(np.float32)
        # reference heuristic: flow_scale = W / 5 (data.py:89)
        self.flow_scale = (video.shape[2] / 5.0 if flow_scale is None
                           else float(flow_scale))

    @property
    def gt_available(self) -> bool:
        return self.flow is not None

    def __len__(self) -> int:
        return self.video.shape[0] - 1

    def sample(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        out = {
            "frame1": self.video[idx],
            "frame2": self.video[idx + 1],
            "times": self.times[idx],
            "scale": np.float32(self.flow_scale),
        }
        if self.gt_available:
            out["gt_flow"] = self.flow[idx]
        return out

    def batches(self, batch_size: int, shuffle: bool = False,
                rng: Optional[np.random.RandomState] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            (rng or np.random).shuffle(order)
        for s in range(0, len(order), batch_size):
            yield self.sample(order[s:s + batch_size])


def load_images(root: str, size: int = 200,
                flow_dir: Optional[str] = None) -> FlowMedia:
    """Images dataset (data.py:67-89). An explicit ``flow_dir`` overrides the
    Sintel ``../../flow/<scene>`` auto-discovery convention."""
    import imageio.v2 as io

    files = sorted(f for f in os.listdir(root) if f.endswith(".png"))
    num = len(files)
    frames = np.stack([io.imread(path.join(root, f)) for f in files])
    if frames.ndim == 3:
        frames = frames[..., None].repeat(3, -1)
    h0, w0 = frames.shape[1:3]
    if h0 > w0:
        raise ValueError("frames should be landscape oriented (data.py:73)")
    video = _resize_frames(frames, size).astype(np.float32) / 255.0

    scene = path.splitext(path.basename(root))[0]
    sintel_dir = path.join(root, "../../flow", scene)
    lookup = flow_dir if flow_dir else sintel_dir
    flow = None
    if path.isdir(lookup):
        flows = load_flow_dir(lookup, num - 1)
        # rescale by the flow files' OWN resolution, not the frames': an
        # explicit flow_dir may hold producer-generated flow already at the
        # training size (generate_pseudo_gt), in which case this is a no-op,
        # while Sintel GT at the source resolution gets the size/h ratio
        rescale = size / flows.shape[1]
        flow = _resize_frames(flows, size) * rescale
    return FlowMedia(video, flow)


def load_video_clip(video_path: str, end: Optional[int] = None,
                    step: int = 10, size: int = 200,
                    flow_dir: Optional[str] = None) -> FlowMedia:
    """VideoClip dataset (data.py:21-64) with precomputed flow instead of an
    in-loop RAFT run."""
    import imageio.v2 as io

    frames = io.mimread(video_path, memtest=False)[:end:step or 1]
    frames = np.stack(frames)
    video = _resize_frames(frames, size).astype(np.float32) / 255.0
    flow = None
    if flow_dir and path.isdir(flow_dir):
        flow = load_flow_dir(flow_dir, len(video) - 1)
        flow = _resize_frames(flow, size)
    return FlowMedia(video, flow, flow_scale=1.0 if flow is not None else None)


def load_flow_dir(flow_dir: str, num: int) -> np.ndarray:
    """Read ``frame_%04d.flo`` or ``.npy`` pseudo-GT flow files."""
    flows = []
    for i in range(num):
        flo = path.join(flow_dir, f"frame_{i+1:04d}.flo")
        npy = path.join(flow_dir, f"frame_{i+1:04d}.npy")
        if path.isfile(flo):
            flows.append(read_flo(flo))
        elif path.isfile(npy):
            flows.append(np.load(npy))
        else:
            raise FileNotFoundError(f"no flow file for frame {i+1} in {flow_dir}")
    return np.stack(flows)


def generate_pseudo_gt(video: np.ndarray, producer, out_dir: str) -> np.ndarray:
    """Synthesize pseudo-GT flow over consecutive frame pairs.

    The pluggable replacement for the reference's in-loop RAFT run
    (/root/reference/video-interpolation/data.py:32-62, which imported a
    hard-coded external RAFT checkout through ``torch.nn.DataParallel``).

    ``producer`` is either
      * a callable ``(frame1, frame2) -> (H, W, 2) float array`` (frames are
        (H, W, 3) float32 in [0, 1]), or
      * a subprocess command template string containing ``{f1} {f2} {out}``
        placeholders — invoked once per pair with PNG paths and an output
        ``.flo`` path (so any external flow tool can plug in).

    Results are written to ``out_dir`` as ``frame_%04d.flo`` — the exact
    layout :func:`load_flow_dir` (the default precomputed-flow impl) reads —
    and returned as an (N-1, H, W, 2) array.
    """
    from sin_inn_tpu.data.flo import write_flo

    os.makedirs(out_dir, exist_ok=True)

    # batched producers (producer.batch_pairs > 1, e.g. make_raft_producer):
    # group consecutive pairs into one device call — per-call host<->device
    # sync on the relayed TPU costs ~27 ms, ~35% of a 48 ms RAFT pair; the
    # ragged tail is padded by repeating the last pair (one compiled shape)
    bp = int(getattr(producer, "batch_pairs", 0) or 0)
    if callable(producer) and bp > 1 and len(video) > 2:
        flows = []
        n_pairs = len(video) - 1
        for s in range(0, n_pairs, bp):
            f1s = video[s:min(s + bp, n_pairs)]
            f2s = video[s + 1:min(s + bp, n_pairs) + 1]
            pad = bp - len(f1s)
            if pad:
                f1s = np.concatenate([f1s, np.repeat(f1s[-1:], pad, 0)])
                f2s = np.concatenate([f2s, np.repeat(f2s[-1:], pad, 0)])
            fls = np.asarray(producer(f1s, f2s), np.float32)
            if fls.shape != f1s.shape[:3] + (2,):
                raise ValueError(
                    f"batched producer returned {fls.shape}, want "
                    f"{f1s.shape[:3] + (2,)}")
            for k in range(len(f1s) - pad):
                write_flo(path.join(out_dir, f"frame_{s + k + 1:04d}.flo"),
                          fls[k])
                flows.append(fls[k])
        return np.stack(flows)

    flows = []
    for i in range(len(video) - 1):
        f1, f2 = video[i], video[i + 1]
        if callable(producer):
            fl = np.asarray(producer(f1, f2), np.float32)
        else:
            import shlex
            import subprocess
            import tempfile

            import imageio.v2 as io

            with tempfile.TemporaryDirectory() as td:
                p1 = path.join(td, "f1.png")
                p2 = path.join(td, "f2.png")
                # the tool writes to a TEMP path; the validated result is
                # copied into out_dir below — a failing producer never
                # leaves partial frame_%04d.flo files behind
                po = path.join(td, "out.flo")
                io.imwrite(p1, (np.clip(f1, 0, 1) * 255).astype(np.uint8))
                io.imwrite(p2, (np.clip(f2, 0, 1) * 255).astype(np.uint8))
                # argv list, no shell: paths with spaces stay one argument
                argv = [a.format(f1=p1, f2=p2, out=po)
                        for a in shlex.split(producer)]
                subprocess.run(argv, check=True)
                fl = read_flo(po)
        if fl.shape != f1.shape[:2] + (2,):
            raise ValueError(
                f"producer returned {fl.shape}, want {f1.shape[:2] + (2,)}")
        write_flo(path.join(out_dir, f"frame_{i+1:04d}.flo"), fl)
        flows.append(fl)
    return np.stack(flows)


def _raft_producer_factory(arg: str):
    from sin_inn_tpu.models.raft import make_raft_producer

    ckpt, _, iters = arg.partition("@")
    return make_raft_producer(ckpt, iters=int(iters) if iters else 20)


def _py_producer_factory(arg: str):
    import importlib

    mod, _, fn = arg.rpartition(":")
    return getattr(importlib.import_module(mod), fn)


#: producer-spec schemes for --flow-producer (see :func:`resolve_producer`)
FLOW_PRODUCERS = {
    "raft": _raft_producer_factory,   # raft:<ckpt.pth>[@iters] — JAX RAFT
    "py": _py_producer_factory,       # py:<module>:<function>  — custom callable
}


def resolve_producer(spec):
    """Turn a producer spec into the callable/template
    :func:`generate_pseudo_gt` accepts.

    Specs: ``raft:<ckpt.pth>[@iters]`` (the TPU-native RAFT port,
    models/raft.py — the reference's external RAFT run,
    video-interpolation/data.py:32-62, as a first-class producer),
    ``py:<module>:<function>`` (any importable callable), or a subprocess
    command template containing ``{f1} {f2} {out}`` placeholders.
    Already-callable specs pass through.
    """
    if callable(spec):
        return spec
    scheme, _, arg = spec.partition(":")
    if arg and scheme in FLOW_PRODUCERS:
        return FLOW_PRODUCERS[scheme](arg)
    if "{f1}" in spec and "{f2}" in spec and "{out}" in spec:
        return spec
    raise ValueError(
        f"flow producer spec {spec!r} is neither a registered scheme "
        f"({sorted(FLOW_PRODUCERS)}) nor a {{f1}}/{{f2}}/{{out}} template")


def attach_pseudo_gt(media: FlowMedia, producer, out_dir: str) -> FlowMedia:
    """Attach producer-generated pseudo-GT flow to an existing FlowMedia
    (reuses files already in ``out_dir`` when complete — the reference
    regenerated RAFT flow every run)."""
    num = len(media.video) - 1
    try:
        flow = load_flow_dir(out_dir, num)
    except FileNotFoundError:
        flow = generate_pseudo_gt(media.video, producer, out_dir)
    media.flow = flow.astype(np.float32)
    # producer flow is in pixels at the training resolution: the model's
    # output scaling drops to 1 exactly like the reference after its RAFT
    # pass (video-interpolation/data.py:64-65 ``self.flow_scale = 1``) and
    # like our precomputed-flow clip path (load_video_clip above)
    media.flow_scale = 1.0
    return media


def get_video(input_video: str, size: int, test_size: int,
              end: Optional[int] = None, step: Optional[int] = None,
              flow_dir: Optional[str] = None):
    """(trainset, testset, scene) dispatcher (data.py:107-119)."""
    if path.isdir(input_video):
        trainset = load_images(input_video, size=size, flow_dir=flow_dir)
        testset = (trainset if test_size == size
                   else load_images(input_video, size=test_size,
                                    flow_dir=flow_dir))
    else:
        trainset = load_video_clip(input_video, end, step or 10, size, flow_dir)
        testset = (trainset if test_size == size else
                   load_video_clip(input_video, end, step or 10, test_size,
                                   flow_dir))
    scene = path.splitext(path.basename(input_video))[0]
    return trainset, testset, scene
