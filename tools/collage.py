"""2x2 video collage tool.

Equivalent of /root/reference/experiments/test/ffmpeg.sh (an ffmpeg xstack of
four result videos). Uses ffmpeg's xstack when available; otherwise decodes
with imageio and tiles frames in numpy.

Usage: python tools/collage.py out.avi a.avi b.avi c.avi d.avi
"""

from __future__ import annotations

import shutil
import subprocess as sp
import sys


def collage_ffmpeg(out_path: str, inputs):
    cmd = ["ffmpeg"]
    for p in inputs:
        cmd += ["-i", p]
    layout = "0_0|w0_0|0_h0|w0_h0"
    cmd += ["-filter_complex",
            f"xstack=inputs={len(inputs)}:layout={layout}",
            "-c:v", "libx264", "-crf", "18", "-y", out_path]
    sp.check_call(cmd)


def collage_numpy(out_path: str, inputs):
    import imageio.v2 as io
    import numpy as np

    readers = [io.mimread(p, memtest=False) for p in inputs]
    n = min(len(r) for r in readers)
    tiles = []
    for i in range(n):
        top = np.concatenate([readers[0][i], readers[1][i]], axis=1)
        bot = np.concatenate([readers[2][i], readers[3][i]], axis=1)
        tiles.append(np.concatenate([top, bot], axis=0))
    io.mimsave(out_path if out_path.endswith(".gif") else out_path + ".gif",
               tiles, format="GIF", fps=10)


def main():
    out, *inputs = sys.argv[1:]
    if len(inputs) != 4:
        raise SystemExit("need exactly 4 input videos")
    if shutil.which("ffmpeg"):
        collage_ffmpeg(out, inputs)
    else:
        collage_numpy(out, inputs)


if __name__ == "__main__":
    main()
