"""Multi-scene experiment launcher: the SLURM-array replacement.

The reference benchmarks Sintel with a 23-wide SLURM job array, one scene per
1-GPU task, then re-parses per-scene EPEs out of GIF filenames
(/root/reference/video-interpolation/train_hpc.sh:32,60-67, main.py:96-106).
Per-scene runs share nothing (SURVEY §2.5 "scene-level parallel"), so the
TPU-native equivalent is plain scale-out: run scenes sequentially on one
chip/host or fan out one scene per host in a multi-host deployment
(``jax.process_index()`` selects the shard of scenes), then aggregate the
frame-weighted AEPE from the structured per-scene results.
"""

from __future__ import annotations

import json
import os
import os.path as path
from dataclasses import dataclass
from typing import Dict, List, Optional

from sin_inn_tpu.core.config import FlowConfig


@dataclass
class SceneResult:
    scene: str
    epe: float
    num_frames: int
    metrics: Dict


def scene_list(root: str) -> List[str]:
    return sorted(d for d in os.listdir(root)
                  if path.isdir(path.join(root, d)))


def shard_for_process(scenes: List[str], process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> List[str]:
    """Round-robin scene assignment across hosts (identity on one host)."""
    if process_index is None:
        try:
            import jax
            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1
    return scenes[process_index::max(process_count, 1)]


def run_scenes(cfg: FlowConfig, root: Optional[str] = None,
               scenes: Optional[List[str]] = None,
               out_path: Optional[str] = None) -> List[SceneResult]:
    """Train + test every assigned scene; write structured results."""
    from sin_inn_tpu.train import loop as L

    root = root or path.dirname(cfg.input_video)
    scenes = scenes if scenes is not None else shard_for_process(
        scene_list(root))
    results: List[SceneResult] = []
    for scene in scenes:
        scfg = cfg.replace(input_video=path.join(root, scene))
        train_out = L.run_flow_train(scfg)
        test_out = L.run_flow_test(
            scfg, state=train_out["state"], spec=train_out["spec"],
            consts=train_out["consts"], ctrl_cfg=train_out["ctrl_cfg"],
            scene=train_out["scene"])
        results.append(SceneResult(scene=scene, epe=test_out["epe"],
                                   num_frames=test_out["num_frames"],
                                   metrics=train_out["metrics"]))
    if out_path:
        with open(out_path, "w") as f:
            json.dump([r.__dict__ for r in results], f, indent=2)
    return results


def aggregate_aepe(results: List[SceneResult]) -> float:
    """Frame-weighted mean EPE (reference main.py:96-106 'summarize')."""
    frames = sum(r.num_frames for r in results)
    if frames == 0:
        return 0.0
    return sum(r.epe * r.num_frames for r in results) / frames


def aggregate_from_files(paths: List[str]) -> float:
    """Combine per-host result JSONs (the cross-host reduce step)."""
    results: List[SceneResult] = []
    for p in paths:
        with open(p) as f:
            results.extend(SceneResult(**r) for r in json.load(f))
    return aggregate_aepe(results)


def main(argv: Optional[List[str]] = None) -> int:
    """CLI: ``python -m sin_inn_tpu.parallel.launcher --root <scenes> [...]``.

    The ``sbatch train_hpc.sh`` replacement: trains+tests this process's
    shard of the scene subdirectories of ``--root`` (round-robin over
    ``jax.process_index()``) and prints the frame-weighted AEPE. Every flag
    of ``sin-inn flow train`` is accepted and forwarded. A multi-host sweep
    writes per-host ``--out`` JSONs; ``--aggregate a.json b.json ...`` is
    the final reduce (reference ``summarize``, main.py:96-106).
    """
    import argparse
    import sys

    argv = sys.argv[1:] if argv is None else list(argv)
    pre = argparse.ArgumentParser(
        prog="python -m sin_inn_tpu.parallel.launcher",
        description="multi-scene flow runner (SLURM-array replacement); "
                    "other flags are forwarded to `sin-inn flow train`")
    pre.add_argument("--root", default=None,
                     help="directory containing one subdirectory per scene")
    pre.add_argument("--out", default=None,
                     help="write this host's per-scene results JSON here")
    pre.add_argument("--aggregate", nargs="+", default=None, metavar="JSON",
                     help="combine per-host result JSONs and print the AEPE")
    mine, rest = pre.parse_known_args(argv)
    if mine.aggregate:
        print(f"Normalized AEPE: {aggregate_from_files(mine.aggregate)}")
        return 0
    if not mine.root:
        pre.error("--root is required (or use --aggregate)")

    from sin_inn_tpu import cli as C

    fp = argparse.ArgumentParser(prog=pre.prog)
    sub = fp.add_subparsers(dest="command", required=True)
    C._flow_parser(sub)
    cfg = C.flow_config_from_args(fp.parse_args(["flow", "train"] + rest))
    results = run_scenes(cfg, root=mine.root, out_path=mine.out)
    print(f"Normalized AEPE: {aggregate_aepe(results)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
