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
