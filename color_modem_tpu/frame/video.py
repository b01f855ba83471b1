"""Chunked, resumable video processing (BASELINE.json config 5; SURVEY.md
§5.3/§5.4/§5.5).

A video run is a sequence of frame chunks pushed through the (optionally
sharded) round-trip pipeline.  Each finished chunk is recorded in the output
directory's manifest with output hashes and PSNR; re-running after an
interruption skips completed chunks (failure recovery = re-running a chunk —
the honest strategy recorded in SURVEY.md §5.3).  A structured JSON summary
goes to ``results/`` (§5.5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import numpy as np

import jax

from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.utils.manifest import ChunkManifest, array_hash
from color_modem_tpu.utils.metrics import psnr

FrameSource = Callable[[int, int], np.ndarray]  # (start, count) -> (B,3,L,N)


def synthetic_source(lines: int, samples: int) -> FrameSource:
    """Deterministic per-frame synthetic scenes (tests, bench config 5)."""
    from color_modem_tpu.utils.testimages import smooth_scene

    def src(start: int, count: int) -> np.ndarray:
        return np.stack(
            [smooth_scene(lines, samples, seed=start + i) for i in range(count)],
            dtype=np.float32,
        )

    return src


def process_video(
    plan: ModemPlan,
    source: FrameSource,
    n_frames: int,
    out_dir: str,
    *,
    decoder: str = "notch",
    chunk: int = 8,
    mesh=None,
    backend: str = "xla",
    save_outputs: bool = False,
    resume: bool = True,
) -> dict:
    """Round-trip ``n_frames`` frames in chunks; returns the run summary."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = ChunkManifest(out_dir) if resume else None
    config = {
        "standard": plan.cfg.name,
        "decoder": decoder,
        "samples": plan.n_samples,
        "chunk": chunk,
        "backend": backend,
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else None,
    }
    if manifest:
        manifest.check_config(config)

    if mesh is not None:
        from color_modem_tpu.parallel.sharded import make_sharded_pipeline

        _, _, roundtrip = make_sharded_pipeline(plan, mesh, decoder)
    else:
        _, _, roundtrip = make_pipeline(plan, decoder, backend)

    t_start = time.perf_counter()
    pixels = 0
    frames_done = 0
    psnrs = []
    for start in range(0, n_frames, chunk):
        end = min(start + chunk, n_frames)
        if manifest and manifest.is_done(start, end):
            continue
        rgb = source(start, end - start)
        out = np.asarray(
            jax.block_until_ready(roundtrip(rgb, start))
        )
        q = psnr(out, rgb)
        psnrs.append(q)
        frames_done += out.shape[0]
        pixels += out.shape[0] * out.shape[2] * out.shape[3]
        if save_outputs:
            np.save(os.path.join(out_dir, f"rgb_{start:06d}.npy"), out)
        if manifest:
            manifest.mark_done(start, end, hash=array_hash(out), psnr=round(q, 2))
    wall = time.perf_counter() - t_start

    summary = {
        **config,
        "n_frames": n_frames,
        "frames_processed_this_run": frames_done,
        "mpix_per_s": round(pixels / wall / 1e6, 3) if pixels else 0.0,
        "min_psnr_db": round(min(psnrs), 2) if psnrs else None,
        "seconds": round(wall, 2),
    }
    results_dir = os.path.join(out_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    with open(
        os.path.join(results_dir, f"run_{time.time_ns()}.json"), "w"
    ) as f:
        json.dump(summary, f, indent=1)
    return summary
