"""Real-time streaming service: capture -> inference -> visualization as a
multi-process pipeline with bounded drop-oldest queues and a liveness
watchdog.

Behavioral reference: /root/reference/run/service.py:720-827 — four OS
processes (frame pump, RTSP reader, inference, visualization), queue sizes
1 (frames) and 5 (results) with drop-oldest backpressure, a child-process
watchdog in the main loop over ALL children (:783-785), and graceful
shutdown through a shared stop flag.

Inference parity (:342-503): cameras come from a calibration file
(setup_cameras, :285-339 — same K^-1 P extrinsics recovery as the custom
dataset); with a configured backbone the raw frames are normalized and run
through the frozen Pose-ResNet ON DEVICE inside the same jitted executable
as the 3D pipeline (prepare_input + model(views=...), :448-465). Without a
backbone (demo/synthetic mode) frames are down-converted to heatmap
stand-ins so the topology stays drivable with no weights.

Visualization parity (:506-717): the viz process composes the views,
reprojects fused poses onto every camera quadrant, and either invokes the
callback, saves JPEGs, or pipes the overlay into an ffmpeg RTSP restream
(fvp_tpu/service/render.py).

TPU specifics: the inference process owns the device; the jitted
frames->poses executable is compiled once at startup (persistent compilation
cache makes restarts fast).
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import os
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
    calibration: str = ""                # custom-format calibration.json
    num_views: int = 4
    result_queue_size: int = 5
    target_fps: float = 30.0
    max_frames: Optional[int] = None     # None = run until stopped
    view_mode: str = "callback"          # callback | save | rtsp | none
    output_dir: str = "/tmp/fvp_service"
    restream_url: str = ""               # rtsp:// target for view_mode=rtsp
    on_result: Optional[Callable] = None  # called in the viz process
    cfg_obj: Optional[object] = None     # FVPConfig override (tests/embedding)
    # --- multi-host serving (SURVEY §2.3 "shard cameras across hosts"):
    # run one service per host with the same coordinator; the inference
    # processes form a jax.distributed job and shard the view axis over
    # the GLOBAL device set (collectives ride ICI within a slice, DCN
    # across hosts). Rehearse on one machine:
    #   FVP_PLATFORM=cpu FVP_CPU_DEVICES=2 python run/service.py \
    #     --coordinator 127.0.0.1:8477 --num_hosts 2 --host_id {0,1} ...
    coordinator: str = ""                # host0 ip:port; empty = single host
    num_hosts: int = 1
    host_id: int = 0


def _load_cfg(svc: ServiceConfig):
    """Experiment config with the camera count reconciled: the frame
    source, model and visualization must all agree on one view count, so
    the service flag wins over the YAML's CAMERA_NUM (a silently
    zero-filled missing view would corrupt the fused poses)."""
    from fvp_tpu.config import FVPConfig, load_config
    if svc.cfg_obj is not None:
        cfg = svc.cfg_obj
    elif not svc.cfg_path:
        return FVPConfig(num_views=svc.num_views)
    else:
        cfg = load_config(svc.cfg_path)
    if svc.num_views and svc.num_views != cfg.num_views:
        print(f"service: overriding CAMERA_NUM {cfg.num_views} -> "
              f"{svc.num_views} (frame source)", flush=True)
        cfg = cfg.replace(num_views=svc.num_views)
    return cfg


def _service_rig(svc: ServiceConfig, cfg):
    """Camera setup: calibration file when provided (reference
    setup_cameras, service.py:285-339), else the synthetic demo ring."""
    if svc.calibration:
        from fvp_tpu.data.custom import load_custom_calibration
        rig = load_custom_calibration(svc.calibration)
        if rig.num_cameras != cfg.num_views:
            raise ValueError(
                f"calibration has {rig.num_cameras} cameras, config "
                f"expects {cfg.num_views}")
        return rig
    from __graft_entry__ import _panoptic_rig
    return _panoptic_rig(cfg.num_views, cfg)


def pick_view_shards(n_devices: int, num_views: int) -> int:
    """Largest divisor of the camera count that fits the device count: a
    single frame (batch 1) scales over the view axis only, so serving
    shards cameras and leaves any leftover devices idle rather than
    splitting a view across devices (ragged per-view work defeats GSPMD)."""
    return next(v for v in range(min(n_devices, num_views), 0, -1)
                if num_views % v == 0)


def inference_process(svc: ServiceConfig, frame_q: FrameQueue,
                      result_q: FrameQueue, stop_flag) -> None:
    """Model owner: consume frames, run the jitted pipeline, emit poses."""
    import jax
    import jax.numpy as jnp

    if os.environ.get("FVP_PLATFORM"):
        # sitecustomize pins JAX_PLATFORMS; this is the working override
        # (e.g. FVP_PLATFORM=cpu to drive the service without the chip)
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    if os.environ.get("FVP_CPU_DEVICES"):
        # virtual multi-device CPU mesh (rehearse the sharded service)
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["FVP_CPU_DEVICES"]))
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    distributed = bool(svc.coordinator)
    if distributed:
        # multi-host serving: the per-host inference processes form one
        # jax.distributed job; meshes below span the GLOBAL device set
        jax.distributed.initialize(coordinator_address=svc.coordinator,
                                   num_processes=svc.num_hosts,
                                   process_id=svc.host_id)
        print(f"service: host {svc.host_id}/{svc.num_hosts} joined "
              f"({jax.device_count()} global devices)", flush=True)

    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose

    cfg = _load_cfg(svc)
    rig = _service_rig(svc, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    model = FasterVoxelPose(cfg=cfg)

    hm_w, hm_h = cfg.heatmap_size
    sample = jnp.zeros((1, cfg.num_views, cfg.num_joints, hm_h, hm_w),
                       jnp.float32)
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False)
    )(jax.random.PRNGKey(0), sample)
    if svc.checkpoint:
        from fvp_tpu.engine.checkpoint import load_model_file

        variables = load_model_file(svc.checkpoint, variables)

    backbone = backbone_vars = None
    if cfg.pretrained_backbone:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from run.train import load_backbone
        backbone, backbone_vars = load_backbone(cfg)

    # hoist the Pallas serving kernels' weight packing to load time
    # (engine/packing.py — loop-invariant for a param-frozen service)
    from fvp_tpu.engine.packing import (
        pack_backbone_variables, pack_model_variables,
    )
    variables = pack_model_variables(cfg, variables)
    if backbone is not None and cfg.backbone_head == "pallas":
        backbone_vars = pack_backbone_variables(backbone_vars)

    # multi-device serving: shard the single-frame step over the camera
    # axis — each device owns a subset of views' backbone + sampling, the
    # volume's view-mean becomes an ICI collective (fvp_tpu/parallel).
    # Rehearse without chips: FVP_PLATFORM=cpu FVP_CPU_DEVICES=N.
    mesh = None
    n_view = pick_view_shards(len(jax.devices()), cfg.num_views)
    if n_view > 1:
        from fvp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(1, n_view)
        print(f"service: sharding inference over {n_view} devices "
              f"(view axis)", flush=True)

    if mesh is not None:
        from fvp_tpu.parallel.sharding import (
            make_global, make_sharded_eval_step,
        )

        if distributed:
            # weights/rig constants become replicated GLOBAL arrays (every
            # host holds the same values: same seed / same checkpoint);
            # each frame's input batch is globalized per call below, with
            # every host contributing the view shards its devices own
            from jax.sharding import PartitionSpec as P

            def repl(tree):
                return make_global(
                    tree, mesh,
                    jax.tree_util.tree_map(lambda _: P(), tree))

            variables, rc = repl(variables), repl(rc)
            if backbone_vars is not None:
                backbone_vars = repl(backbone_vars)

        step = make_sharded_eval_step(cfg, model, mesh, backbone=backbone,
                                      backbone_vars=backbone_vars)
        if distributed:
            from jax.sharding import PartitionSpec as P

            fwd = lambda x: step(                          # noqa: E731
                variables, make_global(x, mesh, P("data", "view")), rc)
        else:
            fwd = lambda x: step(variables, x, rc)         # noqa: E731
    elif backbone is not None:
        # production path: frames -> frozen backbone -> 3D pipeline, one
        # executable (reference service.py:458-465 runs model(views=...))
        @jax.jit
        def fwd(images):
            B, V = images.shape[:2]
            flat = images.reshape(B * V, *images.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False)
            heatmaps = hm.reshape(B, V, *hm.shape[1:]).transpose(
                0, 1, 4, 2, 3)
            return model.apply(variables, heatmaps, rc,
                               train=False)["fused_poses"]
    else:
        fwd = jax.jit(lambda hm: model.apply(variables, hm, rc,
                                             train=False)["fused_poses"])

    if backbone is not None:
        if cfg.backbone_stem == "host_s2d":
            # Pallas stem input contract: space-to-depth on the host
            from fvp_tpu.ops.pallas.stem import s2d_host

            prepare = lambda views: s2d_host(          # noqa: E731
                _frames_to_images(cfg, views))
        else:
            prepare = lambda views: _frames_to_images(  # noqa: E731
                cfg, views)
    else:
        prepare = lambda views: _frames_to_heatmaps(cfg, views)  # noqa: E731

    n_done = 0
    fps_win: list[float] = []
    while not stop_flag.value:
        try:
            ts, views = frame_q.get(timeout=0.5)
        except queue.Empty:
            continue
        t0 = time.perf_counter()
        x = prepare(views)
        out = fwd(jnp.asarray(x))
        if getattr(out, "is_fully_addressable", True):
            poses = np.asarray(out)
        else:
            # multi-host: the output is data-sharded/view-replicated, so
            # every host's first local shard holds the full frame result
            poses = np.asarray(out.addressable_data(0))
        dt = time.perf_counter() - t0
        fps_win = (fps_win + [dt])[-30:]
        result = {
            "timestamp": ts,
            "poses": poses[0],
            "latency_ms": dt * 1000,
            "fps": len(fps_win) / sum(fps_win),
        }
        if svc.view_mode in ("save", "rtsp"):
            # the rendered composite needs the frames; callback/none
            # modes skip serializing ~MBs of pixels through the queue
            result["views"] = [v[::2, ::2] for v in views[:cfg.num_views]]
        result_q.put(result)
        n_done += 1
        if svc.max_frames and n_done >= svc.max_frames:
            stop_flag.value = 1
            break


def _frames_to_images(cfg, views) -> np.ndarray:
    """Raw BGR frames -> (1, V, H, W, 3) normalized RGB batch at the
    working resolution (reference prepare_input, service.py:258-282)."""
    import cv2

    from fvp_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    w, h = cfg.image_size
    out = np.zeros((1, cfg.num_views, h, w, 3), np.float32)
    for v, img in enumerate(views[:cfg.num_views]):
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=2)
        if img.shape[0] != h or img.shape[1] != w:
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        out[0, v] = (rgb - IMAGENET_MEAN) / IMAGENET_STD
    return out


def _frames_to_heatmaps(cfg, views) -> np.ndarray:
    """Demo fallback (no backbone weights): down-convert raw views into
    per-joint heatmap stand-ins so the full topology runs end to end."""
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
    one arrived (service.py:609-625); overlays reprojected poses and
    dispatches per view_mode (callback / save / rtsp)."""
    from fvp_tpu.geometry.transforms import get_resize_transform
    from fvp_tpu.service.render import (
        FFmpegRestream, compose_views, render_result_on_image,
    )

    cfg = _load_cfg(svc)
    rig = _service_rig(svc, cfg)
    resize_t = get_resize_transform(cfg.ori_image_size, cfg.image_size)
    writer = None
    if svc.view_mode == "rtsp" and svc.restream_url:
        rows = max(2, (cfg.num_views + 1) // 2)
        writer = FFmpegRestream(
            svc.restream_url,
            (cfg.image_size[0], cfg.image_size[1] // 2 * rows),
            fps=svc.target_fps)
    if svc.view_mode == "save":
        os.makedirs(svc.output_dir, exist_ok=True)

    period = 1.0 / svc.target_fps
    last = None
    fresh = False
    while not stop_flag.value:
        t0 = time.perf_counter()
        try:
            last = result_q.get(timeout=period)
            fresh = True
        except queue.Empty:
            fresh = False
        if last is not None:
            if svc.view_mode in ("save", "rtsp"):
                import cv2

                if fresh or svc.view_mode == "rtsp":
                    # rtsp re-pushes the last composite to hold the
                    # stream's frame rate; save mode writes each result
                    # once (re-writing an identical JPEG per tick is
                    # pure I/O waste)
                    img = compose_views(last["views"], cfg.image_size)
                    img = render_result_on_image(
                        cfg, rig, resize_t, img, last["poses"],
                        fps=last["fps"], latency_ms=last["latency_ms"])
                    if svc.view_mode == "save":
                        cv2.imwrite(os.path.join(
                            svc.output_dir,
                            f"pose_{int(last['timestamp'] * 1000)}.jpg"),
                            img)
                    elif writer is not None:
                        writer.write(img)
            if svc.on_result is not None and fresh:
                svc.on_result(last)
        dt = time.perf_counter() - t0
        if dt < period:
            time.sleep(period - dt)
    if writer is not None:
        writer.close()


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

    children = {"source": source.proc, "inference": infer, "viz": viz}
    try:
        while not stop_flag.value:
            time.sleep(0.5)
            # watchdog over ALL children (reference service.py:783-785)
            for name, proc in children.items():
                if (proc is not None and not proc.is_alive()
                        and not stop_flag.value):
                    print(f"service: {name} process died; stopping",
                          flush=True)
                    stop_flag.value = 1
                    break
    except KeyboardInterrupt:
        pass
    finally:
        stop_flag.value = 1
        for p in (infer, viz):
            p.join(timeout=3.0)
            if p.is_alive():
                p.terminate()
        source.stop()
