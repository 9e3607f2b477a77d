#!/usr/bin/env python
"""Streaming service CLI.

`python run/service.py --cfg configs/panoptic/jln64.yaml --rtsp_url rtsp://...`
(omit --rtsp_url for the synthetic test source).

Behavioral reference: /root/reference/run/service.py:156-178 (arg surface)
and :720-827 (process topology). See fvp_tpu/service/pipeline.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fvp_tpu.service.pipeline import ServiceConfig, run_service


def on_result(res):
    """Result sink for the spawned visualization process (must be a
    module-level function: ServiceConfig is pickled across the spawn)."""
    print(f"[{res['timestamp']:.2f}] "
          f"{int((res['poses'][:, 0, 3] >= 0).sum())} people, "
          f"latency {res['latency_ms']:.1f} ms, fps {res['fps']:.1f}",
          flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="")
    parser.add_argument("--rtsp_url", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--calibration", default="",
                        help="custom-format calibration.json "
                             "(reference service.py:285-339)")
    parser.add_argument("--num_views", type=int, default=4)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--fps", type=float, default=30.0)
    parser.add_argument("--view_mode", default="callback",
                        choices=("callback", "save", "rtsp", "none"))
    parser.add_argument("--output_dir", default="/tmp/fvp_service")
    parser.add_argument("--restream_url", default="",
                        help="rtsp:// publish target for --view_mode rtsp")
    parser.add_argument("--coordinator", default="",
                        help="multi-host serving: host0 ip:port — run one "
                             "service per host with the same coordinator; "
                             "the view axis shards over the global device "
                             "set (DCN across hosts)")
    parser.add_argument("--num_hosts", type=int, default=1)
    parser.add_argument("--host_id", type=int, default=0)
    args = parser.parse_args()

    run_service(ServiceConfig(
        cfg_path=args.cfg,
        rtsp_url=args.rtsp_url,
        checkpoint=args.checkpoint,
        calibration=args.calibration,
        num_views=args.num_views,
        target_fps=args.fps,
        max_frames=args.max_frames,
        view_mode=args.view_mode,
        output_dir=args.output_dir,
        restream_url=args.restream_url,
        on_result=on_result,
        coordinator=args.coordinator,
        num_hosts=args.num_hosts,
        host_id=args.host_id,
    ))


if __name__ == "__main__":
    main()
