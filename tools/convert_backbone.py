#!/usr/bin/env python
"""Convert a reference torch Pose-ResNet checkpoint into the native flax
msgpack backbone format.

The torch->flax mapping itself is fvp_tpu.models.resnet.convert_torch_state
(parity-tested against the reference model in tests/test_resnet.py); this
tool just persists the result so serving hosts never need torch or pickle:

  python tools/convert_backbone.py backbone/pose_resnet50_panoptic.pth.tar \
      backbone/pose_resnet50_panoptic.msgpack

Point NETWORK.PRETRAINED_BACKBONE at the .msgpack output.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help=".pth/.pth.tar torch state dict")
    parser.add_argument("dst", help="output .msgpack path")
    parser.add_argument("--layers", type=int, default=50)
    args = parser.parse_args()

    import jax
    import torch
    from flax import serialization

    from fvp_tpu.models.resnet import convert_torch_state

    state = torch.load(args.src, map_location="cpu", weights_only=False)
    state = {k: v.numpy() for k, v in state.items()}
    variables = convert_torch_state(state, num_layers=args.layers)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    n = sum(v.size for v in jax.tree_util.tree_leaves(variables))
    print(f"wrote {args.dst} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
