"""Encode raw simulator frames with the frozen CLIP RN50 stack — the framework's
headline path (one fused uint8→features graph).

Usage: python examples/encode_frames.py [--torch-checkpoint RN50.pt]
Without a checkpoint the encoder is random-init (same graph, same speed).
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-checkpoint", default=None,
                   help="openai CLIP RN50 release file for real weights")
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from embodied_clip_tpu.models.encoders import build_encoder

    enc = build_encoder("clip_rn50", dtype=jnp.bfloat16,
                        torch_checkpoint=args.torch_checkpoint).fold_bn()
    frames = np.random.RandomState(0).randint(
        0, 256, (args.batch, 300, 300, 3), np.uint8)  # THOR-sized frames

    t0 = time.time()
    feats = enc.encode(jnp.asarray(frames))
    np.asarray(feats["clip_attnpool"][:1, :4])  # drain
    print(f"compile+first batch: {time.time() - t0:.1f}s")
    for key, val in feats.items():
        print(f"  {key}: {val.shape} {val.dtype}")

    t0 = time.time()
    n = 20
    for _ in range(n):
        feats = enc.encode(jnp.asarray(frames))
    np.asarray(feats["clip_attnpool"][:1, :4])
    fps = args.batch * n / (time.time() - t0)
    print(f"throughput: {fps:.0f} frames/s (single chip, incl. host transfer)")


if __name__ == "__main__":
    main()
