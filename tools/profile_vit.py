"""Per-stage profile of the int8 CLIP ViT serving graph on the real chip.

Times jitted PREFIXES of the quantized ViT forward (preprocess; patch embed +
ln_pre + head via layers=0; +3 blocks at a time; full 12) with the same
slope-timing bench.py uses (tunnel latency cancels in the short/long-run
difference); consecutive differences give per-stage cost. Every prefix ends
with the ln_post+proj head, so the per-block deltas are clean block costs.

Usage: python tools/profile_vit.py  (tunnel up)
Env: BENCH_MODEL (default clip_vit_b32), BENCH_QUANT=int8|none, BENCH_BATCH.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS
    from embodied_clip_tpu.models.encoders import (
        ENCODER_SPECS, _row_major_format, build_encoder,
    )
    from embodied_clip_tpu.ops.quantize_vit import quantized_vit_apply
    from embodied_clip_tpu.parity import golden_frames

    model = os.environ.get("BENCH_MODEL", "clip_vit_b32")
    quant = os.environ.get("BENCH_QUANT", "int8")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n1, n2, reps = 10, 60, 3

    cfg = CLIP_VIT_CONFIGS[ENCODER_SPECS[model].arch]
    nh, nl = cfg["num_heads"], cfg["layers"]

    enc = build_encoder(model, dtype=jnp.bfloat16)
    if quant == "int8":
        enc = enc.quantize(golden_frames(n=32))
        q = enc.variables["qtrunk"]

        def make_prefix(k):
            return lambda qq, frames: quantized_vit_apply(
                qq, enc.preprocess(frames), nh, layers=k)
    else:
        q = enc.variables["params"]["vit"]

        def make_prefix(k):
            from embodied_clip_tpu.ops.quantize_vit import _forward
            return lambda qq, frames: _forward(
                qq, enc.preprocess(frames), nh, k, jnp.float32, None, {},
                collect=True)

    prefixes = [("preprocess", lambda qq, frames: enc.preprocess(frames))]
    for k in [0] + list(range(3, nl + 1, 3)):
        prefixes.append((f"blocks0-{k}", make_prefix(k)))

    rng = np.random.RandomState(0)
    fmt = _row_major_format(3)
    bufs = [jax.device_put(
        jnp.asarray(rng.randint(0, 256, (batch, 300, 300, 3), np.uint8)
                    .reshape(batch, 300, 900)),
        *([fmt] if fmt is not None else []))
        for _ in range(2)]

    def drain(out):
        return np.asarray(out.reshape(-1)[:4].astype(jnp.float32))

    results = []
    prev = 0.0
    for name, fn in prefixes:
        jf = (jax.jit(fn, in_shardings=(None, fmt)) if fmt is not None
              else jax.jit(fn))
        drain(jf(q, bufs[0]))  # compile + warm

        def run(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = jf(q, bufs[i % 2])
            drain(out)
            return time.perf_counter() - t0

        per = min((run(n2) - run(n1)) / (n2 - n1) for _ in range(reps))
        ms = per * 1e3
        results.append((name, ms, ms - prev))
        print(f"{name:12s} cum {ms:7.3f} ms   delta {ms - prev:7.3f} ms",
              flush=True)
        prev = ms
    print(json.dumps({n: {"cum_ms": round(c, 3), "delta_ms": round(d, 3)}
                      for n, c, d in results}))


if __name__ == "__main__":
    main()
