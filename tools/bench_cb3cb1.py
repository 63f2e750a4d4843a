"""Isolated timing of the cross-block pointwise fusion kernel
(ops/pallas/bottleneck_kernel.fused_cb3_cb1_int8) vs the XLA pair it replaces
[cb3 einsum + residual + requant] -> [cb1 einsum + requant], on real stage
shapes, sweeping the row tile.

Usage: python tools/bench_cb3cb1.py [stage1|stage2|stage3|stage4 ...] (tunnel up)
Env: BTS=1,2,4 to override the batch-tile sweep.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPES = {
    # n, h, w (batch 128), cm, c, c1
    "stage1": (128, 56, 56, 64, 256, 64),
    "stage2": (128, 28, 28, 128, 512, 128),
    "stage3": (128, 14, 14, 256, 1024, 256),
    "stage4": (128, 7, 7, 512, 2048, 512),
    # cross-stage boundary pairs: block n = last of stage k, block n+1 =
    # stage k+1's b0 (its cb1 runs at stage k's resolution, pre-pool)
    "b12": (128, 56, 56, 64, 256, 128),
    "b23": (128, 28, 28, 128, 512, 256),
    "b34": (128, 14, 14, 256, 1024, 512),
}


def main():
    import jax
    import jax.numpy as jnp

    from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
        _cb3_cb1_batch_tile, fused_cb3_cb1_int8)

    n1, n2, reps = 5, 25, 3
    stages = sys.argv[1:] or ["stage1"]

    for stage in stages:
        n, h, w, cm, c, c1 = SHAPES[stage]
        rng = np.random.RandomState(0)
        x8 = jax.device_put(jnp.asarray(
            rng.randint(-127, 128, (n, h, w, cm), np.int8)))
        res8 = jax.device_put(jnp.asarray(
            rng.randint(-127, 128, (n, h, w, c), np.int8)))
        f32 = jnp.float32
        ops = {
            "k3": jnp.asarray(rng.randint(-127, 128, (cm, c), np.int8)),
            "s3": jnp.asarray(rng.rand(1, c) * 1e-3, f32),
            "b3": jnp.asarray(rng.randn(1, c), f32),
            "k1": jnp.asarray(rng.randint(-127, 128, (c, c1), np.int8)),
            "s1": jnp.asarray(rng.rand(1, c1) * 1e-3, f32),
            "b1": jnp.asarray(rng.randn(1, c1), f32),
            "scl": jnp.asarray([[0.01, 0.02, 0.03]], f32),
        }
        ops = {k: jax.device_put(v) for k, v in ops.items()}

        def xla_pair(x8, res8):
            o = jnp.einsum("nhwc,cd->nhwd", x8, ops["k3"],
                           preferred_element_type=jnp.int32)
            o = o.astype(f32) * ops["s3"] + ops["b3"]
            out = o + res8.astype(f32) * ops["scl"][0, 0]
            out8 = jnp.clip(out / ops["scl"][0, 1] + 0.5, 0.0, 127.0) \
                .astype(jnp.int8)
            y = jnp.einsum("nhwc,cd->nhwd", out8, ops["k1"],
                           preferred_element_type=jnp.int32)
            y = y.astype(f32) * ops["s1"] + ops["b1"]
            y8 = jnp.clip(y / ops["scl"][0, 2] + 0.5, 0.0, 127.0) \
                .astype(jnp.int8)
            return out8, y8

        def timed(fn):
            fn(x8, res8)  # compile+warm

            def run(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    o, y = fn(x8, res8)
                np.asarray(y[:1, 0, 0, :4])
                return time.perf_counter() - t0

            return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(reps))

        results = {"xla": round(timed(jax.jit(xla_pair)) * 1e3, 3)}
        default_bt = _cb3_cb1_batch_tile(n, h, w, c)
        bts = [int(r) for r in os.environ.get("BTS", "").split(",") if r] \
            or sorted({max(default_bt // 2, 1), default_bt, default_bt * 2})
        s8_dots = [None] if c > 1024 else [None, True]
        hcs = [int(r) for r in os.environ.get("HCS", "0").split(",") if r]
        for bt in bts:
            if n % bt:
                continue
            for s8 in s8_dots:
                for hc in hcs:
                    if hc and h % hc:
                        continue
                    key = (f"pallas:bt{bt}" + (f":hc{hc}" if hc else "")
                           + (":s8" if s8 else ""))
                    fn = jax.jit(
                        lambda a, b, _bt=bt, _s8=s8, _hc=hc: fused_cb3_cb1_int8(
                            a, b, ops, batch_tile=_bt, row_chunk=_hc,
                            s8_dot=_s8))
                    try:
                        results[key] = round(timed(fn) * 1e3, 3)
                    except Exception as e:  # VMEM OOM etc.
                        results[key] = str(e)[:80]
        print(json.dumps({stage: results}))


if __name__ == "__main__":
    main()
