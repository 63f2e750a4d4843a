"""Stage-1 variant timing on the real chip (VERDICT r4 perf lever #1a).

Times jitted PREFIXES of the int8 CLIP RN50 serving graph (preprocess+stem
vs preprocess+stem+stage1-variant) with bench.py's slope timing; the delta is
the in-graph stage-1 cost of each variant. Variants:

  xla            the default XLA stage-1 (epilogue-fused int8 graph)
  pallas:btN     ops/pallas/bottleneck_kernel.fused_stage1_int8, batch_tile N

Round-4 measurements (v5e, batch 128, stem prefix 1.573 ms):
  xla 2.876 ms | pallas v1 bt1 8.9 ms (bt4 VMEM-OOM) | an im2col v2
  (cb2 as ONE K=576 dot over 9 VMEM shifted copies, whole stage in one
  kernel, VMEM-resident residuals, 100 MB vmem_limit_bytes) measured
  7.904 ms — the 9 copies are VPU-copy-bound, same failure mode as the
  stem3 im2col kernel (STATUS.md). Both Pallas directions (per-tap K=64
  dots: MXU-rate-bound; im2col K=576: copy-bound) are measured negative
  vs XLA's conv emitter; the v2 kernel was deleted, numbers recorded here
  and in STATUS.md so nobody re-walks this path.

Usage: python tools/bench_stage1.py [xla pallas:bt4 ...]   (tunnel up)
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

    from embodied_clip_tpu.models.encoders import _row_major_format, build_encoder
    from embodied_clip_tpu.ops import quantize as qz
    from embodied_clip_tpu.parity import golden_frames

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n1, n2, reps = 10, 60, 3
    variants = sys.argv[1:] or ["xla", "pallas:bt1", "pallas:bt4", "pallas:bt8"]

    enc = build_encoder("clip_rn50", dtype=jnp.bfloat16).fold_bn()
    enc = enc.quantize(golden_frames(n=32))
    q = enc.variables["qtrunk"]
    stage_sizes = enc.stage_sizes
    pre = enc.preprocess
    a = q["act_scales"]

    def stem_t8(qq, frames):
        x = pre(frames)

        def fp_conv(name, t, stride=1, relu=True):
            sub = qq["fp"][name]["conv"]
            out = qz._conv(t.astype(jnp.bfloat16),
                           jnp.asarray(sub["kernel"], jnp.bfloat16),
                           stride).astype(jnp.float32)
            out = out + jnp.asarray(sub["bias"], jnp.float32)
            return jax.nn.relu(out) if relu else out

        t = fp_conv("stem1", x, 2)
        t = fp_conv("stem2", t)
        t = fp_conv("stem3", t, relu=False)
        return qz._avg_pool_int8(qz._requant(t, a["stem.out"]), 2)

    def make_variant(spec):
        if spec == "stem":
            return stem_t8
        if spec == "xla":
            def f(qq, frames):
                x = pre(frames)
                return qz.quantized_trunk_apply(qq, x, stage_sizes[:1])
            return f
        kind, _, bt = spec.partition(":bt")
        bt = int(bt or 1)
        if kind == "pallas":
            from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
                fused_stage1_int8,
            )

            def f(qq, frames, _bt=bt):
                t8 = stem_t8(qq, frames)
                return fused_stage1_int8(t8, qz.stage1_int8_operands(qq),
                                         batch_tile=_bt)
            return f
        raise ValueError(spec)

    rng = np.random.RandomState(0)
    fmt = _row_major_format(3)
    bufs = [jax.device_put(
        jnp.asarray(rng.randint(0, 256, (batch, 300, 300, 3), np.uint8)
                    .reshape(batch, 300, 900)),
        *([fmt] if fmt is not None else []))
        for _ in range(2)]

    def drain(out):
        return np.asarray(out.reshape(-1)[:4].astype(jnp.float32))

    def time_fn(fn):
        jf = (jax.jit(fn, in_shardings=(None, fmt)) if fmt is not None
              else jax.jit(fn))
        drain(jf(q, bufs[0]))

        def run(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = jf(q, bufs[i % 2])
            drain(out)
            return time.perf_counter() - t0

        return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(reps)) * 1e3

    base = time_fn(make_variant("stem"))
    print(f"stem prefix: {base:.3f} ms", flush=True)
    results = {}
    for spec in variants:
        ms = time_fn(make_variant(spec))
        results[spec] = round(ms - base, 3)
        print(f"{spec:14s} stage1 delta {ms - base:7.3f} ms "
              f"(prefix {ms:.3f})", flush=True)
    # first variant output vs others: quick bit-exactness check at batch 8
    small = jnp.asarray(rng.randint(0, 256, (8, 300, 300, 3), np.uint8)
                        .reshape(8, 300, 900))
    outs = {s: np.asarray(jax.jit(make_variant(s))(q, small)
                          .astype(jnp.float32)) for s in variants}
    ref = outs[variants[0]]
    for s, o in outs.items():
        d = np.abs(o - ref)
        print(f"exactness {s}: max|Δ|={d.max():.3f} "
              f"frac>0={float((d != 0).mean()):.5f}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
