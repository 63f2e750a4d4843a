"""Per-stage profile of the int8 CLIP RN50 serving graph on the real chip.

Times jitted PREFIXES of the serving graph (preprocess; +stem; +stage1..4;
full encode with heads) with the same slope-timing bench.py uses (tunnel
latency cancels in the difference of a short and a long run); consecutive
differences give per-stage cost. Prefix boundaries cut at the stage output,
so each stage's epilogue fusions are charged to that stage.

Usage: python tools/profile_serving.py  (tunnel up; ~2 min/prefix)
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

    enc = build_encoder("clip_rn50", dtype=jnp.bfloat16).fold_bn()
    enc = enc.quantize(golden_frames(n=32))
    q = enc.variables["qtrunk"]
    stage_sizes = enc.stage_sizes
    pre = enc.preprocess

    # The same env-derived kernel flags _encode_impl reads (models/encoders.py):
    # every prefix must run the SAME graph configuration as the full encode,
    # or the full+heads delta silently absorbs each stage's kernel-vs-XLA
    # difference and per-stage attribution is corrupted (ADVICE r3).
    flags = dict(
        pallas_stage1=os.environ.get("ECT_PALLAS_STAGE1", "0") == "1",
        pallas_resblocks=os.environ.get("ECT_PALLAS_RESBLOCKS", "0") == "1",
        pallas_stem=os.environ.get("ECT_PALLAS_STEM", "0") == "1",
    )

    def stem_only(qq, frames):
        x = pre(frames)

        # mirror of quantized_trunk_apply's stem (ops/quantize.py)
        def fp_conv(name, t, stride=1, relu=True):
            sub = qq["fp"][name]["conv"]
            out = qz._conv(t.astype(jnp.bfloat16),
                           jnp.asarray(sub["kernel"], jnp.bfloat16),
                           stride).astype(jnp.float32)
            out = out + jnp.asarray(sub["bias"], jnp.float32)
            return jax.nn.relu(out) if relu else out

        t = fp_conv("stem1", x, 2)
        t = fp_conv("stem2", t)
        if flags["pallas_stem"]:
            from embodied_clip_tpu.ops.pallas.stem_kernel import (
                stem3_requant_pool_int8,
            )

            sub = qq["fp"]["stem3"]["conv"]
            return stem3_requant_pool_int8(
                t.astype(jnp.bfloat16), sub["kernel"], sub["bias"],
                qq["act_scales"]["stem.out"])
        t = fp_conv("stem3", t, relu=False)
        return qz._avg_pool_int8(qz._requant(t, qq["act_scales"]["stem.out"]), 2)

    def make_prefix(k):
        def f(qq, frames):
            x = pre(frames)
            return qz.quantized_trunk_apply(qq, x, stage_sizes[:k], **flags)
        return f

    prefixes = [("preprocess", lambda qq, frames: pre(frames)),
                ("stem", stem_only)]
    for k in range(1, len(stage_sizes) + 1):
        prefixes.append((f"stage{k}", make_prefix(k)))
    prefixes.append(("full+heads", lambda qq, frames: enc._encode_impl(
        {"qtrunk": qq, "attnpool": enc._attnpool_params}, frames)))

    rng = np.random.RandomState(0)
    fmt = _row_major_format(3)
    bufs = [jax.device_put(
        jnp.asarray(rng.randint(0, 256, (batch, 300, 300, 3), np.uint8)
                    .reshape(batch, 300, 900)),
        *([fmt] if fmt is not None else []))
        for _ in range(2)]

    def drain(out):
        if isinstance(out, dict):
            out = out[sorted(out)[0]]
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
