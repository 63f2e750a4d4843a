"""int4/s4 stage-1 activation experiment — measurement harness + record.

VERDICT r4 next #1a: stage 1 is HBM-traffic-bound and the fidelity budget had
~3.5x headroom, so s4 storage of its cross-fusion activations was the one
untried traffic lever. Measured round 5 — NEGATIVE, twice over:

1. S4 materialization probe (this file, --probe): a (128,56,56,256) tensor
   written behind an optimization_barrier and read by two consumers:
     s8: 1.085 ms    s4: 21.57 ms  (~20x)
   XLA TPU scalarizes S4 stores; S4 between fusions is ~20x the cost of s8,
   not half.

2. In-graph (ECT_INT4_STAGE1=2, the 256-wide block-output/shortcut tensors,
   full serving graph via bench.py): 14,445.6 f/s vs 14,339.2 default — equal
   within the tunnel's +-3% noise. XLA avoids the catastrophic store by
   folding the consumer-side s4->s8 widening back into the producer, i.e. the
   stored tensor stays s8-sized: NO traffic saved, only the 4-bit grid's
   fidelity loss (full-size RN50 cosine: see STATUS.md round-5 table).

Conclusion: no s4 win exists on this runtime. Revisit only if a future
XLA/libtpu packs S4 stores (re-run --probe first: it answers in seconds).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def probe():
    import jax
    import jax.numpy as jnp

    N = (128, 56, 56, 256)

    def make(dt):
        @jax.jit
        def fn(off):
            base = (jax.lax.broadcasted_iota(jnp.int32, N, 3) + off) % 7
            t = base.astype(dt)
            t = jax.lax.optimization_barrier(t)
            a = t.astype(jnp.int32).sum(dtype=jnp.int32)
            b = (t.astype(jnp.int32) * 3).sum(dtype=jnp.int32)
            return a + b
        return fn

    off = jnp.int32(1)
    for name, dt in [("s4", jnp.int4), ("s8", jnp.int8)]:
        fn = make(dt)
        fn(off).block_until_ready()

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(off)
            int(o)
            return time.perf_counter() - t0

        per = (run(25) - run(5)) / 20
        print(f"{name}: {per * 1e3:.3f} ms/iter")


def fidelity():
    """Full-size CLIP RN50 cosine vs f32 for each ECT_INT4_STAGE1 variant."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from embodied_clip_tpu.models.encoders import build_encoder
    from embodied_clip_tpu.parity import cosine_distance, golden_frames

    frames = golden_frames(n=8)
    # same seed -> identical weights; the delta measured is quantization error
    ref = build_encoder("clip_rn50", dtype=jnp.float32).fold_bn()
    qenc = build_encoder("clip_rn50", dtype=jnp.bfloat16).fold_bn() \
        .quantize(golden_frames(n=32))
    out_ref = ref.encode(frames)
    for variant in ("0", "2", "1"):
        os.environ["ECT_INT4_STAGE1"] = variant
        out = qenc.encode(frames)
        ds = {k: float(cosine_distance(np.asarray(out_ref[k], np.float32),
                                       np.asarray(out[k], np.float32)))
              for k in out_ref}
        print("ECT_INT4_STAGE1=" + variant,
              {k: f"{v:.2e}" for k, v in sorted(ds.items())})


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe()
    else:
        fidelity()
