"""Sweep per-compile XLA options over the serving encode graph.

XLA_FLAGS is rejected by the axon tunnel, but jit(compiler_options=...) passes
through (round-4 discovery) — this is the only route to XLA scheduling/fusion
knobs on this runtime. Builds the quantized CLIP RN50 encoder once, then for
each candidate option set re-jits the same encode closure and slope-times it
(same methodology as bench.py: min over reps of (run(n2)-run(n1))/(n2-n1)).

Usage: python tools/bench_xla_opts.py            # built-in candidate list
       ECT_SWEEP='name:k=v,k=v;name2:k=v' python tools/bench_xla_opts.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from embodied_clip_tpu.models.encoders import build_encoder, _row_major_format
    from embodied_clip_tpu.parity import golden_frames

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n1, n2 = 10, 60
    reps = int(os.environ.get("BENCH_REPS", "3"))

    enc = build_encoder("clip_rn50", dtype=jnp.bfloat16).fold_bn()
    enc = enc.quantize(golden_frames(n=32))

    fmt = _row_major_format(3)
    rng = np.random.RandomState(0)
    host = [rng.randint(0, 256, (batch, 300, 300, 3), np.uint8)
            .reshape(batch, 300, 900) for _ in range(2)]
    put = (lambda a: jax.device_put(a, fmt)) if fmt is not None else jax.device_put
    bufs = [put(jnp.asarray(h)) for h in host]

    raw = os.environ.get("ECT_SWEEP", "")
    if raw:
        cands = []
        for part in raw.split(";"):
            name, _, kvs = part.partition(":")
            cands.append((name, dict(kv.split("=", 1)
                                     for kv in kvs.split(",") if "=" in kv)))
    else:
        cands = [
            ("default", None),
            ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
            ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
            ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
            ("lhs+vmem48m", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                             "xla_tpu_scoped_vmem_limit_kib": "49152"}),
        ]

    results = {}
    for name, opts in cands:
        try:
            fn = jax.jit(enc._encode_impl, in_shardings=(None, fmt),
                         compiler_options=opts) if fmt is not None else \
                jax.jit(enc._encode_impl, compiler_options=opts)
            out = fn(enc.variables, bufs[0])
            np.asarray(out["clip_attnpool"][0, :4])  # compile + warm

            def run(n):
                t0 = time.perf_counter()
                o = None
                for i in range(n):
                    o = fn(enc.variables, bufs[i % 2])
                np.asarray(o["clip_attnpool"][0, :4])
                return time.perf_counter() - t0

            per = min((run(n2) - run(n1)) / (n2 - n1) for _ in range(reps))
            results[name] = round(batch / per, 1)
        except Exception as e:
            results[name] = str(e)[:160]
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
