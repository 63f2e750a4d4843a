"""Train goal-conditioned ObjectNav with DD-PPO on the hermetic jittable env.

The whole loop (env rollouts, frozen encode if frames-mode, GAE, PPO epochs) is one
jitted step; runs anywhere — CPU, one TPU chip, or a TPU slice (env batch shards over
the mesh 'dp' axis).

Usage: python examples/train_objectnav.py [--iters 200] [--frames] [--mesh]
"""

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--env-batch", type=int, default=32)
    p.add_argument("--rollout", type=int, default=64)
    p.add_argument("--frames", action="store_true",
                   help="uint8 frame observations + a frozen encoder in-rollout")
    p.add_argument("--encoder", default="clip_rn50",
                   help="frozen encoder for --frames (any ENCODER_SPECS name; "
                        "ResNets feed the conv-map policy path, ViTs the "
                        "flat-embed path)")
    p.add_argument("--int8", action="store_true",
                   help="serve the frozen encoder int8 (PTQ trunk / ViT blocks)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the env batch over all devices (DD-PPO SPMD)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from embodied_clip_tpu.envs.gridworld import GridNavEnv
    from embodied_clip_tpu.models.policy import ActorCritic
    from embodied_clip_tpu.training.ddppo import DDPPOConfig, DDPPOLearner
    from embodied_clip_tpu.training.ppo import PPOConfig

    encode = None
    visual_is_map = False
    if args.frames:
        from embodied_clip_tpu.models.encoders import build_encoder

        enc = build_encoder(args.encoder, dtype=jnp.bfloat16).fold_bn()
        if args.int8:
            # Calibrate on structured representative frames (quantize()'s
            # no-synthetic-noise contract), as the RL experiments do.
            from embodied_clip_tpu.parity import golden_frames

            enc = enc.quantize(golden_frames(n=16))
        fn, variables = enc.encode_fn(), enc.variables
        probe = jax.eval_shape(lambda: fn(variables, jnp.zeros(
            (1, enc.image_size, enc.image_size, 3), jnp.uint8)))
        # ResNets feed the conv-map policy path (prefer *_conv over the
        # pooled embedding); ViTs emit only the flat embedding.
        key = next((k for k in sorted(probe) if k.endswith("_conv")),
                   sorted(probe)[0])
        visual_is_map = probe[key].ndim == 4
        encode = lambda f: fn(variables, f)[key]

    env = GridNavEnv(size=8, max_steps=64, frame_obs=args.frames,
                     flat_obs=not args.frames)
    policy = ActorCritic(
        num_actions=env.num_actions, goal_kind="object_embed",
        num_goal_classes=env.num_classes, hidden=512,
        visual_is_map=visual_is_map,
    )
    mesh = None
    if args.mesh:
        from embodied_clip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print("mesh:", mesh)
    learner = DDPPOLearner(env, policy, DDPPOConfig(
        rollout_len=args.rollout, env_batch=args.env_batch,
        ppo=PPOConfig(lr=3e-4, epochs=4)), encode_fn=encode, mesh=mesh)

    params, opt, act = learner.init(jax.random.PRNGKey(1))
    params, opt, act, m = learner.train_iteration(params, opt, act)  # compile
    import jax as _jax
    _jax.block_until_ready(m["loss"])
    t0 = time.time()
    for it in range(args.iters):
        params, opt, act, m = learner.train_iteration(params, opt, act)
        if (it + 1) % 20 == 0:
            steps = (it + 1) * args.rollout * args.env_batch
            print(f"iter {it+1}: success={float(m['success']):.2f} "
                  f"spl={float(m['spl']):.2f} entropy={float(m['entropy']):.2f} "
                  f"({steps / (time.time() - t0):.0f} env-steps/s)")
    _jax.block_until_ready(m["loss"])
    steps = args.iters * args.rollout * args.env_batch
    print(f"final: success={float(m['success']):.2f} "
          f"{steps / (time.time() - t0):.0f} env-steps/s (post-compile)")


if __name__ == "__main__":
    main()
