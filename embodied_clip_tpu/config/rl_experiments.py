"""RL experiment configs: the reference's documented experiment grid as registered
dataclasses (SURVEY.md §5 config consolidation).

Name parity with the reference runbooks:
  objectnav_robothor_rgb_{clipresnet50,resnet50,resnet18,clipresnet50x16}gru_ddppo
      (baselines_robothor_objectnav.md:48-51; imagenet_vs_objectnav.md:6-11)
  zeroshot_objectnav_robothor_rgb_clipresnet50gru_ddppo[_eval]
      (zeroshot_objectnav.md:17-28)
  ddppo_{objectnav,pointnav}_rgb_{clip,imagenet}, ddppo_objectnav_{rgb,rgbd}
      (baselines_habitat.md:63-75; the suffix-less forms train from scratch)
  one_phase_rgb_{clipresnet50,resnet50}_dagger
      (baselines_ithor_rearrangement.md:8-12)
  two_phase_rgb_{clipresnet50,resnet50}_dagger
      (walkthrough→unshuffle, baselines_ithor_rearrangement.md:4-6)

Each experiment trains on one of three backends:
  fake     hermetic jittable gridworld (default; runs anywhere, incl. CI)
  thor     AI2-THOR via envs/thor.py inside a VectorEnv pool (needs ai2thor)
  habitat  habitat-lab via envs/habitat.py (needs habitat-sim)
The TPU side (frozen encoder + policy + DD-PPO/DAgger update) is identical across
backends; only rollout collection differs (on-device scan vs host pool).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from embodied_clip_tpu.config.experiments import Experiment, _REGISTRY
from embodied_clip_tpu.constants import ROBOTHOR_OBJECT_TYPES

_ENCODER_BY_NAME = {
    "clipresnet50": "clip_rn50",
    "clipresnet50x16": "clip_rn50x16",
    "resnet50": "imagenet_rn50",
    "resnet18": "imagenet_rn18",
    "clip": "clip_rn50",
    "imagenet": "imagenet_rn50",
    "scratch": None,
}


@dataclasses.dataclass
class NavRLExperiment(Experiment):
    task: str = "objectnav"                  # objectnav | pointnav
    algo: str = "ddppo"                      # ddppo | dagger
    encoder: Optional[str] = "clip_rn50"     # None = scratch CNN trained end-to-end
    zeroshot: bool = False                   # CLIP text-embedding goals
    rgbd: bool = False                       # add a depth channel (habitat rgbd)
    dagger_aggregate: int = 8                # DAgger aggregate buffer, in rollouts
    backend: str = "fake"
    total_env_steps: int = 1_000_000
    rollout_len: int = 64
    env_batch: int = 32
    hidden: int = 512
    lr: float = 3e-4
    ppo_epochs: int = 4
    # PPO minibatched epochs + linear LR decay — the reference's habitat DD-PPO
    # training surface (baselines_habitat.md:63-75: 2 epochs × 2 minibatches,
    # use_linear_lr_decay). lr_decay_updates: 0 = constant LR; -1 = decay to 0
    # over this run's total update count; >0 = explicit update horizon.
    num_minibatches: int = 1
    lr_decay_updates: int = 0
    encoder_dtype: str = "bfloat16"
    ckpt_every_steps: int = 250_000
    eval_episodes: int = 200
    seed: int = 1
    log_dir: Optional[str] = None
    # Data-parallel replica count (the reference's NUM_GPUS knob,
    # baselines_habitat.md:63-69). >1 builds a ('dp','mp') mesh: env batch /
    # rollout sharded over dp, params replicated, gradient psum over ICI.
    dp: int = 1
    # Host-rollout double-buffering (BASELINE.md pipeline north star): split the
    # worker pool into this many groups and software-pipeline them — the device
    # act step (frozen encode + policy) for one group overlaps the other groups'
    # simulator steps. 1 = sequential act→step. PPO backends only (DAgger's
    # synchronous expert queries can't pipeline).
    pipeline_groups: int = 1
    # "native" = this repo's ActorCritic; "allenact" = the released-checkpoint
    # architecture (models/allenact_policy.py) — use with `--ckpt` pointing at
    # a convert-policy output to eval the published RoboTHOR ObjectNav models
    # (baselines_robothor_objectnav.md:54-68).
    policy_arch: str = "native"

    def _lr_decay_updates(self, envs_per_iter: Optional[int] = None) -> int:
        """Resolve the lr_decay_updates convention: -1 = linear decay to zero
        over this run's OPTIMIZER-step count (habitat's use_linear_lr_decay
        semantics, baselines_habitat.md:63-75). optax schedules advance once
        per optimizer update — ppo_epochs x num_minibatches times per train
        iteration — so the horizon counts those, not iterations; and the host
        backend's envs-per-iteration is the worker count, not env_batch."""
        if self.lr_decay_updates == -1:
            envs = envs_per_iter or self.env_batch
            iters = max(1, self.total_env_steps // (self.rollout_len * envs))
            # iter_minibatches emits min(m, B) non-empty minibatches — with
            # fewer envs than minibatches the horizon must match the actual
            # optimizer-step count or the LR never reaches zero.
            mb = max(1, min(self.num_minibatches, envs))
            return iters * max(1, self.ppo_epochs) * mb
        return self.lr_decay_updates

    def _mesh(self):
        import jax

        from embodied_clip_tpu.parallel.mesh import make_mesh

        if jax.process_count() > 1:
            # Multi-process (multi-host) run: global mesh over every process's
            # devices — dp = world device count, regardless of self.dp.
            return make_mesh()
        if self.dp <= 1:
            return None
        return make_mesh(dp=self.dp)

    # ------------------------------------------------------------------- builders

    def _build_fake_env(self):
        if self.task == "rearrange":
            from embodied_clip_tpu.envs.rearrange import GridRearrangeEnv

            return GridRearrangeEnv(size=8, max_steps=96)
        if self.task == "rearrange2":
            from embodied_clip_tpu.envs.rearrange import GridTwoPhaseRearrangeEnv

            return GridTwoPhaseRearrangeEnv(size=8, max_steps=96)
        from embodied_clip_tpu.envs.gridworld import GridNavEnv

        class_set = None
        if self.zeroshot:
            from embodied_clip_tpu.zeroshot import seen_unseen_class_ids

            class_set = seen_unseen_class_ids()[0]
        # The fake env always emits uint8 RGB frames: with a frozen encoder the
        # encoder runs INSIDE the rollout — the reference's
        # ClipResNetPreprocessor-in-rollout shape (baselines_robothor_objectnav.md:
        # 48-51) — and scratch configs train their ScratchCNN frontend on pixels
        # (habitat scratch baselines, baselines_habitat.md:75). Either way the
        # policy architecture matches the real-simulator backends, so hermetic
        # checkpoints restore into thor/habitat-backend learners and eval.
        # rgbd adds a depth channel.
        return GridNavEnv(size=8, max_steps=64, class_set=class_set, task=self.task,
                          frame_obs=True, depth_obs=self.rgbd)

    def _goal_spec(self):
        if self.zeroshot:
            return "text_embed", 1024
        if self.task == "pointnav":
            return "pointgoal", 2
        if self.task == "rearrange":
            return "none", 1  # goal is implicit in the observation
        if self.task == "rearrange2":
            return "object_embed", 1024  # the phase flag rides the embedding
        return "object_embed", 1024

    def _make_policy(self, num_actions: int, frame_obs: bool,
                     flat_obs: bool = False, num_goal_classes=None):
        """The ONE policy factory — fake-backend training, host-backend
        training, and host eval all construct through here, so checkpoints
        restore across backends (identical param trees)."""
        from embodied_clip_tpu.models.policy import ActorCritic

        if self.policy_arch == "allenact":
            # The released-checkpoint architecture (convert-policy output).
            # Same (obs, h, is_start) surface as ActorCritic, so all act/eval
            # paths drive it unchanged.
            from embodied_clip_tpu.models.allenact_policy import (
                AllenActResnetPolicy,
            )

            if self.encoder is None or not self._encoder_emits_map() \
                    or self._goal_spec()[0] != "object_embed":
                raise ValueError(
                    "policy_arch=allenact needs a conv-map frozen encoder and "
                    "object-class goals (the released RoboTHOR ObjectNav "
                    "models, baselines_robothor_objectnav.md:58-64)")
            return AllenActResnetPolicy(
                num_actions=num_actions,
                num_goal_classes=(num_goal_classes if num_goal_classes
                                  is not None else len(ROBOTHOR_OBJECT_TYPES)),
                hidden=self.hidden)
        if self.policy_arch != "native":
            raise ValueError(f"unknown policy_arch {self.policy_arch!r} "
                             "(native | allenact)")
        if frame_obs and self.encoder is not None \
                and not self._encoder_emits_map():
            # Flat-embed encoders (CLIP ViT) ride the flat-visual policy path
            # (the encoder-sweep surface, imagenet_vs_objectnav.md:6-11).
            if self.rgbd:
                raise ValueError(
                    f"rgbd requires a conv-map encoder (depth pools to the "
                    f"conv-map grid) but '{self.encoder}' emits a flat embed "
                    "— use a resnet encoder or drop rgbd")
            flat_obs = True
        goal_kind, goal_dim = self._goal_spec()
        return ActorCritic(
            num_actions=num_actions, goal_kind=goal_kind,
            num_goal_classes=(num_goal_classes if num_goal_classes is not None
                              else len(ROBOTHOR_OBJECT_TYPES)),
            goal_input_dim=goal_dim, hidden=self.hidden,
            visual_is_map=not flat_obs,
            scratch_cnn=self.encoder is None and frame_obs,
        )

    def _build_policy(self, env):
        return self._make_policy(
            env.num_actions, getattr(env, "frame_obs", False),
            getattr(env, "flat_obs", False),
            getattr(env, "num_classes", None),
        )

    def _calibration_frames(self) -> np.ndarray:
        """Representative uint8 NHWC frames for int8 PTQ activation calibration.

        Per-tensor max scales derived from synthetic noise mis-scale natural-image
        activations (ADVICE r2; extract.py's first-real-frames recipe is the
        contract) — so calibrate on the structured golden parity frames, topped up
        with frames rendered by the fake backend's env when it renders frames.
        """
        from embodied_clip_tpu.parity import golden_frames

        frames = [golden_frames(n=16)]
        if self.backend == "fake" and not self.task.startswith("rearrange") \
                and self.encoder is not None:
            import jax

            env = self._build_fake_env()
            s, obs = env.reset(jax.random.PRNGKey(0), batch=8)
            if "visual" in obs and obs["visual"].dtype == np.uint8 \
                    and obs["visual"].ndim == 4:
                v = np.asarray(obs["visual"])
                h, w = frames[0].shape[1:3]
                reps = (max(1, -(-h // v.shape[1])), max(1, -(-w // v.shape[2])))
                v = np.tile(v, (1, reps[0], reps[1], 1))[:, :h, :w]
                frames.append(v)
        return np.concatenate(frames, axis=0)

    def _encoder_emits_map(self) -> bool:
        """Whether the frozen encoder emits a spatial conv map (vs a flat
        embed). CLIP ViTs emit only `clip_embed` (B, D); those route through
        the flat-visual policy path instead of the compressor CNN."""
        if self.encoder is None:
            return True
        from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS
        from embodied_clip_tpu.models.encoders import ENCODER_SPECS

        if self.encoder not in ENCODER_SPECS:
            raise ValueError(
                f"unknown encoder '{self.encoder}' — one of "
                f"{sorted(ENCODER_SPECS)}")
        return ENCODER_SPECS[self.encoder].arch not in CLIP_VIT_CONFIGS

    def _encode_fn(self):
        """uint8 frames → frozen conv feature map; None when training from scratch
        (or for the rearrange fake env, whose observations are symbolic maps)."""
        if self.encoder is None:
            return None
        if self.backend == "fake" and self.task.startswith("rearrange"):
            return None
        import jax.numpy as jnp

        from embodied_clip_tpu.models.encoders import build_encoder

        dtype = (jnp.bfloat16 if self.encoder_dtype in ("bfloat16", "int8")
                 else jnp.float32)
        enc = build_encoder(self.encoder, dtype=dtype).fold_bn()
        if self.encoder_dtype == "int8":
            # int8-trunk serving config (ops/quantize.py for the CLIP and
            # torchvision ResNet trunks, ops/quantize_vit.py for the ViT
            # transformer blocks). Activation scales must come from
            # representative frames, never synthetic noise (noise maxima
            # mis-scale natural-image activations; ADVICE r2): calibrate on
            # frames rendered by the actual env backend, topped up with the
            # golden parity frames.
            enc = enc.quantize(self._calibration_frames())
        fn = enc.encode_fn()
        variables = enc.variables
        # Conv trunks emit a spatial map; CLIP ViTs emit only the flat
        # `clip_embed` (models/encoders.py schema) — which the policy consumes
        # through visual_is_map=False (see _make_policy).
        key = (f"{enc.spec.key_prefix}_conv" if self._encoder_emits_map()
               else "clip_embed")

        # jit here: the host rollout/eval paths call this eagerly per act step
        # (op-by-op dispatch otherwise); inside the on-device learners' jitted
        # iterations the inner jit simply inlines.
        import jax

        jfn = jax.jit(lambda v, f: fn(v, f)[key])

        def encode(frames_u8):
            return jfn(variables, frames_u8)

        return encode

    def _goal_map_fn(self, env):
        if not self.zeroshot:
            return None
        # Frozen CLIP text-goal table; without pretrained weights this is a
        # random-but-frozen table — the wiring (and seen/unseen split) is identical.
        from embodied_clip_tpu.models.clip import build_clip
        from embodied_clip_tpu.models.tokenizer import SimpleTokenizer
        from embodied_clip_tpu.zeroshot import goal_map_fn, text_goal_table

        # Real RoboTHOR class names (zeroshot_objectnav.md:31-32 vocabulary) so the
        # frozen text-goal embeddings are meaningful once real CLIP weights load.
        n = getattr(env, "num_classes", 12)
        names = list(ROBOTHOR_OBJECT_TYPES[:n])
        names += [f"object {i}" for i in range(len(names), n)]
        clip_built = build_clip("RN50")
        table = text_goal_table(clip_built, SimpleTokenizer(), names)
        return goal_map_fn(table)

    # ----------------------------------------------------------------------- train

    def train(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        import jax

        from embodied_clip_tpu.training.ddppo import DDPPOConfig, DDPPOLearner
        from embodied_clip_tpu.training.dagger import DAggerConfig, DAggerLearner
        from embodied_clip_tpu.training.ppo import PPOConfig
        from embodied_clip_tpu.utils.checkpoint import StepCheckpointer
        from embodied_clip_tpu.utils.seeding import seed_everything

        if self.backend != "fake":
            return self._train_host(output_dir, ckpt)

        key = seed_everything(self.seed)
        env = self._build_fake_env()
        policy = self._build_policy(env)
        goal_map = self._goal_map_fn(env)
        encode = self._encode_fn()

        if self.algo == "dagger":
            learner = DAggerLearner(env, policy, DAggerConfig(
                rollout_len=self.rollout_len, env_batch=self.env_batch, lr=self.lr,
                aggregate_size=self.dagger_aggregate),
                encode_fn=encode)
        else:
            learner = DDPPOLearner(env, policy, DDPPOConfig(
                rollout_len=self.rollout_len, env_batch=self.env_batch,
                num_minibatches=self.num_minibatches,
                ppo=PPOConfig(lr=self.lr, epochs=self.ppo_epochs,
                              lr_decay_updates=self._lr_decay_updates())),
                encode_fn=encode, mesh=self._mesh())
        # goal mapping for the fake env: patch collect-time goal through env wrapper
        if goal_map is not None:
            env = _GoalMappedEnv(env, goal_map)
            learner.env = env

        params, opt_state, act = learner.init(key)
        ckpts = StepCheckpointer(os.path.join(output_dir, self.name), prefix="exp")
        steps_per_iter = self.rollout_len * self.env_batch
        env_steps, it = 0, 0
        if ckpt:
            from embodied_clip_tpu.utils.checkpoint import restore_params

            params = restore_params(ckpt, params)
        else:
            # Resume-on-restart from the latest step-stamped checkpoint (DD-PPO
            # preemption tolerance; SURVEY.md §5). Full train state — params, opt
            # state (Adam moments + schedule position) AND the act carry (env state,
            # obs, hidden, PRNG key for the jittable env) — so a resumed run is
            # bitwise identical to an uninterrupted one (reference's restorable
            # …__steps_N.pt contract, baselines_robothor_objectnav.md:58-64).
            latest, state = ckpts.restore_latest(
                {"params": params, "opt_state": opt_state, "act": act}
            )
            if latest is not None:
                params, opt_state = state["params"], state["opt_state"]
                act = state["act"]
                env_steps = latest
                it = env_steps // steps_per_iter
                if (mesh := self._mesh()) is not None:
                    from embodied_clip_tpu.parallel.mesh import replicate, shard_batch

                    params = replicate(params, mesh)
                    opt_state = replicate(opt_state, mesh)
                    act = shard_batch(act, mesh, batch=self.env_batch)

        writer = None
        if self.log_dir:
            from embodied_clip_tpu.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(self.log_dir, self.name))

        last_ckpt = env_steps
        metrics = {}

        def save_state(step):
            ckpts.save(step, {"params": params, "opt_state": opt_state, "act": act})

        # Wall-clock throughput is a logged trainer metric on the on-device
        # path too (VERDICT r3 weak #4) — SPMD scaling claims come from the
        # trainer that produced them, not ad-hoc measurements. Windows are
        # synced on the jitted iteration's output so the rate is device time,
        # not dispatch time.
        import time as _time

        t_start = _time.perf_counter()
        start_steps = env_steps
        win_t, win_steps, win_it = t_start, env_steps, it
        while env_steps < self.total_env_steps:
            if self.algo == "dagger":
                params, opt_state, act, metrics = learner.train_iteration(
                    params, opt_state, act, it)
            else:
                params, opt_state, act, metrics = learner.train_iteration(
                    params, opt_state, act)
            env_steps += steps_per_iter
            it += 1
            if it % 10 == 0:
                jax.block_until_ready(metrics)
                now = _time.perf_counter()
                metrics["env_steps_per_s"] = (
                    (env_steps - win_steps) / max(now - win_t, 1e-9))
                metrics["iteration_time_s"] = (
                    (now - win_t) / max(it - win_it, 1))
                win_t, win_steps, win_it = now, env_steps, it
            if writer and it % 10 == 0:
                for k in ("success", "spl", "loss", "entropy", "reward_per_step",
                          "env_steps_per_s", "iteration_time_s"):
                    if k in metrics:
                        writer.add_scalar(k, float(metrics[k]), env_steps)
            if env_steps - last_ckpt >= self.ckpt_every_steps:
                save_state(env_steps)
                last_ckpt = env_steps
        save_state(env_steps)
        jax.block_until_ready(metrics)
        total_t = _time.perf_counter() - t_start
        if "env_steps_per_s" not in metrics and it > 0:
            # no 10-iteration window completed: report the whole run's steps
            # over the whole run's time (NOT the last partial window's steps
            # over total time, which understates the rate)
            metrics["env_steps_per_s"] = (
                (env_steps - start_steps) / max(total_t, 1e-9))
            metrics["iteration_time_s"] = total_t / max(it, 1)
        if writer:
            writer.close()
        out = {k: float(v) for k, v in metrics.items()}
        out["env_steps"] = env_steps
        self._last_params = params
        self._last_policy = policy
        self._last_env = env
        return out

    # host backends -------------------------------------------------------------

    num_workers: int = 8
    straggler_cutoff: float = 1.0   # <1.0 enables DD-PPO laggard masking
    # Inject a Controller-compatible factory into the THOR adapters (tests pass
    # the scripted fixture; None = the real ai2thor.Controller).
    controller_factory: Optional[object] = None
    # Override the simulator episode horizon (None = each adapter's default).
    max_episode_steps: Optional[int] = None

    def _host_env_fns(self, eval_split: bool = False, seed_offset: int = 0):
        """Per-worker env factories. seed_offset shifts worker seeds to GLOBAL
        env indices in multi-process DD-PPO (process p's workers are global
        envs p*num_workers..(p+1)*num_workers-1), so an N-process run steps
        exactly the envs a single-process run of N*num_workers would."""
        ms = {} if self.max_episode_steps is None \
            else {"max_steps": self.max_episode_steps}
        w0, w1 = seed_offset, seed_offset + self.num_workers
        if self.backend == "hostgrid":
            from embodied_clip_tpu.envs.host_gridworld import HostGridNav

            return [lambda i=i: HostGridNav(size=6, seed=i, **ms)
                    for i in range(w0, w1)], (56, 56, 3)
        if self.backend == "thor":
            cf = self.controller_factory
            if self.task in ("rearrange", "rearrange2"):
                from embodied_clip_tpu.envs.thor_rearrange import (
                    THORRearrangeEnv, THORTwoPhaseRearrangeEnv,
                )

                cls = (THORTwoPhaseRearrangeEnv if self.task == "rearrange2"
                       else THORRearrangeEnv)
                scenes = [f"FloorPlan{i}" for i in range(1, 21)]
                return [lambda s=seed: cls(
                            scenes, seed=s, controller_factory=cf, **ms)
                        for seed in range(w0, w1)], (300, 300, 3)
            from embodied_clip_tpu.envs.thor import THORObjectNavEnv

            # RoboTHOR scene split: train scenes for rollouts, val scenes for
            # checkpoint eval (the reference's eval contract,
            # baselines_robothor_objectnav.md:54-68).
            if eval_split:
                scenes = [f"FloorPlan_Val{i}_{j}"
                          for i in range(1, 4) for j in range(1, 6)]
            else:
                scenes = [f"FloorPlan_Train{i}_{j}"
                          for i in range(1, 13) for j in range(1, 6)]
            return [lambda s=seed: THORObjectNavEnv(
                        scenes, seed=s, controller_factory=cf, **ms)
                    for seed in range(w0, w1)], (300, 300, 3)
        if self.backend == "habitat":
            from embodied_clip_tpu.envs.habitat import HabitatNavEnv

            cfg = os.environ.get("ECT_HABITAT_CONFIG", f"configs/tasks/{self.task}.yaml")
            # checkpoint eval runs on the yaml's val split (--run-type eval,
            # baselines_habitat.md:88-97); training uses the configured split.
            split = "val" if eval_split else None
            return [lambda s=seed: HabitatNavEnv(cfg, task=self.task, seed=s,
                                                 rgb_only=not self.rgbd,
                                                 split=split, **ms)
                    for seed in range(w0, w1)], (480, 640, 3)
        raise ValueError(f"unknown backend {self.backend!r}")

    def _train_host(self, output_dir: str, ckpt: Optional[str]) -> dict:
        """THOR/Habitat (and hostgrid test) backends: VectorEnv pool + host rollouts
        + jitted PPO update on device."""
        from embodied_clip_tpu.parallel.distributed import initialize_distributed

        # Multi-host bring-up BEFORE any jax backend use (jax.distributed
        # contract). No-op in single-process runs; idempotent when the entry
        # point already initialized the cluster. This is the reference's
        # N-learner-processes deployment (baselines_habitat.md:63-69): each
        # process owns a VectorEnv pool of num_workers simulators; one global
        # SPMD update allreduces over ICI/DCN.
        initialize_distributed()

        import jax

        from embodied_clip_tpu.envs.vector import VectorEnv
        from embodied_clip_tpu.training.ddppo import DDPPOConfig
        from embodied_clip_tpu.training.host_ppo import HostPPOLearner
        from embodied_clip_tpu.training.ppo import PPOConfig
        from embodied_clip_tpu.utils.checkpoint import StepCheckpointer, restore_pytree
        from embodied_clip_tpu.utils.seeding import seed_everything

        world = jax.process_count()
        pid = jax.process_index()
        if world > 1 and self.algo == "dagger":
            raise NotImplementedError(
                "multi-process DAgger is not supported (synchronous expert "
                "queries don't shard); run DAgger single-process")

        key = seed_everything(self.seed)
        env_fns, frame_shape = self._host_env_fns(
            seed_offset=pid * self.num_workers)
        # DAgger has no straggler-cutoff semantics (expert queries are synchronous).
        cutoff = 1.0 if self.algo == "dagger" else self.straggler_cutoff
        groups = self.pipeline_groups if self.algo != "dagger" else 1
        groups = max(1, min(groups, len(env_fns)))
        if groups == 1:
            venv = VectorEnv(env_fns, frame_shape=frame_shape, cutoff_fraction=cutoff)
            venvs = venv
        else:
            # Double-buffered host rollouts: one pool per pipeline group; the
            # collector overlaps device act steps with the other groups' env steps.
            bounds = [len(env_fns) * g // groups for g in range(groups + 1)]
            pools = [VectorEnv(env_fns[bounds[g]:bounds[g + 1]],
                               frame_shape=frame_shape, cutoff_fraction=cutoff)
                     for g in range(groups)]
            venv, venvs = pools[0], pools
        try:
            encode = self._encode_fn()
            if self.task.startswith("rearrange"):
                from embodied_clip_tpu.envs.thor_rearrange import REARRANGE_ACTIONS

                num_actions = len(REARRANGE_ACTIONS)
            else:
                num_actions = 6  # the unified THOR ObjectNav/PointNav space
            policy = self._make_policy(num_actions, frame_obs=True)
            if self.algo == "dagger":
                from embodied_clip_tpu.training.dagger import (
                    DAggerConfig, HostDAggerLearner,
                )

                learner = HostDAggerLearner(venv, policy, DAggerConfig(
                    rollout_len=self.rollout_len, env_batch=venv.n, lr=self.lr,
                    epochs=self.ppo_epochs, aggregate_size=self.dagger_aggregate),
                    encode_fn=encode, goal_map_fn=self._goal_map_fn(venv),
                    mesh=self._mesh())
            else:
                global_envs = len(env_fns) * world
                learner = HostPPOLearner(venvs, policy, DDPPOConfig(
                    rollout_len=self.rollout_len, env_batch=global_envs,
                    num_minibatches=self.num_minibatches,
                    ppo=PPOConfig(lr=self.lr, epochs=self.ppo_epochs,
                                  lr_decay_updates=self._lr_decay_updates(
                                      envs_per_iter=global_envs))),
                    encode_fn=encode, goal_map_fn=self._goal_map_fn(venv),
                    mesh=self._mesh(),
                    env_id_offset=pid * len(env_fns))
            from embodied_clip_tpu.parallel.mesh import local_view

            params, opt_state = learner.init(key)
            ckpts = StepCheckpointer(os.path.join(output_dir, self.name), prefix="exp")

            def host_state():
                # Host-materialized train state: in multi-process runs the live
                # arrays are global (non-addressable); their local shard holds
                # the full replicated value. EVERY process must call save —
                # orbax coordinates multi-host saves with a cross-process
                # barrier (primary host writes, the rest participate); a
                # process-0-only save deadlocks at that barrier.
                return jax.tree.map(np.asarray, local_view(
                    {"params": params, "opt_state": opt_state}))

            env_steps = 0
            if ckpt:
                from embodied_clip_tpu.utils.checkpoint import restore_params

                restored = restore_params(ckpt, local_view(params))
                params = restored
                if (mesh := self._mesh()) is not None:
                    from embodied_clip_tpu.parallel.mesh import replicate

                    params = replicate(params, mesh)
            else:
                # Full train state; external simulator state can't be checkpointed
                # (lives in worker processes), so envs restart fresh on resume —
                # same as the reference (torch ckpts hold no simulator state).
                latest, state = ckpts.restore_latest(
                    local_view({"params": params, "opt_state": opt_state})
                )
                if latest is not None:
                    params, opt_state = state["params"], state["opt_state"]
                    env_steps = latest
                    if (mesh := self._mesh()) is not None:
                        from embodied_clip_tpu.parallel.mesh import replicate

                        params = replicate(params, mesh)
                        opt_state = replicate(opt_state, mesh)
            steps_per_iter = self.rollout_len * len(env_fns) * world
            last_ckpt = env_steps
            metrics = {}
            writer = None
            if self.log_dir and pid == 0:
                from embodied_clip_tpu.utils.tensorboard import SummaryWriter

                writer = SummaryWriter(os.path.join(self.log_dir, self.name))
            while env_steps < self.total_env_steps:
                if self.algo == "dagger":
                    params, opt_state, metrics = learner.train_iteration(
                        params, opt_state, env_steps // steps_per_iter)
                else:
                    params, opt_state, metrics = learner.train_iteration(
                        params, opt_state)
                env_steps += steps_per_iter
                if writer:
                    # throughput + per-stage timing are first-class trainer
                    # metrics (SURVEY.md §5 tracing row)
                    for k in ("success", "spl", "loss", "env_steps_per_s",
                              "act_frac", "env_step_frac", "update_frac"):
                        if k in metrics:
                            writer.add_scalar(k, float(metrics[k]), env_steps)
                if env_steps - last_ckpt >= self.ckpt_every_steps:
                    ckpts.save(env_steps, host_state())
                    last_ckpt = env_steps
            ckpts.save(env_steps, host_state())
            if writer:
                writer.close()
            self._last_params = params
            self._last_policy = policy
            out = {k: float(v) for k, v in metrics.items()}
            out["env_steps"] = env_steps
            return out
        finally:
            for pool in (venvs if isinstance(venvs, list) else [venvs]):
                pool.close()

    # ------------------------------------------------------------------------ eval

    def evaluate(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        """Checkpoint evaluation. backend=fake evaluates on the jittable
        gridworld; backend=thor/habitat/hostgrid evaluates ON THE SIMULATOR
        (val scenes for RoboTHOR) via evaluate_policy_host — the reference's
        eval contract (baselines_robothor_objectnav.md:54-68,
        baselines_habitat.md:88-97). Both paths emit the same metrics.json
        schema."""
        import jax

        from embodied_clip_tpu.training.evaluate import (
            compute_scores, evaluate_policy, write_metrics_json,
        )
        from embodied_clip_tpu.utils.checkpoint import restore_pytree

        if self.backend != "fake":
            episodes = self._evaluate_host(ckpt)
        else:
            env = getattr(self, "_last_env", None) or self._build_fake_env()
            policy = getattr(self, "_last_policy", None) or self._build_policy(env)
            params = getattr(self, "_last_params", None)
            if ckpt:
                restored = restore_pytree(ckpt)
                params = restored["params"] if "params" in restored else restored
            assert params is not None, "evaluate needs --ckpt or a preceding train()"

            if self.zeroshot:
                # Evaluate on the full vocabulary (seen + unseen), reference
                # zeroshot_objectnav.md:22: eval runs with the original 12 object
                # types.
                env = dataclasses.replace(getattr(env, "inner", env),
                                          class_set=None)

            # Real vocabulary in the eval records (the reference's per-object-type
            # aggregation schema, zeroshot_objectnav.md:34-47, keys on class names).
            n_classes = getattr(env, "num_classes", 12)
            names = list(ROBOTHOR_OBJECT_TYPES[:n_classes])
            names += [f"Class{i}" for i in range(len(names), n_classes)]
            episodes = evaluate_policy(
                env, policy.apply, params, jax.random.PRNGKey(self.seed),
                num_episodes=self.eval_episodes, hidden=policy.hidden,
                class_names=names, goal_map_fn=self._goal_map_fn(env),
                encode_fn=self._encode_fn(),
            )
        # Multi-process eval: episodes are already the MERGED records (see
        # _evaluate_host); exactly one process writes the single metrics.json.
        path = os.path.join(output_dir, self.name, "metrics.json")
        if jax.process_index() == 0:
            os.makedirs(os.path.join(output_dir, self.name), exist_ok=True)
            path = write_metrics_json(path, episodes)
            per_type = {
                t: compute_scores(path, t)
                for t in sorted({e["task_info"]["object_type"] for e in episodes})
            }
        else:
            # same aggregation as compute_scores, from the in-memory records
            # (process 0's file may not be on this host's filesystem — report
            # no metrics_file rather than a path this process never wrote)
            path = None
            per_type = {}
            for t in sorted({e["task_info"]["object_type"] for e in episodes}):
                eps = [e for e in episodes if e["task_info"]["object_type"] == t]
                per_type[t] = (sum(e["success"] for e in eps) / len(eps),
                               sum(e["spl"] for e in eps) / len(eps))
        overall = {
            "success": float(np.mean([e["success"] for e in episodes])),
            "spl": float(np.mean([e["spl"] for e in episodes])),
            "episodes": len(episodes),
            "episodes_requested": self.eval_episodes,
            "metrics_file": path,
        }
        if jax.process_count() > 1:
            overall["episodes_local"] = int(
                getattr(self, "_eval_episodes_local", 0))
        overall["per_object_type"] = {t: {"success": s, "spl": p}
                                      for t, (s, p) in per_type.items()}
        return overall


    def _evaluate_host(self, ckpt: Optional[str]):
        """Eval on the real simulator pool (VectorEnv of THOR/Habitat/hostgrid
        workers), RoboTHOR val scenes. Returns per-episode records.

        Multi-process runs (the same launcher as training,
        baselines_habitat.md:88-97) SHARD the episode request: process p owns
        its own pool (worker seeds offset to global env indices, like
        training), evaluates its share of eval_episodes, and the records are
        allgathered so every process returns the merged list — no duplicated
        pools, no duplicated episodes, one metrics.json (written by process 0
        in evaluate())."""
        import jax
        import jax.numpy as jnp

        from embodied_clip_tpu.envs.vector import VectorEnv
        from embodied_clip_tpu.parallel.distributed import initialize_distributed
        from embodied_clip_tpu.parallel.mesh import gather_records, local_view
        from embodied_clip_tpu.training.evaluate import evaluate_policy_host
        from embodied_clip_tpu.utils.checkpoint import restore_params

        initialize_distributed()
        world, pid = jax.process_count(), jax.process_index()
        local_episodes = (self.eval_episodes // world
                          + (1 if pid < self.eval_episodes % world else 0))
        if local_episodes == 0:
            # More processes than episodes: skip the (expensive) simulator
            # pool entirely — only the merge collective must still run on
            # every process.
            self._eval_episodes_local = 0
            return gather_records([])
        env_fns, frame_shape = self._host_env_fns(
            eval_split=True, seed_offset=pid * self.num_workers)
        venv = VectorEnv(env_fns, frame_shape=frame_shape)
        try:
            encode = self._encode_fn()
            if self.task.startswith("rearrange"):
                from embodied_clip_tpu.envs.thor_rearrange import REARRANGE_ACTIONS

                num_actions = len(REARRANGE_ACTIONS)
            else:
                num_actions = 6  # the unified THOR ObjectNav/PointNav space
            policy = self._make_policy(num_actions, frame_obs=True)
            if self.policy_arch == "allenact" and ckpt:
                # convert-policy checkpoints carry the released model's exact
                # dims (compressor/combiner widths, hidden); rebuild the module
                # from them — the native defaults only cover the standard
                # released configs.
                from embodied_clip_tpu.models.allenact_policy import (
                    AllenActResnetPolicy,
                )
                from embodied_clip_tpu.utils.checkpoint import restore_pytree

                raw = restore_pytree(ckpt)
                if isinstance(raw, dict) and "allenact_config" in raw:
                    cfg = {
                        k: (tuple(int(x) for x in np.asarray(v).reshape(-1))
                            if k in ("compressor_dims", "combiner_dims")
                            else int(np.asarray(v)))
                        for k, v in raw["allenact_config"].items()
                    }
                    policy = AllenActResnetPolicy(**cfg)
            params = getattr(self, "_last_params", None)
            if params is not None:
                # train() on a multi-process mesh leaves GLOBAL (replicated,
                # non-addressable) arrays; the eval act-step is a process-local
                # single-device jit — feed it the local replica.
                params = local_view(params)
            goal_map = self._goal_map_fn(venv) if self.zeroshot else None
            if ckpt:
                obs0 = venv.reset()
                o = {k: jnp.asarray(v) for k, v in obs0.items()}
                if encode is not None:
                    o["visual"] = encode(o["visual"])
                if goal_map is not None:
                    # zeroshot: the policy's goal input is the CLIP text
                    # embedding, not the raw class id — the template must be
                    # built exactly like the act-step obs or the restored
                    # param tree has a wrong-shape goal_fc kernel.
                    o["goal"] = goal_map(o["goal"])
                o["prev_action"] = jnp.zeros((venv.n,), jnp.int32)
                template = policy.init(
                    jax.random.PRNGKey(0), o, policy.initial_state(venv.n),
                    jnp.zeros((venv.n,), bool))["params"]
                params = restore_params(ckpt, template)
            assert params is not None, "evaluate needs --ckpt or a preceding train()"
            local = evaluate_policy_host(
                venv, policy.apply, params,
                jax.random.fold_in(jax.random.PRNGKey(self.seed), pid),
                num_episodes=local_episodes, hidden=policy.hidden,
                num_actions=num_actions, encode_fn=encode, goal_map_fn=goal_map,
                class_names=list(ROBOTHOR_OBJECT_TYPES),
            ) if local_episodes > 0 else []
            self._eval_episodes_local = len(local)
            return gather_records(local)
        finally:
            venv.close()


class _GoalMappedEnv:
    """Wrap a jittable env so integer goals come out as embedding vectors."""

    def __init__(self, inner, goal_map):
        self.inner = inner
        self.goal_map = goal_map

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def reset(self, key, batch):
        state, obs = self.inner.reset(key, batch)
        return state, {**obs, "goal": self.goal_map(obs["goal"])}

    def step(self, state, action):
        state, obs, r, d, info = self.inner.step(state, action)
        return state, {**obs, "goal": self.goal_map(obs["goal"])}, r, d, info


def _reg(name, **kw):
    def factory(n=name, kw=kw):
        return NavRLExperiment(name=n, **kw)

    _REGISTRY[name] = factory


# RoboTHOR ObjectNav DD-PPO grid (backend 'thor' when available; 'fake' is hermetic).
for enc_tag in ("clipresnet50", "resnet50", "resnet18", "clipresnet50x16"):
    _reg(f"objectnav_robothor_rgb_{enc_tag}gru_ddppo",
         task="objectnav", encoder=_ENCODER_BY_NAME[enc_tag])

# Zero-shot ObjectNav (train on seen classes; eval config spans all 12).
_reg("zeroshot_objectnav_robothor_rgb_clipresnet50gru_ddppo",
     task="objectnav", encoder="clip_rn50", zeroshot=True)
_reg("zeroshot_objectnav_robothor_rgb_clipresnet50gru_ddppo_eval",
     task="objectnav", encoder="clip_rn50", zeroshot=True)

# Habitat grid — with the reference's habitat DD-PPO training surface
# (baselines_habitat.md:63-75): 2 PPO epochs × 2 minibatches, linear LR decay
# over the run.
_HABITAT_PPO = dict(ppo_epochs=2, num_minibatches=2, lr_decay_updates=-1)
for task in ("objectnav", "pointnav"):
    for enc_tag in ("clip", "imagenet"):
        _reg(f"ddppo_{task}_rgb_{enc_tag}",
             task=task, encoder=_ENCODER_BY_NAME[enc_tag], **_HABITAT_PPO)
_reg("ddppo_objectnav_rgb", task="objectnav", encoder=None, **_HABITAT_PPO)
_reg("ddppo_objectnav_rgbd", task="objectnav", encoder=None, rgbd=True,
     **_HABITAT_PPO)  # scratch + depth
# rgbd × frozen encoder ("replace rgb with rgbd in the exp-config",
# baselines_habitat.md:75): depth is pooled to the conv-map grid and fed to the
# trainable compressor alongside the frozen features (models/policy.py).
_reg("ddppo_objectnav_rgbd_clip", task="objectnav", encoder="clip_rn50",
     rgbd=True, **_HABITAT_PPO)
_reg("ddppo_objectnav_rgbd_imagenet", task="objectnav", encoder="imagenet_rn50",
     rgbd=True, **_HABITAT_PPO)

# iTHOR Rearrangement 1-phase DAgger (fake backend: pick→carry→place env).
_reg("one_phase_rgb_clipresnet50_dagger", task="rearrange", algo="dagger",
     encoder="clip_rn50")
_reg("one_phase_rgb_resnet50_dagger", task="rearrange", algo="dagger",
     encoder="imagenet_rn50")
# iTHOR Rearrangement 2-phase (walkthrough→unshuffle from memory) — the
# rearrangement branch's other documented task configuration
# (baselines_ithor_rearrangement.md:4-6; the released models are 1-phase only).
_reg("two_phase_rgb_clipresnet50_dagger", task="rearrange2", algo="dagger",
     encoder="clip_rn50")
_reg("two_phase_rgb_resnet50_dagger", task="rearrange2", algo="dagger",
     encoder="imagenet_rn50")
