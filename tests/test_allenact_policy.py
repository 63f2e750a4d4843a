"""Released-checkpoint policy conversion (VERDICT r3 missing #4): a torch
oracle replicating allenact v0.5.0's `ResnetTensorNavActorCritic` (the
architecture inside the published RoboTHOR ObjectNav `.pt` files,
baselines_robothor_objectnav.md:58-64) generates a state_dict with the real
key names; `convert_allenact_state_dict` must load it into
`AllenActResnetPolicy` and reproduce the torch forward — logits, value AND the
GRU carry across multi-step sequences with episode resets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

G = 7            # conv-map side (CLIP RN50 @ 224)
C_IN = 64        # slimmed from 2048 for test cost; mapping is dim-agnostic
N_OBJ = 12
HID = 48


class _TorchOracle(nn.Module):
    """allenact ResnetTensorNavActorCritic, structurally exact: module/field
    names produce the released state_dict keys (goal_visual_encoder.*,
    state_encoders.single_belief.rnn.*, actor.linear, critic.fc — allenact's
    LinearActorHead registers `linear` but LinearCriticHead registers `fc`)."""

    def __init__(self, c_in=C_IN, grid=G, hidden=HID, prev_action_dims=0):
        super().__init__()
        goal_dims, hid1, hid2, k1, k2 = 32, 96, 32, 80, 32
        self._prev_action_dims = prev_action_dims

        class GoalEnc(nn.Module):
            def __init__(self):
                super().__init__()
                self.embed_goal = nn.Embedding(N_OBJ, goal_dims)
                self.resnet_compressor = nn.Sequential(
                    nn.Conv2d(c_in, hid1, 1), nn.ReLU(True),
                    nn.Conv2d(hid1, hid2, 1), nn.ReLU(True))
                self.target_obs_combiner = nn.Sequential(
                    nn.Conv2d(hid2 + goal_dims, k1, 1), nn.ReLU(True),
                    nn.Conv2d(k1, k2, 1))

            def forward(self, resnet_chw, goal):
                x = self.resnet_compressor(resnet_chw)
                g = self.embed_goal(goal)[:, :, None, None].expand(
                    -1, -1, grid, grid)
                x = self.target_obs_combiner(torch.cat([x, g], dim=1))
                return x.reshape(x.size(0), -1)      # CHW flatten

        class RNNEnc(nn.Module):
            def __init__(self):
                super().__init__()
                self.rnn = nn.GRU(k2 * grid * grid + prev_action_dims,
                                  hidden, 1)

        self.goal_visual_encoder = GoalEnc()
        self.state_encoders = nn.ModuleDict({"single_belief": RNNEnc()})

        if prev_action_dims:
            class PrevActionEmbedder(nn.Module):  # allenact FeatureEmbedding
                def __init__(self):
                    super().__init__()
                    self.fc = nn.Embedding(6 + 1, prev_action_dims)

            self.prev_action_embedder = PrevActionEmbedder()

        class ActorHead(nn.Module):      # allenact LinearActorHead
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(hidden, 6)

        class CriticHead(nn.Module):     # allenact LinearCriticHead
            def __init__(self):
                super().__init__()
                self.fc = nn.Linear(hidden, 1)

        self.actor = ActorHead()
        self.critic = CriticHead()

    def forward(self, resnet_chw, goal, h, masks, prev_actions=None):
        # allenact semantics: hidden multiplied by masks (0 at episode start)
        h = h * masks
        x = self.goal_visual_encoder(resnet_chw, goal)
        if self._prev_action_dims:
            # allenact visual_nav_models: index 0 where masks==0, else a+1
            idx = torch.where(masks[:, 0] != 0, prev_actions + 1,
                              torch.zeros_like(prev_actions))
            x = torch.cat([x, self.prev_action_embedder.fc(idx)], dim=-1)
        out, h = self.state_encoders["single_belief"].rnn(
            x[None], h[None].contiguous())
        out = out[0]
        return self.actor.linear(out), self.critic.fc(out)[:, 0], h[0]


def _make_oracle(seed=0, **kw):
    torch.manual_seed(seed)
    return _TorchOracle(**kw).eval()


def test_converted_params_reproduce_torch_forward():
    from embodied_clip_tpu.models.allenact_policy import (
        AllenActResnetPolicy, convert_allenact_state_dict,
    )

    oracle = _make_oracle()
    converted = convert_allenact_state_dict(
        {"model_state_dict": oracle.state_dict()}, grid=G)
    policy = AllenActResnetPolicy(**converted["config"])
    assert converted["config"]["hidden"] == HID
    assert converted["config"]["num_actions"] == 6

    rng = np.random.RandomState(0)
    B, T = 5, 6
    vis = rng.randn(T, B, G, G, C_IN).astype(np.float32)
    goal = rng.randint(0, N_OBJ, (B,))
    # episode resets mid-sequence exercise the carry masking
    dones = np.zeros((T, B), bool)
    dones[0] = True
    dones[3, 1] = dones[4, 3] = True

    h_t = torch.zeros(B, HID)
    h_j = policy.initial_state(B)
    apply = jax.jit(lambda p, o, h, d: policy.apply({"params": p}, o, h, d))
    for t in range(T):
        with torch.no_grad():
            lg_t, v_t, h_t = oracle(
                torch.from_numpy(vis[t].transpose(0, 3, 1, 2)),
                torch.from_numpy(goal),
                h_t,
                torch.from_numpy((~dones[t]).astype(np.float32))[:, None])
        lg_j, v_j, h_j = apply(
            converted["params"],
            {"visual": jnp.asarray(vis[t]), "goal": jnp.asarray(goal)},
            h_j, jnp.asarray(dones[t]))
        np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_converted_prev_action_checkpoint_reproduces_torch_forward():
    """add_prev_actions=True checkpoints (prev_action_embedder.fc appended to
    the GRU input after the visual features) convert and reproduce the torch
    forward. The framework's prev-action sentinel (num_actions at episode
    start) must map to allenact's null row 0, and action a to row a+1."""
    from embodied_clip_tpu.models.allenact_policy import (
        AllenActResnetPolicy, convert_allenact_state_dict,
    )

    E = 8
    oracle = _make_oracle(seed=11, prev_action_dims=E)
    converted = convert_allenact_state_dict(oracle.state_dict(), grid=G)
    assert converted["config"]["prev_action_embed_dims"] == E
    policy = AllenActResnetPolicy(**converted["config"])

    rng = np.random.RandomState(1)
    B, T = 4, 6
    vis = rng.randn(T, B, G, G, C_IN).astype(np.float32)
    goal = rng.randint(0, N_OBJ, (B,))
    actions = rng.randint(0, 6, (T, B))
    dones = np.zeros((T, B), bool)
    dones[0] = True
    dones[2, 0] = dones[4, 2] = True

    h_t = torch.zeros(B, HID)
    h_j = policy.initial_state(B)
    apply = jax.jit(lambda p, o, h, d: policy.apply({"params": p}, o, h, d))
    prev = np.zeros((B,), np.int64)  # arbitrary at t=0: masked out either way
    for t in range(T):
        masks = (~dones[t]).astype(np.float32)
        with torch.no_grad():
            lg_t, v_t, h_t = oracle(
                torch.from_numpy(vis[t].transpose(0, 3, 1, 2)),
                torch.from_numpy(goal), h_t,
                torch.from_numpy(masks)[:, None],
                torch.from_numpy(prev))
        # framework convention: sentinel num_actions where the episode starts
        prev_j = np.where(dones[t], 6, prev).astype(np.int32)
        lg_j, v_j, h_j = apply(
            converted["params"],
            {"visual": jnp.asarray(vis[t]), "goal": jnp.asarray(goal),
             "prev_action": jnp.asarray(prev_j)},
            h_j, jnp.asarray(dones[t]))
        np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        prev = actions[t]


def test_released_key_list_fixture_converts():
    """Fixture of the EXACT released RoboTHOR ObjectNav state_dict key list
    and shapes (allenact ResnetTensorNavActorCritic, CLIP RN50 conv map
    2048×7×7, add_prev_actions=False; baselines_robothor_objectnav.md:58-64).
    Guards the converter against key-naming drift — in particular allenact's
    critic head key is `critic.fc.*`, NOT `critic.linear.*`."""
    from embodied_clip_tpu.models.allenact_policy import (
        AllenActResnetPolicy, convert_allenact_state_dict,
    )

    rng = np.random.RandomState(7)
    released_shapes = {
        "goal_visual_encoder.embed_goal.weight": (12, 32),
        "goal_visual_encoder.resnet_compressor.0.weight": (128, 2048, 1, 1),
        "goal_visual_encoder.resnet_compressor.0.bias": (128,),
        "goal_visual_encoder.resnet_compressor.2.weight": (32, 128, 1, 1),
        "goal_visual_encoder.resnet_compressor.2.bias": (32,),
        "goal_visual_encoder.target_obs_combiner.0.weight": (128, 64, 1, 1),
        "goal_visual_encoder.target_obs_combiner.0.bias": (128,),
        "goal_visual_encoder.target_obs_combiner.2.weight": (32, 128, 1, 1),
        "goal_visual_encoder.target_obs_combiner.2.bias": (32,),
        "state_encoders.single_belief.rnn.weight_ih_l0": (3 * 512, 32 * 49),
        "state_encoders.single_belief.rnn.weight_hh_l0": (3 * 512, 512),
        "state_encoders.single_belief.rnn.bias_ih_l0": (3 * 512,),
        "state_encoders.single_belief.rnn.bias_hh_l0": (3 * 512,),
        "actor.linear.weight": (6, 512),
        "actor.linear.bias": (6,),
        "critic.fc.weight": (1, 512),
        "critic.fc.bias": (1,),
    }
    sd = {k: rng.randn(*s).astype(np.float32) * 0.02
          for k, s in released_shapes.items()}
    converted = convert_allenact_state_dict(sd, grid=7)
    cfg = converted["config"]
    assert cfg == dict(num_actions=6, num_goal_classes=12, goal_dims=32,
                       compressor_dims=(128, 32), combiner_dims=(128, 32),
                       hidden=512, prev_action_embed_dims=0)
    policy = AllenActResnetPolicy(**cfg)
    obs = {"visual": jnp.zeros((2, 7, 7, 2048)),
           "goal": jnp.zeros((2,), jnp.int32)}
    lg, v, h = policy.apply({"params": converted["params"]}, obs,
                            policy.initial_state(2), jnp.ones((2,), bool))
    assert lg.shape == (2, 6) and v.shape == (2,) and h.shape == (2, 512)

    # critic.linear.* fallback (re-exported checkpoints) still converts
    sd_fallback = dict(sd)
    sd_fallback["critic.linear.weight"] = sd_fallback.pop("critic.fc.weight")
    sd_fallback["critic.linear.bias"] = sd_fallback.pop("critic.fc.bias")
    conv2 = convert_allenact_state_dict(sd_fallback, grid=7)
    np.testing.assert_array_equal(
        np.asarray(conv2["params"]["critic"]["kernel"]),
        np.asarray(converted["params"]["critic"]["kernel"]))


def test_converter_rejects_foreign_state_dict():
    from embodied_clip_tpu.models.allenact_policy import (
        convert_allenact_state_dict,
    )

    with pytest.raises(ValueError, match="missing keys"):
        convert_allenact_state_dict({"foo.weight": np.zeros((2, 2))})


def test_load_allenact_checkpoint_roundtrip(tmp_path):
    """The CLI surface: torch-serialized checkpoint file (the released .pt
    layout: {"model_state_dict": ..., "total_steps": N}) -> params."""
    from embodied_clip_tpu.models.allenact_policy import (
        AllenActResnetPolicy, load_allenact_checkpoint,
    )

    oracle = _make_oracle(seed=3)
    path = str(tmp_path / "released.pt")
    torch.save({"model_state_dict": oracle.state_dict(),
                "total_steps": 130_091_717}, path)
    converted = load_allenact_checkpoint(path, grid=G)
    policy = AllenActResnetPolicy(**converted["config"])
    obs = {"visual": jnp.zeros((2, G, G, C_IN)),
           "goal": jnp.zeros((2,), jnp.int32)}
    lg, v, h = policy.apply({"params": converted["params"]}, obs,
                            policy.initial_state(2), jnp.ones((2,), bool))
    assert lg.shape == (2, 6) and v.shape == (2,) and h.shape == (2, HID)
    assert np.isfinite(np.asarray(lg)).all()


@pytest.mark.slow
def test_released_checkpoint_evaluates_on_host_backend(tmp_path):
    """The full published-model eval contract end to end
    (baselines_robothor_objectnav.md:54-68): convert a released-architecture
    checkpoint, then `--override policy_arch=allenact --ckpt <out> --eval`
    runs it against a (hostgrid) simulator pool and emits the metrics.json
    schema."""
    import dataclasses as dc

    from embodied_clip_tpu.config.rl_experiments import NavRLExperiment
    from embodied_clip_tpu.models.allenact_policy import (
        convert_allenact_state_dict,
    )
    from embodied_clip_tpu.models.encoders import build_encoder
    from embodied_clip_tpu.utils.checkpoint import save_pytree

    # conv-map geometry of the smoke-scale trunk stands in for RN50's 7x7x2048
    enc = build_encoder("clip_rn_tiny", dtype=jnp.float32)
    conv = enc.encode(np.zeros((1, 56, 56, 3), np.uint8))["clip_conv"]
    _, g, g2, c = conv.shape
    assert g == g2

    oracle = _make_oracle(seed=5, c_in=c, grid=g, hidden=64)
    converted = convert_allenact_state_dict(oracle.state_dict(), grid=g)
    ckpt_dir = str(tmp_path / "converted")
    # the convert-policy CLI layout: params + the architecture config (the
    # oracle's dims differ from the module defaults on purpose — eval must
    # rebuild from the stored config, not guess)
    save_pytree(ckpt_dir, {"params": converted["params"],
                           "allenact_config": dict(converted["config"])})

    exp = NavRLExperiment(
        name="released_eval", task="objectnav", algo="ddppo",
        encoder="clip_rn_tiny", encoder_dtype="float32",
        backend="hostgrid", num_workers=4, eval_episodes=8,
        hidden=64, policy_arch="allenact", max_episode_steps=12)
    out = exp.evaluate(output_dir=str(tmp_path), ckpt=ckpt_dir)
    assert out["episodes"] >= 1
    assert 0.0 <= out["success"] <= 1.0
    assert "per_object_type" in out
