"""End-to-end multi-process DD-PPO (VERDICT r3 next #3): N learner processes,
each owning a VectorEnv pool, one global SPMD update over a cross-process mesh
— the reference's torch.distributed.launch deployment shape
(baselines_habitat.md:63-69), DCN-style.

The equivalence claim: two processes × 4 workers train EXACTLY what one
process × 8 workers trains (same seeds) — worker seeds are global env indices,
action sampling folds the global env id into the per-step key, host-local
rollouts concatenate into one global dp-sharded batch in process order, and
the jitted update allreduces across processes. Params after training must
match up to reduction-order float noise.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os
from embodied_clip_tpu.parallel.distributed import initialize_distributed

initialize_distributed()

from embodied_clip_tpu.config.rl_experiments import NavRLExperiment

# small hidden + 2 ppo epochs keep the jitted-update compile cheap: this
# box may have a single CPU core shared by both learner processes, so
# compile time (not step time) dominates the test wall clock
exp = NavRLExperiment(
    name="mp_equiv", task="objectnav", algo="ddppo", encoder=None,
    backend="hostgrid", num_workers=int(os.environ["TW_WORKERS"]),
    total_env_steps=int(os.environ.get("TW_TOTAL", "64")),
    rollout_len=4, hidden=16, ppo_epochs=2, seed=7,
    max_episode_steps=12, eval_episodes=8,
    ckpt_every_steps=10_000)
out = exp.train(output_dir=os.environ["TW_OUT"])
print("TRAIN_OK", int(out["env_steps"]))
if os.environ.get("TW_EVAL") == "1":
    ev = exp.evaluate(output_dir=os.environ["TW_OUT"])
    print("EVAL_OK", int(ev["episodes"]), int(ev.get("episodes_local", -1)))
"""


def _run(env_extra, workers, out_dir, n_procs, total=64, run_eval=False):
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.update(env_extra(pid))
        env.update(
            TW_WORKERS=str(workers),
            TW_OUT=str(out_dir),
            TW_TOTAL=str(total),
            TW_EVAL="1" if run_eval else "0",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            ECT_TEST_ENV_SANITIZED="1",
        )
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":") if p and "axon" not in p
        ) or os.getcwd()
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process DD-PPO workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"TRAIN_OK {total}" in out, out[-2000:]
    return outs


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _mp_env(port):
    return lambda pid: dict(
        ECT_COORDINATOR=f"127.0.0.1:{port}",
        ECT_NUM_PROCESSES="2",
        ECT_PROCESS_ID=str(pid),
    )


def _assert_params_match(dir_a, dir_b, ck, msg):
    import jax

    from embodied_clip_tpu.utils.checkpoint import restore_pytree

    ref = restore_pytree(str(dir_a / ck))["params"]
    got = restore_pytree(str(dir_b / ck))["params"]
    flat_r = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    assert len(flat_r) == len(flat_g)
    for (pr, vr), (pg, vg) in zip(flat_r, flat_g):
        assert str(pr) == str(pg)
        np.testing.assert_allclose(
            np.asarray(vr), np.asarray(vg), rtol=2e-4, atol=2e-5,
            err_msg=f"param {pr} diverged: {msg}")


def test_two_procs_x4_match_one_proc_x8(tmp_path):
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"

    # reference: one process, 8 workers, no distributed runtime
    _run(lambda pid: {}, workers=8, out_dir=single_dir, n_procs=1)
    _run(_mp_env(_free_port()), workers=4, out_dir=multi_dir, n_procs=2)

    _assert_params_match(single_dir, multi_dir,
                         "mp_equiv/exp__steps_000000000064",
                         "between 1x8 and 2x4 runs")


def test_multiprocess_eval_shards_episodes(tmp_path):
    """Multi-process checkpoint eval (VERDICT r4 weak #2): the episode request
    is SHARDED across processes (each owns its own pool with globally-offset
    worker seeds), records are allgathered, and exactly one process writes the
    single metrics.json — no duplicated pools, no duplicated episodes."""
    import json

    outs = _run(_mp_env(_free_port()), workers=2, out_dir=tmp_path,
                n_procs=2, total=16, run_eval=True)
    for pid, out in enumerate(outs):
        # merged count on every process; each process evaluated exactly its
        # 8/2 = 4-episode share
        assert "EVAL_OK 8 4" in out, f"proc {pid}:\n{out[-2000:]}"
    with open(tmp_path / "mp_equiv" / "metrics.json") as f:
        tasks = json.load(f)[0]["tasks"]
    assert len(tasks) == 8
    assert all(0.0 <= ep["success"] <= 1.0 for ep in tasks)


def test_multiprocess_resume_matches_single_process(tmp_path):
    """Multi-process kill/resume (VERDICT r4 weak #3): a 2-process run stopped
    at its step-32 checkpoint resumes under 2 processes (every process
    restores, then replicates onto the global mesh) and finishes with the SAME
    params as a 1-process run stopped and resumed the same way — the resume
    path composes with the N-procs ≡ 1-proc equivalence. (Host-backend
    checkpoints hold no simulator state — envs restart fresh on resume, which
    both runs do identically — so the comparison is resume-vs-resume, not
    resume-vs-uninterrupted.)"""
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"

    # 1 proc × 4 workers: train to 32, stop, resume to 64
    _run(lambda pid: {}, workers=4, out_dir=single_dir, n_procs=1, total=32)
    _run(lambda pid: {}, workers=4, out_dir=single_dir, n_procs=1, total=64)

    # 2 procs × 2 workers: train to 32, stop, resume to 64
    _run(_mp_env(_free_port()), workers=2, out_dir=multi_dir, n_procs=2,
         total=32)
    _run(_mp_env(_free_port()), workers=2, out_dir=multi_dir, n_procs=2,
         total=64)

    _assert_params_match(single_dir, multi_dir,
                         "mp_equiv/exp__steps_000000000064",
                         "between resumed 1x4 and resumed 2x2 runs")
