"""Test harness: force an 8-device virtual CPU mesh so sharding paths are exercised
hermetically (no TPU needed).

This environment injects a TPU-tunnel PJRT plugin via sitecustomize (PYTHONPATH →
/root/.axon_site) whose hooks make the FIRST device→host transfer stall for minutes when
multiple virtual CPU devices are active. Tests must be fast and deterministic on pure
CPU, so we re-exec pytest exactly once with a sanitized environment: plugin path
stripped, JAX_PLATFORMS=cpu, 8 virtual devices.
"""

import os
import sys

_SENTINEL = "ECT_TEST_ENV_SANITIZED"

if os.environ.get(_SENTINEL) != "1":
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if p and "axon" not in p
    )
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    argv = list(getattr(sys, "orig_argv", []))
    if argv:
        os.execve(sys.executable, argv, env)
    # No orig_argv (unexpected): fall through with in-process env setup only.
    os.environ.update(env)

os.environ.setdefault("JAX_ENABLE_X64", "0")
