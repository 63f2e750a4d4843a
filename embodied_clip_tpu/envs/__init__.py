from embodied_clip_tpu.envs.gridworld import GridNavEnv, GridNavState

__all__ = ["GridNavEnv", "GridNavState"]
