from .engine import Engine, EnvState
from .env import TrafficEnv

DEBUG_SCENARIOS = ("cartpole", "CartPole-v0", "bandit")


def make_env(env_config):
    """Env factory: traffic scenarios -> :class:`TrafficEnv`; the simulator-
    free debug scenarios (the reference's GymEnv role, envs/test_env.py) ->
    pure-JAX debug envs exposing the same step/reset/dims contract."""
    if env_config.scenario in DEBUG_SCENARIOS:
        from .debug_env import BanditEnv, CartPoleEnv

        env = (BanditEnv() if env_config.scenario == "bandit"
               else CartPoleEnv())
        env.cfg = env_config
        env.agent = env_config.agent
        return env
    return TrafficEnv(env_config)
