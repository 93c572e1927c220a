from .engine import Engine, EnvState
from .env import TrafficEnv
