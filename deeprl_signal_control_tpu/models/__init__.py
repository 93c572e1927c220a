from .policies import MultiAgentLstmACPolicy, MultiAgentQPolicy
from .algorithms import IA2C, MA2C, IQL, make_algorithm
