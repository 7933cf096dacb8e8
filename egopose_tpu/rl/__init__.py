from . import distributions, nets, ppo, rollout  # noqa: F401
from .agent_ego import AgentEgo, SampleLog  # noqa: F401
