from .humanoid import (EnvParams, EnvState, StepOut, ExpertBatch, BodyTables,  # noqa: F401
                       make_body_tables, get_obs, get_body_quat, get_ee_pos,
                       reset, step, finish_step, apply_action,
                       step_autoreset, observe, REWARD_FUNCS)
from .expert import (gen_expert_features, stack_experts, synthetic_experts,  # noqa: F401
                     zero_hands)
