from hanabi_sad_tpu.agent.r2d2_agent import (
    AgentConfig,
    AgentParams,
    init_agent,
    act,
    td_error,
    loss,
    aggregate_priority,
)

__all__ = [
    "AgentConfig",
    "AgentParams",
    "init_agent",
    "act",
    "td_error",
    "loss",
    "aggregate_priority",
]
