from .planner import GROUP_COL, plan_groups  # noqa: F401
