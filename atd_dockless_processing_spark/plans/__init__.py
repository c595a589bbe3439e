from .inspect import explain_all, plan_report  # noqa: F401
