from semicp.utils.metrics import MetricsLogger, PhaseTimer, drain  # noqa: F401
