from .timers import RunTimer, StepRecord, poisson_roofline_iters_per_sec  # noqa: F401
