from .chorin import ChorinSolver, gather_inner  # noqa: F401
