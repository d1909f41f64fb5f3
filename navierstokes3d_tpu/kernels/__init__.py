from .poisson import PoissonBCSpec, build_poisson_iter, choose_slab  # noqa: F401
