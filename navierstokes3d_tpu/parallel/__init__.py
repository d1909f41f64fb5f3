from .mesh import (choose_mesh_shape, make_mesh, replicated,
                   shard_state, state_shardings)  # noqa: F401
