from .binio import load_array, save_array, save_fields  # noqa: F401
from .checkpoint import (latest_checkpoint, load_checkpoint,  # noqa: F401
                         save_checkpoint)
from .matio import load_step_mat, save_step_mat  # noqa: F401
