from . import compute  # noqa: F401  (registers the "be" base)
from . import backends  # noqa: F401  (registers tpu/interp backends)
