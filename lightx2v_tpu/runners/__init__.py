from . import wan_runner  # noqa: F401  (registers runners)
from . import hunyuan_runner  # noqa: F401
