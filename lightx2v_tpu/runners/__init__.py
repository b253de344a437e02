from . import wan_runner  # noqa: F401  (registers runners)
