from .base import SchedulerBase  # noqa: F401
from .unipc import WanUniPCScheduler  # noqa: F401
from .step_distill import WanStepDistillScheduler  # noqa: F401
from .euler import FlowMatchEulerScheduler  # noqa: F401
