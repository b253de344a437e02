from . import wan_runner  # noqa: F401  (registers runners)
from . import hunyuan_runner  # noqa: F401
from . import wan_causvid_runner  # noqa: F401
from . import wan_skyreels_v2_df_runner  # noqa: F401
from . import cogvideox_runner  # noqa: F401
from . import wan_audio_runner  # noqa: F401
