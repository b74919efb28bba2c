from fourdgs.utils.config import load_config, hidden_params_defaults, merge_hparams  # noqa: F401
from fourdgs.utils.logging import Log  # noqa: F401
