from .config import (ConfigBase, EgoMimicConfig, EgoForecastConfig,  # noqa: F401
                     StateRegConfig, make_env_params)
