from .spec import ModelSpec, parse_mjcf, export_mjcf  # noqa: F401
from .model import PhysicsModel, build_model, load_model  # noqa: F401
from . import engine  # noqa: F401
