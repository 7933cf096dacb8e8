from . import quat, math_utils  # noqa: F401
