from .bvh import Bvh  # noqa: F401
from .skeleton import Skeleton, Bone  # noqa: F401
from .pose import load_amc_file, load_bvh_file, interpolated_traj  # noqa: F401
