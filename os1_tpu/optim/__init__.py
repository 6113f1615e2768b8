from .pose_opt import PoseOptResult, optimize_pose  # noqa: F401
from .ba_core import BAProblem, run_ba  # noqa: F401
