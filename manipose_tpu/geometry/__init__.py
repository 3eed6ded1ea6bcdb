from .skeleton import Skeleton
from .rotations import (
    normalize_vector,
    rot4d_to_matrix,
    rot6d_to_matrix,
    rot_to_matrix,
)
from .kinematics import build_t_pose, forward_kinematics
from .h36m import (
    TEST_SUBJECTS,
    TRAIN_SUBJECTS,
    h36m_skeleton_16,
    h36m_skeleton_17,
    h36m_skeleton_32,
)

__all__ = [
    "Skeleton",
    "normalize_vector",
    "rot4d_to_matrix",
    "rot6d_to_matrix",
    "rot_to_matrix",
    "build_t_pose",
    "forward_kinematics",
    "h36m_skeleton_16",
    "h36m_skeleton_17",
    "h36m_skeleton_32",
    "TRAIN_SUBJECTS",
    "TEST_SUBJECTS",
]
