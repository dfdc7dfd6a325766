"""3DDFA head-pose math (pure numpy parity).

The reference extracts a 7-vector [yaw, pitch, roll, scale, t3d.x, t3d.y,
t3d.z] per frame from a 3DMM camera matrix (ref:3DDFA_V2/utils/pose.py:
18-63, 216-230, 263-283).  The 3DMM fitting itself (FaceBoxes + TDDFA) is an
external artifact exactly as in the reference — these functions cover the
decomposition/conversion math so saved ``param`` vectors can be turned into
pose files without the upstream repo.
"""
from __future__ import annotations

from math import asin, atan2, cos, sin

import numpy as np


def P2sRt(P: np.ndarray):
    """Decompose a 3x4 affine camera matrix into scale, rotation, t3d."""
    t3d = P[:, 3]
    R1 = P[0:1, :3]
    R2 = P[1:2, :3]
    s = (np.linalg.norm(R1) + np.linalg.norm(R2)) / 2.0
    r1 = R1 / np.linalg.norm(R1)
    r2 = R2 / np.linalg.norm(R2)
    r3 = np.cross(r1, r2)
    return s, np.concatenate((r1, r2, r3), 0), t3d


def matrix2angle(R: np.ndarray):
    """Rotation matrix -> (yaw, pitch, roll) radians (ref convention)."""
    if R[2, 0] > 0.998:
        z = 0.0
        x = np.pi / 2
        y = z + atan2(-R[0, 1], -R[0, 2])
    elif R[2, 0] < -0.998:
        z = 0.0
        x = -np.pi / 2
        y = -z + atan2(R[0, 1], R[0, 2])
    else:
        x = asin(R[2, 0])
        y = atan2(R[2, 1] / cos(x), R[2, 2] / cos(x))
        z = atan2(R[1, 0] / cos(x), R[0, 0] / cos(x))
    return x, y, z


def angle2matrix(theta) -> np.ndarray:
    """(yaw, pitch, roll) radians -> rotation matrix (inverse of
    matrix2angle for non-degenerate poses; ref:3DDFA_V2/utils/pose.py:65-110)."""
    R_x = np.array([[1, 0, 0],
                    [0, cos(theta[1]), -sin(theta[1])],
                    [0, sin(theta[1]), cos(theta[1])]])
    R_y = np.array([[cos(theta[0]), 0, sin(-theta[0])],
                    [0, 1, 0],
                    [-sin(-theta[0]), 0, cos(theta[0])]])
    R_z = np.array([[cos(theta[2]), -sin(theta[2]), 0],
                    [sin(theta[2]), cos(theta[2]), 0],
                    [0, 0, 1]])
    return R_z @ R_y @ R_x


def pose_from_param(param: np.ndarray) -> np.ndarray:
    """3DMM ``param`` (first 12 = camera matrix) -> 7-vector
    [yaw_deg, pitch_deg, roll_deg, s, t3d.x, t3d.y, t3d.z]
    (ref:3DDFA_V2/utils/pose.py:216-230,263-283)."""
    P = np.asarray(param[:12], np.float64).reshape(3, -1)
    s, R, t3d = P2sRt(P)
    pose = [p * 180 / np.pi for p in matrix2angle(R)]
    return np.array([pose[0], pose[1], pose[2], s, t3d[0], t3d[1], t3d[2]])
