"""Point-cloud primitives: TPU-native replacements for the reference CUDA ops.

Reference: /root/reference/pointnet2/_ext_src/src/{sampling,ball_query,
group_points,interpolate}_gpu.cu, exposed via pointnet2/pointnet2_utils.py.
"""
from .fps import furthest_point_sample
from .ball_query import ball_query, group_points
from .interpolate import three_nn, three_interpolate
from .sampling import gather_points

__all__ = [
    "furthest_point_sample",
    "ball_query",
    "group_points",
    "three_nn",
    "three_interpolate",
    "gather_points",
]
