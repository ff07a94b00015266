"""Geometry: rotated/aligned 3D box IoU, box corners, chamfer, NMS/LHS.

TPU-native replacement for OpenPCDet's iou3d_nms CUDA extension
(`OpenPCDet/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu`) and the reference
`utils/{box_util,nn_distance,nms}.py`.
"""
from .iou3d import (
    boxes_iou3d,
    boxes_iou_bev,
    boxes_iou3d_paired_rows,
    boxes_overlap_bev,
    box3d_iou_axis_aligned,
)
from .boxes import (
    rotz,
    rot_gpu,
    roty_np,
    get_3d_box_batch_np,
    get_3d_box_np,
    get_3d_box_depth_np,
    flip_axis_to_camera,
    flip_axis_to_depth,
    corners_aabb,
    box3d_vol_batch_np,
    get_iou,
    box2d_iou,
    box3d_iou_batch_np,
    corners3d_to_parameter,
    check_valid_corners3d,
)
from .nn_distance import (
    huber_loss,
    nn_distance,
    nn_distance_withcls,
    nn_distance_exclude_self,
    nn_distance_exclude_self_with_cls,
    nn_distance_inbox,
)
from .nms import (
    nms_2d,
    nms_2d_faster,
    nms_rotated_jax,
    nms_normal_jax,
    nms_3d_faster,
    nms_3d_faster_samecls,
    lhs_3d_faster_samecls,
    lhs_3d_samecls_jax,
)

__all__ = [
    "boxes_iou3d",
    "boxes_iou_bev",
    "boxes_iou3d_paired_rows",
    "boxes_overlap_bev",
    "box3d_iou_axis_aligned",
    "rotz",
    "rot_gpu",
    "roty_np",
    "get_3d_box_batch_np",
    "get_3d_box_np",
    "get_3d_box_depth_np",
    "flip_axis_to_camera",
    "flip_axis_to_depth",
    "corners_aabb",
    "box3d_vol_batch_np",
    "get_iou",
    "box2d_iou",
    "box3d_iou_batch_np",
    "corners3d_to_parameter",
    "check_valid_corners3d",
    "huber_loss",
    "nn_distance",
    "nn_distance_withcls",
    "nn_distance_exclude_self",
    "nn_distance_exclude_self_with_cls",
    "nn_distance_inbox",
    "nms_2d",
    "nms_2d_faster",
    "nms_rotated_jax",
    "nms_normal_jax",
    "nms_3d_faster",
    "nms_3d_faster_samecls",
    "lhs_3d_faster_samecls",
    "lhs_3d_samecls_jax",
]
