"""Host-side oriented 3D box IoU from 8-corner boxes (upright camera frame).

Mirrors `utils/box_util.py:23-137` (Sutherland–Hodgman polygon clip +
shoelace area + y-extent overlap). Used by the VOC AP greedy matcher
(`utils/eval_det.py:76-78`). The clipped polygon of two convex rectangles is
convex, so its shoelace area equals the reference's ConvexHull area.
"""
import numpy as np


def polygon_clip(subject, clip_poly):
    """Clip ``subject`` by convex ``clip_poly`` (CCW points). Returns vertex
    list or None when empty (box_util.py:23-69, same strict `>` inside test)."""

    def inside(p, cp1, cp2):
        return (cp2[0] - cp1[0]) * (p[1] - cp1[1]) > (cp2[1] - cp1[1]) * (p[0] - cp1[0])

    def intersection(cp1, cp2, s, e):
        dc = (cp1[0] - cp2[0], cp1[1] - cp2[1])
        dp = (s[0] - e[0], s[1] - e[1])
        n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
        n2 = s[0] * e[1] - s[1] * e[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
        return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)

    output = list(subject)
    cp1 = clip_poly[-1]
    for cp2 in clip_poly:
        inp = output
        output = []
        if not inp:
            return None
        s = inp[-1]
        for e in inp:
            if inside(e, cp1, cp2):
                if not inside(s, cp1, cp2):
                    output.append(intersection(cp1, cp2, s, e))
                output.append(e)
            elif inside(s, cp1, cp2):
                output.append(intersection(cp1, cp2, s, e))
            s = e
        cp1 = cp2
        if len(output) == 0:
            return None
    return output


def poly_area(x, y):
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def box3d_vol(corners):
    a = np.sqrt(np.sum((corners[0, :] - corners[1, :]) ** 2))
    b = np.sqrt(np.sum((corners[1, :] - corners[2, :]) ** 2))
    c = np.sqrt(np.sum((corners[0, :] - corners[4, :]) ** 2))
    return a * b * c


def box3d_iou(corners1, corners2):
    """(8,3) x (8,3) camera-frame corners -> (iou3d, iou_bev)
    (box_util.py:112-137)."""
    rect1 = [(corners1[i, 0], corners1[i, 2]) for i in range(3, -1, -1)]
    rect2 = [(corners2[i, 0], corners2[i, 2]) for i in range(3, -1, -1)]
    area1 = poly_area(np.array(rect1)[:, 0], np.array(rect1)[:, 1])
    area2 = poly_area(np.array(rect2)[:, 0], np.array(rect2)[:, 1])
    inter = polygon_clip(rect1, rect2)
    if inter is None:
        inter_area = 0.0
    else:
        pts = np.array(inter)
        inter_area = poly_area(pts[:, 0], pts[:, 1])
    iou_2d = inter_area / (area1 + area2 - inter_area)
    ymax = min(corners1[0, 1], corners2[0, 1])
    ymin = max(corners1[4, 1], corners2[4, 1])
    inter_vol = inter_area * max(0.0, ymax - ymin)
    vol1 = box3d_vol(corners1)
    vol2 = box3d_vol(corners2)
    iou = inter_vol / (vol1 + vol2 - inter_vol)
    return iou, iou_2d
