"""SUN RGB-D calibration, frames, and raw-label utilities (host NumPy).

Rebuilds the library surface of `sunrgbd/sunrgbd_utils.py`: the five SUN
RGB-D coordinate systems (camera / depth / upright depth / upright camera /
image, see `sunrgbd_utils.py:62-88`), the calibration file projections, 3D
box construction from raw labels, and point-in-box extraction. The offline
data prep itself lives in `prep_sunrgbd.py` / `prep_sunrgbd_raw.py`.

Image drawing uses a dependency-free Bresenham rasterizer instead of cv2
(not in this image).
"""
import gzip
import pickle

import numpy as np

from ..geometry.boxes import flip_axis_to_camera, flip_axis_to_depth  # noqa: F401
from .pc_util import rotz, roty  # noqa: F401


def rotx(t):
    """Rotation about the x-axis (sunrgbd_utils.py:141-148)."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def transform_from_rot_trans(R, t):
    """(3,3) + (3,) -> (4,4) rigid transform (sunrgbd_utils.py:168-173)."""
    R = np.asarray(R).reshape(3, 3)
    t = np.asarray(t).reshape(3, 1)
    return np.vstack((np.hstack([R, t]), [0, 0, 0, 1]))


def inverse_rigid_trans(Tr):
    """Inverse of a (3,4) rigid transform [R|t] (sunrgbd_utils.py:175-182)."""
    inv = np.zeros_like(Tr)
    inv[0:3, 0:3] = np.transpose(Tr[0:3, 0:3])
    inv[0:3, 3] = np.dot(-np.transpose(Tr[0:3, 0:3]), Tr[0:3, 3])
    return inv


class SUNObject3d:
    """One raw SUN RGB-D label line (sunrgbd_utils.py:41-59): classname,
    2D box (x,y,w,h on disk -> x1y1x2y2), centroid, HALF sizes (w,l,h), and
    heading from the orientation vector (−atan2(oy, ox))."""

    def __init__(self, line):
        data = line.split(" ")
        data[1:] = [float(x) for x in data[1:]]
        self.classname = data[0]
        self.xmin, self.ymin = data[1], data[2]
        self.xmax, self.ymax = data[1] + data[3], data[2] + data[4]
        self.box2d = np.array([self.xmin, self.ymin, self.xmax, self.ymax])
        self.centroid = np.array([data[5], data[6], data[7]])
        self.unused_dimension = np.array([data[8], data[9], data[10]])
        self.w, self.l, self.h = data[8], data[9], data[10]
        self.orientation = np.zeros((3,))
        self.orientation[0] = data[11]
        self.orientation[1] = data[12]
        self.heading_angle = -1 * np.arctan2(
            self.orientation[1], self.orientation[0])


class SUNRGBD_Calibration:
    """Calibration matrices + frame projections (sunrgbd_utils.py:61-139).

    The calib file holds Rtilt (line 1) and K (line 2), both flattened
    column-major. Depth points and 3D labels live in the upright depth
    frame (z up); 2D boxes in the image frame.
    """

    def __init__(self, calib_filepath):
        lines = [line.rstrip() for line in open(calib_filepath)]
        Rtilt = np.array([float(x) for x in lines[0].split(" ")])
        self.Rtilt = np.reshape(Rtilt, (3, 3), order="F")
        K = np.array([float(x) for x in lines[1].split(" ")])
        self.K = np.reshape(K, (3, 3), order="F")
        self.f_u, self.f_v = self.K[0, 0], self.K[1, 1]
        self.c_u, self.c_v = self.K[0, 2], self.K[1, 2]

    def project_upright_depth_to_camera(self, pc):
        """(N,3) upright depth -> camera (z fwd, y down)."""
        pc2 = np.dot(np.transpose(self.Rtilt), np.transpose(pc[:, 0:3]))
        return flip_axis_to_camera(np.transpose(pc2))

    def project_upright_depth_to_image(self, pc):
        """(N,3) -> ((N,2) uv, (N,) depth)."""
        pc2 = self.project_upright_depth_to_camera(pc)
        uv = np.dot(pc2, np.transpose(self.K))
        uv[:, 0] /= uv[:, 2]
        uv[:, 1] /= uv[:, 2]
        return uv[:, 0:2], pc2[:, 2]

    def project_upright_depth_to_upright_camera(self, pc):
        return flip_axis_to_camera(pc)

    def project_upright_camera_to_upright_depth(self, pc):
        return flip_axis_to_depth(pc)

    def project_image_to_camera(self, uv_depth):
        """(N,3) [u, v, depth] -> (N,3) camera-frame points."""
        n = uv_depth.shape[0]
        x = ((uv_depth[:, 0] - self.c_u) * uv_depth[:, 2]) / self.f_u
        y = ((uv_depth[:, 1] - self.c_v) * uv_depth[:, 2]) / self.f_v
        pts = np.zeros((n, 3))
        pts[:, 0], pts[:, 1], pts[:, 2] = x, y, uv_depth[:, 2]
        return pts

    def project_image_to_upright_camerea(self, uv_depth):
        """Image+depth -> upright camera (name typo kept from the
        reference's public API, sunrgbd_utils.py:135-139)."""
        pts_cam = self.project_image_to_camera(uv_depth)
        pts_depth = flip_axis_to_depth(pts_cam)
        pts_upright = np.transpose(np.dot(self.Rtilt, np.transpose(pts_depth)))
        return self.project_upright_depth_to_upright_camera(pts_upright)

    # alias with the spelling fixed
    project_image_to_upright_camera = project_image_to_upright_camerea


def read_sunrgbd_label(label_filename):
    """Label txt -> list of SUNObject3d (sunrgbd_utils.py:184-187)."""
    lines = [line.rstrip() for line in open(label_filename)]
    return [SUNObject3d(line) for line in lines]


def load_image(img_filename):
    """RGB image as (H,W,3) uint8 via PIL (the reference used cv2)."""
    from PIL import Image

    return np.asarray(Image.open(img_filename).convert("RGB"))


def load_depth_points(depth_filename):
    return np.loadtxt(depth_filename)


def load_depth_points_mat(depth_filename):
    import scipy.io as sio

    return sio.loadmat(depth_filename)["instance"]


def random_shift_box2d(box2d, shift_ratio=0.1, rng=None):
    """Randomly shift center / scale w,h of an image-frame 2D box
    (sunrgbd_utils.py:200-213)."""
    rng = rng if rng is not None else np.random
    r = shift_ratio
    xmin, ymin, xmax, ymax = box2d
    h, w = ymax - ymin, xmax - xmin
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    cx2 = cx + w * r * (rng.random() * 2 - 1)
    cy2 = cy + h * r * (rng.random() * 2 - 1)
    h2 = h * (1 + rng.random() * 2 * r - r)
    w2 = w * (1 + rng.random() * 2 * r - r)
    return np.array([cx2 - w2 / 2.0, cy2 - h2 / 2.0,
                     cx2 + w2 / 2.0, cy2 + h2 / 2.0])


def in_hull(p, hull):
    """(N,3) points inside the convex hull of (M,3) (sunrgbd_utils.py:215-219)."""
    from scipy.spatial import Delaunay

    if not isinstance(hull, Delaunay):
        hull = Delaunay(hull)
    return hull.find_simplex(p) >= 0


def extract_pc_in_box3d(pc, box3d):
    """pc: (N,C), box3d: (8,3) -> (points inside, bool mask)
    (sunrgbd_utils.py:221-224)."""
    inds = in_hull(pc[:, 0:3], box3d)
    return pc[inds, :], inds


def my_compute_box_3d(center, size, heading_angle):
    """Upright-depth corners from center + HALF sizes + heading
    (sunrgbd_utils.py:227-238): rotz(−heading) applied to ±size corners."""
    R = rotz(-1 * heading_angle)
    l, w, h = size
    x = np.array([-l, l, l, -l, -l, l, l, -l])
    y = np.array([w, w, -w, -w, w, w, -w, -w])
    z = np.array([h, h, h, h, -h, -h, -h, -h])
    return (R @ np.vstack([x, y, z])).T + np.asarray(center)


def compute_box_3d(obj, calib):
    """Raw label object -> ((8,2) image corners, (8,3) upright-depth
    corners) (sunrgbd_utils.py:240-271)."""
    corners_3d = my_compute_box_3d(
        obj.centroid, (obj.l, obj.w, obj.h), obj.heading_angle)
    corners_2d, _ = calib.project_upright_depth_to_image(corners_3d)
    return corners_2d, corners_3d


def compute_orientation_3d(obj, calib):
    """Orientation arrow endpoints in image + upright-depth coords
    (sunrgbd_utils.py:273-291)."""
    ori = obj.orientation
    orientation_3d = np.array([
        [0.0, ori[0]], [0.0, ori[1]], [0.0, 0.0]])
    orientation_3d[0, :] += obj.centroid[0]
    orientation_3d[1, :] += obj.centroid[1]
    orientation_3d[2, :] += obj.centroid[2]
    orientation_2d, _ = calib.project_upright_depth_to_image(
        np.transpose(orientation_3d))
    return orientation_2d, np.transpose(orientation_3d)


def _draw_line(image, p0, p1, color):
    """Bresenham line on an (H,W,3) uint8 array."""
    h, w = image.shape[:2]
    x0, y0 = int(p0[0]), int(p0[1])
    x1, y1 = int(p1[0]), int(p1[1])
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    while True:
        if 0 <= x0 < w and 0 <= y0 < h:
            image[y0, x0] = color
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy


def draw_projected_box3d(image, qs, color=(255, 255, 255), thickness=2):
    """Draw the 12 box edges of (8,2) projected corners on an (H,W,3)
    uint8 image (sunrgbd_utils.py:293-316; pure NumPy, thickness ignored
    beyond 1px — the reference used cv2)."""
    qs = np.asarray(qs).astype(np.int32)
    for k in range(4):
        _draw_line(image, qs[k], qs[(k + 1) % 4], color)
        _draw_line(image, qs[k + 4], qs[(k + 1) % 4 + 4], color)
        _draw_line(image, qs[k], qs[k + 4], color)
    return image


def save_zipped_pickle(obj, filename, protocol=-1):
    with gzip.open(filename, "wb") as f:
        pickle.dump(obj, f, protocol)


def load_zipped_pickle(filename):
    with gzip.open(filename, "rb") as f:
        return pickle.load(f)


def draw_boxes3d_in_point_cloud(gt_boxes3d, filename, rad=0.01, colors=None):
    """Dump the 12 edges of each (8, 3)-corner box as a cylinder-line PLY
    mesh (sunrgbd_utils.draw_boxes3d:318-343 rendered mayavi figures; this
    dependency-free rebuild writes a mesh viewable in MeshLab instead).
    gt_boxes3d: (n, 8, 3)."""
    from ..utils.dump_helper import write_lines_as_cylinders

    segments = []
    for b in np.asarray(gt_boxes3d).reshape(-1, 8, 3):
        for k in range(4):
            i, j = k, (k + 1) % 4
            segments.append([b[i], b[j]])
            segments.append([b[i + 4], b[j + 4]])
            segments.append([b[i], b[i + 4]])
    write_lines_as_cylinders(np.array(segments), filename, rad=rad)


class SunrgbdObject:
    """Raw SUN RGB-D trainval accessor (sunrgbd/sunrgbd_data.py:31-72):
    image / depth-.mat / calib / label files laid out by 6-digit index."""

    def __init__(self, root_dir, split="training", use_v1=False):
        self.root_dir = root_dir
        self.split = split
        assert self.split == "training"
        self.split_dir = root_dir
        self.num_samples = 10335
        self.image_dir = f"{self.split_dir}/image"
        self.calib_dir = f"{self.split_dir}/calib"
        self.depth_dir = f"{self.split_dir}/depth"
        self.label_dir = (f"{self.split_dir}/label_v1" if use_v1
                          else f"{self.split_dir}/label")

    def __len__(self):
        return self.num_samples

    def get_image(self, idx):
        return load_image(f"{self.image_dir}/{idx:06d}.jpg")

    def get_depth(self, idx):
        return load_depth_points_mat(f"{self.depth_dir}/{idx:06d}.mat")

    def get_calibration(self, idx):
        return SUNRGBD_Calibration(f"{self.calib_dir}/{idx:06d}.txt")

    def get_label_objects(self, idx):
        return read_sunrgbd_label(f"{self.label_dir}/{idx:06d}.txt")


# snake_case alias matching the reference class name (sunrgbd_data.py:31)
sunrgbd_object = SunrgbdObject

DEFAULT_TYPE_WHITELIST = ["bed", "table", "sofa", "chair", "toilet", "desk",
                          "dresser", "night_stand", "bookshelf", "bathtub"]


def get_box3d_dim_statistics(idx_filename, root_dir="./sunrgbd_trainval",
                             type_whitelist=DEFAULT_TYPE_WHITELIST,
                             save_path=None):
    """Collect per-class box-dimension statistics over the raw labels
    (sunrgbd_data.py:264-305). Returns {classname: mean (l, w, h)} and
    optionally pickles (types, dims, headings)."""
    dataset = SunrgbdObject(root_dir)
    dimension_list, type_list, ry_list = [], [], []
    for data_idx in [int(line.rstrip()) for line in open(idx_filename)]:
        for obj in dataset.get_label_objects(data_idx):
            if obj.classname not in type_whitelist:
                continue
            heading_angle = -1 * np.arctan2(obj.orientation[1],
                                            obj.orientation[0])
            dimension_list.append(np.array([obj.l, obj.w, obj.h]))
            type_list.append(obj.classname)
            ry_list.append(heading_angle)

    if save_path is not None:
        with open(save_path, "wb") as fp:
            pickle.dump(type_list, fp)
            pickle.dump(dimension_list, fp)
            pickle.dump(ry_list, fp)

    medians = {}
    for class_type in sorted(set(type_list)):
        dims = [dimension_list[i] for i in range(len(dimension_list))
                if type_list[i] == class_type]
        medians[class_type] = np.median(np.stack(dims), axis=0)
    return medians


def data_viz(data_dir, dump_dir="data_viz_dump", idx=1):
    """Examine + visualize one raw SUN RGB-D scene (sunrgbd_data.py:74-137
    without cv2/mayavi): writes the depth-colored projection image, the 2D
    and projected-3D label boxes (Bresenham), and the cloud + 3D boxes as
    PLY."""
    import os

    from ..utils.dump_helper import write_ply

    os.makedirs(dump_dir, exist_ok=True)
    dataset = SunrgbdObject(data_dir)
    pc = dataset.get_depth(idx)
    calib = dataset.get_calibration(idx)
    uv, d = calib.project_upright_depth_to_image(pc[:, 0:3])

    img = dataset.get_image(idx).copy()
    h, w = img.shape[:2]
    u = np.round(uv[:, 0]).astype(int)
    v = np.round(uv[:, 1]).astype(int)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (d > 0)
    depth_norm = np.clip(120.0 / np.maximum(d[ok], 1e-6), 0, 255) / 255.0
    colors = (np.stack([depth_norm, 1 - depth_norm,
                        np.abs(0.5 - depth_norm) * 2], axis=1) * 255)
    img[v[ok], u[ok]] = colors.astype(np.uint8)
    from PIL import Image
    Image.fromarray(img).save(f"{dump_dir}/img_depth.jpg")

    objects = dataset.get_label_objects(idx)
    img2 = dataset.get_image(idx).copy()
    boxes3d = []
    for obj in objects:
        for x in (int(obj.xmin), int(obj.xmax)):
            _draw_line(img2, (x, obj.ymin), (x, obj.ymax), (0, 255, 0))
        for y in (int(obj.ymin), int(obj.ymax)):
            _draw_line(img2, (obj.xmin, y), (obj.xmax, y), (0, 255, 0))
        box3d_pts_2d, box3d_pts_3d = compute_box_3d(obj, calib)
        draw_projected_box3d(img2, box3d_pts_2d, color=(255, 0, 0))
        boxes3d.append(box3d_pts_3d)
    Image.fromarray(img2).save(f"{dump_dir}/img_boxes.jpg")

    write_ply(pc[:, 0:3], f"{dump_dir}/pc.ply")
    if boxes3d:
        draw_boxes3d_in_point_cloud(
            np.stack(boxes3d), f"{dump_dir}/label_boxes.ply")
