"""SUN RGB-D raw extraction — pure-Python replacement for the reference's
MATLAB step (`sunrgbd/matlab/extract_rgbd_data_v2.m`, `extract_split.m`).

Reads the official SUNRGBD release (OFFICIAL_SUNRGBD/ with
SUNRGBDMeta3DBB_v2.mat, SUNRGBDMeta2DBB_v2.mat,
SUNRGBDtoolbox/traintestSUNRGBD/allsplit.mat and the per-scene depth/rgb
files) with scipy.io — no MATLAB required — and writes the same
``sunrgbd_trainval`` layout the downstream prep (prep_sunrgbd.py) consumes:

    depth/XXXXXX.mat   key 'instance': (N, 6) xyz+rgb in upright depth coords
    image/XXXXXX.jpg   copied RGB
    calib/XXXXXX.txt   Rtilt row, K row
    label_v1|label/XXXXXX.txt  'cls x y w h cx cy cz c1 c2 c3 ox oy' per box
    train_data_idx.txt / val_data_idx.txt

The 3D point recovery mirrors SUNRGBDtoolbox read3dPoints.m: the 16-bit
depth PNG stores millimeters rotated by 3 bits; points are unprojected with
K, axis-swapped to z-up, tilted by Rtilt, capped at 8 m.
"""
import argparse
import os
import shutil

import numpy as np


def _field(rec, name):
    v = rec[name]
    while isinstance(v, np.ndarray) and v.dtype == object and v.size == 1:
        v = v.item()
    return v


def read_depth_points(depth_path, k_mat):
    """Depth PNG -> (N, 3) camera-frame points (read3dPoints.m semantics)."""
    from PIL import Image

    depth_vis = np.asarray(Image.open(depth_path), dtype=np.uint16)
    depth = np.bitwise_or(
        np.right_shift(depth_vis, 3), np.left_shift(depth_vis, 16 - 3)
    ).astype(np.float32) / 1000.0
    depth[depth > 8.0] = 8.0
    h, w = depth.shape
    cx, cy = k_mat[0, 2], k_mat[1, 2]
    fx, fy = k_mat[0, 0], k_mat[1, 1]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    z = depth
    valid = depth > 0
    pts = np.stack([x[valid], y[valid], z[valid]], axis=1)
    rgb_uv = np.stack([v[valid], u[valid]], axis=1)
    return pts, rgb_uv


def camera_to_upright_depth(points_cam, rtilt):
    """[x, z, -y] then tilt by Rtilt (read3dPoints.m axis convention)."""
    pts = np.stack(
        [points_cam[:, 0], points_cam[:, 2], -points_cam[:, 1]], axis=1
    )
    return pts @ rtilt.T


def extract_one(meta_rec, meta2d_rec, official_root, out, idx, v1=False):
    from PIL import Image

    rtilt = np.asarray(_field(meta_rec, "Rtilt"), dtype=np.float64)
    k_mat = np.asarray(_field(meta_rec, "K"), dtype=np.float64)

    def _local(p):
        p = str(np.asarray(p).item()) if isinstance(p, np.ndarray) else str(p)
        if os.path.exists(p):
            return p
        # Official metadata stores absolute paths from the capture machine
        # ('/n/fs/sun3d/data/...'); strip that prefix and rebase
        # (extract_rgbd_data_v2.m:41-44).
        return os.path.join(official_root, p[17:] if p.startswith("/") else p)

    depth_path = _local(_field(meta_rec, "depthpath"))
    rgb_path = _local(_field(meta_rec, "rgbpath"))

    pts_cam, rgb_uv = read_depth_points(depth_path, k_mat)
    pts_up = camera_to_upright_depth(pts_cam, rtilt)
    rgb_img = np.asarray(Image.open(rgb_path), dtype=np.float32) / 255.0
    rgb = rgb_img[rgb_uv[:, 0], rgb_uv[:, 1]]
    points3d_rgb = np.concatenate([pts_up, rgb], axis=1).astype(np.float32)

    import scipy.io as sio

    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    os.makedirs(os.path.join(out, "image"), exist_ok=True)
    os.makedirs(os.path.join(out, "calib"), exist_ok=True)
    label_dir = os.path.join(out, "label_v1" if v1 else "label")
    os.makedirs(label_dir, exist_ok=True)

    sio.savemat(os.path.join(out, "depth", f"{idx:06d}.mat"),
                {"instance": points3d_rgb}, do_compression=True)
    shutil.copyfile(rgb_path, os.path.join(out, "image", f"{idx:06d}.jpg"))
    with open(os.path.join(out, "calib", f"{idx:06d}.txt"), "w") as f:
        f.write(" ".join(str(v) for v in rtilt.flatten(order="F")) + "\n")
        f.write(" ".join(str(v) for v in k_mat.flatten(order="F")) + "\n")

    boxes3d = _field(meta_rec, "groundtruth3DBB")
    boxes2d = _field(meta2d_rec, "groundtruth2DBB") if meta2d_rec is not None else None
    lines = []
    if boxes3d is not None and np.asarray(boxes3d).size:
        boxes3d = np.atleast_1d(np.asarray(boxes3d).squeeze())
        b2 = (np.atleast_1d(np.asarray(boxes2d).squeeze())
              if boxes2d is not None and np.asarray(boxes2d).size else None)
        for j in range(len(boxes3d)):
            bb = boxes3d[j]
            cls = str(np.asarray(_field(bb, "classname")).item())
            centroid = np.asarray(_field(bb, "centroid")).ravel()
            coeffs = np.abs(np.asarray(_field(bb, "coeffs")).ravel())
            orient = np.asarray(_field(bb, "orientation")).ravel()
            if b2 is not None and j < len(b2):
                box2d = np.asarray(_field(b2[j], "gtBb2D")).ravel()
            else:
                box2d = np.zeros(4)
            lines.append(
                f"{cls} {int(box2d[0])} {int(box2d[1])} {int(box2d[2])} "
                f"{int(box2d[3])} {centroid[0]:f} {centroid[1]:f} "
                f"{centroid[2]:f} {coeffs[0]:f} {coeffs[1]:f} {coeffs[2]:f} "
                f"{orient[0]:f} {orient[1]:f}"
            )
    with open(os.path.join(label_dir, f"{idx:06d}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def write_splits(official_root, out):
    """allsplit.mat -> train/val index files (extract_split.m)."""
    import scipy.io as sio

    split = sio.loadmat(
        os.path.join(official_root, "SUNRGBDtoolbox", "traintestSUNRGBD",
                     "allsplit.mat"),
        squeeze_me=True,
    )
    train = {str(p)[17:] if str(p).startswith("/") else str(p)
             for p in split["alltrain"]}
    meta = sio.loadmat(
        os.path.join(official_root, "SUNRGBDMeta3DBB_v2.mat"),
        squeeze_me=True, struct_as_record=True,
    )["SUNRGBDMeta"]
    train_idx, val_idx = [], []
    for i in range(len(meta)):
        folder = str(_field(meta[i], "sequenceName"))
        (train_idx if any(folder in t for t in train) else val_idx).append(i + 1)
    with open(os.path.join(out, "train_data_idx.txt"), "w") as f:
        f.write("\n".join(str(i) for i in train_idx) + "\n")
    with open(os.path.join(out, "val_data_idx.txt"), "w") as f:
        f.write("\n".join(str(i) for i in val_idx) + "\n")
    return len(train_idx), len(val_idx)


def main(argv=None):
    import scipy.io as sio

    p = argparse.ArgumentParser()
    p.add_argument("--official_root", default="OFFICIAL_SUNRGBD")
    p.add_argument("--out", default="sunrgbd_trainval")
    p.add_argument("--v1", action="store_true", help="write label_v1/")
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--end", type=int, default=10335)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    meta = sio.loadmat(
        os.path.join(args.official_root, "SUNRGBDMeta3DBB_v2.mat"),
        squeeze_me=True, struct_as_record=True,
    )["SUNRGBDMeta"]
    try:
        meta2d = sio.loadmat(
            os.path.join(args.official_root, "SUNRGBDMeta2DBB_v2.mat"),
            squeeze_me=True, struct_as_record=True,
        )["SUNRGBDMeta2DBB"]
    except Exception:
        meta2d = None
    for idx in range(args.start, args.end + 1):
        try:
            extract_one(meta[idx - 1], None if meta2d is None else meta2d[idx - 1],
                        args.official_root, args.out, idx, v1=args.v1)
            print(f"{idx:06d}: done")
        except Exception as e:  # per-scene resilience like the matlab try/catch
            print(f"{idx:06d}: FAILED ({e})")
    n_train, n_val = write_splits(args.official_root, args.out)
    print(f"splits: {n_train} train / {n_val} val")


if __name__ == "__main__":
    main()
