"""Point-cloud utilities (host side, NumPy).

Mirrors the library surface of `utils/pc_util.py`: random_sampling (:35-43,
sampling WITH replacement iff the cloud has fewer points than requested),
voxelization helpers (:49-190), rotations (:264-321), and bbox helpers
(:323-356). PLY/mesh writers live in `iou3dmatch_tpu.utils.dump_helper`
and readers in `iou3dmatch_tpu.data.ply`.
"""
import numpy as np


def random_sampling(pc, num_sample, replace=None, return_choices=False, rng=None):
    """pc: (N, C) -> (num_sample, C)."""
    if replace is None:
        replace = pc.shape[0] < num_sample
    rng = rng if rng is not None else np.random
    choices = rng.choice(pc.shape[0], num_sample, replace=replace)
    if return_choices:
        return pc[choices], choices
    return pc[choices]


def rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def roty(t):
    """Rotation about the y-axis (pc_util.py:287-293)."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def roty_batch(t):
    """(...,) angles -> (..., 3, 3) y-rotations (pc_util.py:295-309)."""
    t = np.asarray(t)
    out = np.zeros(t.shape + (3, 3))
    c, s = np.cos(t), np.sin(t)
    out[..., 0, 0] = c
    out[..., 0, 2] = s
    out[..., 1, 1] = 1
    out[..., 2, 0] = -s
    out[..., 2, 2] = c
    return out


def rotate_point_cloud(points, rotation_matrix=None, rng=None):
    """Rotate (n,3) about the z axis around the centroid; returns
    (rotated, rotation_matrix) (pc_util.py:264-275)."""
    if rotation_matrix is None:
        rng = rng if rng is not None else np.random
        angle = rng.uniform() * 2 * np.pi
        s, c = np.sin(angle), np.cos(angle)
        rotation_matrix = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
    ctr = points.mean(axis=0)
    return np.dot(points - ctr, rotation_matrix) + ctr, rotation_matrix


def rotate_pc_along_y(pc, rot_angle):
    """In-place rotation of (N,C>=3) camera-frame points about y
    (pc_util.py:277-285)."""
    c, s = np.cos(rot_angle), np.sin(rot_angle)
    rotmat = np.array([[c, -s], [s, c]])
    pc[:, [0, 2]] = np.dot(pc[:, [0, 2]], rotmat.T)
    return pc


# ------------------------------------------------------------- voxelization
def point_cloud_to_volume(points, vsize, radius=1.0):
    """(N,3) in [-radius, radius] -> (vsize,)*3 occupancy grid
    (pc_util.py:66-77). Vectorized; cells are floor((p+r)/voxel) like the
    reference's int cast for in-range points."""
    vol = np.zeros((vsize, vsize, vsize))
    voxel = 2 * radius / float(vsize)
    loc = ((points + radius) / voxel).astype(int)
    vol[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    return vol


def point_cloud_to_volume_batch(point_clouds, vsize=12, radius=1.0,
                                flatten=True):
    """(B,N,3) -> (B, vsize**3) if flatten else (B,)+(vsize,)*3+(1,)
    (pc_util.py:49-64)."""
    vols = [point_cloud_to_volume(pc, vsize, radius) for pc in point_clouds]
    if flatten:
        return np.vstack([v.flatten() for v in vols])
    return np.stack(vols)[..., None]


def volume_to_point_cloud(vol):
    """Occupancy grid -> (N,3) integer cell coordinates (pc_util.py:78-93)."""
    vsize = vol.shape[0]
    assert vol.shape[1] == vsize and vol.shape[2] == vsize
    pts = np.argwhere(vol == 1).astype(float)
    return pts if len(pts) else np.zeros((0, 3))


def _sample_or_pad(pc, num_sample, rng):
    """Sample without replacement if too many, edge-pad if too few."""
    if pc.shape[0] > num_sample:
        return random_sampling(pc, num_sample, replace=False, rng=rng)
    if pc.shape[0] < num_sample:
        return np.pad(pc, ((0, num_sample - pc.shape[0]), (0, 0)), "edge")
    return pc


def point_cloud_to_volume_v2(points, vsize, radius=1.0, num_sample=128,
                             rng=None):
    """(N,3) -> (vsize,vsize,vsize,num_sample,3): per-voxel point sets,
    sampled/edge-padded to num_sample, centered on the voxel and scaled by
    the voxel size (pc_util.py:106-143)."""
    vol = np.zeros((vsize, vsize, vsize, num_sample, 3))
    voxel = 2 * radius / float(vsize)
    loc = ((points + radius) / voxel).astype(int)
    for key in {tuple(l) for l in loc}:
        mask = np.all(loc == key, axis=1)
        pc = _sample_or_pad(points[mask], num_sample, rng)
        center = (np.array(key) + 0.5) * voxel - radius
        vol[key] = (pc - center) / voxel
    return vol


def point_cloud_to_volume_v2_batch(point_clouds, vsize=12, radius=1.0,
                                   num_sample=128, rng=None):
    """(B,N,3) -> (B,vsize,vsize,vsize,num_sample,3) (pc_util.py:95-104)."""
    return np.stack([
        point_cloud_to_volume_v2(pc, vsize, radius, num_sample, rng)
        for pc in point_clouds
    ])


def point_cloud_to_image(points, imgsize, radius=1.0, num_sample=128,
                         rng=None):
    """(N,3) -> (imgsize,imgsize,num_sample,3): per-pixel (xy cells) point
    sets; xy centered/scaled per pixel, z kept (pc_util.py:156-190)."""
    img = np.zeros((imgsize, imgsize, num_sample, 3))
    pixel = 2 * radius / float(imgsize)
    loc = ((points[:, 0:2] + radius) / pixel).astype(int)
    for key in {tuple(l) for l in loc}:
        mask = np.all(loc == key, axis=1)
        pc = _sample_or_pad(points[mask], num_sample, rng).copy()
        center = (np.array(key) + 0.5) * pixel - radius
        pc[:, 0:2] = (pc[:, 0:2] - center) / pixel
        img[key] = pc
    return img


def point_cloud_to_image_batch(point_clouds, imgsize, radius=1.0,
                               num_sample=128, rng=None):
    """(B,N,3) -> (B,imgsize,imgsize,num_sample,3) (pc_util.py:144-154)."""
    return np.stack([
        point_cloud_to_image(pc, imgsize, radius, num_sample, rng)
        for pc in point_clouds
    ])


# ------------------------------------------------------------------ drawing
def pyplot_draw_point_cloud(points, output_filename=None):
    """3D scatter of an (N,3) cloud via matplotlib; saves to
    output_filename when given (pc_util.py:243-252 — the reference's
    savefig call is commented out, ours actually saves)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    if output_filename:
        fig.savefig(output_filename)
    plt.close(fig)


def pyplot_draw_volume(vol, output_filename=None):
    """Draw an occupancy grid as its cell point cloud (pc_util.py:254-259)."""
    pyplot_draw_point_cloud(volume_to_point_cloud(vol), output_filename)


# ------------------------------------------------------------------- bboxes
def bbox_corner_dist_measure(crnr1, crnr2):
    """Corner-distance similarity in [0,1] between two boxes given as (8,3)
    camera-frame corners; min over the 4 cyclic corner alignments
    (pc_util.py:323-344, sans its debug print)."""
    dist = min(
        np.linalg.norm(
            crnr2[[(x + y) % 4 for x in range(4)]
                  + [4 + (x + y) % 4 for x in range(4)], :] - crnr1,
            axis=1,
        ).sum() / 8.0
        for y in range(4)
    )
    u = sum(np.linalg.norm(x[0, :] - x[6, :]) for x in (crnr1, crnr2)) / 2.0
    return max(1.0 - dist / u, 0)


def point_cloud_to_bbox(points):
    """AABB of (N,3) or (B,N,3) -> 6-dim [center, lengths]
    (pc_util.py:346-356)."""
    which_dim = len(points.shape) - 2
    mn, mx = points.min(which_dim), points.max(which_dim)
    return np.concatenate([0.5 * (mn + mx), mx - mn], axis=which_dim)
