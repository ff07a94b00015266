"""Library-surface tests for data/sunrgbd_calib.py (sunrgbd_utils.py parity)
and the pc_util / dump_helper extras."""
import numpy as np
import pytest

from iou3dmatch_tpu.data import pc_util
from iou3dmatch_tpu.data.sunrgbd_calib import (
    SUNObject3d,
    SUNRGBD_Calibration,
    compute_box_3d,
    compute_orientation_3d,
    draw_projected_box3d,
    extract_pc_in_box3d,
    in_hull,
    inverse_rigid_trans,
    load_zipped_pickle,
    my_compute_box_3d,
    random_shift_box2d,
    rotx,
    save_zipped_pickle,
    transform_from_rot_trans,
)


def _write_calib(path, rtilt=None, K=None):
    rtilt = np.eye(3) if rtilt is None else np.asarray(rtilt)
    K = (np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
         if K is None else np.asarray(K))
    # calib file is column-major flattened (order="F" on read)
    with open(path, "w") as f:
        f.write(" ".join(str(v) for v in rtilt.flatten(order="F")) + "\n")
        f.write(" ".join(str(v) for v in K.flatten(order="F")) + "\n")
    return path


def test_calibration_roundtrip(tmp_path):
    # a real tilt: 10 degrees about x
    rtilt = rotx(np.deg2rad(10.0))[0:3, 0:3]
    calib = SUNRGBD_Calibration(_write_calib(tmp_path / "c.txt", rtilt=rtilt))
    assert calib.f_u == 500.0 and calib.c_v == 240.0
    np.testing.assert_allclose(calib.Rtilt, rtilt)

    rng = np.random.RandomState(0)
    pc = rng.randn(50, 3) * 0.5 + np.array([0.0, 3.0, 1.0])  # in front
    uv, d = calib.project_upright_depth_to_image(pc)
    assert uv.shape == (50, 2) and np.all(d > 0)
    # image (+depth) -> upright camera -> upright depth recovers the cloud
    rec_cam = calib.project_image_to_upright_camera(
        np.concatenate([uv, d[:, None]], axis=1))
    rec = calib.project_upright_camera_to_upright_depth(rec_cam)
    np.testing.assert_allclose(rec, pc, atol=1e-9)
    # frame flips are inverses
    np.testing.assert_allclose(
        calib.project_upright_camera_to_upright_depth(
            calib.project_upright_depth_to_upright_camera(pc)), pc)


def test_rigid_transform_helpers():
    R = rotx(0.3)
    t = np.array([1.0, -2.0, 0.5])
    T = transform_from_rot_trans(R, t)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])
    inv = inverse_rigid_trans(T[0:3, :])
    # inv applied after T is identity
    comp_R = inv[0:3, 0:3] @ T[0:3, 0:3]
    comp_t = inv[0:3, 0:3] @ T[0:3, 3] + inv[0:3, 3]
    np.testing.assert_allclose(comp_R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(comp_t, np.zeros(3), atol=1e-12)


def test_sunobject3d_and_boxes(tmp_path):
    # classname x y w h cx cy cz sx sy sz ox oy
    line = "chair 10 20 30 40 1.0 2.0 0.5 0.4 0.5 0.45 0.7071 -0.7071"
    obj = SUNObject3d(line)
    assert obj.classname == "chair"
    np.testing.assert_allclose(obj.box2d, [10, 20, 40, 60])
    np.testing.assert_allclose(obj.centroid, [1.0, 2.0, 0.5])
    assert (obj.w, obj.l, obj.h) == (0.4, 0.5, 0.45)
    # heading = -atan2(oy, ox) = -(-pi/4) = pi/4
    np.testing.assert_allclose(obj.heading_angle, np.pi / 4, rtol=1e-4)

    corners = my_compute_box_3d(obj.centroid, (obj.l, obj.w, obj.h),
                                obj.heading_angle)
    assert corners.shape == (8, 3)
    # sizes are HALF extents: z span == 2*h
    np.testing.assert_allclose(corners[:, 2].max() - corners[:, 2].min(),
                               2 * obj.h, rtol=1e-6)
    np.testing.assert_allclose(0.5 * (corners.max(0) + corners.min(0)),
                               obj.centroid, atol=1e-9)

    calib = SUNRGBD_Calibration(_write_calib(tmp_path / "c.txt"))
    c2d, c3d = compute_box_3d(obj, calib)
    assert c2d.shape == (8, 2)
    np.testing.assert_allclose(c3d, corners)
    o2d, o3d = compute_orientation_3d(obj, calib)
    assert o2d.shape == (2, 2) and o3d.shape == (2, 3)
    np.testing.assert_allclose(o3d[0], obj.centroid)
    np.testing.assert_allclose(
        o3d[1], obj.centroid + np.array([obj.orientation[0],
                                         obj.orientation[1], 0.0]))


def test_in_hull_and_extract():
    box = my_compute_box_3d((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 0.3)
    pts = np.array([[0.0, 0.0, 0.0, 7.0],   # inside (extra feature col)
                    [5.0, 5.0, 5.0, 8.0]])  # outside
    inside, mask = extract_pc_in_box3d(pts, box)
    assert mask.tolist() == [True, False]
    np.testing.assert_allclose(inside, pts[:1])
    assert in_hull(np.zeros((1, 3)), box)[0]


def test_random_shift_box2d_bounds():
    rng = np.random.RandomState(3)
    box = np.array([10.0, 20.0, 50.0, 100.0])
    for _ in range(20):
        out = random_shift_box2d(box, shift_ratio=0.1, rng=rng)
        assert out[0] < out[2] and out[1] < out[3]
        # center moved at most w*r / h*r; sizes within +-10%
        assert abs((out[0] + out[2]) / 2 - 30.0) <= 4.0 + 1e-9
        assert abs((out[1] + out[3]) / 2 - 60.0) <= 8.0 + 1e-9
        assert 36.0 - 1e-9 <= out[2] - out[0] <= 44.0 + 1e-9
        assert 72.0 - 1e-9 <= out[3] - out[1] <= 88.0 + 1e-9


def test_draw_projected_box3d_pixels():
    img = np.zeros((60, 80, 3), np.uint8)
    qs = np.array([[10, 10], [40, 10], [40, 30], [10, 30],
                   [12, 14], [42, 14], [42, 34], [12, 34]])
    out = draw_projected_box3d(img, qs, color=(255, 0, 0))
    assert out is img and (img[:, :, 0] == 255).sum() > 50
    assert img[10, 10, 0] == 255  # a corner lies on an edge


def test_zipped_pickle_roundtrip(tmp_path):
    obj = {"a": np.arange(5), "b": "hi"}
    p = tmp_path / "o.pkl.gz"
    save_zipped_pickle(obj, p)
    back = load_zipped_pickle(p)
    assert back["b"] == "hi"
    np.testing.assert_array_equal(back["a"], obj["a"])


# ------------------------------------------------------------ pc_util extras
def test_voxelization_roundtrip():
    pts = np.array([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9], [-0.9, 0.0, 0.5]])
    vol = pc_util.point_cloud_to_volume(pts, vsize=8, radius=1.0)
    assert vol.shape == (8, 8, 8) and vol.sum() == 3
    back = pc_util.volume_to_point_cloud(vol)
    assert back.shape == (3, 3)
    # batch + flatten
    flat = pc_util.point_cloud_to_volume_batch(pts[None], vsize=8)
    assert flat.shape == (1, 512) and flat.sum() == 3
    unflat = pc_util.point_cloud_to_volume_batch(pts[None], vsize=8,
                                                 flatten=False)
    assert unflat.shape == (1, 8, 8, 8, 1)


def test_voxel_v2_and_image():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.99, 0.99, size=(200, 3))
    vol = pc_util.point_cloud_to_volume_v2(pts, vsize=4, num_sample=16,
                                           rng=rng)
    assert vol.shape == (4, 4, 4, 16, 3)
    # local coords are within half a voxel of the center (scaled by voxel)
    assert np.abs(vol).max() <= 0.5 + 1e-9
    img = pc_util.point_cloud_to_image(pts, imgsize=4, num_sample=16, rng=rng)
    assert img.shape == (4, 4, 16, 3)
    assert np.abs(img[..., 0:2]).max() <= 0.5 + 1e-9
    batch = pc_util.point_cloud_to_image_batch(pts[None], imgsize=4,
                                               num_sample=16, rng=rng)
    assert batch.shape == (1, 4, 4, 16, 3)


def test_bbox_helpers():
    # identical boxes -> similarity 1
    from iou3dmatch_tpu.geometry import get_3d_box_np
    c = get_3d_box_np(np.array([1.0, 2.0, 0.5]), 0.2, np.array([0., 0., 0.]))
    assert pc_util.bbox_corner_dist_measure(c, c) == 1.0
    far = c + 100.0
    assert pc_util.bbox_corner_dist_measure(c, far) == 0.0

    bb = pc_util.point_cloud_to_bbox(np.array([[0, 0, 0], [2, 4, 6.0]]))
    np.testing.assert_allclose(bb, [1, 2, 3, 2, 4, 6])
    bbb = pc_util.point_cloud_to_bbox(np.zeros((2, 5, 3)))
    assert bbb.shape == (2, 6)


def test_rotation_helpers():
    np.testing.assert_allclose(
        pc_util.roty(np.pi / 2) @ np.array([0, 0, 1.0]), [1, 0, 0],
        atol=1e-12)
    rb = pc_util.roty_batch(np.array([0.1, 0.2]))
    assert rb.shape == (2, 3, 3)
    np.testing.assert_allclose(rb[0], pc_util.roty(0.1))
    pts = np.array([[1.0, 2.0, 0.0]])
    rot, mat = pc_util.rotate_point_cloud(pts.copy(),
                                          rng=np.random.RandomState(0))
    assert rot.shape == pts.shape and mat.shape == (3, 3)
    # single point: rotation about centroid is a no-op
    np.testing.assert_allclose(rot, pts, atol=1e-12)
    pc = np.array([[1.0, 5.0, 0.0]])
    pc_util.rotate_pc_along_y(pc, np.pi / 2)  # x->+z (reference convention)
    np.testing.assert_allclose(pc, [[0.0, 5.0, 1.0]], atol=1e-12)


# --------------------------------------------------------- dump_helper extras
def test_ply_mesh_writers(tmp_path):
    from iou3dmatch_tpu.utils.dump_helper import (
        write_bbox, write_oriented_bbox_camera_coord, write_lines_as_cylinders)

    p1 = tmp_path / "aabb.ply"
    write_bbox(np.array([[0, 0, 0, 2, 2, 2.0]]), p1)
    txt = p1.read_text()
    assert "element vertex 8" in txt and "element face 12" in txt

    p2 = tmp_path / "cam.ply"
    write_oriented_bbox_camera_coord(np.array([[0, 0, 0, 1, 1, 1, 0.3]]), p2)
    assert "element vertex 8" in p2.read_text()

    p3 = tmp_path / "lines.ply"
    write_lines_as_cylinders(np.array([[[0, 0, 0], [0, 0, 1.0]]]), p3, res=8)
    txt3 = p3.read_text()
    assert "element vertex 16" in txt3 and "element face 16" in txt3


def _write_raw_scene(root, idx=1):
    """Minimal raw SUN RGB-D trainval layout for one scene."""
    import scipy.io as sio
    from PIL import Image

    for d in ("image", "calib", "depth", "label", "label_v1"):
        (root / d).mkdir(exist_ok=True)
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        root / "image" / f"{idx:06d}.jpg")
    rtilt = np.eye(3).flatten(order="F")
    k = np.array([[200.0, 0, 32], [0, 200.0, 24], [0, 0, 1]]).flatten(order="F")
    (root / "calib" / f"{idx:06d}.txt").write_text(
        " ".join(map(str, rtilt)) + "\n" + " ".join(map(str, k)) + "\n")
    pts = np.random.RandomState(0).uniform(-1, 1, (50, 6))
    pts[:, 1] += 3.0  # in front of the camera
    sio.savemat(root / "depth" / f"{idx:06d}.mat", {"instance": pts})
    line = ("bed 10 10 20 15 " + "0.0 3.0 0.5 " + "1.0 2.0 0.5 " + "1 0")
    (root / "label" / f"{idx:06d}.txt").write_text(line + "\n")
    (root / "label_v1" / f"{idx:06d}.txt").write_text(line + "\n")


def test_sunrgbd_object_accessor(tmp_path):
    """SunrgbdObject file layout + readers (sunrgbd_data.py:31-72)."""
    from iou3dmatch_tpu.data.sunrgbd_calib import SunrgbdObject, sunrgbd_object

    _write_raw_scene(tmp_path)
    ds = SunrgbdObject(str(tmp_path), use_v1=True)
    assert len(ds) == 10335 and sunrgbd_object is SunrgbdObject
    assert ds.get_image(1).shape == (48, 64, 3)
    assert ds.get_depth(1).shape == (50, 6)
    calib = ds.get_calibration(1)
    np.testing.assert_allclose(calib.f_u, 200.0)
    objs = ds.get_label_objects(1)
    assert len(objs) == 1 and objs[0].classname == "bed"
    np.testing.assert_allclose(objs[0].centroid, [0.0, 3.0, 0.5])


def test_get_box3d_dim_statistics(tmp_path):
    """Per-class median dims over raw labels (sunrgbd_data.py:264-305)."""
    from iou3dmatch_tpu.data.sunrgbd_calib import get_box3d_dim_statistics

    _write_raw_scene(tmp_path)
    idxf = tmp_path / "idx.txt"
    idxf.write_text("1\n")
    save = tmp_path / "stats.pkl"
    med = get_box3d_dim_statistics(str(idxf), root_dir=str(tmp_path),
                                   save_path=str(save))
    # label line: w l h = 1.0 2.0 0.5 -> dims recorded as (l, w, h)
    np.testing.assert_allclose(med["bed"], [2.0, 1.0, 0.5])
    assert save.exists()


def test_draw_boxes3d_and_data_viz(tmp_path):
    """draw_boxes3d_in_point_cloud writes a 12-edge cylinder mesh per box;
    data_viz produces the three dump artifacts (sunrgbd_data.py:74-137)."""
    from iou3dmatch_tpu.data.sunrgbd_calib import (
        data_viz, draw_boxes3d_in_point_cloud, my_compute_box_3d)

    corners = my_compute_box_3d(np.zeros(3), (1.0, 1.0, 1.0), 0.0)
    out = tmp_path / "boxes.ply"
    draw_boxes3d_in_point_cloud(corners[None], str(out), rad=0.01)
    txt = out.read_text()
    assert "element vertex" in txt and "element face" in txt

    _write_raw_scene(tmp_path)
    dump = tmp_path / "viz"
    data_viz(str(tmp_path), dump_dir=str(dump), idx=1)
    assert (dump / "img_depth.jpg").exists()
    assert (dump / "img_boxes.jpg").exists()
    assert (dump / "pc.ply").exists()
    assert (dump / "label_boxes.ply").exists()


def test_pyplot_draws(tmp_path):
    """pyplot_draw_point_cloud / volume save figures (pc_util.py:243-259)."""
    from iou3dmatch_tpu.data.pc_util import (
        point_cloud_to_volume, pyplot_draw_point_cloud, pyplot_draw_volume)

    pts = np.random.RandomState(0).uniform(-0.9, 0.9, (50, 3))
    f1 = tmp_path / "pc.png"
    pyplot_draw_point_cloud(pts, str(f1))
    assert f1.stat().st_size > 0
    f2 = tmp_path / "vol.png"
    pyplot_draw_volume(point_cloud_to_volume(pts, 8), str(f2))
    assert f2.stat().st_size > 0
