"""Geometry tests: rotated IoU vs polygon-clipping oracle, chamfer, NMS/LHS."""
import numpy as np
import jax.numpy as jnp
import pytest

from iou3dmatch_tpu.geometry import (
    boxes_iou3d,
    boxes_iou3d_paired_rows,
    box3d_iou_axis_aligned,
    huber_loss,
    nn_distance,
    nn_distance_withcls,
    nms_3d_faster_samecls,
    lhs_3d_faster_samecls,
    lhs_3d_samecls_jax,
    corners_aabb,
    get_3d_box_batch_np,
    flip_axis_to_camera,
)


# ---------- oracle: exact rotated-rect intersection via polygon clipping ----
def _rect_corners(cx, cy, dx, dy, ang):
    local = np.array([[-dx, -dy], [dx, -dy], [dx, dy], [-dx, dy]]) * 0.5
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s], [s, c]])
    return local @ R.T + np.array([cx, cy])


def _clip(subject, clip_poly):
    """Sutherland-Hodgman, CCW convex clip."""
    out = list(subject)
    cp1 = clip_poly[-1]
    for cp2 in clip_poly:
        inp = out
        out = []
        if not inp:
            return []
        s = inp[-1]
        for e in inp:
            side_e = (cp2[0] - cp1[0]) * (e[1] - cp1[1]) - (cp2[1] - cp1[1]) * (e[0] - cp1[0])
            side_s = (cp2[0] - cp1[0]) * (s[1] - cp1[1]) - (cp2[1] - cp1[1]) * (s[0] - cp1[0])
            if side_e > 0:
                if side_s <= 0:
                    out.append(_isect(cp1, cp2, s, e))
                out.append(e)
            elif side_s > 0:
                out.append(_isect(cp1, cp2, s, e))
            s = e
        cp1 = cp2
    return out


def _isect(cp1, cp2, s, e):
    dc = (cp1[0] - cp2[0], cp1[1] - cp2[1])
    dp = (s[0] - e[0], s[1] - e[1])
    n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
    n2 = s[0] * e[1] - s[1] * e[0]
    n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
    return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def iou3d_oracle(a, b):
    inter_poly = _clip(
        list(_rect_corners(a[0], a[1], a[3], a[4], a[6])),
        list(_rect_corners(b[0], b[1], b[3], b[4], b[6])),
    )
    bev = _poly_area(inter_poly)
    zo = max(
        0.0,
        min(a[2] + a[5] / 2, b[2] + b[5] / 2) - max(a[2] - a[5] / 2, b[2] - b[5] / 2),
    )
    inter = bev * zo
    va = a[3] * a[4] * a[5]
    vb = b[3] * b[4] * b[5]
    return inter / max(va + vb - inter, 1e-6)


def _random_boxes(rng, n):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:3] = rng.uniform(-2, 2, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.3, 2.5, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rotated_iou3d_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    a = _random_boxes(rng, 24)
    b = _random_boxes(rng, 16)
    # make some pairs heavily overlapping / identical / touching
    b[0] = a[0]
    b[1] = a[1]
    b[1, 6] += 0.3
    b[2] = a[2]
    b[2, 0] += a[2, 3]  # touching along x
    got = np.asarray(boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[iou3d_oracle(ai, bj) for bj in b] for ai in a])
    # MARGIN=1e-2 corner-containment (inherited from the reference kernel)
    # admits tiny overlaps for near-touching boxes; tolerance accounts for it.
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # and strongly-overlapping pairs should be tight
    np.testing.assert_allclose(got[0, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(got[1, 1], want[1, 1], atol=5e-3)


def test_identical_boxes_iou_one():
    a = np.array([[0, 0, 0, 1.0, 2.0, 1.5, 0.7]], np.float32)
    got = float(boxes_iou3d(jnp.asarray(a), jnp.asarray(a))[0, 0])
    assert abs(got - 1.0) < 1e-4


def test_disjoint_boxes_iou_zero():
    a = np.array([[0, 0, 0, 1.0, 1.0, 1.0, 0.3]], np.float32)
    b = np.array([[10, 10, 10, 1.0, 1.0, 1.0, -0.2]], np.float32)
    assert float(boxes_iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0]) == 0.0


def test_paired_rows_matches_cross_product_blocks():
    rng = np.random.RandomState(0)
    a = _random_boxes(rng, 6).reshape(2, 3, 7)
    b = _random_boxes(rng, 8).reshape(2, 4, 7)
    paired = np.asarray(boxes_iou3d_paired_rows(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        full = np.asarray(boxes_iou3d(jnp.asarray(a[i]), jnp.asarray(b[i])))
        np.testing.assert_allclose(paired[i], full, rtol=1e-5, atol=1e-6)


def test_axis_aligned_iou():
    c1 = jnp.asarray([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]])  # unit cube
    c2 = jnp.asarray([[[1.5, 1.0, 1.0], [0.5, 0.0, 0.0]]])  # shifted 0.5 in x
    got = float(box3d_iou_axis_aligned(c1, c2)[0])
    assert abs(got - 0.5 / 1.5) < 1e-5


def test_huber_and_nn_distance():
    err = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(huber_loss(err, delta=1.0))
    want = np.array([1.5, 0.125, 0.0, 0.125, 1.5])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    rng = np.random.RandomState(0)
    pc1 = rng.rand(1, 5, 3).astype(np.float32)
    pc2 = rng.rand(1, 6, 3).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
    dm = ((pc1[0][:, None] - pc2[0][None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1[0]), dm.min(1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1[0]), dm.argmin(1))
    np.testing.assert_allclose(np.asarray(d2[0]), dm.min(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2[0]), dm.argmin(0))

    # class-gated
    cls1 = jnp.asarray([[0, 1, 0, 1, 0]])
    cls2 = jnp.asarray([[0, 0, 1, 1, 0, 1]])
    d1c, _, _, _ = nn_distance_withcls(jnp.asarray(pc1), jnp.asarray(pc2), cls1, cls2)
    dmc = dm + (np.asarray(cls1)[0][:, None] != np.asarray(cls2)[0][None]) * 1000.0
    np.testing.assert_allclose(np.asarray(d1c[0]), dmc.min(1), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_lhs_jax_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    k = 32
    mins = rng.uniform(-3, 2, (k, 3)).astype(np.float32)
    maxs = mins + rng.uniform(0.5, 2.5, (k, 3)).astype(np.float32)
    scores = rng.rand(k).astype(np.float32)
    cls = rng.randint(0, 3, k).astype(np.float32)
    boxes = np.concatenate([mins, maxs, scores[:, None], cls[:, None]], axis=1)
    pick = lhs_3d_faster_samecls(boxes, 0.25)
    want = np.zeros(k, bool)
    want[np.array(pick, int)] = True
    got = np.asarray(
        lhs_3d_samecls_jax(
            jnp.asarray(mins), jnp.asarray(maxs), jnp.asarray(scores),
            jnp.asarray(cls), 0.25,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_nms_samecls_basic():
    # two same-class heavily overlapping boxes, one other-class overlapping
    boxes = np.array(
        [
            [0, 0, 0, 1, 1, 1, 0.9, 0],
            [0.05, 0, 0, 1.05, 1, 1, 0.8, 0],  # suppressed by box 0
            [0.05, 0, 0, 1.05, 1, 1, 0.7, 1],  # different class: kept
            [5, 5, 5, 6, 6, 6, 0.6, 0],  # far away: kept
        ]
    )
    pick = sorted(nms_3d_faster_samecls(boxes, 0.25))
    assert pick == [0, 2, 3]


def test_corners_aabb_matches_camera_frame_corner_aabb():
    """AABB of rotated box in depth frame == permuted camera-frame corner AABB."""
    rng = np.random.RandomState(0)
    center = rng.randn(5, 3).astype(np.float32)
    size = rng.uniform(0.5, 2, (5, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, 5).astype(np.float32)
    mins, maxs = corners_aabb(
        jnp.asarray(center), jnp.asarray(size), jnp.asarray(heading)
    )
    corners_cam = get_3d_box_batch_np(size, heading, flip_axis_to_camera(center))
    # camera (x, y, z) = depth (x, -z, y): depth-x = cam-x, depth-y = cam-z,
    # depth-z = -cam-y
    dx_min = corners_cam[..., 0].min(-1)
    dy_min = corners_cam[..., 2].min(-1)
    dz_min = (-corners_cam[..., 1]).min(-1)
    np.testing.assert_allclose(np.asarray(mins)[:, 0], dx_min, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mins)[:, 1], dy_min, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mins)[:, 2], dz_min, atol=1e-4)


def test_boxes_iou_bev_and_nms_jax():
    """BEV IoU + on-device rotated/normal NMS (nms_gpu surface parity)."""
    from iou3dmatch_tpu.geometry import boxes_iou_bev, nms_rotated_jax, nms_normal_jax

    boxes = jnp.asarray(np.array([
        [0, 0, 0, 2, 2, 2, 0.0],
        [0.1, 0, 0, 2, 2, 2, 0.0],   # heavy overlap with box 0
        [5, 5, 0, 2, 2, 2, 0.7],     # far away
        [5, 5.2, 0, 2, 2, 2, 0.7],   # overlaps box 2
    ], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.5])

    iou = np.asarray(boxes_iou_bev(boxes, boxes))
    assert abs(iou[0, 0] - 1.0) < 1e-5
    assert iou[0, 1] > 0.8 and iou[0, 2] < 1e-6

    keep = np.asarray(nms_rotated_jax(boxes, scores, 0.3))
    np.testing.assert_array_equal(keep, [True, False, True, False])

    keep_n = np.asarray(nms_normal_jax(boxes, scores, 0.3))
    np.testing.assert_array_equal(keep_n, [True, False, True, False])

    # normal NMS ignores heading: rotate box 1 heavily, AABB footprint same
    boxes2 = boxes.at[1, 6].set(0.78)
    keep2 = np.asarray(nms_normal_jax(boxes2, scores, 0.3))
    np.testing.assert_array_equal(keep2, [True, False, True, False])


def test_nn_distance_variants_match_torch_semantics():
    """exclude-self / exclude-self-with-cls / inbox vs a literal numpy oracle
    of the torch reference (utils/nn_distance.py:65-216)."""
    from iou3dmatch_tpu.geometry import (
        nn_distance_exclude_self, nn_distance_exclude_self_with_cls,
        nn_distance_inbox)

    rng = np.random.RandomState(5)
    b, n = 2, 6
    pc = rng.randn(b, n, 3).astype(np.float32)
    cls = rng.randint(0, 3, (b, n))

    # oracle: diagonal of pc2 replaced with -1000
    tiled = np.broadcast_to(pc[:, None, :, :], (b, n, n, 3)).copy()
    tiled[:, np.eye(n, dtype=bool)] = -1000.0
    d_o = ((pc[:, :, None, :] - tiled) ** 2).sum(-1)

    d1, i1, d2, i2 = nn_distance_exclude_self(jnp.asarray(pc), jnp.asarray(pc))
    np.testing.assert_allclose(np.asarray(d1), d_o.min(2), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), d_o.argmin(2))
    np.testing.assert_allclose(np.asarray(d2), d_o.min(1), rtol=1e-4)

    d_oc = d_o + (cls[:, :, None] != cls[:, None, :]) * 1000.0
    d1c, i1c, _, _ = nn_distance_exclude_self_with_cls(
        jnp.asarray(pc), jnp.asarray(pc), jnp.asarray(cls), jnp.asarray(cls))
    np.testing.assert_allclose(np.asarray(d1c), d_oc.min(2), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1c), d_oc.argmin(2))

    # inbox: seeds outside the target box get +1000
    m = 4
    pc2 = rng.randn(b, m, 3).astype(np.float32)
    seed = rng.randn(b, n, 3).astype(np.float32)
    half = np.abs(rng.randn(b, m, 3)).astype(np.float32)
    d_p = ((pc[:, :, None, :] - pc2[:, None, :, :]) ** 2).sum(-1)
    lower = pc2[:, None] - half[:, None]
    higher = pc2[:, None] + half[:, None]
    st = seed[:, :, None, :]
    out = ((lower > st).any(-1) | (higher < st).any(-1)) * 1000.0
    d_ib = d_p + out
    d1b, i1b, d2b, i2b = nn_distance_inbox(
        jnp.asarray(pc), jnp.asarray(seed), jnp.asarray(pc2), jnp.asarray(half))
    np.testing.assert_allclose(np.asarray(d1b), d_ib.min(2), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1b), d_ib.argmin(2))
    np.testing.assert_allclose(np.asarray(d2b), d_ib.min(1), rtol=1e-4)


def test_box_util_extras():
    """Library-surface parity for box_util's auxiliary functions
    (utils/box_util.py:77-109,152-250,309-332,384-411,442-521)."""
    from iou3dmatch_tpu.geometry import (
        roty_np, get_3d_box_depth_np, box3d_vol_batch_np, get_iou,
        box2d_iou, box3d_iou_batch_np, corners3d_to_parameter,
        check_valid_corners3d, get_3d_box_np, nms_2d, nms_2d_faster)
    from iou3dmatch_tpu.eval.box3d_iou_np import (
        convex_hull_intersection, is_clockwise, boxes3d_iou_batch)

    # roty: rotating +z by pi/2 lands on +x
    np.testing.assert_allclose(
        roty_np(np.pi / 2) @ np.array([0, 0, 1.0]),
        np.array([1.0, 0, 0]), atol=1e-12)

    # depth-frame corners: axis-aligned box recovers its extents
    c = get_3d_box_depth_np((2.0, 1.0, 3.0), 0.0, (5.0, 6.0, 7.0))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.max(0) - c.min(0), [2.0, 1.0, 3.0])
    np.testing.assert_allclose(0.5 * (c.max(0) + c.min(0)), [5.0, 6.0, 7.0])

    # 2D IoUs
    assert get_iou({'x1': 0, 'y1': 0, 'x2': 2, 'y2': 2},
                   {'x1': 1, 'y1': 1, 'x2': 3, 'y2': 3}) == 1 / 7
    assert box2d_iou((0, 0, 2, 2), (2, 2, 4, 4)) == 0.0

    # paired axis-aligned corner IoU: identical boxes -> 1
    corners = get_3d_box_np(np.array([1.0, 1.0, 1.0]), 0.3,
                            np.array([0.0, 0.0, 0.0]))[None]
    iou = box3d_iou_batch_np(corners, corners)
    np.testing.assert_allclose(iou, [1.0], atol=1e-6)

    # volume-batch quirk is preserved: sqrt of each edge length
    v = box3d_vol_batch_np(corners)
    edge = lambda i, j: np.linalg.norm(corners[0, i] - corners[0, j])
    np.testing.assert_allclose(
        v, [np.sqrt(edge(1, 2)) * np.sqrt(edge(0, 1)) * np.sqrt(edge(0, 4))],
        rtol=1e-6)

    # corner parameterization roundtrip (upright camera frame, heading 0.3)
    params = corners3d_to_parameter(
        get_3d_box_np(np.array([2.0, 1.0, 0.5]), 0.3, np.array([1., 2., 3.])))
    np.testing.assert_allclose(params[3:6], [2.0, 1.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(params[6], 0.3, atol=1e-6)
    # center mapping camera->depth: (x, z, -y)
    np.testing.assert_allclose(params[0:3], [1.0, 3.0, -2.0], atol=1e-6)

    assert check_valid_corners3d(corners[0])
    bad = corners[0].copy()
    bad[0] += 0.5
    assert not check_valid_corners3d(bad)
    assert not check_valid_corners3d(np.zeros((8, 3)))

    # hull intersection of two unit squares offset by 0.5 -> area 0.25
    sq = [(0, 0), (1, 0), (1, 1), (0, 1)]  # CCW, as polygon_clip expects
    sq2 = [(x + 0.5, y + 0.5) for (x, y) in sq]
    _, area = convex_hull_intersection(sq, sq2)
    np.testing.assert_allclose(area, 0.25, atol=1e-12)
    assert is_clockwise(np.array([(0, 0), (0, 1), (1, 1), (1, 0)]))

    # oriented cross IoU vs a manual per-pair computation. (Self-pairs of
    # bit-identical boxes are degenerate in the reference too — scipy
    # ConvexHull on the inf-vertex self-clip — so use distinct boxes.)
    b1 = get_3d_box_np(np.array([2.0, 1.0, 1.5]), 0.3, np.array([0., 0., 0.]))
    b2 = get_3d_box_np(np.array([1.5, 1.2, 1.0]), -0.2,
                       np.array([0.3, 0.1, -0.2]))
    b3 = b1 + 10.0  # disjoint from both
    b2s = get_3d_box_np(np.array([1.4, 1.1, 0.9]), -0.25,
                        np.array([0.4, 0.0, -0.1]))
    m = boxes3d_iou_batch(np.stack([b1, b2]), np.stack([b2s, b3]))
    assert m.shape == (2, 2)
    assert m[0, 1] == 0.0 and m[1, 1] == 0.0
    rect = lambda c: [(c[k, 0], c[k, 2]) for k in range(3, -1, -1)]
    inter_area = convex_hull_intersection(rect(b1), rect(b2s))[1]
    inter_y = min(b1[0, 1], b2s[0, 1]) - max(b1[4, 1], b2s[4, 1])
    inter_vol = inter_area * max(0.0, inter_y)
    vols = box3d_vol_batch_np(np.stack([b1, b2s]))
    np.testing.assert_allclose(
        m[0, 0], inter_vol / (vols[0] + vols[1] - inter_vol), rtol=1e-5)
    assert 0.0 < m[0, 0] and 0.0 < m[1, 0]

    # plain nms_2d == faster(old_type=True)
    boxes = np.array([[0, 0, 2, 2, 0.9], [0.2, 0.2, 2.2, 2.2, 0.8],
                      [5, 5, 6, 6, 0.7]])
    assert sorted(nms_2d(boxes, 0.5)) == sorted(
        nms_2d_faster(boxes, 0.5, old_type=True))


def test_nms_crnr_dist():
    """Corner-distance NMS (utils/nms.py:215-230): identical boxes collapse
    to the highest-confidence one; distant boxes survive."""
    from iou3dmatch_tpu.geometry.nms import nms_crnr_dist
    from iou3dmatch_tpu.geometry import get_3d_box_np

    b = get_3d_box_np(np.array([1.0, 1.0, 1.0]), 0.0, np.array([0., 0., 0.]))
    far = get_3d_box_np(np.array([1.0, 1.0, 1.0]), 0.0, np.array([9., 9., 9.]))
    boxes = np.stack([b, b + 1e-4, far])
    conf = np.array([0.9, 0.5, 0.8])
    pick = nms_crnr_dist(boxes, conf, overlap_threshold=0.7)
    assert set(pick) == {0, 2}
