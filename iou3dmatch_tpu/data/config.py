"""Dataset configurations for ScanNet and SUN RGB-D.

Mirrors `scannet/model_util_scannet.py:19-83` and
`sunrgbd/model_util_sunrgbd.py:19-129`. Device-side helpers (class2angle /
class2size / angle2class) are pure jnp functions so they can live inside
jitted loss graphs; NumPy twins serve the host-side eval path.

The ScanNet mean sizes are the dataset statistics shipped as
`scannet/meta_data/scannet_means.npz` in the reference, inlined here.
"""
import jax.numpy as jnp
import numpy as np

_SCANNET_MEAN_SIZES = np.array(
    [
        [0.76966726, 0.81160211, 0.92573741],
        [1.876858, 1.84255952, 1.19315654],
        [0.61327999, 0.61486087, 0.71827014],
        [1.39550063, 1.51215451, 0.83443565],
        [0.97949596, 1.06751485, 0.63296875],
        [0.53166301, 0.59555772, 1.75001483],
        [0.96247056, 0.72462326, 1.14818682],
        [0.83221924, 1.04909355, 1.68756634],
        [0.21132214, 0.4206159, 0.53728459],
        [1.44400728, 1.89708334, 0.26985747],
        [1.02942616, 1.40407966, 0.87554322],
        [1.37664116, 0.65521793, 1.68131292],
        [0.66508189, 0.71111926, 1.29885307],
        [0.41999174, 0.37906947, 1.75139715],
        [0.59359559, 0.59124924, 0.73919014],
        [0.50867595, 0.50656087, 0.30136236],
        [1.15115265, 1.0546296, 0.49706794],
        [0.47535286, 0.49249493, 0.58021168],
    ]
)

_SUNRGBD_TYPE_MEAN_SIZE = {
    "bed": [2.114256, 1.620300, 0.927272],
    "table": [0.791118, 1.279516, 0.718182],
    "sofa": [0.923508, 1.867419, 0.845495],
    "chair": [0.591958, 0.552978, 0.827272],
    "toilet": [0.699104, 0.454178, 0.756250],
    "desk": [0.695190, 1.346299, 0.736364],
    "dresser": [0.528526, 1.002642, 1.172878],
    "night_stand": [0.500618, 0.632163, 0.683424],
    "bookshelf": [0.404671, 1.071108, 1.688889],
    "bathtub": [0.765840, 1.398258, 0.472728],
}


class _BaseConfig:
    """Shared class2size / angle-bin logic."""

    def class2size(self, pred_cls, residual):
        """NumPy host-side (model_util_*.py class2size)."""
        return self.mean_size_arr[pred_cls, :] + residual

    def size2class(self, size, type_name):
        """Full box size -> (size class, residual); size clusters are
        semantic classes in both datasets (model_util_sunrgbd.py:80-84,
        model_util_scannet.py:56-60)."""
        size_class = self.type2class[type_name]
        return size_class, size - self.mean_size_arr[size_class]

    def class2size_jnp(self, pred_cls, residual):
        return jnp.asarray(self.mean_size_arr)[pred_cls, :] + residual

    def param2obb(self, center, heading_class, heading_residual, size_class, size_residual):
        heading_angle = self.class2angle(heading_class, heading_residual)
        box_size = self.class2size(int(size_class), size_residual)
        obb = np.zeros((7,))
        obb[0:3] = center
        obb[3:6] = box_size
        obb[6] = heading_angle * -1
        return obb


class ScannetConfig(_BaseConfig):
    """18 classes, 1 heading bin (axis-aligned boxes), 18 size clusters
    (scannet/model_util_scannet.py:19-83)."""

    num_class = 18
    num_heading_bin = 1
    num_size_cluster = 18
    max_num_obj = 64

    type2class = {
        "cabinet": 0, "bed": 1, "chair": 2, "sofa": 3, "table": 4, "door": 5,
        "window": 6, "bookshelf": 7, "picture": 8, "counter": 9, "desk": 10,
        "curtain": 11, "refrigerator": 12, "showercurtrain": 13, "toilet": 14,
        "sink": 15, "bathtub": 16, "garbagebin": 17,
    }
    nyu40ids = np.array(
        [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
    )

    def __init__(self):
        self.class2type = {v: k for k, v in self.type2class.items()}
        self.nyu40id2class = {nid: i for i, nid in enumerate(list(self.nyu40ids))}
        self.mean_size_arr = _SCANNET_MEAN_SIZES.copy()

    def class2angle(self, pred_cls, residual, to_label_format=True):
        return np.zeros(np.asarray(pred_cls).shape)

    def class2angle_jnp(self, pred_cls, residual, to_label_format=True):
        return jnp.zeros(pred_cls.shape, dtype=jnp.float32)

    def angle2class_jnp(self, angle):
        raise NotImplementedError("ScanNet boxes are axis-aligned")


class SunrgbdConfig(_BaseConfig):
    """10 classes, 12 heading bins, 10 size clusters
    (sunrgbd/model_util_sunrgbd.py:19-129)."""

    num_class = 10
    num_heading_bin = 12
    num_size_cluster = 10
    max_num_obj = 64

    type2class = {
        "bed": 0, "table": 1, "sofa": 2, "chair": 3, "toilet": 4,
        "desk": 5, "dresser": 6, "night_stand": 7, "bookshelf": 8, "bathtub": 9,
    }

    def __init__(self):
        self.class2type = {v: k for k, v in self.type2class.items()}
        self.mean_size_arr = np.zeros((self.num_size_cluster, 3))
        for i in range(self.num_size_cluster):
            self.mean_size_arr[i, :] = _SUNRGBD_TYPE_MEAN_SIZE[self.class2type[i]]

    def class2angle(self, pred_cls, residual, to_label_format=True):
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = pred_cls * angle_per_class + residual
        if to_label_format:
            angle = angle - 2 * np.pi * (angle > np.pi)
        return angle

    def class2angle_jnp(self, pred_cls, residual, to_label_format=True):
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = pred_cls.astype(jnp.float32) * angle_per_class + residual
        if to_label_format:
            angle = angle - 2 * np.pi * (angle > np.pi)
        return angle

    def angle2class(self, angle):
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = angle % (2 * np.pi)
        shifted = (angle + angle_per_class / 2) % (2 * np.pi)
        class_id = int(shifted / angle_per_class)
        residual = shifted - (class_id * angle_per_class + angle_per_class / 2)
        return class_id, residual

    def angle2class_jnp(self, angle):
        """Vectorized (sunrgbd/model_util_sunrgbd.py:62-78)."""
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = angle % (2 * np.pi)
        shifted = (angle + angle_per_class / 2) % (2 * np.pi)
        class_id = (shifted / angle_per_class).astype(jnp.int32)
        residual = shifted - (
            class_id.astype(jnp.float32) * angle_per_class + angle_per_class / 2
        )
        return class_id, residual


def get_config(dataset: str):
    if dataset == "scannet":
        return ScannetConfig()
    if dataset == "sunrgbd":
        return SunrgbdConfig()
    raise ValueError(f"unknown dataset {dataset!r}")
