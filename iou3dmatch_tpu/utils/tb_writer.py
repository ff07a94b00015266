"""Pure-Python TensorBoard event-file writer.

Replaces the reference's TF1 ``FileWriter`` wrapper (utils/tf_logger.py,
utils/tf_visualizer.py) without a tensorflow dependency: encodes Event /
Summary protobufs by hand and frames them in the TFRecord format
(length + masked-crc32c framing), which TensorBoard reads natively.

Supports scalars and histograms — the two summary kinds the reference
actually emits (tf_logger.py:31-77).
"""
import os
import struct
import time

import numpy as np

# ----------------------------------------------------------------- crc32c
_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ------------------------------------------------------- protobuf encoding
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", float(v))


def _int64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _scalar_value(tag: str, value: float) -> bytes:
    # Summary.Value{ tag=1 (string), simple_value=2 (float) }
    return _len_delim(1, tag.encode()) + _float(2, value)


def _histo_value(tag: str, values: np.ndarray, bins: int = 30) -> bytes:
    values = np.asarray(values, dtype=np.float64).ravel()
    counts, edges = np.histogram(values, bins=bins)
    # HistogramProto: min=1 max=2 num=3 sum=4 sum_squares=5 (doubles),
    # bucket_limit=6, bucket=7 (packed repeated double)
    h = (
        _double(1, float(values.min())) + _double(2, float(values.max()))
        + _double(3, float(values.size)) + _double(4, float(values.sum()))
        + _double(5, float((values ** 2).sum()))
    )
    limits = struct.pack(f"<{bins}d", *edges[1:])
    buckets = struct.pack(f"<{bins}d", *counts.astype(np.float64))
    h += _len_delim(6, limits) + _len_delim(7, buckets)
    return _len_delim(1, tag.encode()) + _len_delim(5, h)


def _image_value(tag: str, image: np.ndarray) -> bytes:
    """Summary.Value{ tag=1, image=4 } with a PNG-encoded HWC uint8 image
    (mirrors `tf_logger.image_summary`, utils/tf_logger.py:28-49)."""
    import io

    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    # Summary.Image: height=1 width=2 colorspace=3 (int32),
    # encoded_image_string=4 (bytes)
    img = (
        _tag(1, 0) + _varint(arr.shape[0])
        + _tag(2, 0) + _varint(arr.shape[1])
        + _tag(3, 0) + _varint(arr.shape[2])
        + _len_delim(4, buf.getvalue())
    )
    return _len_delim(1, tag.encode()) + _len_delim(4, img)


def _event(step: int, summary_values: bytes = b"", file_version: str = "") -> bytes:
    # Event{ wall_time=1 (double), step=2 (int64), file_version=3 | summary=5 }
    ev = _double(1, time.time()) + _int64(2, step)
    if file_version:
        ev += _len_delim(3, file_version.encode())
    if summary_values:
        # Summary{ repeated Value value=1 }
        ev += _len_delim(5, summary_values)
    return ev


class TBWriter:
    """Minimal TensorBoard SummaryWriter (scalars + histograms)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.iou3dmatch"
        self._fh = open(os.path.join(log_dir, fname), "ab")
        self._write_record(_event(0, file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", _masked_crc(header)))
        self._fh.write(data)
        self._fh.write(struct.pack("<I", _masked_crc(data)))
        self._fh.flush()

    def scalar_summary(self, tag: str, value: float, step: int) -> None:
        self._write_record(_event(step, _scalar_value(tag, value)))

    def scalars(self, tag_value: dict, step: int) -> None:
        payload = b"".join(_scalar_value(t, v) for t, v in tag_value.items())
        self._write_record(_event(step, payload))

    def histo_summary(self, tag: str, values, step: int, bins: int = 30) -> None:
        self._write_record(_event(step, _histo_value(tag, values, bins)))

    def image_summary(self, tag: str, images, step: int) -> None:
        """images: list/array of HWC images (tf_logger.py:28-49 semantics:
        one Value per image, tag suffixed with its index)."""
        payload = b"".join(
            _image_value(f"{tag}/{i}", img) for i, img in enumerate(images)
        )
        self._write_record(_event(step, payload))

    def close(self) -> None:
        self._fh.close()


class Visualizer:
    """Name-spaced scalar logging (utils/tf_visualizer.py:15-48): keys are
    bucketed into loss/ acc/ ratio/ value/ other/ groups like the reference's
    train.py:292-302."""

    def __init__(self, log_dir: str, name: str = "train"):
        self.writer = TBWriter(os.path.join(log_dir, "tb", name))

    def log_scalars(self, scalar_dict: dict, step: int) -> None:
        grouped = {}
        for key, value in scalar_dict.items():
            if "loss" in key:
                prefix = "loss/"
            elif "acc" in key:
                prefix = "acc/"
            elif "ratio" in key:
                prefix = "ratio/"
            elif "value" in key:
                prefix = "value/"
            else:
                prefix = "other/"
            grouped[prefix + key] = float(value)
        self.writer.scalars(grouped, step)

    def log_images(self, visuals: dict, step: int) -> None:
        """visuals: {label: [HWC images]} (tf_visualizer.py:27-31)."""
        for label, images in visuals.items():
            self.writer.image_summary(label, images, step)

    def close(self) -> None:
        self.writer.close()
