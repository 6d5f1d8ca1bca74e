"""COCO caption↔image dataset.

Capability match for the reference's ``TexttoImgCOCO``
(``/root/reference/data_loader.py:16-61``): build a caption↔file_name
manifest from the COCO ``captions_*.json`` annotation file, then serve
(caption, decoded+resized image) samples.

Differences by design (SURVEY.md §3.4):
* the annotation JSON is fetched ONCE through a shared ``BlobStore``;
* image bytes are fetched through the same shared store (one client),
  decoded with PIL, resized, normalized to [-1, 1] — the reference's
  ``ToTensor + Resize + Normalize(0.5, 0.5)`` transform
  (``/root/reference/train.py:40-54``) without per-item client churn;
* per-host sharding is an explicit (host_index, host_count) slice,
  the ``DistributedSampler`` role.
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass

import numpy as np

from imagegenerator_tpu.data.storage import BlobStore


@dataclass(frozen=True)
class ManifestEntry:
    caption: str
    file_name: str


def build_manifest(store: BlobStore, ann_file: str) -> list[ManifestEntry]:
    """annotation JSON -> [(caption, file_name)] via an image_id join."""
    anns = json.loads(store.read_text(ann_file))
    id_to_file = {img["id"]: img["file_name"] for img in anns["images"]}
    out = []
    for ann in anns["annotations"]:
        fname = id_to_file.get(ann["image_id"])
        if fname is not None:
            out.append(ManifestEntry(caption=ann["caption"], file_name=fname))
    return out


def decode_resize_normalize(data: bytes, size: int) -> np.ndarray:
    """JPEG/PNG bytes -> float32 NHWC image in [-1, 1] at (size, size).

    Matches PIL ToTensor -> Resize(size, BILINEAR) -> Normalize(0.5,
    0.5). The native kernel (native/host_ops.cpp) implements the SAME
    antialiased triangle resample as PIL's BILINEAR — round 1's native
    path was a plain 2-tap lookup that aliased badly on COCO's ~640px ->
    64px downscale (ADVICE.md) — so native and PIL paths now agree to
    ~1/255 per pixel. For JPEGs the whole decode+resample chain runs in
    C++ (GIL-free). DCT-domain scaled decode (decode directly at the
    nearest 1/2..1/8 scale, then resample) is ON by default — measured
    2.07x faster at 640px->256px with photographic-content parity of
    <1 gray level mean / <=3.3 p99 vs the full decode (round-3 A/B; only
    synthetic per-pixel noise shows larger deltas). Set
    IMAGEGEN_FAST_DCT=0 to force the full-resolution decode.
    """
    from imagegenerator_tpu.data import native

    if data[:2] == b"\xff\xd8" and native.available():
        out = native.decode_jpeg_resize_normalize(
            data, size, fast_dct=os.environ.get("IMAGEGEN_FAST_DCT", "1") != "0"
        )
        if out is not None:
            return out

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    if native.available():
        return native.resize_normalize(np.asarray(img, np.uint8), size)

    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def decode_resize_u8(data: bytes, size: int) -> np.ndarray:
    """JPEG/PNG bytes -> uint8 NHWC image at (size, size), resampled but
    NOT normalized — the device-normalize transfer path: the train step
    maps uint8 to [-1, 1] on-device (stage1/stage2 ``train_step``), so
    each image crosses the host->device link at 1/4 the f32 bytes.

    Deliberate divergence, like the antialias policy (SURVEY.md §3.4):
    the reference applies ``ToTensor()`` BEFORE ``Resize``
    (``/root/reference/train.py:40-54``), i.e. resamples float tensors
    and never re-quantizes, so this path's <=0.5/255 per-pixel
    quantization after the resample has no reference counterpart — it
    is the standard TPU input-pipeline trade (bytes over the link,
    normalize on device). ``image_dtype='float32'`` keeps the
    quantization-free path."""
    from imagegenerator_tpu.data import native

    if data[:2] == b"\xff\xd8" and native.available():
        out = native.decode_jpeg_resize_u8(
            data, size, fast_dct=os.environ.get("IMAGEGEN_FAST_DCT", "1") != "0"
        )
        if out is not None:
            return out

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    if native.available():
        out = native.resize_u8(np.asarray(img, np.uint8), size)
        if out is not None:
            return out

    return np.asarray(img.resize((size, size), Image.BILINEAR), np.uint8)


class CocoCaptions:
    """Random-access (caption, image) dataset with host sharding."""

    def __init__(
        self,
        store: BlobStore,
        root: str,
        ann_file: str,
        image_size: int = 64,
        host_index: int = 0,
        host_count: int = 1,
        image_dtype: str = "uint8",
    ):
        if image_dtype not in ("uint8", "float32"):
            raise ValueError(f"image_dtype must be uint8|float32, got {image_dtype}")
        self.store = store
        self.root = root.rstrip("/")
        self.image_size = image_size
        # uint8 (default): resampled bytes, normalized ON-DEVICE by the
        # train step — 4x fewer H2D bytes and less host work, at the
        # cost of <=0.5/255 post-resample quantization the reference
        # (float-tensor Resize) doesn't apply — see decode_resize_u8.
        # float32: host-side normalize, quantization-free (the
        # pre-round-4 behavior).
        self.image_dtype = image_dtype
        full = build_manifest(store, ann_file)
        # contiguous per-host shard (drop the ragged tail so every host
        # sees the same number of samples — the DistributedSampler+
        # drop_last contract, reference data_loader.py:90-106)
        per_host = len(full) // host_count
        self.entries = full[host_index * per_host : (host_index + 1) * per_host]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, index: int) -> tuple[str, np.ndarray]:
        e = self.entries[index]
        data = self.store.read_bytes(f"{self.root}/{e.file_name}")
        if self.image_dtype == "uint8":
            return e.caption, decode_resize_u8(data, self.image_size)
        return e.caption, decode_resize_normalize(data, self.image_size)
