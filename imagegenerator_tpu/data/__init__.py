"""Host-side data pipeline: storage adapters, COCO caption dataset,
tokenizers, and a prefetching device loader."""

from imagegenerator_tpu.data.storage import (
    BlobStore,
    LocalStore,
    MemoryStore,
    open_store,
)
from imagegenerator_tpu.data.coco import CocoCaptions, build_manifest
from imagegenerator_tpu.data.tokenizer import HashTokenizer, HFTokenizer
from imagegenerator_tpu.data.pipeline import DataLoader

__all__ = [
    "BlobStore",
    "LocalStore",
    "MemoryStore",
    "open_store",
    "CocoCaptions",
    "build_manifest",
    "HashTokenizer",
    "HFTokenizer",
    "DataLoader",
]
