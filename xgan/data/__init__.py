from xgan.data.rsna import (check_dataset_availability, load_test_metadata,
                            load_train_metadata)
from xgan.data.store import ImageStore, decode_folder_store

__all__ = [
    "check_dataset_availability",
    "load_train_metadata",
    "load_test_metadata",
    "ImageStore",
    "decode_folder_store",
]
