"""RSNA pneumonia metadata handling (pure host-side, numpy/pandas).

Label semantics are the exact contract of the reference data layer
(reference src/data_loader.py:91,:93):

- train:  label = 1 iff ``class == 'Lung Opacity'``
- test:   label = 1 iff ``PredictionString.strip() != '0.5 0 0 100 100'``

Directory layout checked (reference data_loader.py:119-156):
  <data_dir>/stage2_train_metadata.csv
  <data_dir>/stage2_test_metadata.csv
  <data_dir>/Training/Images/*.png
  <data_dir>/Test/*.png
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import pandas as pd

NEGATIVE_PREDICTION = "0.5 0 0 100 100"
POSITIVE_CLASS = "Lung Opacity"


def load_train_metadata(csv_path: str) -> Tuple[List[str], np.ndarray]:
    df = pd.read_csv(csv_path)
    ids = df["patientId"].astype(str).tolist()
    labels = (df["class"] == POSITIVE_CLASS).to_numpy().astype(np.int32)
    return ids, labels


def load_test_metadata(csv_path: str) -> Tuple[List[str], np.ndarray]:
    df = pd.read_csv(csv_path)
    ids = df["patientId"].astype(str).tolist()
    labels = (df["PredictionString"].astype(str).str.strip()
              != NEGATIVE_PREDICTION).to_numpy().astype(np.int32)
    return ids, labels


def check_dataset_availability(data_dir: str, verbose: bool = True) -> bool:
    required = [
        os.path.join(data_dir, "stage2_train_metadata.csv"),
        os.path.join(data_dir, "stage2_test_metadata.csv"),
        os.path.join(data_dir, "Training", "Images"),
        os.path.join(data_dir, "Test"),
    ]
    if not all(os.path.exists(p) for p in required):
        if verbose:
            print(f"Dataset not found in {data_dir} with expected structure.")
            print("Required: stage2_train_metadata.csv, "
                  "stage2_test_metadata.csv, Training/Images/, Test/")
            print("Run `python src/download_dataset.py` first if needed.")
        return False
    train_pngs = [f for f in os.listdir(required[2]) if f.endswith(".png")]
    test_pngs = [f for f in os.listdir(required[3]) if f.endswith(".png")]
    if not train_pngs or not test_pngs:
        if verbose:
            print("No images found in Training/Images/ or Test/.")
        return False
    if verbose:
        print(f"Dataset found: {len(train_pngs)} training images, "
              f"{len(test_pngs)} test images.")
    return True


def train_paths(data_dir: str, ids: List[str]) -> List[str]:
    base = os.path.join(data_dir, "Training", "Images")
    return [os.path.join(base, f"{pid}.png") for pid in ids]


def test_paths(data_dir: str, ids: List[str]) -> List[str]:
    base = os.path.join(data_dir, "Test")
    return [os.path.join(base, f"{pid}.png") for pid in ids]
