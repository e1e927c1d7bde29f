#!/usr/bin/env python
"""Download the RSNA pneumonia processed dataset from Kaggle.

CLI-compatible with the reference script of the same name
(reference src/download_dataset.py:50-77). The kaggle package is an
optional dependency — when it (or an API token) is absent, this prints
actionable instructions instead of crashing. After download, the on-disk
layout is validated against the structure the data layer expects.
"""
import argparse
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DATASET = "iamtapendu/rsna-pneumonia-processed-dataset"


def download_kaggle_dataset(dataset_name: str, output_dir: str,
                            unzip: bool = True) -> None:
    os.makedirs(output_dir, exist_ok=True)
    try:
        import kaggle
    except ImportError:
        print("The `kaggle` package is not installed in this environment.")
        print("Either install it (pip install kaggle) and set up "
              "~/.kaggle/kaggle.json, or download the dataset manually:")
        print(f"  https://www.kaggle.com/datasets/{DEFAULT_DATASET}")
        print(f"and extract it into {output_dir} with the layout:")
        print("  stage2_train_metadata.csv, stage2_test_metadata.csv,")
        print("  Training/Images/*.png, Test/*.png")
        raise SystemExit(1)

    print(f"Downloading dataset '{dataset_name}' to {output_dir}...")
    kaggle.api.authenticate()
    kaggle.api.dataset_download_files(dataset_name, path=output_dir,
                                      unzip=unzip)
    print(f"Dataset downloaded to {output_dir}")
    if not unzip:
        for f in os.listdir(output_dir):
            if f.endswith(".zip"):
                path = os.path.join(output_dir, f)
                print(f"Unzipping {path}...")
                with zipfile.ZipFile(path) as z:
                    z.extractall(output_dir)


def main():
    parser = argparse.ArgumentParser(
        description="Download RSNA Pneumonia processed dataset from Kaggle")
    parser.add_argument("--dataset", type=str, default=DEFAULT_DATASET)
    parser.add_argument("--data-dir", type=str, default="./data/processed")
    args = parser.parse_args()

    data_dir = os.path.abspath(args.data_dir)
    try:
        download_kaggle_dataset(args.dataset, data_dir)
    except SystemExit:
        raise
    except Exception as e:
        print(f"Script failed due to error: {e}")
        print("Please ensure your Kaggle API token is set up in "
              "~/.kaggle/kaggle.json")
        return

    from xgan.data import check_dataset_availability
    if check_dataset_availability(data_dir):
        print("\nDataset download completed and structure validated.")
    else:
        print("\nDownload finished but the expected structure was not "
              "found; check the extracted contents.")


if __name__ == "__main__":
    main()
