#!/usr/bin/env python
"""Data-layer self-test CLI (role of reference src/data_loader.py:754-811).

Validates the on-disk dataset structure and exercises each batch-source
mode: basic (real), kfold, augmented (concat), phased_kfold (curriculum
mixer), printing batch shapes and label distributions like the reference's
--test-mode runs. This is the documented dataset-structure validator.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Test the TPU-native data pipeline on an RSNA-layout "
                    "dataset")
    p.add_argument("--data-dir", type=str, default="./data/processed")
    p.add_argument("--synthetic-dir", type=str, default="./data/synthetic")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--k-folds", type=int, default=3)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--cache-dir", type=str, default="./data/cache")
    p.add_argument("--test-mode", type=str,
                   choices=["basic", "kfold", "augmented",
                            "kfold_augmented", "phased_kfold"],
                   default="basic")
    p.add_argument("--cpu", action="store_true")
    return p


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)

    import jax.numpy as jnp
    import numpy as np

    from xgan.data import check_dataset_availability
    from xgan.data.pipeline import normalize_images
    from xgan.train.gan_loop import load_train_store

    print("\n--- Checking dataset availability ---")
    if not check_dataset_availability(args.data_dir):
        print("Please download the dataset first using "
              "src/download_dataset.py.")
        return

    store = load_train_store(args.data_dir, args.image_size, args.cache_dir)
    images = jnp.asarray(np.ascontiguousarray(store.images))
    labels = jnp.asarray(store.labels)
    rng = np.random.default_rng(0)

    def show_batch(name, imgs_u8, labs):
        normed = normalize_images(imgs_u8)
        counts = np.bincount(np.asarray(labs), minlength=2)
        print(f"{name}: images {tuple(normed.shape)} {normed.dtype}, "
              f"labels {np.asarray(labs).tolist()}, "
              f"label distribution {counts.tolist()}")

    # Error envelope parity: the reference self-test wraps each exercised
    # loader in try/except, prints the error + traceback and finishes
    # cleanly instead of crashing (reference data_loader.py:775-810 —
    # whose --test-mode flag is declared but never consumed; ours
    # actually dispatches all five modes).
    mode = args.test_mode
    try:
        run_mode(args, mode, store, images, labels, rng, show_batch)
    except Exception as e:  # noqa: BLE001 — reference self-test contract
        import traceback
        print(f"Error using {mode}: {e}")
        traceback.print_exc()

    print("\nData pipeline self-test finished.")


def run_mode(args, mode, store, images, labels, rng, show_batch):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sklearn.model_selection import KFold

    from xgan.data.mixer import mix_batch
    from xgan.data.pipeline import epoch_batches
    from xgan.data.store import decode_folder_store
    from xgan.train.classifier import gather_concat
    from xgan.train.classifier_loop import KFOLD_SEED

    if mode in ("basic", "kfold"):
        if mode == "basic":
            batch = epoch_batches(len(store), args.batch_size, rng)[0]
            show_batch("basic train batch",
                       jnp.take(images, jnp.asarray(batch), axis=0),
                       jnp.take(labels, jnp.asarray(batch), axis=0))
        else:
            kf = KFold(n_splits=args.k_folds, shuffle=True,
                       random_state=KFOLD_SEED)
            for fold, (tr, va) in enumerate(kf.split(range(len(store)))):
                print(f"Fold {fold + 1}/{args.k_folds}: train {len(tr)}, "
                      f"val {len(va)}")
            batch = epoch_batches(len(tr), args.batch_size, rng,
                                  indices=tr)[0]
            show_batch("fold train batch",
                       jnp.take(images, jnp.asarray(batch), axis=0),
                       jnp.take(labels, jnp.asarray(batch), axis=0))
    else:
        synth = decode_folder_store(args.synthetic_dir, args.image_size,
                                    cache_dir=args.cache_dir)
        s_images = jnp.asarray(np.ascontiguousarray(synth.images))
        s_labels = jnp.asarray(synth.labels)
        if mode in ("augmented", "kfold_augmented"):
            if mode == "kfold_augmented":
                kf = KFold(n_splits=args.k_folds, shuffle=True,
                           random_state=KFOLD_SEED)
                for fold, (tr, va) in enumerate(
                        kf.split(range(len(store)))):
                    print(f"Fold {fold + 1} - Train size: "
                          f"{len(tr) + len(synth)} (Original: {len(tr)}, "
                          f"Synthetic: {len(synth)}), Val size: {len(va)}")
                space = np.concatenate([tr, len(store)
                                        + np.arange(len(synth))])
            else:
                space = np.concatenate([np.arange(len(store)),
                                        len(store) + np.arange(len(synth))])
            batch = epoch_batches(len(space), args.batch_size, rng,
                                  indices=space)[0]
            imgs, labs = gather_concat(images, labels, s_images, s_labels,
                                       jnp.asarray(batch))
            show_batch(f"{mode} batch (concat space "
                       f"{len(space) - len(synth)}+{len(synth)})",
                       imgs, labs)
        else:  # phased_kfold
            for ratio in (0.0, 0.5, 1.0):
                batch = epoch_batches(len(store), args.batch_size, rng)[0]
                imgs, labs = mix_batch(images, labels, jnp.asarray(batch),
                                       s_images, s_labels,
                                       jnp.float32(ratio),
                                       jax.random.key(0))
                show_batch(f"phased batch ratio={ratio}", imgs, labs)


if __name__ == "__main__":
    main()
