#!/usr/bin/env python
"""Generate synthetic images from a trained DCGAN generator — sharded
TPU inference (CLI-compatible with reference src/generate_synthetic.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from xgan import config  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser(
        description="Generate synthetic images using a trained DCGAN "
                    "generator (sharded TPU inference).")
    p.add_argument("--model-path", type=str, required=True,
                   help="Trained generator checkpoint "
                        "(e.g. models/gan/generator_final.msgpack, a "
                        "reference .pth, or a .stablehlo artifact)")
    p.add_argument("--output-dir", type=str, default="./data/synthetic")
    p.add_argument("--num-images", type=int, default=5000)
    p.add_argument("--latent-dim", type=int, default=100)
    p.add_argument("--feature-maps-g", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    config.add_compute_dtype_arg(p)
    return p


def main():
    args = build_parser().parse_args()
    config.apply_device_flag(args)
    dtype = config.resolve_dtype(args.compute_dtype)
    import jax.numpy as jnp
    from xgan.models import dcgan
    from xgan.train.sample import (generate_images, load_generator,
                                   load_generator_artifact,
                                   make_artifact_sampler)

    if args.model_path.endswith(".stablehlo"):
        art, latent, _meta = load_generator_artifact(args.model_path,
                                                     conditional=False)
        generate_images(None, {}, output_dir=args.output_dir,
                        num_images=args.num_images, latent_dim=latent,
                        batch_size=args.batch_size, seed=args.seed,
                        sample_override=make_artifact_sampler(
                            art, latent, conditional=False))
        return
    model = dcgan.Generator(latent_dim=args.latent_dim,
                            feature_maps=args.feature_maps_g,
                            image_size=args.image_size,
                            dtype=dtype)
    variables = load_generator(model, args.model_path,
                               (jnp.zeros((2, args.latent_dim)),),
                               torch_kind="dcgan")
    generate_images(model, variables, output_dir=args.output_dir,
                    num_images=args.num_images, latent_dim=args.latent_dim,
                    batch_size=args.batch_size, seed=args.seed)


if __name__ == "__main__":
    main()
