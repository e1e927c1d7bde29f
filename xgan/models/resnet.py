"""ResNet-50 (flax.linen), torchvision-v1.5-compatible, NHWC.

Replaces the reference classifier factory (reference src/classifier.py:5-33):
``models.resnet50(IMAGENET1K_V1)`` with the final fc swapped for
``Linear(2048, num_classes)``. Our module reproduces the torchvision graph
exactly (bottleneck expansion 4, stride on the 3x3 conv — "v1.5") so that
torchvision ImageNet checkpoints can be imported 1:1 via
:func:`xgan.models.pretrained.load_torch_resnet50`.

Freezing the base (reference classifier.py:19-21) is an optimizer-level
concern here (optax.multi_transform in xgan.train.classifier); BatchNorm
running statistics still update in train mode exactly as torch's do for a
frozen-but-train()-mode backbone.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from xgan.ops.conv import conv2d
from xgan.models.layers import Dense, TorchBatchNorm


def _he_fan_out(key, shape, dtype=jnp.float32):
    # torchvision: kaiming_normal_(mode="fan_out", nonlinearity="relu")
    import jax
    fan_out = shape[0] * shape[1] * shape[3]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dtype: Any = jnp.float32
    # Grad-CAM tap (reference analyze_results.py:466 hooks the raw
    # nn.Conv2d module `layer4[-1].conv3`, i.e. the PRE-BN conv output):
    # when set, the pre-BN activation is sow'n into "intermediates" and
    # routed through self.perturb so jax.grad w.r.t. the zero-valued
    # "perturbations" leaf yields d(score)/d(activation) — flax's
    # intermediate-gradient idiom, used by xgan.analysis._cam_program.
    # Adds no "params" leaves: checkpoints interop unchanged.
    tap: str = ""

    @nn.compact
    def __call__(self, x, *, train: bool, mask=None):
        w = self.param("kernel", _he_fan_out,
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        y = conv2d(x.astype(self.dtype), w.astype(self.dtype),
                   stride=self.stride, padding=self.padding,
                   preferred_dtype=jnp.float32).astype(self.dtype)
        if self.tap:
            y = self.perturb(self.tap, y)
            self.sow("intermediates", self.tap, y)
        y = TorchBatchNorm(scale_init=nn.initializers.ones, name="bn")(
            y, train=train, mask=mask)
        return y


class Bottleneck(nn.Module):
    width: int        # the "planes" value; output channels = 4 * width
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    cam_tap: bool = False  # tap conv3's pre-BN output (see _ConvBN.tap)

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        # train/mask are positional-or-keyword (not kw-only) so that
        # nn.remat(Bottleneck, static_argnums=(2,)) can mark ``train``
        # static — jax.checkpoint's static_argnums only sees positional
        # args, and a traced ``train`` would break BN's Python branch.
        identity = x
        out = nn.relu(_ConvBN(self.width, 1, dtype=self.dtype,
                              name="conv1")(x, train=train, mask=mask))
        out = nn.relu(_ConvBN(self.width, 3, stride=self.stride, padding=1,
                              dtype=self.dtype, name="conv2")(
                                  out, train=train, mask=mask))
        out = _ConvBN(self.width * 4, 1, dtype=self.dtype,
                      tap="cam_conv3" if self.cam_tap else "",
                      name="conv3")(out, train=train, mask=mask)
        if self.downsample:
            identity = _ConvBN(self.width * 4, 1, stride=self.stride,
                               dtype=self.dtype, name="downsample")(
                                   x, train=train, mask=mask)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    num_classes: int = 2
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    # Activation rematerialization (--remat): each bottleneck block is
    # wrapped in jax.checkpoint via nn.remat, so the backward pass
    # recomputes block-internal activations instead of keeping them in
    # HBM across the whole forward. Numerics are identical (same ops,
    # pinned by tests/test_remat.py); the trade is ~1 extra forward of
    # FLOPs for peak-activation memory of one block instead of fifty —
    # the standard jax.checkpoint batch-headroom lever on TPU.
    remat: bool = False
    # remat_scope="stage" checkpoints each of the four STAGES instead of
    # each block. Block-level remat measured ZERO max-batch gain on TPU
    # at 224/448px and ResNet-101 depth (BENCH_DETAIL remat_*_ab): the
    # HBM ceiling is the ~16 BLOCK-BOUNDARY activations per image,
    # which per-block checkpointing keeps. Stage scope keeps only the 4
    # stage inputs (~3.7x fewer boundary bytes) and recomputes a stage
    # per backward segment — same ~1 extra forward of FLOPs, but the
    # live set actually shrinks. Param/variable trees are identical in
    # every mode (checkpoints interop freely).
    # "nested" composes both: stage-level checkpoint regions whose
    # recompute passes themselves checkpoint per block — backward peak
    # ≈ 4 stage inputs + one stage's block boundaries + one block's
    # internals, the minimum any remat partition of this graph reaches.
    remat_scope: str = "block"  # "block" | "stage" | "nested"
    # cam_tap: tap the LAST stage-4 block's conv3 pre-BN activation for
    # reference-exact Grad-CAM (analyze_results.py:466 targets
    # model.layer4[-1].conv3). Inference-time only; incompatible with
    # remat (the lifted stage fn doesn't thread the tap; CAM never
    # remats — it is a 1-image eval forward).
    cam_tap: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, return_features: bool = False,
                 mask=None):
        """x: (B, H, W, 3) -> logits (B, num_classes).

        ``return_features=True`` additionally returns the layer4 output
        (B, H/32, W/32, 2048) used by Grad-CAM (reference
        analyze_results.py:466 targets model.layer4[-1].conv3; we expose the
        post-activation stage output, the standard CAM target map).
        ``mask``: (B,) validity weights for tail-exact BN statistics.
        """
        x = nn.relu(_ConvBN(64, 7, stride=2, padding=3, dtype=self.dtype,
                            name="stem")(x, train=train, mask=mask))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        assert not (self.cam_tap and self.remat), \
            "cam_tap is an inference-path feature; build with remat=False"
        if self.remat and self.remat_scope in ("stage", "nested"):
            # One jax.checkpoint region per stage, via flax's lifted
            # function remat. The blocks are created INSIDE the lifted
            # function but named into self's scope, so the param tree
            # stays the flat ``layer{stage+1}_{b}`` layout every other
            # mode (and the torchvision importer) uses. static_argnums
            # count the module as arg 0; ``mask`` (3) stays dynamic.
            inner_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                         if self.remat_scope == "nested" else Bottleneck)

            def stage_fn(mdl, x, train, mask, stage, blocks, width):
                for b in range(blocks):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    x = inner_cls(width, stride=stride,
                                  downsample=(b == 0), dtype=mdl.dtype,
                                  name=f"layer{stage + 1}_{b}")(
                                      x, train, mask)
                return x

            stage_call = nn.remat(stage_fn, static_argnums=(2, 4, 5, 6))
            for stage, (blocks, width) in enumerate(
                    zip(self.stage_sizes, widths)):
                x = stage_call(self, x, train, mask, stage, blocks,
                               width)
        else:
            # static_argnums=(2,): ``train`` (self=0, x=1); ``mask``
            # stays dynamic (an array or None). Param/variable trees
            # are identical to the un-remat'd module, so checkpoints
            # interop freely.
            block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                         if self.remat else Bottleneck)
            for stage, (blocks, width) in enumerate(
                    zip(self.stage_sizes, widths)):
                for b in range(blocks):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    tap = (self.cam_tap and stage == 3
                           and b == blocks - 1)
                    x = block_cls(width, stride=stride,
                                  downsample=(b == 0), dtype=self.dtype,
                                  cam_tap=tap,
                                  name=f"layer{stage + 1}_{b}")(
                                      x, train, mask)
        features = x
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        if return_features:
            return logits, features
        return logits
