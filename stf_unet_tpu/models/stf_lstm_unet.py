"""STF-LSTM-UNet (ref:src/stf_lstm_unet.py:89-256), redesigned TPU-first.

Topology parity with the reference:
  * ResNet-34 encoder applied per time step (fresh conv1 sized for the
    actual input channels, no pretrained weights; ref:102-114).
  * Per-pixel LSTM temporal fusion at each of the 4 scales, last-step
    output feeds the decoder (ref:124-127, 214-242).
  * Decoder: 3x DecoderBlock, ConvT k3 s2 + ResidualConvBlock + 1x1 head
    (ref:130-137, 245-254).
  * Optional PK maps carried as 3 extra pseudo-time-steps, split off in
    forward, concatenated to every frame and re-fused at all 4 scales via
    1x1 convs after align_corners bilinear resize (ref:117-121, 146-200).

TPU-native divergences (deliberate, documented):
  * The encoder runs ONCE over the folded [B*T, H, W, C] batch instead of a
    Python loop over T (ref:168-206) — identical math for convs and eval-mode
    BN; train-mode BN statistics are computed over B*T instead of per-t
    (SURVEY.md §7 "BatchNorm semantics"), which is the better-conditioned
    choice and the only one that vectorizes.
  * The temporal LSTM is a `lax.scan` over fused [B*H*W, C] gate matmuls
    (ops/lstm.py) instead of cuDNN nn.LSTM on [B*H*W, T, C].
  * The reference decoder stops at 1/2 resolution (upconv1 from 1/4 to 1/2,
    ref:250-254), which cannot train against full-res targets — a reference
    bug. We bilinearly upsample the logits to the input resolution
    (align_corners=True) as the final step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stf_unet_tpu.models.blocks import ConvTranspose, DecoderBlock, ResidualConvBlock
from stf_unet_tpu.models.resnet import ResNet34Encoder
from stf_unet_tpu.ops.lstm import pixel_lstm
from stf_unet_tpu.ops.resize import resize_bilinear_align_corners

_SCALE_WIDTHS = (64, 128, 256, 512)


class PixelLSTM(nn.Module):
    """Linen wrapper owning torch-compatible LSTM parameters for one scale.

    torch nn.LSTM init: uniform(-k, k) with k = 1/sqrt(hidden)
    (ref:src/stf_lstm_unet.py:124-127). b_ih and b_hh are kept separate for
    weight-import parity; they fold into one bias at apply time.

    lstm_backend: 'auto' routes to the fused Pallas kernel on TPU
    (ops/pallas/lstm_kernel.py) and lax.scan elsewhere.
    """

    features: int
    lstm_backend: str = "auto"

    @nn.compact
    def __call__(self, feat_seq: jax.Array, *, train: bool = True) -> jax.Array:
        c = self.features
        bound = 1.0 / c ** 0.5
        init = nn.initializers.uniform(scale=2 * bound)

        def centered(key, shape, dtype):
            return init(key, shape, dtype) - bound

        w_ih = self.param("w_ih", centered, (c, 4 * c), jnp.float32)
        w_hh = self.param("w_hh", centered, (c, 4 * c), jnp.float32)
        b_ih = self.param("b_ih", centered, (4 * c,), jnp.float32)
        b_hh = self.param("b_hh", centered, (4 * c,), jnp.float32)
        dt = feat_seq.dtype
        return pixel_lstm(feat_seq, w_ih.astype(dt), w_hh.astype(dt),
                          (b_ih + b_hh).astype(dt), backend=self.lstm_backend,
                          train=train)


class STFLSTMUNet(nn.Module):
    input_format = "time_sequence"

    num_classes: int = 2
    time_steps: int = 8
    use_pk_maps: bool = False
    pk_channels: int = 3
    dtype: Any = None
    lstm_backend: str = "auto"
    # Rematerialize the encoder in the backward pass: at B*T folded batch
    # the ResNet activations dominate HBM; remat trades ~1 extra forward
    # for O(scales) activation memory (SURVEY §2.9 / jax.checkpoint).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        """x: [B, T(+pk_channels), H, W, C] NHWC frames (C=1 for DCE-MRI)."""
        bsz, total_steps, height, width, chans = x.shape

        pk_maps: Optional[jax.Array] = None
        if self.use_pk_maps:
            t_steps = total_steps - self.pk_channels
            time_series = x[:, :t_steps]
            # [B, pk, H, W, C=1] -> [B, H, W, pk] (ref:146-156 squeeze)
            pk_maps = x[:, t_steps:, :, :, 0].transpose(0, 2, 3, 1)
            x = time_series
        else:
            t_steps = total_steps

        if pk_maps is not None:
            # Concat PK channels to every frame's input (ref:172-174).
            pk_tiled = jnp.broadcast_to(
                pk_maps[:, None], (bsz, t_steps) + pk_maps.shape[1:])
            x = jnp.concatenate([x, pk_tiled], axis=-1)

        # Fold time into batch; ONE encoder pass for all frames.
        folded = x.reshape(bsz * t_steps, height, width, x.shape[-1])
        encoder = ResNet34Encoder(dtype=self.dtype, name="encoder")
        if self.remat:
            e1, e2, e3, e4 = nn.remat(
                lambda mdl, xx: mdl(xx, train=train))(encoder, folded)
        else:
            e1, e2, e3, e4 = encoder(folded, train=train)

        if pk_maps is not None:
            # Re-fuse PK maps at all 4 scales (ref:117-121, 189-200): resize
            # (align_corners bilinear), concat, 1x1 conv. Same weights for all
            # t, so the folded form is exactly the reference per-t loop.
            def fuse(feat, name):
                h, w = feat.shape[1], feat.shape[2]
                pk_r = resize_bilinear_align_corners(pk_maps, h, w)
                pk_r = jnp.broadcast_to(
                    pk_r[:, None], (bsz, t_steps, h, w, pk_r.shape[-1])
                ).reshape(bsz * t_steps, h, w, pk_r.shape[-1])
                cat = jnp.concatenate([feat, pk_r], axis=-1)
                return nn.Conv(feat.shape[-1], (1, 1), dtype=self.dtype,
                               name=name)(cat)

            e1 = fuse(e1, "pk_fusion1")
            e2 = fuse(e2, "pk_fusion2")
            e3 = fuse(e3, "pk_fusion3")
            e4 = fuse(e4, "pk_fusion4")

        # Temporal fusion per scale: [B*T, h, w, c] -> [B, T, h, w, c] -> LSTM.
        def unfold(feat):
            return feat.reshape(bsz, t_steps, *feat.shape[1:])

        f1 = PixelLSTM(_SCALE_WIDTHS[0], self.lstm_backend, name="lstm1")(
            unfold(e1), train=train)
        f2 = PixelLSTM(_SCALE_WIDTHS[1], self.lstm_backend, name="lstm2")(
            unfold(e2), train=train)
        f3 = PixelLSTM(_SCALE_WIDTHS[2], self.lstm_backend, name="lstm3")(
            unfold(e3), train=train)
        f4 = PixelLSTM(_SCALE_WIDTHS[3], self.lstm_backend, name="lstm4")(
            unfold(e4), train=train)

        d4 = DecoderBlock(256, dtype=self.dtype, name="decoder4")(f4, f3, train=train)
        d3 = DecoderBlock(128, dtype=self.dtype, name="decoder3")(d4, f2, train=train)
        d2 = DecoderBlock(64, dtype=self.dtype, name="decoder2")(d3, f1, train=train)

        d1 = ConvTranspose(32, kernel=3, stride=2, padding=1, output_padding=1,
                           dtype=self.dtype, name="upconv1")(d2)
        d1 = ResidualConvBlock(32, dtype=self.dtype, name="final_res")(d1, train=train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="final")(d1)

        # Divergence fix: reference stops at 1/2 resolution (ref:250-254).
        if out.shape[1:3] != (height, width):
            out = resize_bilinear_align_corners(out, height, width)
        return {"out": out.astype(jnp.float32)}
