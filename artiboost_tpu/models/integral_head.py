"""Integral (soft-argmax) deconvolution pose head.

Parity: ``anakin/models/simplebaseline.py:16-190`` — deconv upsampling
stack, 1x1 conv to NCLASSES*DEPTH channels, global softmax over the 3D
heatmap, integral regression to normalized uvd (arXiv:1711.08229), and
per-class confidence = heatmap max.

TPU notes: heatmaps stay NHWC until the final reshape; the softmax +
integral reduce to three weighted sums which XLA fuses into the conv
epilogue.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.utils.misc import resolve_dtype
from artiboost_tpu.utils.registry import HEAD


def norm_heatmap(norm_type: str, heatmap: jnp.ndarray) -> jnp.ndarray:
    """heatmap: (B, C, L) flattened; normalize over L."""
    if norm_type == "softmax":
        return nn.softmax(heatmap, axis=2)
    elif norm_type == "sigmoid":
        return nn.sigmoid(heatmap)
    elif norm_type == "divide_sum":
        return heatmap / jnp.sum(heatmap, axis=2, keepdims=True)
    raise NotImplementedError(norm_type)


def integral_heatmap3d(hm: jnp.ndarray) -> jnp.ndarray:
    """(B, C, D, H, W) normalized 3D heatmap -> (B, C, 3) uvd in [0, 1]."""
    d_accu = jnp.sum(hm, axis=(3, 4))
    v_accu = jnp.sum(hm, axis=(2, 4))
    u_accu = jnp.sum(hm, axis=(2, 3))
    wd = jnp.arange(d_accu.shape[-1], dtype=hm.dtype) / d_accu.shape[-1]
    wv = jnp.arange(v_accu.shape[-1], dtype=hm.dtype) / v_accu.shape[-1]
    wu = jnp.arange(u_accu.shape[-1], dtype=hm.dtype) / u_accu.shape[-1]
    d_ = jnp.sum(d_accu * wd, axis=-1, keepdims=True)
    v_ = jnp.sum(v_accu * wv, axis=-1, keepdims=True)
    u_ = jnp.sum(u_accu * wu, axis=-1, keepdims=True)
    return jnp.concatenate([u_, v_, d_], axis=-1)


class IntegralDeconvHead(nn.Module):
    nclasses: int = 22
    depth_res: int = 28
    heatmap_size: Tuple[int, int] = (28, 28)  # (W, H)
    norm_type: str = "softmax"
    deconv_filters: Sequence[int] = (256, 256)
    deconv_kernels: Sequence[int] = (4, 4)
    deconv_with_bias: bool = False
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """feature: (B, h, w, C) NHWC -> {"kp3d": (B, NC, 3), "kp3d_confd": (B, NC)}."""
        x = feature.astype(self.dtype)
        for filters, kernel in zip(self.deconv_filters, self.deconv_kernels):
            x = nn.ConvTranspose(
                filters, (kernel, kernel), strides=(2, 2), padding="SAME",
                use_bias=self.deconv_with_bias, dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)
        pad = "SAME" if self.final_conv_kernel == 3 else "VALID"
        x = nn.Conv(
            self.nclasses * self.depth_res,
            (self.final_conv_kernel, self.final_conv_kernel), padding=pad, dtype=self.dtype,
        )(x)
        B, H, W, _ = x.shape
        if self.norm_type == "softmax":
            # HBM-lean path: soft-argmax directly in NHWC layout (no
            # (B,NC*D,H,W) transpose, single exp materialization), using
            # max(softmax) == exp(0)/Z == 1/Z for the confidence.
            x5 = x.reshape(B, H, W, self.nclasses, self.depth_res).astype(jnp.float32)
            m = jnp.max(x5, axis=(1, 2, 4), keepdims=True)          # (B,1,1,NC,1)
            e = jnp.exp(x5 - m)
            z = jnp.sum(e, axis=(1, 2, 4))                          # (B, NC)
            confd = 1.0 / z
            wd = jnp.arange(self.depth_res, dtype=jnp.float32) / self.depth_res
            wv = jnp.arange(H, dtype=jnp.float32) / H
            wu = jnp.arange(W, dtype=jnp.float32) / W
            d_ = jnp.einsum("bhwcd,d->bc", e, wd) / z
            v_ = jnp.einsum("bhwcd,h->bc", e, wv) / z
            u_ = jnp.einsum("bhwcd,w->bc", e, wu) / z
            uvd = jnp.stack([u_, v_, d_], axis=-1)
            return {"kp3d": uvd, "kp3d_confd": confd}
        # generic path (sigmoid / divide_sum): reference layout
        x = x.transpose(0, 3, 1, 2).reshape(B, self.nclasses, self.depth_res, H, W)
        flat = x.reshape(B, self.nclasses, -1).astype(jnp.float32)
        flat = norm_heatmap(self.norm_type, flat)
        confd = jnp.max(flat, axis=-1)
        flat = flat / (jnp.sum(flat, axis=-1, keepdims=True) + 1e-7)
        hm3d = flat.reshape(B, self.nclasses, self.depth_res, self.heatmap_size[1], self.heatmap_size[0])
        uvd = integral_heatmap3d(hm3d)
        return {"kp3d": uvd, "kp3d_confd": confd}


@HEAD.register_module(name="IntegralDeconvHead")
def build_integral_deconv_head(**cfg):
    return IntegralDeconvHead(
        nclasses=cfg.get("NCLASSES", 22),
        depth_res=cfg.get("DEPTH_RESOLUTION", 28),
        heatmap_size=tuple(cfg.get("HEATMAP_SIZE", (28, 28))),
        norm_type=cfg.get("NORM_TYPE", "softmax"),
        deconv_filters=tuple(cfg.get("NUM_DECONV_FILTERS", (256, 256))),
        deconv_kernels=tuple(cfg.get("NUM_DECONV_KERNELS", (4, 4))),
        deconv_with_bias=cfg.get("DECONV_WITH_BIAS", False),
        final_conv_kernel=cfg.get("FINAL_CONV_KERNEL", 1),
        dtype=resolve_dtype(cfg.get("DTYPE")),
    )
