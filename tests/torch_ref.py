"""PyTorch mirror of Depth Pro, used as the parity ground truth in tests.

This reimplements the network with torch modules *named like the real
``depth_pro.pt`` checkpoint* (Apple ml-depth-pro conventions: nn.Sequential
containers with ReLU/Identity holes, e.g. ``head.0/1/2/4``,
``fov.encoder.0/1``, ``decoder.convs.1..4``, ``resnet1.residual.1/3`` --
exactly the indices the reference's KeyRemapper rewrites, mod.rs:185-210).

Its two jobs:
* ``state_dict()`` / ``torch.save`` produce realistic checkpoint fixtures
  for the converter tests;
* its forward pass is the numerical reference the JAX implementation must
  match (the accuracy target is parity with PyTorch Depth Pro).

Torch is a test-only dependency; the framework itself never imports it.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from matrix_eyes_tpu.config import ModelConfig


class LayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        return x * self.gamma


class Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, eps):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = Attention(dim, num_heads)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = Mlp(dim, dim * mlp_ratio)
        self.ls2 = LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, patch, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, patch, stride=patch)

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2)


class DinoViT(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, cfg.seq_len, cfg.embed_dim))
        self.blocks = nn.ModuleList(
            [Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.layer_norm_eps)
             for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.embed_dim, eps=cfg.layer_norm_eps)

    def forward_features(self, x, intermediate_blocks=()):
        B = x.shape[0]
        t = self.patch_embed(x)
        cls = self.cls_token.expand(B, -1, -1)
        t = torch.cat([cls, t], dim=1) + self.pos_embed
        inters = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in intermediate_blocks:
                inters.append(t)
        return self.norm(t), inters


def _project_upsample_block(dim_in, dim_out, n_up, dim_int=None):
    dim_int = dim_out if dim_int is None else dim_int
    layers = [nn.Conv2d(dim_in, dim_int, 1, bias=False)]
    for i in range(n_up):
        cin = dim_int if i == 0 else dim_out
        layers.append(nn.ConvTranspose2d(cin, dim_out, 2, stride=2, bias=False))
    return nn.Sequential(*layers)


class DepthProEncoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        D = cfg.embed_dim
        ef = cfg.encoder_feature_dims
        dec = cfg.decoder_features
        self.patch_encoder = DinoViT(cfg)
        self.image_encoder = DinoViT(cfg)
        self.upsample_latent0 = _project_upsample_block(D, dec, 3, dim_int=ef[0])
        self.upsample_latent1 = _project_upsample_block(D, ef[0], 2)
        self.upsample0 = _project_upsample_block(D, ef[1], 1)
        self.upsample1 = _project_upsample_block(D, ef[2], 1)
        self.upsample2 = _project_upsample_block(D, ef[3], 1)
        self.upsample_lowres = nn.ConvTranspose2d(D, ef[3], 2, stride=2, bias=True)
        self.fuse_lowres = nn.Conv2d(2 * ef[3], ef[3], 1, bias=True)

    @staticmethod
    def _split(x, patch, overlap_div):
        stride = patch - patch // overlap_div
        size = x.shape[-1]
        tiles = []
        for j in range(0, size - patch + 1, stride):
            for i in range(0, size - patch + 1, stride):
                tiles.append(x[:, :, j:j + patch, i:i + patch])
        return torch.cat(tiles, dim=0)

    @staticmethod
    def _merge(x, batch_size, padding):
        b, c, h, w = x.shape
        steps = int(math.isqrt(b // batch_size))
        rows = []
        for j in range(steps):
            row = []
            for i in range(steps):
                idx = j * steps + i
                tile = x[batch_size * idx: batch_size * (idx + 1)]
                h0 = padding if j > 0 else 0
                h1 = h - padding if j < steps - 1 else h
                w0 = padding if i > 0 else 0
                w1 = w - padding if i < steps - 1 else w
                row.append(tile[:, :, h0:h1, w0:w1])
            rows.append(torch.cat(row, dim=3))
        return torch.cat(rows, dim=2)

    def _reshape_feature(self, t):
        b, n, c = t.shape
        s = self.cfg.tokens_per_side
        return t[:, 1:, :].reshape(b, s, s, c).permute(0, 3, 1, 2)

    def forward(self, x):
        cfg = self.cfg
        P = cfg.vit_img_size
        s = cfg.tokens_per_side
        pad_hi, pad_lo = s // 8, s // 4
        B = x.shape[0]

        x0 = x
        x1 = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False)
        x2 = F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)

        p0 = self._split(x0, P, 4)
        p1 = self._split(x1, P, 2)
        n0, n1 = p0.shape[0], p1.shape[0]
        pyramid = torch.cat([p0, p1, x2], dim=0)

        enc, (hi0, hi1) = self.patch_encoder.forward_features(
            pyramid, cfg.highres_block_ids)
        enc = self._reshape_feature(enc)
        latent0 = self._merge(self._reshape_feature(hi0)[: B * 25], B, pad_hi)
        latent1 = self._merge(self._reshape_feature(hi1)[: B * 25], B, pad_hi)

        x0_enc, x1_enc, x2_enc = enc[:n0], enc[n0:n0 + n1], enc[n0 + n1:]
        x0_feat = self._merge(x0_enc, B, pad_hi)
        x1_feat = self._merge(x1_enc, B, pad_lo)

        g, _ = self.image_encoder.forward_features(x2)
        g = self._reshape_feature(g)

        latent0 = self.upsample_latent0(latent0)
        latent1 = self.upsample_latent1(latent1)
        x0_feat = self.upsample0(x0_feat)
        x1_feat = self.upsample1(x1_feat)
        x2_feat = self.upsample2(x2_enc)

        g = self.upsample_lowres(g)
        g = self.fuse_lowres(torch.cat([x2_feat, g], dim=1))
        return [latent0, latent1, x0_feat, x1_feat, g]


class ResidualBlock(nn.Module):
    def __init__(self, residual):
        super().__init__()
        self.residual = residual

    def forward(self, x):
        return x + self.residual(x)


def _residual_block(c):
    return ResidualBlock(nn.Sequential(
        nn.ReLU(False), nn.Conv2d(c, c, 3, padding=1, bias=True),
        nn.ReLU(False), nn.Conv2d(c, c, 3, padding=1, bias=True)))


class FeatureFusionBlock(nn.Module):
    def __init__(self, c, deconv):
        super().__init__()
        self.resnet1 = _residual_block(c)
        self.resnet2 = _residual_block(c)
        if deconv:
            self.deconv = nn.ConvTranspose2d(c, c, 2, stride=2, bias=False)
        else:
            self.deconv = None
        self.out_conv = nn.Conv2d(c, c, 1, bias=True)

    def forward(self, x0, x1=None):
        out = x0 if x1 is None else x0 + self.resnet1(x1)
        out = self.resnet2(out)
        if self.deconv is not None:
            out = self.deconv(out)
        return self.out_conv(out)


class MultiresConvDecoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dec = cfg.decoder_features
        dims = (dec,) + tuple(cfg.encoder_feature_dims)
        conv0 = (nn.Conv2d(dims[0], dec, 1, bias=False) if dims[0] != dec
                 else nn.Identity())
        convs = [conv0] + [nn.Conv2d(d, dec, 3, padding=1, bias=False) for d in dims[1:]]
        self.convs = nn.ModuleList(convs)
        self.fusions = nn.ModuleList(
            [FeatureFusionBlock(dec, i != 0) for i in range(len(dims))])

    def forward(self, encodings):
        features = self.convs[-1](encodings[-1])
        lowres = features
        features = self.fusions[-1](features)
        for i in range(len(encodings) - 2, -1, -1):
            features_i = self.convs[i](encodings[i])
            features = self.fusions[i](features, features_i)
        return features, lowres


class FOVNetwork(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dec = cfg.decoder_features
        k = cfg.tokens_per_side // 4
        self.encoder = nn.Sequential(
            DinoViT(cfg), nn.Linear(cfg.embed_dim, dec // 2))
        self.downsample = nn.Sequential(
            nn.Conv2d(dec, dec // 2, 3, stride=2, padding=1), nn.ReLU(True))
        self.head = nn.Sequential(
            nn.Conv2d(dec // 2, dec // 4, 3, stride=2, padding=1), nn.ReLU(True),
            nn.Conv2d(dec // 4, dec // 8, 3, stride=2, padding=1), nn.ReLU(True),
            nn.Conv2d(dec // 8, 1, k))

    def forward(self, x, lowres_feature):
        x = F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
        t, _ = self.encoder[0].forward_features(x)
        t = self.encoder[1](t)
        t = t[:, 1:].permute(0, 2, 1)
        low = self.downsample(lowres_feature)
        t = t.reshape(low.shape) + low
        return self.head(t).reshape(x.shape[0])


class DepthPro(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        dec = cfg.decoder_features
        l0, l1 = cfg.head_last_dims
        self.encoder = DepthProEncoder(cfg)
        self.decoder = MultiresConvDecoder(cfg)
        self.head = nn.Sequential(
            nn.Conv2d(dec, dec // 2, 3, padding=1, bias=True),
            nn.ConvTranspose2d(dec // 2, dec // 2, 2, stride=2, bias=True),
            nn.Conv2d(dec // 2, l0, 3, padding=1, bias=True),
            nn.ReLU(True),
            nn.Conv2d(l0, l1, 1, bias=True),
            nn.ReLU(False),
        )
        self.fov = FOVNetwork(cfg)

    def forward(self, x, f_norm=None):
        encodings = self.encoder(x)
        features, lowres = self.decoder(encodings)
        canonical = self.head(features)[:, 0]
        if f_norm is None:
            fov_deg = self.fov(x, lowres)
            f_norm = torch.tan(0.5 * fov_deg * math.pi / 180.0) / 0.5
            f_norm = f_norm.reshape(-1, 1, 1)
        inv = canonical / f_norm
        return inv.clamp(1e-4, 1e4)


def randomize(model: nn.Module, seed: int = 0) -> nn.Module:
    """Re-init every parameter from N(0, fan-in scaled) with nonzero
    LayerScale gammas, for deterministic numeric fixtures."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2:
                fan_in = p.shape[1] if p.ndim == 2 else p[0].numel()
                p.copy_(torch.randn(p.shape, generator=g) * (1.0 / max(fan_in, 1)) ** 0.5)
            else:
                p.copy_(torch.rand(p.shape, generator=g) * 0.25 + 0.05)
    return model


@torch.no_grad()
def dump_stages(model: DepthPro, x: torch.Tensor):
    """Per-stage activations named like matrix_eyes_tpu.debug.dump_stages
    (NHWC for feature maps), for real-checkpoint parity reports."""
    import numpy as np

    out = {}
    enc = model.encoder
    cfg = enc.cfg
    P = cfg.vit_img_size
    s = cfg.tokens_per_side
    pad_hi, pad_lo = s // 8, s // 4
    B = x.shape[0]

    x1 = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False)
    x2 = F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
    p0 = enc._split(x, P, 4)
    p1 = enc._split(x1, P, 2)
    n0, n1 = p0.shape[0], p1.shape[0]
    pyramid = torch.cat([p0, p1, x2], dim=0)

    t, (hi0, hi1) = enc.patch_encoder.forward_features(pyramid, cfg.highres_block_ids)
    out["patch_tokens"] = t.float().numpy()
    out["patch_highres0"] = hi0.float().numpy()
    out["patch_highres1"] = hi1.float().numpy()

    # continue the encoder forward from the already-computed tokens
    tokens = enc._reshape_feature(t)
    latent0 = enc._merge(enc._reshape_feature(hi0)[: B * 25], B, pad_hi)
    latent1 = enc._merge(enc._reshape_feature(hi1)[: B * 25], B, pad_hi)
    x0_enc, x1_enc, x2_enc = tokens[:n0], tokens[n0:n0 + n1], tokens[n0 + n1:]
    x0_feat = enc._merge(x0_enc, B, pad_hi)
    x1_feat = enc._merge(x1_enc, B, pad_lo)
    g, _ = enc.image_encoder.forward_features(x2)
    g = enc._reshape_feature(g)
    latent0 = enc.upsample_latent0(latent0)
    latent1 = enc.upsample_latent1(latent1)
    x0_feat = enc.upsample0(x0_feat)
    x1_feat = enc.upsample1(x1_feat)
    x2_feat = enc.upsample2(x2_enc)
    g = enc.upsample_lowres(g)
    g = enc.fuse_lowres(torch.cat([x2_feat, g], dim=1))
    encodings = [latent0, latent1, x0_feat, x1_feat, g]

    names = ("latent0", "latent1", "x0", "x1", "global")
    for name, e in zip(names, encodings):
        out[f"enc_{name}"] = e.permute(0, 2, 3, 1).float().numpy()

    features, lowres = model.decoder(encodings)
    out["dec_features"] = features.permute(0, 2, 3, 1).float().numpy()
    out["dec_lowres"] = lowres.permute(0, 2, 3, 1).float().numpy()

    canonical = model.head(features)[:, 0]
    out["canonical_inverse_depth"] = canonical.float().numpy()

    fov_deg = model.fov(x, lowres)
    out["fov_deg"] = fov_deg.float().numpy()
    return out
