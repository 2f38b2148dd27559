"""Composable point-cloud augmentations (host-side numpy).

Re-design of /root/reference/data/transform.py — the YAML-keyed
transform registry with the training-relevant members implemented
natively (no torchvision): ColorJitter, RandomRotate, ColorShift,
RGB/YUV conversion (BT.709), Normalize/Denormalize, RandomNoise.

Transforms operate on dicts {"points": [N,3] float, "colors": [N,3]
float in [0,1]} with an explicit numpy Generator for determinism
(the reference relies on global seeds, /root/reference/train.py:32-45).
"""

from __future__ import annotations

import numpy as np

BT709 = np.array(
    [
        [0.2126, 0.7152, 0.0722],
        [-0.1146, -0.3854, 0.5],
        [0.5, -0.4542, -0.0458],
    ],
    np.float32,
)


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    yuv = rgb @ BT709.T
    yuv[:, 1:] += 0.5
    return yuv


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    v = yuv.copy()
    v[:, 1:] -= 0.5
    return v @ np.linalg.inv(BT709).T


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter (strength 0.3 each,
    matching torchvision semantics used at
    /root/reference/data/transform.py:107-130)."""

    def __init__(self, config=None):
        config = config or {}
        self.brightness = config.get("brightness", 0.3)
        self.contrast = config.get("contrast", 0.3)
        self.saturation = config.get("saturation", 0.3)
        self.hue = config.get("hue", 0.3)

    def __call__(self, sample, rng: np.random.Generator):
        c = sample["colors"].astype(np.float32)
        b = rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
        c = c * b
        k = rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
        mean_gray = c @ np.array([0.299, 0.587, 0.114], np.float32)
        c = (c - mean_gray.mean()) * k + mean_gray.mean()
        s = rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
        gray = (c @ np.array([0.299, 0.587, 0.114], np.float32))[:, None]
        c = (c - gray) * s + gray
        h = rng.uniform(-self.hue, self.hue) * 2 * np.pi
        yuv = rgb_to_yuv(np.clip(c, 0, 1))
        u, v = yuv[:, 1] - 0.5, yuv[:, 2] - 0.5
        cos, sin = np.cos(h), np.sin(h)
        yuv[:, 1] = u * cos - v * sin + 0.5
        yuv[:, 2] = u * sin + v * cos + 0.5
        c = yuv_to_rgb(yuv)
        sample = dict(sample)
        sample["colors"] = np.clip(c, 0.0, 1.0)
        return sample


class RandomRotate:
    """Random 3D rotation about the block center, rounded to the voxel
    grid with dedup; identity if too few points survive
    (/root/reference/data/transform.py:425-494)."""

    def __init__(self, config=None):
        config = config or {}
        self.block_size = config.get("block_size", 128)
        self.min_points = config.get("min_points", 1000)

    def __call__(self, sample, rng: np.random.Generator):
        pts = sample["points"].astype(np.float64)
        cols = sample["colors"]
        angles = rng.uniform(0, 2 * np.pi, 3)
        cx, cy, cz = np.cos(angles)
        sx, sy, sz = np.sin(angles)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz
        center = (self.block_size - 1) / 2.0
        p = (pts - center) @ rot.T + center
        p = np.round(p).astype(np.int64)
        keep = np.all((p >= 0) & (p < self.block_size), axis=1)
        p, cols2 = p[keep], cols[keep]
        p, idx = np.unique(p, axis=0, return_index=True)
        cols2 = cols2[idx]
        if p.shape[0] <= self.min_points:
            return sample  # rotation destroyed too much; keep original
        return {**sample, "points": p.astype(np.float64), "colors": cols2}


class ColorShift:
    """Independent uniform shift per channel (/root/reference/data/transform.py:73)."""

    def __init__(self, config=None):
        self.shift = (config or {}).get("shift", 0.1)

    def __call__(self, sample, rng):
        c = sample["colors"] + rng.uniform(-self.shift, self.shift, 3).astype(np.float32)
        return {**sample, "colors": np.clip(c, 0.0, 1.0)}


class RandomNoise:
    """Additive color noise (/root/reference/data/transform.py:316-340)."""

    def __init__(self, config=None):
        self.sigma = (config or {}).get("sigma", 0.02)

    def __call__(self, sample, rng):
        c = sample["colors"] + rng.normal(0, self.sigma, sample["colors"].shape)
        return {**sample, "colors": np.clip(c.astype(np.float32), 0.0, 1.0)}


class Normalize:
    def __init__(self, config=None):
        pass

    def __call__(self, sample, rng):
        c = sample["colors"] * 2.0 - 1.0
        return {**sample, "colors": c}


class Denormalize:
    def __init__(self, config=None):
        pass

    def __call__(self, sample, rng):
        return {**sample, "colors": (sample["colors"] + 1.0) / 2.0}


class RGBtoYUV:
    def __init__(self, config=None):
        pass

    def __call__(self, sample, rng):
        return {**sample, "colors": rgb_to_yuv(sample["colors"])}


class YUVtoRGB:
    def __init__(self, config=None):
        pass

    def __call__(self, sample, rng):
        return {**sample, "colors": yuv_to_rgb(sample["colors"])}


_REGISTRY = {
    "ColorJitter": ColorJitter,
    "RandomRotate": RandomRotate,
    "ColorShift": ColorShift,
    "RandomNoise": RandomNoise,
    "Normalize": Normalize,
    "Denormalize": Denormalize,
    "RGBtoYUV": RGBtoYUV,
    "YUVtoRGB": YUVtoRGB,
}


class Voxelize:
    """Point-cloud cube -> dense [4, S, S, S] voxel grid (occupancy +
    RGB; /root/reference/data/transform.py:190-229). Replaces
    points/colors with a "voxels" entry."""

    def __init__(self, settings=None):
        settings = settings or {}
        self.block_size = int(settings.get("block_size", 128))

    def __call__(self, sample, rng=None):
        s = self.block_size
        voxel = np.zeros((4, s, s, s), np.float32)
        pts = np.clip(np.round(sample["points"]).astype(np.int64), 0, s - 1)
        i, j, k = pts[:, 0], pts[:, 1], pts[:, 2]
        voxel[0, i, j, k] = 1.0
        voxel[1:, i, j, k] = np.asarray(sample["colors"], np.float32).T
        out = dict(sample)
        out.pop("points")
        out.pop("colors")
        out["voxels"] = voxel
        return out


class Devoxelize:
    """Inverse of Voxelize: occupied cells -> points + colors
    (/root/reference/data/transform.py:231-272)."""

    def __init__(self, settings=None):
        self.block_size = int((settings or {}).get("block_size", 128))

    def __call__(self, sample, rng=None):
        voxel = sample["voxels"]
        occ = np.nonzero(voxel[0] == 1)
        pts = np.stack(occ, axis=1).astype(np.float64)
        colors = voxel[1:, occ[0], occ[1], occ[2]].T.astype(np.float32)
        out = dict(sample)
        out.pop("voxels")
        out["points"] = pts
        out["colors"] = colors
        return out


class ProjectTexture:
    """Project a random texture image onto the cube's (x, y) footprint
    (/root/reference/data/transform.py:343-391 uses torchvision DTD;
    here any directory of images — or, absent one, procedural multi-
    octave textures — supplies the patterns, keeping the augmentation
    usable with zero downloads)."""

    def __init__(self, settings=None):
        settings = settings or {}
        dataset_dir = settings.get("dataset_dir")
        self.block_size = int(settings.get("block_size", 128))
        self.probability = float(settings.get("probability", 0.5))
        self.images = []
        if dataset_dir:
            import glob as _glob

            for ext in ("*.png", "*.jpg", "*.jpeg"):
                self.images.extend(
                    _glob.glob(f"{dataset_dir}/**/{ext}", recursive=True)
                )

    def _texture(self, rng) -> np.ndarray:
        s = self.block_size
        if self.images:
            from PIL import Image  # torchvision dependency, present

            img = np.asarray(
                Image.open(self.images[rng.integers(len(self.images))])
                .convert("RGB"),
                np.float32,
            ) / 255.0
            # random crop / tile to [s, s, 3]
            h, w = img.shape[:2]
            ys = rng.integers(max(1, h - s + 1))
            xs = rng.integers(max(1, w - s + 1))
            crop = img[ys:ys + s, xs:xs + s]
            out = np.zeros((s, s, 3), np.float32)
            out[: crop.shape[0], : crop.shape[1]] = crop
            return out
        # Procedural fallback: multi-octave directional harmonics.
        yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        grid = np.stack([yy, xx], -1).astype(np.float32) / s
        tex = np.full((s, s, 3), 0.5, np.float32)
        for octave in range(4):
            freq = 2.0 * (2.0**octave)
            amp = 0.3 / (1.5**octave)
            for c in range(3):
                d = rng.standard_normal(2)
                d /= np.linalg.norm(d)
                tex[:, :, c] += amp * np.sin(
                    freq * 2 * np.pi * (grid @ d) + rng.uniform(0, 2 * np.pi)
                )
        return np.clip(tex, 0, 1)

    def __call__(self, sample, rng=None):
        rng = rng or np.random.default_rng()
        # NOTE: reference quirk — it returns UNCHANGED when rand < p,
        # i.e. `probability` is the chance of SKIPPING the projection.
        if rng.random() < self.probability:
            return sample
        tex = self._texture(rng)
        pts = np.asarray(sample["points"])
        x = np.round(pts[:, 0]).astype(np.int64)
        y = np.round(pts[:, 1]).astype(np.int64)
        h, w = tex.shape[:2]
        valid = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        colors = np.array(sample["colors"], np.float32)
        colors[valid] = tex[y[valid], x[valid]]
        out = dict(sample)
        out["colors"] = colors
        return out


_REGISTRY.update({
    "Voxelize": Voxelize,
    "Devoxelize": Devoxelize,
    "ProjectTexture": ProjectTexture,
})


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample, rng):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


def build_transforms(config) -> Compose:
    """YAML-keyed construction (/root/reference/data/transform.py:9-71):
    config = {"1_ColorJitter": {"key": "ColorJitter", ...}, ...}."""
    ts = []
    for _, setting in sorted((config or {}).items()):
        key = setting["key"]
        if key not in _REGISTRY:
            raise ValueError(f"unknown transform {key!r}")
        ts.append(_REGISTRY[key](setting))
    return Compose(ts)
