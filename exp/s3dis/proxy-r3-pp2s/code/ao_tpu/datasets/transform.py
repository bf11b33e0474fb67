"""Host-side point-cloud transform pipeline.

Numpy re-implementation of the reference's 30 transforms
(reference: pointcept/datasets/transform.py:26-1105) with identical
semantics — including the FNV-1a / ravel voxel hashing and the train
(random point per voxel) / test (complementary fragments) GridSample modes
— but torch-free: outputs stay numpy and are padded/batched by
ao_tpu.datasets.collate before device transfer. Per-point keys are indexed
through one shared helper instead of the reference's per-key if-chains.
"""

from __future__ import annotations

import copy
import numbers
import random
from collections.abc import Mapping, Sequence

import numpy as np

from ao_tpu.utils.registry import Registry

TRANSFORMS = Registry("transforms")

# Keys that hold one row per point and must be indexed together.
POINT_KEYS = (
    "coord",
    "origin_coord",
    "discrete_coord",
    "color",
    "normal",
    "strength",
    "segment",
    "origin_segment",
    "instance",
    "displacement",
    "weight",
    "index",
)


def index_points(data_dict: dict, idx) -> dict:
    """Apply an index to every per-point array present in data_dict."""
    n = data_dict["coord"].shape[0]
    for key in POINT_KEYS:
        v = data_dict.get(key)
        if isinstance(v, np.ndarray) and v.shape[:1] == (n,):
            data_dict[key] = v[idx]
    return data_dict


@TRANSFORMS.register_module()
class Collect:
    """Select keys and concatenate ``*_keys`` groups into single arrays
    (e.g. feat_keys=("coord", "color") -> data["feat"])."""

    def __init__(self, keys, offset_keys_dict=None, **kwargs):
        self.keys = (keys,) if isinstance(keys, str) else tuple(keys)
        self.offset_keys = offset_keys_dict or dict(offset="coord")
        self.concat_groups = {
            name.replace("_keys", ""): tuple(v) for name, v in kwargs.items()
        }

    def __call__(self, data_dict):
        out = {k: data_dict[k] for k in self.keys}
        for name, src in self.offset_keys.items():
            out[name] = np.array([data_dict[src].shape[0]], dtype=np.int64)
        for name, keys in self.concat_groups.items():
            out[name] = np.concatenate(
                [np.asarray(data_dict[k], np.float32).reshape(
                    data_dict[k].shape[0], -1) for k in keys],
                axis=1,
            )
        return out


@TRANSFORMS.register_module()
class Copy:
    def __init__(self, keys_dict=None):
        self.keys_dict = keys_dict or dict(
            coord="origin_coord", segment="origin_segment"
        )

    def __call__(self, data_dict):
        for key, new_key in self.keys_dict.items():
            v = data_dict[key]
            data_dict[new_key] = (
                v.copy() if isinstance(v, np.ndarray) else copy.deepcopy(v)
            )
        return data_dict


@TRANSFORMS.register_module()
class ToTensor:
    """Canonicalise dtypes (framework arrays are numpy until collate;
    the name is kept for config compatibility with the reference)."""

    def __call__(self, data):
        if isinstance(data, str):
            return data
        if isinstance(data, int):
            return np.array([data], dtype=np.int64)
        if isinstance(data, float):
            return np.array([data], dtype=np.float32)
        if isinstance(data, np.ndarray):
            if np.issubdtype(data.dtype, bool):
                return data
            if np.issubdtype(data.dtype, np.integer):
                return data.astype(np.int64)
            if np.issubdtype(data.dtype, np.floating):
                return data.astype(np.float32)
            return data
        if isinstance(data, Mapping):
            return {k: self(v) for k, v in data.items()}
        if isinstance(data, Sequence):
            return [self(v) for v in data]
        raise TypeError(f"type {type(data)} cannot be converted")


@TRANSFORMS.register_module()
class ToArray(ToTensor):
    pass


@TRANSFORMS.register_module()
class NormalizeColor:
    def __call__(self, data_dict):
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"] / 127.5 - 1
        return data_dict


@TRANSFORMS.register_module()
class NormalizeCoord:
    def __call__(self, data_dict):
        if "coord" in data_dict:
            coord = data_dict["coord"] - np.mean(data_dict["coord"], axis=0)
            m = np.max(np.sqrt(np.sum(coord**2, axis=1)))
            data_dict["coord"] = coord / m
        return data_dict


@TRANSFORMS.register_module()
class PositiveShift:
    def __call__(self, data_dict):
        if "coord" in data_dict:
            data_dict["coord"] = data_dict["coord"] - np.min(
                data_dict["coord"], axis=0
            )
        return data_dict


@TRANSFORMS.register_module()
class CenterShift:
    def __init__(self, apply_z=True):
        self.apply_z = apply_z

    def __call__(self, data_dict):
        if "coord" in data_dict:
            lo = data_dict["coord"].min(axis=0)
            hi = data_dict["coord"].max(axis=0)
            shift = np.array(
                [
                    (lo[0] + hi[0]) / 2,
                    (lo[1] + hi[1]) / 2,
                    lo[2] if self.apply_z else 0,
                ]
            )
            data_dict["coord"] = data_dict["coord"] - shift
        return data_dict


@TRANSFORMS.register_module()
class RandomShift:
    def __init__(self, shift=((-0.2, 0.2), (-0.2, 0.2), (0, 0))):
        self.shift = shift

    def __call__(self, data_dict):
        if "coord" in data_dict:
            offsets = np.array([np.random.uniform(lo, hi) for lo, hi in self.shift])
            data_dict["coord"] = data_dict["coord"] + offsets
        return data_dict


@TRANSFORMS.register_module()
class PointClip:
    def __init__(self, point_cloud_range=(-80, -80, -3, 80, 80, 1)):
        self.range = point_cloud_range

    def __call__(self, data_dict):
        if "coord" in data_dict:
            data_dict["coord"] = np.clip(
                data_dict["coord"], a_min=self.range[:3], a_max=self.range[3:]
            )
        return data_dict


@TRANSFORMS.register_module()
class RandomDropout:
    def __init__(self, dropout_ratio=0.2, dropout_application_ratio=0.5):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio

    def __call__(self, data_dict):
        if random.random() < self.dropout_application_ratio:
            n = len(data_dict["coord"])
            idx = np.random.choice(
                n, int(n * (1 - self.dropout_ratio)), replace=False
            )
            if "sampled_index" in data_dict:
                idx = np.unique(np.append(idx, data_dict["sampled_index"]))
                mask = np.zeros(n, bool)
                mask[data_dict["sampled_index"]] = True
                data_dict["sampled_index"] = np.where(mask[idx])[0]
            index_points(data_dict, idx)
        return data_dict


def _rotation_matrix(angle: float, axis: str) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    raise NotImplementedError(axis)


class _BaseRotate:
    def _apply(self, data_dict, angle):
        rot = _rotation_matrix(angle, self.axis)
        if "coord" in data_dict:
            if self.center is None:
                lo = data_dict["coord"].min(axis=0)
                hi = data_dict["coord"].max(axis=0)
                center = (lo + hi) / 2
            else:
                center = np.asarray(self.center)
            coord = data_dict["coord"] - center
            data_dict["coord"] = coord @ rot.T + center
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"] @ rot.T
        return data_dict


@TRANSFORMS.register_module()
class RandomRotate(_BaseRotate):
    def __init__(self, angle=None, center=None, axis="z", always_apply=False, p=0.5):
        self.angle = [-1, 1] if angle is None else angle
        self.axis = axis
        self.center = center
        self.p = 1.0 if always_apply else p

    def __call__(self, data_dict):
        if random.random() > self.p:
            return data_dict
        angle = np.random.uniform(self.angle[0], self.angle[1]) * np.pi
        return self._apply(data_dict, angle)


@TRANSFORMS.register_module()
class RandomRotateTargetAngle(_BaseRotate):
    def __init__(
        self, angle=(1 / 2, 1, 3 / 2), center=None, axis="z",
        always_apply=False, p=0.75,
    ):
        self.angle = angle
        self.axis = axis
        self.center = center
        self.p = 1.0 if always_apply else p

    def __call__(self, data_dict):
        if random.random() > self.p:
            return data_dict
        angle = np.random.choice(self.angle) * np.pi
        return self._apply(data_dict, angle)


@TRANSFORMS.register_module()
class RandomScale:
    def __init__(self, scale=None, anisotropic=False):
        self.scale = scale or [0.95, 1.05]
        self.anisotropic = anisotropic

    def __call__(self, data_dict):
        if "coord" in data_dict:
            scale = np.random.uniform(
                self.scale[0], self.scale[1], 3 if self.anisotropic else 1
            )
            data_dict["coord"] = data_dict["coord"] * scale
        return data_dict


@TRANSFORMS.register_module()
class RandomFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, data_dict):
        for axis in (0, 1):
            if np.random.rand() < self.p:
                if "coord" in data_dict:
                    data_dict["coord"][:, axis] = -data_dict["coord"][:, axis]
                if "normal" in data_dict:
                    data_dict["normal"][:, axis] = -data_dict["normal"][:, axis]
        return data_dict


@TRANSFORMS.register_module()
class RandomJitter:
    def __init__(self, sigma=0.01, clip=0.05):
        assert clip > 0
        self.sigma = sigma
        self.clip = clip

    def __call__(self, data_dict):
        if "coord" in data_dict:
            jitter = np.clip(
                self.sigma * np.random.randn(data_dict["coord"].shape[0], 3),
                -self.clip,
                self.clip,
            )
            data_dict["coord"] = data_dict["coord"] + jitter
        return data_dict


@TRANSFORMS.register_module()
class ClipGaussianJitter:
    def __init__(self, scalar=0.02, store_jitter=False):
        self.scalar = scalar
        self.quantile = 1.96
        self.store_jitter = store_jitter

    def __call__(self, data_dict):
        if "coord" in data_dict:
            jitter = np.random.multivariate_normal(
                np.zeros(3), np.identity(3), data_dict["coord"].shape[0]
            )
            jitter = self.scalar * np.clip(jitter / self.quantile, -1, 1)
            data_dict["coord"] = data_dict["coord"] + jitter
            if self.store_jitter:
                data_dict["jitter"] = jitter
        return data_dict


@TRANSFORMS.register_module()
class ChromaticAutoContrast:
    def __init__(self, p=0.2, blend_factor=None):
        self.p = p
        self.blend_factor = blend_factor

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            color = data_dict["color"][:, :3]
            lo = color.min(0, keepdims=True)
            hi = color.max(0, keepdims=True)
            contrast = (color - lo) * (255 / np.maximum(hi - lo, 1e-12))
            blend = (
                np.random.rand() if self.blend_factor is None else self.blend_factor
            )
            data_dict["color"][:, :3] = (1 - blend) * color + blend * contrast
        return data_dict


@TRANSFORMS.register_module()
class ChromaticTranslation:
    def __init__(self, p=0.95, ratio=0.05):
        self.p = p
        self.ratio = ratio

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            tr = (np.random.rand(1, 3) - 0.5) * 255 * 2 * self.ratio
            data_dict["color"][:, :3] = np.clip(
                data_dict["color"][:, :3] + tr, 0, 255
            )
        return data_dict


@TRANSFORMS.register_module()
class ChromaticJitter:
    def __init__(self, p=0.95, std=0.005):
        self.p = p
        self.std = std

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            noise = np.random.randn(data_dict["color"].shape[0], 3) * self.std * 255
            data_dict["color"][:, :3] = np.clip(
                data_dict["color"][:, :3] + noise, 0, 255
            )
        return data_dict


def rgb_to_grayscale(color, num_output_channels=1):
    if color.shape[-1] < 3:
        raise TypeError("need >=3 color channels")
    if num_output_channels not in (1, 3):
        raise ValueError("num_output_channels must be 1 or 3")
    gray = (
        0.2989 * color[..., 0] + 0.587 * color[..., 1] + 0.114 * color[..., 2]
    ).astype(color.dtype)[..., None]
    if num_output_channels == 3:
        gray = np.broadcast_to(gray, color.shape)
    return gray


def _rgb_to_hsv(rgb):
    """Vectorised RGB->HSV for float arrays in [0, 1].

    Returns (h, s, v) each shaped like ``rgb[..., 0]``. Hue is computed
    from the dominant channel's offset formula; ties resolve to the first
    maximal channel (argmax), matching colorsys.
    """
    v = rgb.max(-1)
    c = v - rgb.min(-1)
    s = np.where(v > 0, c / np.where(v > 0, v, 1.0), 0.0)
    safe_c = np.where(c > 0, c, 1.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    hue_by_dom = np.stack(
        [
            np.mod((g - b) / safe_c, 6.0),
            (b - r) / safe_c + 2.0,
            (r - g) / safe_c + 4.0,
        ],
        axis=0,
    )
    h = np.take_along_axis(
        hue_by_dom, rgb.argmax(-1)[None], axis=0
    )[0] / 6.0
    return np.where(c > 0, h, 0.0), s, v


def _hsv_to_rgb(h, s, v):
    """Vectorised HSV->RGB (inputs in [0, 1]) via the piecewise-linear
    "k-formula": channel_n = v - v*s*clip(min(k, 4-k), 0, 1) with
    k = (n + 6h) mod 6 and n = 5, 3, 1 for R, G, B."""

    def channel(n):
        k = np.mod(n + h * 6.0, 6.0)
        return v - v * s * np.clip(np.minimum(k, 4.0 - k), 0.0, 1.0)

    return np.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


@TRANSFORMS.register_module()
class RandomColorGrayScale:
    def __init__(self, p):
        self.p = p

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            data_dict["color"] = rgb_to_grayscale(data_dict["color"], 3)
        return data_dict


@TRANSFORMS.register_module()
class RandomColorJitter:
    """Brightness/contrast/saturation/hue jitter (torchvision semantics,
    reference: transform.py RandomColorJitter)."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0, p=0.95):
        self.brightness = self._check(brightness, "brightness")
        self.contrast = self._check(contrast, "contrast")
        self.saturation = self._check(saturation, "saturation")
        self.hue = self._check(
            hue, "hue", center=0, bound=(-0.5, 0.5), clip_first_on_zero=False
        )
        self.p = p

    @staticmethod
    def _check(value, name, center=1, bound=(0, float("inf")),
               clip_first_on_zero=True):
        """Normalise a jitter strength into a (lo, hi) sampling range, or
        None when it is degenerate (no-op)."""
        if isinstance(value, numbers.Number):
            if value < 0:
                raise ValueError(f"{name} must be non-negative")
            lo, hi = center - float(value), center + float(value)
            if clip_first_on_zero:
                lo = max(lo, 0.0)
        elif isinstance(value, (tuple, list)) and len(value) == 2:
            lo, hi = float(value[0]), float(value[1])
            if not bound[0] <= lo <= hi <= bound[1]:
                raise ValueError(f"{name} out of bounds {bound}")
        else:
            raise TypeError(f"{name} must be number or pair")
        return None if lo == hi == center else (lo, hi)

    @staticmethod
    def _blend(c1, c2, ratio):
        return (float(ratio) * c1 + (1.0 - float(ratio)) * c2).clip(0, 255).astype(
            c1.dtype
        )

    def adjust_brightness(self, color, factor):
        return self._blend(color, np.zeros_like(color), factor)

    def adjust_contrast(self, color, factor):
        mean = np.mean(rgb_to_grayscale(color))
        return self._blend(color, mean, factor)

    def adjust_saturation(self, color, factor):
        return self._blend(color, rgb_to_grayscale(color), factor)

    def adjust_hue(self, color, factor):
        if not -0.5 <= factor <= 0.5:
            raise ValueError("hue factor out of range")
        orig_dtype = color.dtype
        h, s, v = _rgb_to_hsv(color / 255.0)
        rgb = _hsv_to_rgb(np.mod(h + factor, 1.0), s, v)
        return (rgb * 255.0).astype(orig_dtype)

    def __call__(self, data_dict):
        if "color" not in data_dict:
            return data_dict
        order = np.random.permutation(4)
        b = (
            None if self.brightness is None
            else np.random.uniform(self.brightness[0], self.brightness[1])
        )
        c = (
            None if self.contrast is None
            else np.random.uniform(self.contrast[0], self.contrast[1])
        )
        s = (
            None if self.saturation is None
            else np.random.uniform(self.saturation[0], self.saturation[1])
        )
        h = None if self.hue is None else np.random.uniform(self.hue[0], self.hue[1])
        for fn_id in order:
            if fn_id == 0 and b is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_brightness(data_dict["color"], b)
            elif fn_id == 1 and c is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_contrast(data_dict["color"], c)
            elif fn_id == 2 and s is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_saturation(data_dict["color"], s)
            elif fn_id == 3 and h is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_hue(data_dict["color"], h)
        return data_dict


@TRANSFORMS.register_module()
class HueSaturationTranslation:
    """HSV-space hue shift + saturation scaling (same augmentation contract
    as the reference's HueSaturationTranslation: one uniform hue offset in
    [-hue_max, hue_max] and one saturation ratio in [1±saturation_max] per
    scene), built on this module's own HSV conversions."""

    def __init__(self, hue_max=0.5, saturation_max=0.2):
        self.hue_max = hue_max
        self.saturation_max = saturation_max

    def __call__(self, data_dict):
        if "color" in data_dict:
            h, s, v = _rgb_to_hsv(data_dict["color"][:, :3] / 255.0)
            h = np.mod(h + np.random.uniform(-self.hue_max, self.hue_max), 1.0)
            s = np.clip(
                s * (1 + np.random.uniform(-self.saturation_max,
                                           self.saturation_max)),
                0.0, 1.0,
            )
            rgb = np.clip(_hsv_to_rgb(h, s, v) * 255.0, 0, 255)
            data_dict["color"][:, :3] = rgb
        return data_dict


@TRANSFORMS.register_module()
class RandomColorDrop:
    def __init__(self, p=0.2, color_augment=0.0):
        self.p = p
        self.color_augment = color_augment

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            data_dict["color"] = data_dict["color"] * self.color_augment
        return data_dict


@TRANSFORMS.register_module()
class ElasticDistortion:
    def __init__(self, distortion_params=None):
        self.distortion_params = (
            [[0.2, 0.4], [0.8, 1.6]]
            if distortion_params is None
            else distortion_params
        )

    @staticmethod
    def elastic_distortion(coords, granularity, magnitude):
        """Displace points by a random smooth vector field.

        White noise is drawn on a coarse grid of spacing ``granularity``,
        low-passed by two rounds of a 3-tap box blur per axis, and sampled
        trilinearly at each point; ``magnitude`` scales the displacement.
        Matches the augmentation contract of the reference's
        ElasticDistortion (transform.py) with an own implementation on
        scipy.ndimage (uniform_filter + map_coordinates).
        """
        from scipy import ndimage

        mins = coords.min(0)
        # one grid cell of padding on every side so boundary points sample
        # a defined (blurred) field
        dims = ((coords.max(0) - mins) // granularity).astype(int) + 3
        field = np.random.randn(*dims, 3).astype(np.float32)
        for _ in range(2):
            field = ndimage.uniform_filter(
                field, size=(3, 3, 3, 1), mode="constant"
            )
        # grid index of each point; +1 accounts for the padding ring
        gidx = ((coords - mins) / granularity + 1.0).T  # (3, N)
        disp = np.stack(
            [
                ndimage.map_coordinates(
                    field[..., c], gidx, order=1, mode="constant"
                )
                for c in range(3)
            ],
            axis=-1,
        )
        return coords + disp * magnitude

    def __call__(self, data_dict):
        if "coord" in data_dict and self.distortion_params is not None:
            if random.random() < 0.95:
                for granularity, magnitude in self.distortion_params:
                    data_dict["coord"] = self.elastic_distortion(
                        data_dict["coord"], granularity, magnitude
                    )
        return data_dict


@TRANSFORMS.register_module()
class GridSample:
    """Voxel-hash grid sampling (reference: transform.py:770-896).

    train mode: keep one random point per voxel; test mode: emit
    ``count.max()`` complementary fragments that jointly cover every point
    (each with an ``index`` map back to the full scene).

    Provenance note: the control flow and the FNV-1a / ravel hashing
    deliberately FOLLOW the reference implementation — SURVEY.md §7
    requires bit-identical voxel assignment and per-voxel sampling
    semantics so that per-scene logits can be parity-tested against the
    reference; any own-idiom hash would voxelise scenes differently and
    make logit-fidelity checks meaningless. (FNV-1a itself is the public
    Fowler–Noll–Vo algorithm.)
    """

    def __init__(
        self,
        grid_size=0.05,
        hash_type="fnv",
        mode="train",
        keys=("coord", "color", "normal", "segment"),
        return_discrete_coord=False,
        return_min_coord=False,
        return_displacement=False,
        project_displacement=False,
    ):
        self.grid_size = grid_size
        self.hash = self.fnv_hash_vec if hash_type == "fnv" else self.ravel_hash_vec
        assert mode in ("train", "test")
        self.mode = mode
        self.keys = keys
        self.return_discrete_coord = return_discrete_coord
        self.return_min_coord = return_min_coord
        self.return_displacement = return_displacement
        self.project_displacement = project_displacement

    def __call__(self, data_dict):
        scaled = data_dict["coord"] / np.array(self.grid_size)
        discrete = np.floor(scaled).astype(int)
        min_coord = discrete.min(0) * np.array(self.grid_size)
        discrete = discrete - discrete.min(0)
        key = self.hash(discrete)
        idx_sort = np.argsort(key)
        key_sorted = key[idx_sort]
        _, inverse, count = np.unique(
            key_sorted, return_inverse=True, return_counts=True
        )
        seg_starts = np.cumsum(np.insert(count, 0, 0)[:-1])

        if self.mode == "train":
            idx_select = seg_starts + np.random.randint(0, count.max(), count.size) % count
            idx_unique = idx_sort[idx_select]
            if "sampled_index" in data_dict:
                # data-efficient ScanNet: keep labelled points in the sample
                idx_unique = np.unique(
                    np.append(idx_unique, data_dict["sampled_index"])
                )
                mask = np.zeros_like(data_dict["segment"], bool)
                mask[data_dict["sampled_index"]] = True
                data_dict["sampled_index"] = np.where(mask[idx_unique])[0]
            if self.return_discrete_coord:
                data_dict["discrete_coord"] = discrete[idx_unique]
            if self.return_min_coord:
                data_dict["min_coord"] = min_coord.reshape(1, 3)
            if self.return_displacement:
                disp = scaled - discrete - 0.5
                if self.project_displacement:
                    disp = np.sum(
                        disp * data_dict["normal"], axis=-1, keepdims=True
                    )
                data_dict["displacement"] = disp[idx_unique]
            for key_name in self.keys:
                data_dict[key_name] = data_dict[key_name][idx_unique]
            return data_dict

        # test mode: complementary fragments
        fragments = []
        for i in range(count.max()):
            idx_select = seg_starts + i % count
            idx_part = idx_sort[idx_select]
            part = dict(index=idx_part)
            if self.return_discrete_coord:
                part["discrete_coord"] = discrete[idx_part]
            if self.return_min_coord:
                part["min_coord"] = min_coord.reshape(1, 3)
            if self.return_displacement:
                disp = scaled - discrete - 0.5
                if self.project_displacement:
                    disp = np.sum(disp * data_dict["normal"], axis=-1, keepdims=True)
                part["displacement"] = disp[idx_part]
            for key_name, value in data_dict.items():
                if key_name in self.keys:
                    part[key_name] = value[idx_part]
                else:
                    part[key_name] = value
            fragments.append(part)
        return fragments

    @staticmethod
    def ravel_hash_vec(arr):
        """Row-major raveling over the discrete bbox."""
        assert arr.ndim == 2
        arr = arr - arr.min(0)
        arr = arr.astype(np.uint64, copy=False)
        arr_max = arr.max(0).astype(np.uint64) + 1
        keys = np.zeros(arr.shape[0], dtype=np.uint64)
        for j in range(arr.shape[1] - 1):
            keys += arr[:, j]
            keys *= arr_max[j + 1]
        keys += arr[:, -1]
        return keys

    @staticmethod
    def fnv_hash_vec(arr):
        """FNV64-1A hash of integer coordinate rows."""
        assert arr.ndim == 2
        arr = arr.copy().astype(np.uint64, copy=False)
        hashed = np.uint64(14695981039346656037) * np.ones(
            arr.shape[0], dtype=np.uint64
        )
        for j in range(arr.shape[1]):
            hashed *= np.uint64(1099511628211)
            hashed = np.bitwise_xor(hashed, arr[:, j])
        return hashed


@TRANSFORMS.register_module()
class SphereCrop:
    """Crop to the point_max nearest points around a random/center point;
    mode 'all' yields overlapping crops covering every point
    (reference: transform.py:899-998)."""

    def __init__(self, point_max=80000, sample_rate=None, mode="random"):
        self.point_max = point_max
        self.sample_rate = sample_rate
        assert mode in ("random", "center", "all")
        self.mode = mode

    def __call__(self, data_dict):
        point_max = (
            int(self.sample_rate * data_dict["coord"].shape[0])
            if self.sample_rate is not None
            else self.point_max
        )
        n = data_dict["coord"].shape[0]

        if self.mode == "all":
            if "index" not in data_dict:
                data_dict["index"] = np.arange(n)
            parts = []
            if n > point_max:
                coord_p = np.random.rand(n) * 1e-3
                covered = np.array([])
                while covered.size != data_dict["index"].shape[0]:
                    init_idx = np.argmin(coord_p)
                    dist2 = np.sum(
                        (data_dict["coord"] - data_dict["coord"][init_idx]) ** 2, 1
                    )
                    idx_crop = np.argsort(dist2)[:point_max]
                    part = {
                        k: data_dict[k][idx_crop]
                        for k in POINT_KEYS
                        if isinstance(data_dict.get(k), np.ndarray)
                        and data_dict[k].shape[:1] == (n,)
                    }
                    part["weight"] = dist2[idx_crop]
                    parts.append(part)
                    delta = np.square(1 - part["weight"] / np.max(part["weight"]))
                    coord_p[idx_crop] += delta
                    covered = np.unique(np.concatenate((covered, part["index"])))
            else:
                part = dict(data_dict)
                part["weight"] = np.zeros(n)
                parts.append(part)
            return parts

        if n > point_max:
            if self.mode == "random":
                center = data_dict["coord"][np.random.randint(n)]
            else:
                center = data_dict["coord"][n // 2]
            idx_crop = np.argsort(
                np.sum((data_dict["coord"] - center) ** 2, 1)
            )[:point_max]
            index_points(data_dict, idx_crop)
        return data_dict


@TRANSFORMS.register_module()
class ShufflePoint:
    def __call__(self, data_dict):
        assert "coord" in data_dict
        idx = np.random.permutation(data_dict["coord"].shape[0])
        return index_points(data_dict, idx)


@TRANSFORMS.register_module()
class CropBoundary:
    def __call__(self, data_dict):
        segment = data_dict["segment"].flatten()
        mask = (segment != 0) & (segment != 1)
        return index_points(data_dict, mask)


@TRANSFORMS.register_module()
class ContrastiveViewsGenerator:
    def __init__(
        self,
        view_keys=("coord", "color", "normal", "origin_coord"),
        view_trans_cfg=None,
    ):
        self.view_keys = view_keys
        self.view_trans = Compose(view_trans_cfg)

    def __call__(self, data_dict):
        for prefix in ("view1_", "view2_"):
            view = {k: data_dict[k].copy() for k in self.view_keys}
            view = self.view_trans(view)
            for k, v in view.items():
                data_dict[prefix + k] = v
        return data_dict


@TRANSFORMS.register_module()
class InstanceParser:
    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1):
        self.segment_ignore_index = segment_ignore_index
        self.instance_ignore_index = instance_ignore_index

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        segment = data_dict["segment"]
        instance = data_dict["instance"].copy()
        mask = ~np.isin(segment, self.segment_ignore_index)
        instance[~mask] = self.instance_ignore_index
        unique, inverse = np.unique(instance[mask], return_inverse=True)
        instance_num = len(unique)
        instance[mask] = inverse
        center = np.ones((coord.shape[0], 3)) * self.instance_ignore_index
        bbox = np.ones((instance_num, 6)) * self.instance_ignore_index
        for iid in range(instance_num):
            m = instance == iid
            pts = coord[m]
            center[m] = pts.mean(0)
            bbox[iid] = np.concatenate([pts.min(0), pts.max(0)])
        data_dict["instance"] = instance
        data_dict["instance_center"] = center
        data_dict["bbox"] = bbox
        return data_dict


class Compose:
    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        self.transforms = [TRANSFORMS.build(dict(t)) for t in self.cfg]

    def __call__(self, data_dict):
        for t in self.transforms:
            data_dict = t(data_dict)
        return data_dict
