"""Perspective camera: host-side matrix build + batched ray generation.

Reference: crates/akari_render/src/camera/mod.rs:69-153 (raster->camera
matrix chain, c2w transform applied to origin+direction) and
load.rs:172-194 (fov in degrees, lens_radius = focal_distance / (2 fstop);
depth of field is stored but not sampled in the reference — same here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .core.math import normalize, transform_point, transform_vector
from .scenegraph.model import load_transform


class PerspectiveCamera(NamedTuple):
    c2w: jnp.ndarray  # [4, 4]
    w2c: jnp.ndarray  # [4, 4]
    r2c: jnp.ndarray  # [4, 4] raster -> camera
    width: int
    height: int
    fov: float  # radians
    lens_radius: float
    focal_distance: float


def _raster_to_camera(width: int, height: int, fov_rad: float) -> np.ndarray:
    """Raster (pixel) -> camera-space point at z=-1 plane (camera/mod.rs:119-141)."""

    def scale(x, y, z):
        m = np.eye(4)
        m[0, 0], m[1, 1], m[2, 2] = x, y, z
        return m

    def translate(x, y, z):
        m = np.eye(4)
        m[:3, 3] = [x, y, z]
        return m

    m = np.eye(4)
    m = scale(1.0 / width, 1.0 / height, 1.0) @ m
    m = scale(2.0, 2.0, 1.0) @ m
    m = translate(-1.0, -1.0, 0.0) @ m
    m = scale(1.0, -1.0, 1.0) @ m
    s = np.tan(fov_rad / 2.0)
    if width > height:
        m = scale(s, s * height / width, 1.0) @ m
    else:
        m = scale(s * width / height, s, 1.0) @ m
    m = translate(0.0, 0.0, -1.0) @ m
    return m


def camera_from_scenegraph(cam: dict, width: int | None = None, height: int | None = None) -> PerspectiveCamera:
    assert cam["type"] == "perspective", cam["type"]
    d = cam["data"]
    c2w = load_transform(d["transform"], is_camera=True)
    fov = float(np.deg2rad(d["fov"]))
    width = width or int(d["sensor_width"])
    height = height or int(d["sensor_height"])
    fstop = float(d.get("fstop", 0.0) or 0.0)
    focal_distance = float(d.get("focal_distance", 0.0) or 0.0)
    lens_radius = focal_distance / (2.0 * fstop) if fstop > 0 else 0.0
    r2c = _raster_to_camera(width, height, fov)
    return PerspectiveCamera(
        c2w=jnp.asarray(c2w, jnp.float32),
        w2c=jnp.asarray(np.linalg.inv(c2w), jnp.float32),
        r2c=jnp.asarray(r2c, jnp.float32),
        width=width,
        height=height,
        fov=fov,
        lens_radius=lens_radius,
        focal_distance=focal_distance,
    )


def generate_rays(camera: PerspectiveCamera, p_film):
    """Raster positions [N, 2] (already filter-jittered, pixel centers at +0.5)
    -> (ray_o [N, 3], ray_d [N, 3]) in world space (camera/mod.rs:69-103)."""
    n = p_film.shape[0]
    p = jnp.concatenate([p_film, jnp.zeros((n, 1), p_film.dtype)], axis=-1)
    d_cam = normalize(transform_point(camera.r2c, p))
    o = jnp.broadcast_to(transform_point(camera.c2w, jnp.zeros((3,), jnp.float32)), (n, 3))
    d = transform_vector(camera.c2w, d_cam)
    return o, d
