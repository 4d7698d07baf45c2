"""Static camera-model dispatch.

Semantic reference: the reference's abstract `Camera` interface with
virtual project/unproject/projectJac
(`/root/reference/include/vi_slam/geometry/cameramodels/camera.h:38-111`,
implemented by `pinhole.cpp` and `kannalabrandt8.cpp`).

TPU redesign: dispatch happens at TRACE time on the concrete pytree type
of the parameter struct (`KB8Params` vs `CameraParams`), so every jitted
pipeline kernel specializes to one model with zero device-side branching;
switching models changes the treedef and recompiles — exactly the jit
contract the rest of the pipeline assumes.
"""

from __future__ import annotations

import jax.numpy as jnp

from vi_slam_tpu.cameras import kb8, pinhole
from vi_slam_tpu.cameras.base import CameraParams, KB8Params


def _mod(cam: CameraParams):
    return kb8 if isinstance(cam, KB8Params) else pinhole


def project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    return _mod(cam).project(cam, xyz)


def project_jac(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    return _mod(cam).project_jac(cam, xyz)


def unproject(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    return _mod(cam).unproject(cam, uv)


def stereo_project(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    return _mod(cam).stereo_project(cam, xyz)


def stereo_project_jac(cam: CameraParams, xyz: jnp.ndarray) -> jnp.ndarray:
    return _mod(cam).stereo_project_jac(cam, xyz)
