"""Camera model parameter containers.

Semantic reference: the reference's abstract `Camera` interface
(`/root/reference/include/vi_slam/geometry/cameramodels/camera.h:38-111`):
project / unproject / projection Jacobian / triangulate / epipolar check.

Rather than virtual dispatch we keep a flat parameter struct plus
module-level function families (`pinhole.project`, `kb8.project`, ...);
the model choice is a static (compile-time) switch in the pipeline config,
so every jitted kernel specializes to one model — no branching on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraParams(NamedTuple):
    """Intrinsics for either model.

    fx, fy, cx, cy: focal lengths / principal point (pixels).
    dist: distortion coefficients.
      - pinhole (radtan): [k1, k2, p1, p2, k3] (any suffix may be zero)
      - kb8 (Kannala-Brandt equidistant): [k1, k2, k3, k4, 0]
    width, height: image size in pixels (static Python ints in practice).
    bf: stereo baseline * fx (pixels * metres), 0 for mono rigs
        (reference: `bf` in config/KITTI00-Stereo.yaml, frame.h mbf).
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,)
    bf: jnp.ndarray

    @classmethod
    def make(cls, fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0, 0.0), bf=0.0,
             dtype=jnp.float32) -> "CameraParams":
        d = jnp.zeros((5,), dtype=dtype).at[: len(tuple(dist))].set(
            jnp.asarray(tuple(dist), dtype=dtype)
        )
        return cls(
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype),
            cy=jnp.asarray(cy, dtype),
            dist=d,
            bf=jnp.asarray(bf, dtype),
        )

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    @property
    def baseline(self) -> jnp.ndarray:
        return self.bf / self.fx


class KB8Params(CameraParams):
    """Kannala-Brandt-8 fisheye intrinsics (dist = [k1, k2, k3, k4, 0]).

    The concrete pytree TYPE is the model switch (the reference's virtual
    `Camera` dispatch, camera.h:38-111, made static): `cameras.dispatch`
    picks the kb8 function family via isinstance at trace time, so every
    jitted kernel specializes to exactly one model — no device branching,
    and a model change recompiles (treedefs differ).
    """
