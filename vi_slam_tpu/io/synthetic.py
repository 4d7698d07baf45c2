"""Synthetic worlds and sequences for tests and benchmarks.

No KITTI data ships with this machine, so end-to-end validation uses two
synthetic sources (SURVEY §4 implication — component-level numeric checks
vs known data):

  * `LandmarkWorld` — an "oracle feature" source: 3D landmarks with fixed
    random descriptors; frames are perfect/noisy projections with stereo
    disparity. Exercises tracking, mapping, and BA without the image
    frontend.
  * `BillboardWorld` — renders grayscale stereo images of textured quads
    ("billboards") so the full image pipeline (FAST/ORB/stereo SAD) runs.

Ground-truth trajectories are smooth forward motions with curvature,
KITTI-like scale (metres, ~10 fps).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from vi_slam_tpu.io.trajectory import rotation_to_quaternion  # noqa: F401


def make_trajectory(
    n_frames: int, speed: float = 1.0, yaw_rate: float = 0.005, seed: int = 0
) -> np.ndarray:
    """(N, 4, 4) Twc camera-to-world poses: forward (+z) motion with gentle
    yaw, camera x right / y down / z forward (KITTI convention)."""
    rng = np.random.default_rng(seed)
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])  # yaw about y (down)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
        fwd = R @ np.asarray([0.0, 0.0, 1.0])
        pos = pos + speed * fwd
        yaw += yaw_rate * (1.0 + 0.3 * np.sin(i * 0.05))
    return np.stack(poses)


class LandmarkWorld(NamedTuple):
    points: np.ndarray  # (L, 3) world positions
    desc: np.ndarray  # (L, 8) uint32 descriptors
    poses_wc: np.ndarray  # (N, 4, 4) ground-truth Twc


def make_landmark_world(
    n_frames: int = 60,
    n_landmarks: int = 4000,
    corridor_half_width: float = 12.0,
    seed: int = 0,
    speed: float = 1.0,
    yaw_rate: float = 0.005,
) -> LandmarkWorld:
    """Landmarks scattered in a corridor around the trajectory."""
    rng = np.random.default_rng(seed)
    poses = make_trajectory(n_frames, speed=speed, yaw_rate=yaw_rate, seed=seed)
    # scatter landmarks around the path, biased forward
    centers = poses[rng.integers(0, n_frames, n_landmarks), :3, 3]
    offs = np.stack(
        [
            rng.uniform(-corridor_half_width, corridor_half_width, n_landmarks),
            rng.uniform(-4.0, 2.0, n_landmarks),
            rng.uniform(2.0, 45.0, n_landmarks),
        ],
        axis=-1,
    )
    pts = centers + offs
    desc = rng.integers(0, 2 ** 32, size=(n_landmarks, 8), dtype=np.uint32)
    return LandmarkWorld(points=pts, desc=desc, poses_wc=poses)


def flip_descriptor_bits(
    desc: np.ndarray, n_bits: int, rng: np.random.Generator
) -> np.ndarray:
    """Simulate descriptor noise: flip n_bits random bits per descriptor."""
    out = desc.copy()
    n = desc.shape[0]
    for _ in range(n_bits):
        word = rng.integers(0, 8, n)
        bit = rng.integers(0, 32, n).astype(np.uint32)
        out[np.arange(n), word] ^= (np.uint32(1) << bit)
    return out


class OracleFrame(NamedTuple):
    """Per-frame oracle observation set (visible landmarks projected)."""

    xy: np.ndarray  # (V, 2) pixel positions (left)
    uright: np.ndarray  # (V,) right-image u (-1 if occluded from right)
    depth: np.ndarray  # (V,)
    desc: np.ndarray  # (V, 8)
    landmark_id: np.ndarray  # (V,) ground-truth association (for diagnostics)
    level: np.ndarray  # (V,) simulated pyramid level


def render_oracle_frame(
    world: LandmarkWorld,
    frame_idx: int,
    cam_fx: float,
    cam_fy: float,
    cam_cx: float,
    cam_cy: float,
    bf: float,
    width: int,
    height: int,
    max_features: int = 1200,
    px_noise: float = 0.3,
    desc_noise_bits: int = 8,
    seed: int = 100,
) -> OracleFrame:
    rng = np.random.default_rng(seed + frame_idx)
    Twc = world.poses_wc[frame_idx]
    Rcw = Twc[:3, :3].T
    tcw = -Rcw @ Twc[:3, 3]
    pc = (Rcw @ world.points.T).T + tcw
    z = pc[:, 2]
    u = cam_fx * pc[:, 0] / np.maximum(z, 1e-6) + cam_cx
    v = cam_fy * pc[:, 1] / np.maximum(z, 1e-6) + cam_cy
    ur = u - bf / np.maximum(z, 1e-6)
    # each landmark is a physical feature with an intrinsic scale: d0 is
    # the distance at which it is detected at pyramid level 0; it is only
    # detectable within its 8-octave band (level in [0, 7]), and its
    # octave follows the geometric model the pipeline's PredictScale and
    # scale-range gates assume (mappoint.h:164-170)
    d0 = np.exp(
        np.random.default_rng(777).uniform(
            np.log(8.0), np.log(70.0), world.points.shape[0]
        )
    )
    lvl_f = np.log(d0 / np.maximum(z, 1e-6)) / np.log(1.2)
    vis = (
        (z > 1.0) & (z < 60.0)
        & (u >= 5) & (u < width - 5) & (v >= 5) & (v < height - 5)
        & (lvl_f > -0.5) & (lvl_f < 7.5)
    )
    ids = np.where(vis)[0]
    if ids.shape[0] > max_features:
        # deterministic subselection (lowest ids) so consecutive frames see
        # a consistent feature set, as a real detector would
        ids = np.sort(ids)[:max_features]
    u = u[ids] + rng.normal(0, px_noise, ids.shape[0])
    v = v[ids] + rng.normal(0, px_noise, ids.shape[0])
    ur = ur[ids] + rng.normal(0, px_noise, ids.shape[0])
    desc = flip_descriptor_bits(world.desc[ids], desc_noise_bits, rng)
    level = np.clip(np.round(lvl_f[ids]).astype(int), 0, 7)
    return OracleFrame(
        xy=np.stack([u, v], axis=-1),
        uright=ur,
        depth=z[ids],
        desc=desc,
        landmark_id=ids,
        level=level.astype(np.int32),
    )


class BillboardWorld(NamedTuple):
    centers: np.ndarray  # (B, 3)
    sizes: np.ndarray  # (B,)
    intensities: np.ndarray  # (B,)
    poses_wc: np.ndarray  # (N, 4, 4)
    textures: np.ndarray  # (B, G, G) per-board intensity pattern


def make_billboard_world(
    n_frames: int = 40,
    n_boards: int = 3000,
    seed: int = 1,
    speed: float = 0.8,
    yaw_rate: float = 0.004,
    texture_cells: int = 5,
) -> BillboardWorld:
    rng = np.random.default_rng(seed)
    poses = make_trajectory(n_frames, speed=speed, yaw_rate=yaw_rate, seed=seed)
    centers = poses[rng.integers(0, n_frames, n_boards), :3, 3]
    offs = np.stack(
        [
            rng.uniform(-15.0, 15.0, n_boards),
            rng.uniform(-5.0, 3.0, n_boards),
            rng.uniform(3.0, 50.0, n_boards),
        ],
        axis=-1,
    )
    intensities = rng.uniform(60.0, 255.0, n_boards)
    # per-board procedural texture: a coarse random intensity grid. A flat
    # quad makes every corner descriptor-identical (ORB aliases across
    # boards and tracking degenerates); a distinctive pattern that sticks
    # to the board gives the frontend real, repeatable structure.
    G = texture_cells
    tex = rng.uniform(30.0, 255.0, (n_boards, G, G)).astype(np.float32)
    return BillboardWorld(
        centers=centers + offs,
        sizes=rng.uniform(0.15, 0.6, n_boards),
        intensities=intensities,
        poses_wc=poses,
        textures=tex,
    )


def render_billboard_image(
    world: BillboardWorld,
    Twc: np.ndarray,
    cam_fx: float,
    cam_fy: float,
    cam_cx: float,
    cam_cy: float,
    width: int,
    height: int,
    baseline: float = 0.0,
    background: float = 20.0,
) -> np.ndarray:
    """Rasterize billboards as depth-sorted textured rectangles (approximate
    perspective: screen-aligned squares sized by depth; the texture is
    sampled in board-relative coordinates so it is view-consistent).
    baseline shifts the camera right (for the right stereo view)."""
    Rcw = Twc[:3, :3].T
    tw = Twc[:3, 3] + Twc[:3, :3] @ np.asarray([baseline, 0.0, 0.0])
    tcw = -Rcw @ tw
    pc = (Rcw @ world.centers.T).T + tcw
    z = pc[:, 2]
    vis = z > 1.0
    img = np.full((height, width), background, np.float32)
    u = cam_fx * pc[:, 0] / np.maximum(z, 1e-6) + cam_cx
    v = cam_fy * pc[:, 1] / np.maximum(z, 1e-6) + cam_cy
    half_w = cam_fx * world.sizes / np.maximum(z, 1e-6) * 0.5
    half_h = cam_fy * world.sizes / np.maximum(z, 1e-6) * 0.5
    G = world.textures.shape[1]
    order = np.argsort(-z)  # far to near
    for i in order:
        if not vis[i]:
            continue
        x0 = int(np.floor(u[i] - half_w[i]))
        x1 = int(np.ceil(u[i] + half_w[i]))
        y0 = int(np.floor(v[i] - half_h[i]))
        y1 = int(np.ceil(v[i] + half_h[i]))
        if x1 < 0 or y1 < 0 or x0 >= width or y0 >= height:
            continue
        if x1 - x0 < 1 or y1 - y0 < 1:
            continue
        x0c, x1c = max(x0, 0), min(x1, width)
        y0c, y1c = max(y0, 0), min(y1, height)
        if x1 - x0 < 4 or y1 - y0 < 4:
            # too small to resolve texture: flat fill
            img[y0c:y1c, x0c:x1c] = world.intensities[i]
            continue
        # board-relative texture coordinates (nearest-neighbour sample)
        xs = np.arange(x0c, x1c)
        ys = np.arange(y0c, y1c)
        tx = ((xs - x0) * G) // max(x1 - x0, 1)
        ty = ((ys - y0) * G) // max(y1 - y0, 1)
        tx = np.clip(tx, 0, G - 1)
        ty = np.clip(ty, 0, G - 1)
        img[y0c:y1c, x0c:x1c] = world.textures[i][np.ix_(ty, tx)]
    return img


class InertialWorld(NamedTuple):
    """LandmarkWorld + synchronized IMU stream with known calibration."""

    world: LandmarkWorld
    imu_per_frame: List[np.ndarray]  # frame i: (n_i, 7) [t, acc3, gyro3] in (t_{i-1}, t_i]
    vel_w: np.ndarray  # (N, 3) ground-truth body velocity at frame times
    gravity_w: np.ndarray  # (3,) gravity acceleration vector in world frame
    bias_gyro: np.ndarray  # (3,) true constant gyro bias
    bias_acc: np.ndarray  # (3,)
    timestamps: np.ndarray  # (N,) frame times


def make_inertial_world(
    n_frames: int = 40,
    fps: float = 10.0,
    imu_rate: float = 200.0,
    n_landmarks: int = 6000,
    corridor_half_width: float = 12.0,
    seed: int = 0,
    speed: float = 1.2,
    bias_gyro=(0.002, -0.001, 0.0015),
    bias_acc=(0.05, -0.03, 0.02),
    noise_gyro: float = 1.7e-4,
    noise_acc: float = 2.0e-3,
    excitation: float = 1.0,
    closed_loop: bool = False,
    closed_loop_period_frames: int = 0,
) -> InertialWorld:
    """Analytic smooth trajectory (closed-form velocity/acceleration) in the
    KITTI camera convention (x right, y down, z forward; gravity +y) with
    exact IMU measurements: accel_b = R_wb^T (a_w - g_w) + b_a + n,
    gyro_b = omega_b + b_g + n. Body frame == camera frame (T_bc = I
    variant; pipelines with extrinsics pre-compose them)."""
    rng = np.random.default_rng(seed)
    g_w = np.asarray([0.0, 9.81, 0.0])

    # `excitation` scales the oscillation amplitudes: mono-inertial scale
    # is only observable under real acceleration (the reason MAV datasets
    # wiggle); 1.0 keeps the gentle default, ~4 gives MAV-like dynamics
    ax_, wx_ = 0.8 * excitation, 0.5
    ay_, wy_ = 0.15 * excitation, 0.9
    az_, wz_ = 0.5 * excitation, 0.4
    yaw0, wyaw = 0.25, 0.3

    def pos(t):
        return np.stack(
            [ax_ * np.sin(wx_ * t), ay_ * np.sin(wy_ * t),
             speed * t + az_ * np.sin(wz_ * t)], axis=-1)

    def vel(t):
        return np.stack(
            [ax_ * wx_ * np.cos(wx_ * t), ay_ * wy_ * np.cos(wy_ * t),
             speed + az_ * wz_ * np.cos(wz_ * t)], axis=-1)

    def acc(t):
        return np.stack(
            [-ax_ * wx_ ** 2 * np.sin(wx_ * t), -ay_ * wy_ ** 2 * np.sin(wy_ * t),
             -az_ * wz_ ** 2 * np.sin(wz_ * t)], axis=-1)

    def yaw(t):
        return yaw0 * np.sin(wyaw * t)

    def yawdot(t):
        return yaw0 * wyaw * np.cos(wyaw * t)

    if closed_loop:
        # Circular return-to-start path (heading tangent to the circle):
        # the last frame re-observes the first frame's scene, which is the
        # geometry loop-closure benchmarks need (LoopClosing::Run,
        # loopclosing.cpp:44-253). Arc speed matches `speed`; the lateral
        # oscillation keeps IMU excitation for bias observability.
        # period defaults to the whole sequence (loop closes exactly at
        # the last frame); a shorter period makes the tail re-traverse
        # the start — the regime loop-closure benchmarks need
        period = closed_loop_period_frames or n_frames
        T_total = period / fps
        w_c = 2.0 * np.pi / T_total
        Rr = speed / w_c

        def pos(t):  # noqa: F811
            th = w_c * np.asarray(t)
            return np.stack(
                [Rr * (1.0 - np.cos(th)), ay_ * np.sin(wy_ * t),
                 Rr * np.sin(th)], axis=-1)

        def vel(t):  # noqa: F811
            th = w_c * np.asarray(t)
            return np.stack(
                [Rr * w_c * np.sin(th), ay_ * wy_ * np.cos(wy_ * t),
                 Rr * w_c * np.cos(th)], axis=-1)

        def acc(t):  # noqa: F811
            th = w_c * np.asarray(t)
            return np.stack(
                [Rr * w_c ** 2 * np.cos(th),
                 -ay_ * wy_ ** 2 * np.sin(wy_ * t),
                 -Rr * w_c ** 2 * np.sin(th)], axis=-1)

        def yaw(t):  # noqa: F811
            return w_c * np.asarray(t)

        def yawdot(t):  # noqa: F811
            return w_c * np.ones_like(np.asarray(t))

    def roty(y):
        c, s = np.cos(y), np.sin(y)
        R = np.zeros((*np.shape(y), 3, 3))
        R[..., 0, 0] = c
        R[..., 0, 2] = s
        R[..., 1, 1] = 1.0
        R[..., 2, 0] = -s
        R[..., 2, 2] = c
        return R

    t_frames = np.arange(n_frames) / fps
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    poses[:, :3, :3] = roty(yaw(t_frames))
    poses[:, :3, 3] = pos(t_frames)

    # landmarks in a corridor around the path
    centers = poses[rng.integers(0, n_frames, n_landmarks), :3, 3]
    offs = np.stack(
        [
            rng.uniform(-corridor_half_width, corridor_half_width, n_landmarks),
            rng.uniform(-4.0, 2.0, n_landmarks),
            rng.uniform(2.0, 45.0, n_landmarks),
        ],
        axis=-1,
    )
    pts = centers + offs
    desc = rng.integers(0, 2 ** 32, size=(n_landmarks, 8), dtype=np.uint32)
    world = LandmarkWorld(points=pts, desc=desc, poses_wc=poses)

    bg = np.asarray(bias_gyro)
    ba = np.asarray(bias_acc)
    sg = noise_gyro * np.sqrt(imu_rate)
    sa = noise_acc * np.sqrt(imu_rate)
    imu_per_frame: List[np.ndarray] = [np.zeros((0, 7))]
    dt_imu = 1.0 / imu_rate
    for i in range(1, n_frames):
        ts = np.arange(t_frames[i - 1] + dt_imu, t_frames[i] + dt_imu / 2, dt_imu)
        Rwb = roty(yaw(ts))  # (n,3,3) body-to-world
        a_b = np.einsum("nji,nj->ni", Rwb, acc(ts) - g_w[None, :])
        w_b = np.einsum(
            "nji,nj->ni", Rwb,
            np.stack([np.zeros_like(ts), yawdot(ts), np.zeros_like(ts)], -1),
        )
        a_b = a_b + ba[None, :] + rng.normal(0, sa, a_b.shape)
        w_b = w_b + bg[None, :] + rng.normal(0, sg, w_b.shape)
        imu_per_frame.append(
            np.concatenate([ts[:, None], a_b, w_b], axis=1)
        )
    vels = vel(t_frames)
    return InertialWorld(
        world=world, imu_per_frame=imu_per_frame, vel_w=vels,
        gravity_w=g_w, bias_gyro=bg, bias_acc=ba, timestamps=t_frames,
    )


def make_billboard_inertial_sequence(
    n_frames: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    bf: float,
    fps: float = 10.0,
    n_landmarks: int = 2000,
    n_boards: int = 4000,
    seed: int = 5,
    excitation: float = 1.0,
    closed_loop: bool = False,
    closed_loop_period_frames: int = 0,
    speed: float = 1.2,
) -> Tuple[InertialWorld, BillboardWorld, List]:
    """Shared image+IMU bench sequence: an inertial world plus textured
    billboards rendered as stereo pairs along its trajectory (the world
    bench_vio.py / diagnostics / loop benches all draw from, so their
    numbers are comparable). Returns (inertial_world, billboard_world,
    [(imgL, imgR), ...]). With closed_loop=True the trajectory returns to
    its start (loop-closure benchmarkable, LoopClosing::Run semantics)."""
    iw = make_inertial_world(
        n_frames=n_frames, fps=fps, n_landmarks=n_landmarks, seed=seed,
        excitation=excitation, speed=speed, closed_loop=closed_loop,
        closed_loop_period_frames=closed_loop_period_frames,
    )
    poses = iw.world.poses_wc
    rng = np.random.default_rng(seed + 2)
    centers = poses[rng.integers(0, n_frames, n_boards), :3, 3]
    offs = np.stack(
        [rng.uniform(-14.0, 14.0, n_boards),
         rng.uniform(-6.0, 3.0, n_boards),
         rng.uniform(2.0, 45.0, n_boards)], axis=-1,
    )
    G = 5
    bw = BillboardWorld(
        centers=centers + offs,
        sizes=rng.uniform(0.15, 0.7, n_boards),
        intensities=rng.uniform(60.0, 255.0, n_boards),
        poses_wc=poses,
        textures=rng.uniform(30.0, 255.0, (n_boards, G, G)).astype(
            np.float32
        ),
    )
    frames = []
    for i in range(n_frames):
        imgL = render_billboard_image(
            bw, poses[i], fx, fy, cx, cy, width, height, baseline=0.0)
        imgR = render_billboard_image(
            bw, poses[i], fx, fy, cx, cy, width, height, baseline=bf / fx)
        frames.append((imgL, imgR))
    return iw, bw, frames


def render_oracle_frame_fisheye(
    world: LandmarkWorld,
    frame_idx: int,
    cam,  # KB8Params
    bf: float,
    width: int,
    height: int,
    max_features: int = 1200,
    px_noise: float = 0.3,
    desc_noise_bits: int = 8,
    seed: int = 100,
) -> OracleFrame:
    """Oracle observations through a Kannala-Brandt fisheye: projections
    via kb8.project, depth = camera z, and the pseudo-disparity right
    coordinate u_r = u - bf/z that the KB8 stereo pipeline uses after
    TriangulateMatches (kannalabrandt8.h:87 rig semantics)."""
    import jax.numpy as jnp

    from vi_slam_tpu.cameras import kb8 as kb8_mod

    rng = np.random.default_rng(seed + frame_idx)
    Twc = world.poses_wc[frame_idx]
    Rcw = Twc[:3, :3].T
    tcw = -Rcw @ Twc[:3, 3]
    pc = (Rcw @ world.points.T).T + tcw
    z = pc[:, 2]
    uv = np.asarray(kb8_mod.project(cam, jnp.asarray(pc, jnp.float32)))
    u, v = uv[:, 0], uv[:, 1]
    ur = u - bf / np.maximum(z, 1e-6)
    # each landmark is a physical feature with an intrinsic scale: d0 is
    # the distance at which it is detected at pyramid level 0; it is only
    # detectable within its 8-octave band (level in [0, 7]), and its
    # octave follows the geometric model the pipeline's PredictScale and
    # scale-range gates assume (mappoint.h:164-170)
    d0 = np.exp(
        np.random.default_rng(777).uniform(
            np.log(8.0), np.log(70.0), world.points.shape[0]
        )
    )
    lvl_f = np.log(d0 / np.maximum(z, 1e-6)) / np.log(1.2)
    vis = (
        (z > 1.0) & (z < 60.0)
        & (u >= 5) & (u < width - 5) & (v >= 5) & (v < height - 5)
        & (lvl_f > -0.5) & (lvl_f < 7.5)
    )
    ids = np.where(vis)[0]
    if ids.shape[0] > max_features:
        ids = np.sort(ids)[:max_features]
    u = u[ids] + rng.normal(0, px_noise, ids.shape[0])
    v = v[ids] + rng.normal(0, px_noise, ids.shape[0])
    ur = ur[ids] + rng.normal(0, px_noise, ids.shape[0])
    desc = flip_descriptor_bits(world.desc[ids], desc_noise_bits, rng)
    level = np.clip(np.round(lvl_f[ids]).astype(int), 0, 7)
    return OracleFrame(
        xy=np.stack([u, v], axis=-1),
        uright=ur,
        depth=z[ids],
        desc=desc,
        landmark_id=ids,
        level=level.astype(np.int32),
    )
