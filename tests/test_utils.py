"""Tests for aux subsystems: logging, profiling, checkpoint/resume, camera
controls, cameras.json."""

import json
import math

import numpy as np
import jax.numpy as jnp
import pytest

from gaussiansplattingregistration_tpu.models.camera import (
    Camera,
    focal2fov,
    fov2focal,
    focal_lengths_from_spec,
)
from gaussiansplattingregistration_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from gaussiansplattingregistration_tpu.utils.logging import (
    CancelledError,
    ProgressReporter,
    RunLogger,
)
from gaussiansplattingregistration_tpu.utils.profiling import Stopwatch, timed


def test_run_logger_jsonl(tmp_path):
    path = str(tmp_path / "run.jsonl")
    rl = RunLogger(path)
    rl.metrics(step=1, fitness=0.9, rmse=0.01)
    with rl.phase("icp", scale=0.05):
        pass
    rl.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "metrics" and lines[0]["fitness"] == 0.9
    assert lines[1]["event"] == "phase_start"
    assert lines[2]["event"] == "phase_end" and lines[2]["seconds"] >= 0


def test_progress_reporter_cancellation():
    seen = []
    pr = ProgressReporter(seen.append)
    pr.report(50)
    assert seen == [50]
    pr.checkpoint()  # no-op before cancel
    pr.cancel()
    with pytest.raises(CancelledError):
        pr.checkpoint()


def test_stopwatch():
    sw = Stopwatch()
    with sw("phase_a"):
        pass
    with sw("phase_a"):
        pass
    s = sw.summary()
    assert s["phase_a"]["count"] == 2


def test_timed():
    import jax

    f = jax.jit(lambda x: x * 2)
    dt, out = timed(f, jnp.ones(4), iters=2)
    assert dt >= 0 and float(out[0]) == 2.0


def test_checkpoint_roundtrip(tmp_path, rng):
    import optax

    path = str(tmp_path / "ckpt")
    T = np.eye(4)
    T[0, 3] = 0.5
    twist = rng.normal(size=6)
    opt = optax.adam(1e-3)
    opt_state = opt.init(jnp.asarray(twist, jnp.float32))

    from gaussiansplattingregistration_tpu.ops.hem import MixtureLevel

    lvl = MixtureLevel(
        xyz=rng.normal(size=(5, 3)).astype(np.float32),
        colors=rng.normal(size=(5, 3)).astype(np.float32),
        opacities=rng.uniform(0, 1, 5).astype(np.float32),
        covariance=rng.normal(size=(5, 6)).astype(np.float32),
        features=rng.normal(size=(5, 9)).astype(np.float32),
    )
    save_checkpoint(
        path, T, twist=twist, opt_state=opt_state,
        loss_history=[1.0, 0.5], mixture_levels=[lvl],
        metadata={"note": "unit"},
    )
    restored = load_checkpoint(path, opt_state_template=opt_state)
    np.testing.assert_allclose(restored["transformation"], T)
    np.testing.assert_allclose(restored["twist"], twist)
    assert restored["loss_history"] == [1.0, 0.5]
    assert restored["metadata"] == {"note": "unit"}
    np.testing.assert_allclose(restored["mixture_levels"][0].xyz, lvl.xyz)
    # Optimizer state restored leaf-by-leaf.
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(restored["opt_state"]),
        jax.tree_util.tree_leaves(opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------- cameras

def make_cam():
    return Camera.create(np.eye(3), [0.0, 0.0, 4.0], 100.0, 100.0, 200, 150)


def test_camera_viewmat_roundtrip():
    cam = make_cam()
    V = np.asarray(cam.viewmat)
    cam2 = cam.with_viewmat(V)
    np.testing.assert_allclose(np.asarray(cam2.rotation), np.asarray(cam.rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam2.position), np.asarray(cam.position), atol=1e-6)


def test_camera_rotate_preserves_orthonormality():
    cam = make_cam().rotate(0.2, -0.1)
    R = np.asarray(cam.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_camera_translate():
    cam = make_cam()
    moved = cam.translate(100.0, 0.0)  # 100 px at fx=100 -> 1 world unit
    delta = np.asarray(moved.position - cam.position)
    np.testing.assert_allclose(delta, [1.0, 0.0, 0.0], atol=1e-6)


def test_camera_roll_and_zoom():
    cam = make_cam()
    rolled = cam.roll(10.0)
    R = np.asarray(rolled.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    zoomed = cam.zoom(1.0, [-1, -1, -1], [1, 1, 1])
    assert float(zoomed.position[2]) != float(cam.position[2])


def test_fov_focal_roundtrip():
    f = fov2focal(math.radians(60), 640)
    assert abs(focal2fov(f, 640) - math.radians(60)) < 1e-9
    fx, fy = focal_lengths_from_spec(640, 480, 60.0, 1)  # degrees auto-detected
    assert abs(fx - fov2focal(math.radians(60), 640)) < 1e-6
    fx2, fy2 = focal_lengths_from_spec(640, 480, fx, 2)
    assert abs(fx2 - fx) < 1e-9


def test_camera_from_json_entry():
    entry = {
        "img_name": "r_0",
        "width": 800,
        "height": 600,
        "fx": 700.0,
        "fy": 700.0,
        "rotation": np.eye(3).tolist(),
        "position": [0.0, 0.0, -3.0],
    }
    cam = Camera.from_json_entry(entry)
    assert cam.image_name == "r_0"
    assert cam.width == 800
    # W2C of (R=I, pos) inverted -> camera at z=-3 looking along +z.
    center = np.asarray(cam.cam_center)
    np.testing.assert_allclose(center, [0, 0, -3.0], atol=1e-5)


def test_camera_resized():
    cam = make_cam().resized(0.5)
    assert cam.width == 100 and cam.height == 75
    assert abs(float(cam.fx) - 50.0) < 1e-6
