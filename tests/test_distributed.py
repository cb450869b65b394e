"""Multi-host smoke test: 2 CPU processes over a localhost coordinator.

The only multi-host signal available without a pod slice (SURVEY.md §2.9
multi-host row): spawn two fresh Python processes, `distributed.initialize`
them against a local coordinator, build a global mesh, and run one psum'd
sharded computation plus one sharded photometric train step. Exercises
`parallel/distributed.py`, which previously had zero callers.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})

from gaussiansplattingregistration_tpu.parallel import distributed

distributed.initialize(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = distributed.global_mesh(data=1)
assert mesh.devices.size == 4

# One psum'd sharded computation across hosts.
def body(x):
    return jax.lax.psum(jnp.sum(x), "splat")

total = jax.jit(jax.shard_map(
    body, mesh=mesh, in_specs=P("splat"), out_specs=P(), check_vma=False,
))(jnp.arange(8.0))
assert float(total) == 28.0, float(total)

# One sharded photometric train step across both hosts.
import math
from gaussiansplattingregistration_tpu.models.camera import Camera
from gaussiansplattingregistration_tpu.models.gaussian_cloud import GaussianCloud
from gaussiansplattingregistration_tpu.ops import math3d
from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig
from gaussiansplattingregistration_tpu.parallel.mesh import make_mesh
from gaussiansplattingregistration_tpu.parallel.train_step import (
    make_photometric_train_step, shard_splats,
)

rng = np.random.default_rng(0)
n = 32
cloud = GaussianCloud.create(
    xyz=rng.uniform(-1, 1, size=(n, 3)).astype(np.float32),
    features_dc=(rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32),
    features_rest=np.zeros((n, 3, 3), np.float32),
    opacity=np.full((n, 1), 1.0, np.float32),
    scaling=np.log(rng.uniform(0.05, 0.15, size=(n, 3))).astype(np.float32),
    rotation=rng.normal(size=(n, 4)).astype(np.float32),
    sh_degree=1,
)
width = height = 32
config = RasterizeConfig(max_tiles_per_splat=4, max_splats_per_tile=16,
                         tile_chunk=1)
mesh2 = make_mesh(data=2, splat=2, devices=jax.devices())
step, init, pad_targets = make_photometric_train_step(
    mesh2, width, height, cloud.sh_degree, config
)
splats = shard_splats(cloud, mesh2)
f = width / (2 * math.tan(math.radians(60) / 2))
cams = [Camera.create(np.eye(3), [0.0, 0.0, 4.0], f, f, width, height)
        for _ in range(2)]
viewmats = jnp.stack([c.viewmat for c in cams])
intrinsics = jnp.stack([c.intrinsics for c in cams])
targets = pad_targets(jnp.asarray(
    rng.uniform(0, 1, size=(2, height, width, 3)), jnp.float32))
data_shard = NamedSharding(mesh2, P("data"))
viewmats = jax.device_put(viewmats, data_shard)
intrinsics = jax.device_put(intrinsics, data_shard)
targets = jax.device_put(targets, data_shard)
xi, opt_state = init()
xi, opt_state, loss, dropped = step(xi, opt_state, splats, viewmats,
                                    intrinsics, targets)
assert np.isfinite(float(loss)), float(loss)
if distributed.is_primary():
    print("MULTIHOST_OK", float(loss))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord))

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-3000:]}"
    assert any("MULTIHOST_OK" in out for _, out, _ in outs)
