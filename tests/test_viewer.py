"""Interactive viewer server: HTTP endpoints against the real rasterizer.

Counterpart coverage for the reference's interactive visualization windows
(`/root/reference/src/gui/windows/visualization/rasterization_window.py`),
realized as a browser page + stateless render endpoint (pipelines/viewer.py).
"""

import io
import json
import urllib.request

import numpy as np
import pytest

from gaussiansplattingregistration_tpu.ops.rasterize import RasterizeConfig
from gaussiansplattingregistration_tpu.pipelines import viewer
from tests.conftest import make_random_cloud


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(5)
    cloud = make_random_cloud(rng, n=200, sh_degree=1, scale_range=(0.05, 0.15))
    cfg = RasterizeConfig(max_splats_per_tile=64, tile_chunk=4, backend="xla")
    srv, scene = viewer.serve(cloud, port=0, width=128, height=96, config=cfg)
    try:
        yield srv
    finally:
        srv.shutdown()


def _get(server, path):
    host, port = server.server_address[:2]
    with urllib.request.urlopen(f"http://{host}:{port}{path}", timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_page(server):
    code, ctype, body = _get(server, "/")
    assert code == 200 and ctype.startswith("text/html")
    assert b"/render?" in body          # the JS drives the render endpoint


def test_viewer_state(server):
    code, ctype, body = _get(server, "/state")
    assert code == 200
    st = json.loads(body)
    assert st["num_points"] == 200 and st["sh_degree"] == 1
    assert st["aabb_min"][0] < st["aabb_max"][0]


def test_viewer_render_default_and_orbit(server):
    from PIL import Image

    code, ctype, body = _get(server, "/render?w=128&h=96")
    assert code == 200 and ctype == "image/png"
    img0 = np.asarray(Image.open(io.BytesIO(body)))
    assert img0.shape == (96, 128, 3)
    # Scene must actually be visible (not all background).
    assert img0.std() > 1.0

    # Orbit + zoom + pan change the frame (the mouse mapping's parameters).
    code, _, body2 = _get(
        server, "/render?w=128&h=96&yaw=0.5&pitch=0.2&zoom=-3&panx=40&pany=-20"
    )
    assert code == 200
    img1 = np.asarray(Image.open(io.BytesIO(body2)))
    assert img1.shape == (96, 128, 3)
    assert np.abs(img1.astype(int) - img0.astype(int)).mean() > 0.5


def test_viewer_render_bad_params(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server, "/render?w=nan&h=96")
    assert exc.value.code == 500   # surfaced, server stays alive
    code, _, body = _get(server, "/render?w=128&h=96")
    assert code == 200
