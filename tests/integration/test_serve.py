"""Live HTTP viewer loop (engine.serve): drives the real server over HTTP
on a tiny CPU render — the reference's interactive loop
(include/viewer.hpp:659-845) minus the window."""

import json
import time
import urllib.request

import numpy as np
import pytest

from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.engine.serve import OrbitCamera, ViewerServer
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("cornell_serve")
    scene_path = procedural.write_cornell_scene(str(d))
    scene = parse_scene(scene_path)
    r = Renderer(scene, width=32, height=32, mode=RendererType.NORMALS)
    s = ViewerServer(r, scene_path=scene_path, port=0,
                     out_dir=str(tmp_path_factory.mktemp("shots")))
    s.start()
    yield s
    s.shutdown()


def _get(server, path, tries=3):
    for i in range(tries):
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}{path}", timeout=180
            ) as f:
                return f.read()
        except OSError:
            if i == tries - 1:
                raise
            time.sleep(0.5)


def _post(server, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/control",
        data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=180) as f:
        return json.loads(f.read())


def _wait_spp(server, n, timeout=60.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if json.loads(_get(server, "/status"))["accum_id"] >= n:
            return
        time.sleep(0.05)
    raise TimeoutError(f"accum never reached {n}")


def test_page_and_frame(server):
    page = _get(server, "/")
    assert b"optix_renderer_tpu" in page
    _wait_spp(server, 1)
    png = _get(server, "/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    status = json.loads(_get(server, "/status"))
    assert status["mode_name"] == "Normals"
    assert status["width"] == 32


def test_mode_switch_resets_accum(server):
    _wait_spp(server, 1)
    assert _post(server, {"op": "mode", "mode": int(RendererType.MASK)})["ok"]
    _wait_spp(server, 1)  # re-renders in the new mode
    status = json.loads(_get(server, "/status"))
    assert status["mode"] == int(RendererType.MASK)
    # MASK of a closed box is all-white -> PNG of constant 1.0
    png = _get(server, "/frame.png")
    from io import BytesIO

    from PIL import Image

    img = np.asarray(Image.open(BytesIO(png)))
    assert (img[..., :3] == 255).all()
    _post(server, {"op": "mode", "mode": int(RendererType.NORMALS)})


def test_orbit_changes_camera_and_restarts(server):
    _wait_spp(server, 1)
    before = np.array(server.cam.from_)
    assert _post(server, {"op": "orbit", "daz": 0.5, "del": 0.0})["ok"]
    after = np.array(server.cam.from_)
    assert not np.allclose(before, after)
    # distance to the look-at point is preserved by orbiting
    r0 = np.linalg.norm(before - server.cam.at)
    r1 = np.linalg.norm(after - server.cam.at)
    assert abs(r0 - r1) < 1e-6 * max(r0, 1.0)
    _wait_spp(server, 1)
    assert _post(server, {"op": "reset"})["ok"]
    assert np.allclose(server.cam.from_, before)


def test_record_camera_appends_to_scene_json(server):
    with open(server.scene_path) as f:
        n_before = len(json.load(f).get("cameras", []))
    assert _post(server, {"op": "record"})["ok"]
    with open(server.scene_path) as f:
        cams = json.load(f)["cameras"]
    assert len(cams) == n_before + 1
    assert set(cams[-1]) == {"from", "to", "up", "cos_fovy"}


def test_screenshot(server):
    _wait_spp(server, 1)
    out = _post(server, {"op": "screenshot"})
    assert out["ok"]
    with open(out["path"], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_orbit_camera_math():
    cam = OrbitCamera(_mk_cam())
    v0 = cam.from_ - cam.at
    cam.orbit(np.pi / 2, 0.0)
    v1 = cam.from_ - cam.at
    assert abs(np.linalg.norm(v0) - np.linalg.norm(v1)) < 1e-9
    assert abs(float(np.dot(v0, v1))) < 1e-6 * float(np.dot(v0, v0))  # 90 deg
    cam.zoom(0.5)
    assert abs(np.linalg.norm(cam.from_ - cam.at) - 0.5 * np.linalg.norm(v1)) < 1e-9


def _mk_cam():
    from optix_renderer_tpu.scene.config import SceneCamera

    return SceneCamera(
        from_=np.array([0.0, 0.0, 5.0], np.float32),
        at=np.zeros(3, np.float32),
        up=np.array([0.0, 1.0, 0.0], np.float32),
        cos_fovy=0.66,
    )


class _SlowFakeRenderer:
    """Renderer stand-in whose frames take ``frame_s`` seconds (a
    terrain-class scene): proves the serve loop renders OUTSIDE the lock
    (round-4 fix) — /status and /control must answer in milliseconds
    while a frame is in flight, and a camera op mid-frame discards the
    stale frame instead of committing it."""

    class _State:
        def __init__(self, accum_id):
            self.accum = np.zeros((1, 1, 3), np.float32)
            self.accum_id = accum_id

    def __init__(self, frame_s=1.5):
        import threading as _t

        self.frame_s = frame_s
        self.width = self.height = 8
        self.mode = RendererType.PATH
        self.state = self._State(0)
        self.scene = type("S", (), {"cameras": [_mk_cam()]})()
        self.metrics = {"mrays_per_sec": 0.0}
        self.commits = 0
        self.discarded_epochs = []
        self._lock = _t.Lock()

    def render_step_detached(self):
        time.sleep(self.frame_s)
        return self._State(int(self.state.accum_id) + 1), None, {}

    def commit_step(self, state, gb, aux, seconds):
        self.state = state
        self.commits += 1

    def set_camera(self, cam):
        self.state = self._State(0)

    def set_mode(self, mode):
        self.mode = mode
        self.state = self._State(0)

    def image(self):
        return np.zeros((self.height, self.width, 3), np.float32)


def test_serve_nonblocking_while_frame_in_flight(tmp_path):
    r = _SlowFakeRenderer(frame_s=1.5)
    s = ViewerServer(r, port=0, out_dir=str(tmp_path))
    s.start()
    try:
        time.sleep(0.3)  # a 1.5 s frame is now in flight
        lat = []
        for _ in range(4):
            t0 = time.perf_counter()
            json.loads(_get(s, "/status"))
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = _post(s, {"op": "orbit", "daz": 0.1, "del": 0.0})
        lat.append(time.perf_counter() - t0)
        assert out["ok"]
        # every request answered while the frame was still rendering
        assert max(lat) < 0.5, lat
        # the in-flight frame raced the orbit op: it must be DISCARDED
        # (accum restarts from the new camera, never shows the old one)
        time.sleep(r.frame_s + 0.5)
        assert int(s.r.state.accum_id) <= 1
    finally:
        s.shutdown()
