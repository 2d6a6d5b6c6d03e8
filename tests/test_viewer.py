"""Loopback tests for the SIBR live-viewer protocol (utils/viewer.py).

Drives the server with a real client socket speaking the reference wire
format (ref gaussian_renderer/network_gui.py:42-56): length-prefixed JSON in,
raw RGB + length-prefixed verify string out.
"""

import json
import socket
import threading

import numpy as np

from contextgs_tpu.scene.cameras import Camera, MiniCam
from contextgs_tpu.utils.viewer import ViewerServer


def _make_camera(w=32, h=24):
    return Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 2.0]),
                  fov_x=1.0, fov_y=0.8, image=None, width=w, height=h)


def _client_message(cam: Camera, train=True, keep_alive=False, res=None):
    """Build the JSON message a SIBR client would send for `cam`: the client
    ships matrices in its flipped-axis convention, which the server un-flips
    (columns 1,2 of view / column 1 of view-proj negated)."""
    wv = cam.world_view.copy()
    wv[:, 1] = -wv[:, 1]
    wv[:, 2] = -wv[:, 2]
    vp = cam.full_proj.copy()
    vp[:, 1] = -vp[:, 1]
    w, h = res if res is not None else (cam.width, cam.height)
    return dict(resolution_x=w, resolution_y=h, train=train,
                fov_x=cam.fov_x, fov_y=cam.fov_y, z_near=cam.znear,
                z_far=cam.zfar, shs_python=False, rot_scale_python=False,
                keep_alive=keep_alive, scaling_modifier=1.0,
                view_matrix=[float(x) for x in wv.reshape(-1)],
                view_projection_matrix=[float(x) for x in vp.reshape(-1)])


def _send_msg(sock, msg):
    data = json.dumps(msg).encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little") + data)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed"
        buf += chunk
    return buf


def test_viewer_roundtrip_frame_and_verify():
    server = ViewerServer("127.0.0.1", 0)
    cam = _make_camera()
    frame = np.linspace(0, 1, cam.height * cam.width * 3, dtype=np.float32
                        ).reshape(cam.height, cam.width, 3)
    seen = {}

    def render_rgb(mc: MiniCam, scaling_mod):
        seen["cam"] = mc
        seen["scaling"] = scaling_mod
        return frame

    client = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    try:
        t = threading.Thread(target=server.poll,
                             args=(render_rgb, "/data/scene", 100, 30_000))
        t.start()
        _send_msg(client, _client_message(cam))
        img = _recv_exact(client, cam.height * cam.width * 3)
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n) == b"/data/scene"
        t.join(timeout=5)
        assert not t.is_alive()

        expect = (np.clip(frame, 0, 1) * 255 + 0.5).astype(np.uint8).tobytes()
        assert img == expect

        # the reconstructed MiniCam must match the original camera exactly
        mc = seen["cam"]
        np.testing.assert_allclose(mc.world_view, cam.world_view, atol=1e-6)
        np.testing.assert_allclose(mc.full_proj, cam.full_proj, atol=1e-6)
        np.testing.assert_allclose(mc.camera_center, cam.camera_center,
                                   atol=1e-5)
        assert (mc.width, mc.height) == (cam.width, cam.height)
        assert seen["scaling"] == 1.0
    finally:
        client.close()
        server.close()


def test_viewer_keepalive_zero_resolution():
    """A zero-resolution message renders nothing; server still replies with
    the verify string, then breaks out on the next training message."""
    server = ViewerServer("127.0.0.1", 0)
    cam = _make_camera()
    calls = []

    def render_rgb(mc, s):
        calls.append(mc)
        return np.zeros((cam.height, cam.width, 3), np.float32)

    client = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    try:
        t = threading.Thread(target=server.poll,
                             args=(render_rgb, "x", 5, 10))
        t.start()
        _send_msg(client, _client_message(cam, train=False, res=(0, 0)))
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n) == b"x"
        assert not calls  # no frame rendered for keep-alive
        _send_msg(client, _client_message(cam, train=True))
        _recv_exact(client, cam.height * cam.width * 3)
        n = int.from_bytes(_recv_exact(client, 4), "little")
        _recv_exact(client, n)
        t.join(timeout=5)
        assert not t.is_alive()
        assert len(calls) == 1
    finally:
        client.close()
        server.close()


def test_viewer_client_disconnect_recovers():
    """A dropped client must not raise; the server just clears the slot."""
    server = ViewerServer("127.0.0.1", 0)
    client = socket.create_connection(("127.0.0.1", server.port), timeout=5)
    client.close()

    def render_rgb(mc, s):  # pragma: no cover - never called
        raise AssertionError

    server.poll(render_rgb, "x", 1, 10)   # accept + read fails → drop
    assert server.conn is None
    server.close()
