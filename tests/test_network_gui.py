"""Viewer socket server protocol test (client+server in-process)."""

import json
import socket
import threading

import numpy as np

from ed3dgs_tpu.render.network_gui import ViewerServer


def test_viewer_protocol_roundtrip():
    server = ViewerServer("127.0.0.1", 0)
    port = server.listener.getsockname()[1]
    w, h = 32, 24
    got = {}

    def render_fn(cam):
        got.update(cam)
        img = np.zeros((3, cam["height"], cam["width"]), np.float32)
        img[0] = 0.5
        return img

    t = threading.Thread(target=server.serve_forever,
                         args=(render_fn,), kwargs={"verify": "model-x",
                                                    "max_requests": 1})
    t.start()
    try:
        client = socket.create_connection(("127.0.0.1", port), timeout=5)
        msg = {
            "resolution_x": w, "resolution_y": h,
            "fov_x": 1.0, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
            "train": False, "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        payload = json.dumps(msg).encode()
        client.sendall(len(payload).to_bytes(4, "little") + payload)
        img_bytes = b""
        want = w * h * 3
        while len(img_bytes) < want:
            img_bytes += client.recv(want - len(img_bytes))
        nlen = int.from_bytes(client.recv(4), "little")
        verify = client.recv(nlen).decode()
        assert verify == "model-x"
        img = np.frombuffer(img_bytes, np.uint8).reshape(h, w, 3)
        assert img[..., 0].min() == 127 and img[..., 1].max() == 0
        assert got["width"] == w and got["height"] == h
        client.close()
    finally:
        t.join(timeout=5)
        server.close()
