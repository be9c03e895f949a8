"""Live network viewer — SIBR remote-viewer socket protocol
(reference gaussian_renderer/network_gui.py:26-86).

Wire format: [4-byte LE length][JSON] requests carrying a camera + training
toggles; responses are raw RGB bytes followed by a length-prefixed verify
string.  Polled from the training loop when enabled (train_4DGS.py:120-145).
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.conn = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self):
        if self.conn is not None:
            return
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def receive(self):
        """Returns (camera_pack | None, do_training, shs_python,
        rot_scale_python, keep_alive, scaling_modifier, (W, H))."""
        msg = self._read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None, None, (0, 0)

        # the viewer sends transposed (glm) matrices with flipped y/z columns
        wvt = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wvt[:, 1] *= -1
        wvt[:, 2] *= -1
        fpt = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        fpt[:, 1] *= -1
        world_view = wvt.T                       # back to math convention
        full_proj = fpt.T
        campos = np.linalg.inv(world_view)[:3, 3]
        import math
        cam = {
            "viewmatrix": world_view.astype(np.float32),
            "projmatrix": full_proj.astype(np.float32),
            "campos": campos.astype(np.float32),
            "tanfovx": np.float32(math.tan(msg["fov_x"] * 0.5)),
            "tanfovy": np.float32(math.tan(msg["fov_y"] * 0.5)),
            "time": np.float32(0.0),
            "frame_num": np.float32(0.0),
        }
        return (cam, bool(msg["train"]), bool(msg["shs_python"]),
                bool(msg["rot_scale_python"]), bool(msg["keep_alive"]),
                msg["scaling_modifier"], (width, height))

    def send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def poll(self, render_fn, source_path: str):
        """One training-loop poll: if a viewer is connected, serve frames
        until it releases control (train_4DGS.py:120-145).  render_fn(cam,
        W, H) -> (H, W, 3) float image in [0, 1]."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, do_training, _, _, keep_alive, scale_mod, (w, h) = \
                    self.receive()
                payload = None
                if cam is not None:
                    img = render_fn(cam, w, h)
                    payload = (np.clip(np.asarray(img), 0, 1) * 255).astype(
                        np.uint8).tobytes()
                self.send(payload, source_path)
                if do_training or not keep_alive:
                    break
            except Exception:
                traceback.print_exc()
                self.conn = None
