"""MP4 writing with graceful backend fallback: imageio(ffmpeg) -> cv2 ->
skip with a warning (hermetic environments may lack both encoders)."""

from __future__ import annotations

import os


def write_mp4(path: str, frames, fps: int = 30, quality: int = 8) -> bool:
    """frames: list of (H, W, 3) uint8 RGB arrays.  Returns success."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio
        imageio.mimwrite(path, frames, fps=fps, quality=quality)
        return True
    except Exception:
        pass
    try:
        import cv2
        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2 VideoWriter failed to open")
        for f in frames:
            writer.write(f[:, :, ::-1])   # RGB -> BGR
        writer.release()
        return True
    except Exception as e:
        print(f"WARNING: could not write video {path}: {e}")
        return False
