"""Video/GIF export for demo interpolations.

The reference's ``save_videos`` uses OpenCV mp4 (utils/__init__.py:182-191);
cv2 isn't in this image, so frames are written as an animated GIF via PIL
(always available) with an mp4 path when cv2 exists.
"""

from __future__ import annotations

import numpy as np


def save_video(frames, filename: str, fps: float = 30.0) -> str:
    """frames: list of (H, W, 3) float [0,1] or uint8 arrays."""
    frames8 = [
        np.asarray(np.clip(f, 0, 1) * 255, np.uint8) if np.asarray(f).dtype != np.uint8
        else np.asarray(f)
        for f in frames
    ]
    try:
        import cv2  # optional

        h, w, _ = frames8[0].shape
        writer = cv2.VideoWriter(
            filename + ".mp4", cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames8:
            writer.write(f[..., ::-1])
        writer.release()
        return filename + ".mp4"
    except ImportError:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames8]
        out = filename + ".gif"
        imgs[0].save(
            out, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        return out
