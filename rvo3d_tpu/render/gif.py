"""PNG frames -> GIF/MP4 export.

Capability of the reference's create_gif.py + env_plot.create_animate
(reference: train/fig_save/create_gif.py:4-24, env_plot.py:357-414)."""

from __future__ import annotations

import os
from typing import List, Optional


def frames_to_gif(frame_paths: List[str], out_path: str,
                  fps: int = 10) -> Optional[str]:
    try:
        import imageio.v2 as imageio
    except Exception:
        try:
            import imageio
        except Exception:
            return None
    images = [imageio.imread(p) for p in frame_paths]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    imageio.mimsave(out_path, images, duration=1.0 / fps)
    return out_path
