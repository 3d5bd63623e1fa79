"""Default colormap: black + matplotlib inferno-256 + white = 258 RGBA8 entries.

The reference frontend builds this table from matplotlib's published inferno
data and passes it to the backend at init (reference:
src/prototypes/constants/colors.ts:64-165; length-258 expectation
src-tauri/src/core/mod.rs:55).  We source the identical values from
matplotlib directly.
"""

from __future__ import annotations

import numpy as np


def default_colormap_rgba8() -> np.ndarray:
    """(258, 4) uint8: [black, inferno..., white], alpha 255."""
    import matplotlib

    inferno = np.asarray(matplotlib.colormaps["inferno"].colors)  # (256, 3) float64
    rgbf = np.vstack([[0.0, 0.0, 0.0], inferno, [1.0, 1.0, 1.0]])
    rgb = np.clip(np.round(rgbf * 255.0), 0, 255).astype(np.uint8)
    out = np.empty((rgb.shape[0], 4), np.uint8)
    out[:, :3] = rgb
    out[:, 3] = 255
    return out
