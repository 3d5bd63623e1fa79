"""Channel up/down-mix rules for playback output.

reference: src-tauri/src/player/stream.rs:242-272.
"""

from __future__ import annotations

import numpy as np


def source_sample_for_output(
    samples: np.ndarray, input_channels: int, source_frame_idx: int,
    output_channel: int, output_channels: int,
) -> float:
    """Single-sample semantics (mirrors the reference exactly; tests)."""
    if input_channels == 0:
        return 0.0
    off = source_frame_idx * input_channels
    if off >= len(samples):
        return 0.0
    if input_channels == 1:
        return float(samples[off])
    if output_channels == 1:
        left = samples[off]
        right = samples[off + min(1, input_channels - 1)]
        return float((left + right) * 0.5)
    if input_channels == 2:
        src_ch = output_channel % 2
    else:
        src_ch = min(output_channel, input_channels - 1)
    return float(samples[off + src_ch])


def render_block(
    samples: np.ndarray, input_channels: int, start_frame: int, n_frames: int,
    output_channels: int, volume: float,
) -> np.ndarray:
    """Vectorized block render -> (n_frames, output_channels) f32 in [-1, 1].

    Frames past the end render silence (reference fills zeros at track end).
    """
    out = np.zeros((n_frames, output_channels), np.float32)
    if input_channels == 0:
        return out
    total = len(samples) // input_channels
    n_avail = max(min(n_frames, total - start_frame), 0)
    if n_avail == 0:
        return out
    src = samples[
        start_frame * input_channels : (start_frame + n_avail) * input_channels
    ].reshape(n_avail, input_channels)
    if input_channels == 1:
        out[:n_avail] = src  # broadcast mono to all outputs
    elif output_channels == 1:
        out[:n_avail, 0] = (src[:, 0] + src[:, min(1, input_channels - 1)]) * 0.5
    else:
        for oc in range(output_channels):
            if input_channels == 2:
                sc = oc % 2
            else:
                sc = min(oc, input_channels - 1)
            out[:n_avail, oc] = src[:, sc]
    np.clip(out * volume, -1.0, 1.0, out=out)
    return out
