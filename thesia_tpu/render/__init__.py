from .colormap import default_colormap_rgba8
from .visualize import convert_spectrogram_to_img, convert_spectrogram_to_img_device
from .resize import lanczos3_crop_resize_u16
from .tiles import (
    RenderTileCache,
    SPECTROGRAM_TILE_GUTTER,
    SPECTROGRAM_TILE_SIZE,
    WAVEFORM_TILE_BINS,
    decode_spectrogram_tile,
    decode_waveform_tile,
    encode_spectrogram_tile,
    encode_waveform_tile,
)

__all__ = [
    "default_colormap_rgba8",
    "convert_spectrogram_to_img",
    "convert_spectrogram_to_img_device",
    "lanczos3_crop_resize_u16",
    "RenderTileCache",
    "SPECTROGRAM_TILE_GUTTER",
    "SPECTROGRAM_TILE_SIZE",
    "WAVEFORM_TILE_BINS",
    "decode_spectrogram_tile",
    "decode_waveform_tile",
    "encode_spectrogram_tile",
    "encode_waveform_tile",
]
