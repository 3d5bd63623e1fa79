"""TrackManager: orchestrates spectrogram compute + u16 image quantization.

reference: src-tauri/src/core/mod.rs:31-231.

Global dB range: max_dB = min(global max over all specs, 0); min_dB =
max(global min, max_dB - dB_range).  When the range, max_sr or settings
change, every image is requantized; otherwise only freshly added tracks.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..common.freqscale import FreqScale
from ..dsp.framing import SpecSetting
from ..dsp.spectrogram import SpectrogramAnalyzer
from ..obs import span
from ..render.mips import SpecImage
from ..render.visualize import convert_spectrogram_to_img
from .track import TrackList

IdCh = tuple[int, int]


def _quantize_multi(db_padded, i_freq_range, db_range, colormap_length):
    """(C, T_pad, F) dB -> (C, H, T_pad) u16 on device.

    Same semantics as render.visualize.convert_spectrogram_to_img
    (drawing.rs:6-36), batched over channels; invalid trailing frames carry
    garbage that the caller slices off.
    """
    import jax.numpy as jnp

    i_start, i_end = i_freq_range
    height = i_end - i_start
    c, t_pad, f_avail = db_padded.shape
    if db_range[0] == db_range[1] and np.isneginf(db_range[1]):
        return jnp.zeros((c, height, t_pad), jnp.uint16)
    min_value = max(int(np.round(65535.0 / colormap_length)), 1) if colormap_length else 1
    u16_span = np.float32(65535 - min_value)
    db_span = np.float32(db_range[1] - db_range[0])
    n_rows = max(min(i_end, f_avail) - i_start, 0)
    out = jnp.zeros((c, height, t_pad), jnp.uint16)
    if n_rows > 0:
        sub = jnp.swapaxes(db_padded[:, :, i_start : i_start + n_rows], 1, 2)
        vals = (sub - np.float32(db_range[0])) / db_span * u16_span + np.float32(min_value)
        vals = jnp.where(jnp.isnan(vals), 0.0, vals)
        rounded = jnp.sign(vals) * jnp.floor(jnp.abs(vals) + 0.5)
        out = out.at[:, :n_rows].set(jnp.clip(rounded, 0.0, 65535.0).astype(jnp.uint16))
    return out


class TrackManager:
    def __init__(self):
        self.max_db = -math.inf
        self.min_db = math.inf
        self.max_sr = 0
        self.setting = SpecSetting()
        self.db_range = 100.0
        self.colormap_length = 258
        self.spec_analyzer = SpectrogramAnalyzer()
        # per-track SpecResult covering all channels (device-resident)
        self.specs: dict[int, object] = {}
        self.spec_imgs: dict[IdCh, np.ndarray] = {}  # u16 images (H, T)
        self._spec_n_ch: dict[int, int] = {}
        self._no_spec_img_ids: set[int] = set()

    # -- lifecycle mirrors of the reference API ----------------------------
    def add_tracks(self, tracklist: TrackList, added_ids: list[int]) -> None:
        params = tracklist.construct_sr_win_nfft_set(added_ids, self.setting)
        self._update_specs(tracklist, tracklist.id_ch_tuples_from(added_ids), params)
        self._no_spec_img_ids.update(added_ids)

    def reload_tracks(self, tracklist: TrackList, reloaded_ids: list[int]) -> None:
        self.add_tracks(tracklist, reloaded_ids)

    def remove_tracks(self, tracklist: TrackList, removed_id_ch: list[IdCh]) -> None:
        for tup in removed_id_ch:
            self.spec_imgs.pop(tup, None)
            self.specs.pop(tup[0], None)
            self._spec_n_ch.pop(tup[0], None)
            self.spec_analyzer.drop_wav(tup[0])
        self.spec_analyzer.retain(
            tracklist.construct_all_sr_win_nfft_set(self.setting), self.setting.freq_scale
        )

    def apply_track_list_changes(self, tracklist: TrackList) -> tuple[set[int], int]:
        updated = self._update_spec_imgs(tracklist, force_update_all=False)
        return updated, self.max_sr

    def set_setting(self, tracklist: TrackList, setting: SpecSetting) -> None:
        params = tracklist.construct_sr_win_nfft_set(tracklist.all_ids(), setting)
        self.setting = setting
        self.spec_analyzer.retain(params, setting.freq_scale)
        self._update_specs(tracklist, tracklist.id_ch_tuples(), params)
        self._update_spec_imgs(tracklist, force_update_all=True)

    def update_all_specs_imgs(self, tracklist: TrackList) -> None:
        self._update_specs(tracklist, tracklist.id_ch_tuples(), None)
        self._update_spec_imgs(tracklist, force_update_all=True)

    def set_db_range(self, tracklist: TrackList, db_range: float) -> None:
        self.db_range = db_range
        self._update_spec_imgs(tracklist, force_update_all=True)

    def set_colormap_length(self, tracklist: TrackList, colormap_length: int) -> None:
        self.colormap_length = colormap_length
        self._update_spec_imgs(tracklist, force_update_all=True)

    def get_spectrogram(self, id_ch: IdCh) -> np.ndarray | None:
        return self.spec_imgs.get(id_ch)

    # -- internals ---------------------------------------------------------
    def _update_specs(self, tracklist: TrackList, id_ch_tuples, params) -> None:
        with span("spec.recompute"):
            self._update_specs_inner(tracklist, id_ch_tuples, params)

    def _update_specs_inner(self, tracklist: TrackList, id_ch_tuples, params) -> None:
        if params is None:
            params = tracklist.construct_all_sr_win_nfft_set(self.setting)
        self.spec_analyzer.prepare(params, self.setting.freq_scale)
        track_ids = sorted({t for t, _ in id_ch_tuples})
        if len(track_ids) > 1:
            # one device program per (sr, win, n_fft, bucket) group
            items = [
                (
                    tid,
                    tracklist[tid].audio.wavs,
                    tracklist[tid].sr,
                    tracklist[tid].audio.version,
                )
                for tid in track_ids
            ]
            results = self.spec_analyzer.calc_specs_batched(items, self.setting)
            for tid in track_ids:
                self.specs[tid] = results[tid]
                self._spec_n_ch[tid] = tracklist[tid].n_ch
            return
        for track_id in track_ids:
            track = tracklist[track_id]
            self.specs[track_id] = self.spec_analyzer.calc_spec_multi(
                track.audio.wavs,
                track.sr,
                self.setting,
                cache_key=track_id,
                token=track.audio.version,
            )
            self._spec_n_ch[track_id] = track.n_ch

    def _update_spec_imgs(self, tracklist: TrackList, force_update_all: bool) -> set[int]:
        with span("spec.quantize"):
            return self._update_spec_imgs_inner(tracklist, force_update_all)

    def _update_spec_imgs_inner(self, tracklist: TrackList, force_update_all: bool) -> set[int]:
        """reference: mod.rs:168-230."""
        gmin, gmax = math.inf, -math.inf
        for res in self.specs.values():
            if res.n_frames == 0:
                continue
            smin, smax = res.min_max_db()
            gmin = min(gmin, smin)
            gmax = max(gmax, smax)
        gmax = min(gmax, 0.0)
        gmin = max(gmin, gmax - self.db_range)

        need_update_all = force_update_all
        if self.max_db != gmax:
            self.max_db = gmax
            need_update_all = True
        if self.min_db != gmin:
            self.min_db = gmin
            need_update_all = True
        max_sr = tracklist.max_sr()
        if self.max_sr != max_sr:
            self.max_sr = max_sr
            need_update_all = True

        if need_update_all:
            ids_need_update = set(tracklist.all_ids())
            self._no_spec_img_ids.clear()
        else:
            ids_need_update = set(self._no_spec_img_ids)
            self._no_spec_img_ids.clear()

        if ids_need_update:
            if need_update_all:
                self.spec_imgs.clear()
            for track_id, res in self.specs.items():
                if track_id not in ids_need_update:
                    continue
                sr = tracklist[track_id].sr
                i_freq_range = self.setting.freq_scale.hz_range_to_idx(
                    (0.0, self.max_sr / 2.0), sr, res.n_freq
                )
                # quantize on device (u16 halves the transfer), one bulk
                # d2h per track covering all channels
                imgs_dev = _quantize_multi(
                    res.db_padded,
                    i_freq_range,
                    (self.min_db, self.max_db),
                    self.colormap_length,
                )
                host = np.asarray(imgs_dev)[:, :, : res.n_frames]
                for ch in range(self._spec_n_ch.get(track_id, host.shape[0])):
                    self.spec_imgs[(track_id, ch)] = SpecImage(host[ch])
        return ids_need_update
