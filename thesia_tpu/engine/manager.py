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
from ..render.visualize import convert_spectrogram_to_img
from .track import TrackList

IdCh = tuple[int, int]


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
        if params is None:
            params = tracklist.construct_all_sr_win_nfft_set(self.setting)
        self.spec_analyzer.prepare(params, self.setting.freq_scale)
        for track_id in sorted({t for t, _ in id_ch_tuples}):
            track = tracklist[track_id]
            self.specs[track_id] = self.spec_analyzer.calc_spec_multi(
                track.audio.wavs,
                track.sr,
                self.setting,
                cache_key=track_id,
                token=id(track.audio),
            )
            self._spec_n_ch[track_id] = track.n_ch

    def _update_spec_imgs(self, tracklist: TrackList, force_update_all: bool) -> set[int]:
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
                # one bulk transfer for all channels, sliced on host
                host = np.asarray(res.db_padded)[:, : res.n_frames]
                for ch in range(self._spec_n_ch.get(track_id, host.shape[0])):
                    self.spec_imgs[(track_id, ch)] = convert_spectrogram_to_img(
                        host[ch],
                        i_freq_range,
                        (self.min_db, self.max_db),
                        self.colormap_length,
                    )
        return ids_need_update
