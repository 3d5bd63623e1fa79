"""thesia_tpu — a TPU-native multi-track audio spectrogram/waveform engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Sytronik/thesia
(reference: a Tauri desktop app with a Rust DSP backend).  The compute core —
STFT, mel projection, dB scaling, loudness stats, limiting, waveform
decimation and spectrogram tile rasterization — runs batched on TPU; the
runtime around it (track/session state, tile cache, service, decode) is host
Python + native C++.

Layout:
  common/    mel scale, frequency-scale mapping, window functions
  dsp/       framing, batched STFT, dB conversion, spectrogram analyzer
  dynamics/  loudness (EBU R128), RMS/peak stats, normalize, guard clipping,
             lookahead limiter (associative-scan formulation)
  render/    u16 quantization, Lanczos3 resize, colormap LUT, render tiles,
             LRU tile cache
  engine/    Track/TrackList/TrackManager + the command surface / service
  io/        audio decode (WAV native; other codecs via native ext)
  axis/      axis tick/label computation (time/freq/amp/dB)
  player/    playback state machine, resampling, channel mixing
  parallel/  device-mesh sharding of the batched pipeline
"""

__version__ = "0.1.0"
