from .audio import Audio
from .track import AudioTrack, TrackList
from .manager import TrackManager
from .utils import unique_filenames

__all__ = ["Audio", "AudioTrack", "TrackList", "TrackManager", "unique_filenames"]
