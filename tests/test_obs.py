"""Observability: timing spans, metrics summary, readers-writer lock.

SURVEY §5 tracing/race-safety deliverables (the reference relies on
parking_lot::RwLock, lib.rs:36-42, and has no tracing)."""

import threading
import time

import pytest

from thesia_tpu import obs


def test_span_records_and_summarizes():
    obs.reset()
    for _ in range(5):
        with obs.span("test.stage"):
            time.sleep(0.001)
    s = obs.summary()["test.stage"]
    assert s["count"] == 5
    assert s["p50_ms"] >= 1.0
    assert s["p95_ms"] >= s["p50_ms"]
    assert s["total_ms"] >= 5.0
    obs.reset()
    assert "test.stage" not in obs.summary()


def test_rwlock_concurrent_readers():
    lock = obs.RwLock()
    active = []
    peak = [0]

    def reader():
        with lock.read():
            active.append(1)
            peak[0] = max(peak[0], len(active))
            time.sleep(0.02)
            active.pop()

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert peak[0] >= 2  # readers overlapped


def test_rwlock_writer_excludes_readers():
    lock = obs.RwLock()
    log = []

    def writer():
        with lock.write():
            log.append("w_in")
            time.sleep(0.03)
            log.append("w_out")

    def reader():
        time.sleep(0.005)  # start after the writer holds the lock
        with lock.read():
            log.append("r")

    tw = threading.Thread(target=writer)
    tr = threading.Thread(target=reader)
    tw.start()
    tr.start()
    tw.join()
    tr.join()
    assert log == ["w_in", "w_out", "r"]


def test_rwlock_writer_priority_over_new_readers():
    lock = obs.RwLock()
    order = []
    reader_holds = threading.Event()

    def long_reader():
        with lock.read():
            reader_holds.set()
            time.sleep(0.03)
        order.append("r1_done")

    def writer():
        reader_holds.wait()
        with lock.write():
            order.append("w")

    def late_reader():
        reader_holds.wait()
        time.sleep(0.01)  # writer is queued by now
        with lock.read():
            order.append("r2")

    ts = [
        threading.Thread(target=long_reader),
        threading.Thread(target=writer),
        threading.Thread(target=late_reader),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # the queued writer goes before the late reader
    assert order.index("w") < order.index("r2")


def test_rwlock_aborted_writer_wakes_parked_readers():
    """A writer interrupted while waiting (KeyboardInterrupt/shutdown) must
    wake readers parked on the writer-priority gate — with no holder left,
    nothing else would ever notify them (review finding)."""
    import threading

    from thesia_tpu.obs import RwLock

    rw = RwLock()
    orig_wait = rw._cond.wait
    reader_parked = threading.Event()

    def flaky_wait(timeout=None):
        t = threading.current_thread().name
        if t == "parked-reader":
            # the event is set while the reader still HOLDS the cond lock;
            # the writer can only observe it after this orig_wait releases
            # the lock — i.e. once the reader is genuinely parked
            reader_parked.set()
            return orig_wait(timeout)
        if t == "doomed-writer":
            while not reader_parked.is_set():
                orig_wait(0.01)  # releases the lock so the reader can park
            raise RuntimeError("simulated interrupt inside cond.wait")
        return orig_wait(timeout)

    rw._cond.wait = flaky_wait
    got_read = threading.Event()
    writer_raised = threading.Event()

    def doomed_writer():
        try:
            with rw.write():
                pass
        except RuntimeError:
            writer_raised.set()

    def parked_reader():
        # parks behind _writers_waiting while the main read is held
        with rw.read():
            got_read.set()

    with rw.read():
        w = threading.Thread(target=doomed_writer, name="doomed-writer")
        w.start()
        r = threading.Thread(target=parked_reader, name="parked-reader")
        r.start()
        w.join(timeout=10)
        assert writer_raised.is_set()
        # STILL holding the original read: the parked reader must get in
        # (read locks are shared) because the aborting writer notified
        assert got_read.wait(timeout=5), "reader stayed parked after writer abort"
        r.join(timeout=5)
    rw._cond.wait = orig_wait
    assert rw._writers_waiting == 0


def test_session_write_takes_exclusive_lock(tmp_path):
    """EngineSession mutations run under rw.write(); a held read blocks them."""
    from thesia_tpu.engine.session import EngineSession

    s = EngineSession(settings_dir=tmp_path)
    done = []

    def write():
        s.set_db_range(80.0)
        done.append(True)

    with s.rw.read():
        t = threading.Thread(target=write)
        t.start()
        time.sleep(0.05)
        assert not done  # writer waits for the reader
    t.join(timeout=2.0)
    assert done and s.tm.db_range == 80.0


def test_engine_stages_record_metrics(tmp_path):
    """decode/spec/quantize/tile spans populate the metrics registry."""
    import numpy as np

    from tests.synth import synth_stereo_write
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import default_colormap_rgba8

    obs.reset()
    p = tmp_path / "t.wav"
    synth_stereo_write(p, sr=8000, sec=1.0)
    s = EngineSession(settings_dir=tmp_path / "cfg")
    s.init(default_colormap_rgba8())
    s.add_tracks([0], [str(p)])
    s.apply_track_list_changes()
    s.get_waveform_tile("0_0", 4, 0)
    s.get_spectrogram_tile("0_0", 0, 0, 0, 0)
    m = obs.summary()
    for stage in (
        "decode", "spec.recompute", "spec.quantize",
        "tile.waveform_encode", "tile.spectrogram_encode",
    ):
        assert stage in m and m[stage]["count"] >= 1, stage
