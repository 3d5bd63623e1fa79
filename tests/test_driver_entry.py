"""Driver entry points must be outage-proof (VERDICT r4 next #1/#2).

Round 4 shipped zero driver-visible TPU evidence because both entry points
died of the same tunnel outage: dryrun_multichip blocked on
`jax.devices()` under the axon platform before deciding to respawn onto
virtual CPUs (rc=124), and bench.py exited 1 without printing its JSON
line after a single 1500 s probe.  These tests pin the hardened behavior:
the dryrun parent makes ZERO backend touches before respawning, and
bench.py always prints exactly one parseable JSON line — backend dead,
stage faulted, or stage wedged.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(code: str, env_extra: dict, timeout: float) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("_THESIA_DRYRUN_CHILD", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


def test_dryrun_parent_respawns_without_backend_touch():
    """The respawn decision must not initialize any backend: under a
    non-cpu platform pin (the sitecustomize default on the driver host),
    dryrun_multichip must choose to respawn from config alone.  jax.devices
    is stubbed to raise — the old code (`__graft_entry__.py` r4:103) called
    it and would fail here (and block forever on a hung tunnel)."""
    code = (
        "import sys, jax\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "import __graft_entry__ as g\n"
        "calls = []\n"
        "g._respawn_with_virtual_devices = lambda n: calls.append(n)\n"
        "def _boom(*a, **k):\n"
        "    raise AssertionError('parent touched the backend')\n"
        "jax.devices = _boom\n"
        "g.dryrun_multichip(8)\n"
        "assert calls == [8], calls\n"
        "print('PARENT_NO_BACKEND_OK', jax.config.jax_platforms)\n"
    )
    p = _run(code, {"JAX_PLATFORMS": "axon,cpu"}, timeout=120)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "PARENT_NO_BACKEND_OK" in p.stdout


def test_dryrun_child_runs_in_process_on_cpu():
    """A process already pinned to cpu (tests, the respawned child) runs
    the dryrun body in-process — no recursive respawn."""
    code = (
        "import sys, jax\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "def _no(*a, **k): raise AssertionError('respawned from a cpu child')\n"
        "g._respawn_with_virtual_devices = _no\n"
        "g.dryrun_multichip(2)\n"
        "print('CHILD_IN_PROCESS_OK')\n"
    )
    p = _run(
        code,
        {
            "JAX_PLATFORMS": "cpu",
            "_THESIA_DRYRUN_CHILD": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "THESIA_PRECOMPILE": "0",
        },
        timeout=600,
    )
    assert p.returncode == 0, (p.stderr[-3000:], p.stdout[-500:])
    assert "CHILD_IN_PROCESS_OK" in p.stdout


def _last_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert lines, "bench printed nothing"
    # contract: ONE JSON line; it is the only stdout line bench prints
    payload = [l for l in lines if l.startswith("{")]
    assert len(payload) == 1, f"expected exactly one JSON line, got: {lines}"
    return json.loads(payload[0])


def test_bench_emits_json_when_backend_dead(tmp_path):
    """A dead backend must degrade to an error artifact, not a lost one:
    the JSON line still prints (null metrics + error field) and the
    process exits 0 so the driver parses it.

    Deadness is simulated by shadowing `jax` on the probe subprocess's
    PYTHONPATH (import raises), NOT via JAX_PLATFORMS: this image's axon
    sitecustomize force-registers the backend with jax.config.update, so a
    bogus platform env var is silently overridden and — when the tunnel is
    healthy — the probe would succeed and run the real bench (observed:
    this test measured 68x on the shared TPU before the fix)."""
    (tmp_path / "jax.py").write_text(
        "raise RuntimeError('simulated dead backend: tunnel outage')\n"
    )
    pythonpath = os.pathsep.join(
        [str(tmp_path)] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )
    p = _run(
        "import runpy; runpy.run_path('bench.py', run_name='__main__')",
        {
            "PYTHONPATH": pythonpath,
            "THESIA_BENCH_PROBE_BUDGET": "20",
            "THESIA_BENCH_FAST": "1",
            "THESIA_BENCH_CPU_FALLBACK": "0",  # keep this test probe-focused
        },
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    doc = _last_json_line(p.stdout)
    assert doc["metric"] == "stft_mel_raster_realtime_factor_48k_stereo"
    assert doc["value"] is None
    assert "backend" in doc.get("error", ""), doc


def test_bench_probe_retries_in_fresh_subprocesses():
    """Each probe attempt is a fresh subprocess (a poisoned backend init
    can't wedge the parent) and failures retry until the budget runs out."""
    import bench

    calls = []
    orig = bench._probe_backend_once

    def fake(timeout_s):
        calls.append(timeout_s)
        return (False, "synthetic outage") if len(calls) < 3 else (True, "1xcpu")

    bench._probe_backend_once = fake
    real_sleep = time.sleep
    bench.time.sleep = lambda s: real_sleep(0)
    old = os.environ.get("THESIA_BENCH_PROBE_BUDGET")
    os.environ["THESIA_BENCH_PROBE_BUDGET"] = "1000"
    try:
        assert bench._require_backend() is None
        assert len(calls) == 3
        assert calls[1] >= calls[0]  # backoff: later probes get longer
    finally:
        bench._probe_backend_once = orig
        bench.time.sleep = real_sleep
        if old is None:
            os.environ.pop("THESIA_BENCH_PROBE_BUDGET", None)
        else:
            os.environ["THESIA_BENCH_PROBE_BUDGET"] = old


def test_run_stage_timeout_and_fault_paths():
    """_run_stage degrades a wedged or raising stage to (None, reason)
    without blocking the run."""
    import bench

    t0 = time.perf_counter()
    v, e = bench._run_stage("wedge", lambda: time.sleep(60), budget_s=0.5)
    assert v is None and e.startswith("timeout>")
    assert time.perf_counter() - t0 < 10

    def boom():
        raise ValueError("kaput")

    v, e = bench._run_stage("boom", boom, budget_s=5)
    assert v is None and "kaput" in e

    v, e = bench._run_stage("ok", lambda: 42, budget_s=5)
    assert v == 42 and e is None

    os.environ["THESIA_BENCH_FAULT"] = "inj"
    try:
        v, e = bench._run_stage("inj", lambda: 42, budget_s=5)
        assert v is None and "injected fault" in e
    finally:
        os.environ.pop("THESIA_BENCH_FAULT", None)


def test_bench_single_stage_fault_preserves_all_other_fields():
    """VERDICT r4 next #2 'Done' criterion: killing any single stage still
    yields a parsed artifact containing every other stage's numbers.  Full
    bench runs on the CPU backend in fast mode with a fault injected into
    the multitrack stage; every non-multitrack field must carry a real
    value."""
    p = _run(
        "import runpy; runpy.run_path('bench.py', run_name='__main__')",
        {
            "THESIA_BENCH_BACKEND": "cpu",
            "THESIA_BENCH_FAST": "1",
            "THESIA_BENCH_FAULT": "multitrack",
            "THESIA_BENCH_TOTAL_BUDGET": "560",
            "THESIA_BENCH_STAGE_BUDGET": "120",
            "THESIA_PRECOMPILE": "0",
        },
        timeout=590,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    doc = _last_json_line(p.stdout)
    assert doc["multitrack_mixed_sr_x_realtime"] is None
    assert "multitrack" in doc.get("error", ""), doc
    missing = [
        k
        for k, val in doc.items()
        if val is None and k != "multitrack_mixed_sr_x_realtime"
    ]
    assert not missing, (missing, doc)


def test_run_stage_timeout_restores_env_and_flags_taint():
    """An abandoned stage never runs its finally-block env restore: the
    harness must restore the snapshot itself and flag the artifact (review
    finding — a wedged cold_shape left THESIA_PRECOMPILE=1 for every later
    'clean' timing)."""
    import bench

    bench._ABANDONED.clear()
    os.environ["THESIA_STAGE_ENV_PROBE"] = "before"

    def wedge():
        os.environ["THESIA_STAGE_ENV_PROBE"] = "polluted"
        os.environ["THESIA_STAGE_ENV_NEW"] = "zombie"
        time.sleep(60)

    try:
        v, e = bench._run_stage("wedge_env", wedge, budget_s=0.8)
        assert v is None and "abandoned" in e
        assert os.environ["THESIA_STAGE_ENV_PROBE"] == "before"
        assert "THESIA_STAGE_ENV_NEW" not in os.environ
        assert "wedge_env" in bench._ABANDONED
    finally:
        bench._ABANDONED.clear()
        os.environ.pop("THESIA_STAGE_ENV_PROBE", None)
        os.environ.pop("THESIA_STAGE_ENV_NEW", None)


def test_cpu_fallback_merges_marked_numbers(monkeypatch):
    """A dead device backend still yields driver-visible evidence: the
    fallback child's non-null fields land under 'cpu_fallback' with an
    explicit backend marker, never merged into the (null) TPU fields."""
    import bench

    canned = json.dumps({
        "metric": "stft_mel_raster_realtime_factor_48k_stereo",
        "value": 12.3, "unit": "x_realtime_per_chip", "vs_baseline": 0.123,
        "spec_tile_p50_ms": 1.5, "long1h_add_s": None, "error": None,
    })

    class P:
        stdout = "[bench] noise\n" + canned + "\n"
        returncode = 0

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: P())
    monkeypatch.delenv("THESIA_BENCH_CPU_FALLBACK", raising=False)
    fb = bench._cpu_fallback_numbers()
    assert fb["value"] == 12.3 and fb["spec_tile_p50_ms"] == 1.5
    assert "long1h_add_s" not in fb and "metric" not in fb
    assert "cpu" in fb["backend"] and "NOT comparable" in fb["backend"]

    monkeypatch.setenv("THESIA_BENCH_CPU_FALLBACK", "0")
    assert bench._cpu_fallback_numbers() is None
