"""bench.py outage-proofing (round-3 post-mortem: a hung TPU backend init
erased the round's headline number). The supervisor must fail FAST and
STRUCTURED when the backend is unavailable — never hang unboundedly."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backend_unavailable_is_bounded_and_structured():
    """With an impossibly short probe timeout the supervisor must emit one
    JSON line with error=backend_unavailable and exit nonzero, quickly.
    (A 10 ms probe can never succeed, so this never reaches the TPU —
    safe to run alongside the CPU test suite.)"""
    env = dict(os.environ, KALLE_BENCH_PROBE_TIMEOUT="0.01",
               KALLE_BENCH_PROBE_ATTEMPTS="2")
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env, timeout=120)
    took = time.time() - t0
    assert p.returncode == 3, (p.returncode, p.stderr[-300:])
    assert took < 90, took  # bounded: 2 probes + one 15s backoff
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, lines  # exactly ONE line on stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "synthesis_rtf_v5e_chip"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["error"] == "backend_unavailable"
    assert "probe" in rec["detail"]
    # probe progress goes to stderr, not stdout (driver parses stdout)
    assert "probe 1/2" in p.stderr
