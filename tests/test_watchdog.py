"""utils.watchdog: the step-heartbeat that turns silent hangs into exit 86.

Motivated by a real failure: a training process wedged on a device-runtime
RPC (thread blocked in native code, CPU time frozen, zero output for
49 minutes). The reference has no failure detection at all — its posture is
checkpoint/resume driven by a human noticing (FISRnet.py:580-744); this
module makes the recovery path reachable unattended.
"""

import subprocess
import sys
import time

import pytest

from fisr_tpu.utils.watchdog import EXIT_CODE, Heartbeat


def test_beats_keep_it_quiet():
    fired = []
    hb = Heartbeat(0.4, poll_s=0.05, on_timeout=fired.append)
    with hb:
        for _ in range(12):  # 1.2 s of life, beats every 0.1 s
            time.sleep(0.1)
            hb.beat()
    assert fired == []


def test_silence_fires_on_timeout_with_duration():
    fired = []
    hb = Heartbeat(0.2, poll_s=0.05, on_timeout=fired.append)
    hb.start()
    time.sleep(0.6)
    hb.stop()
    assert len(fired) == 1
    assert fired[0] >= 0.2  # reported silence duration


def test_stop_disarms_before_timeout():
    fired = []
    hb = Heartbeat(0.3, poll_s=0.05, on_timeout=fired.append)
    hb.start()
    hb.stop()
    time.sleep(0.5)
    assert fired == []


def test_monitor_thread_is_daemon_and_restart_guarded():
    hb = Heartbeat(5.0)
    hb.start()
    assert hb._thread.daemon  # must never keep a healthy process alive
    with pytest.raises(RuntimeError):
        hb.start()
    hb.stop()
    hb.stop()  # idempotent


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        Heartbeat(0.0)


def test_default_action_exits_86_with_stack_dump():
    """The real contract: a process whose main thread is blocked (sleep
    stands in for the wedged native RPC — neither beats) is hard-exited
    with the distinct watchdog status and a thread-stack post-mortem."""
    code = (
        "import time\n"
        "from fisr_tpu.utils.watchdog import Heartbeat\n"
        "Heartbeat(0.3, name='t', poll_s=0.05).start()\n"
        "time.sleep(30)\n"  # 'wedged': never beats
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode == EXIT_CODE, (p.returncode, p.stderr[-500:])
    assert "watchdog:t" in p.stderr and "no heartbeat" in p.stderr
    # faulthandler post-mortem shows where the process was stuck
    assert "time.sleep(30)" in p.stderr or "Thread" in p.stderr
