"""Host contention lock between long TPU campaigns and driver entry points.

The build/bench host has ONE CPU core and ONE TPU chip; a training campaign
(`tools/run_campaign.sh`) monopolises both for hours.  Round 3's driver
record went red purely from this self-inflicted contention: the multichip
dryrun's CPU compile ran beside a campaign chunk and timed out
(MULTICHIP_r03.json rc=124), and the headline bench measured ~3.5% low.

Protocol (VERDICT r3 item 8):

* the trainer takes ``/tmp/hdt_campaign.lock`` (its PID inside) for the
  duration of any non-CPU training run and removes it on exit;
* ``bench.py`` waits a bounded time for the lock to clear, then proceeds and
  records ``"contended": true|false`` in its JSON line;
* ``__graft_entry__.dryrun_multichip`` does not wait (its CPU-side compile
  merely competes with the campaign's *niced* host work) but reports the
  contention state in its output so the driver artifact carries it.

Stale locks (holder PID dead) are ignored and cleaned up.
"""

from __future__ import annotations

import os
import time

LOCK_PATH = os.environ.get("HDT_CAMPAIGN_LOCK", "/tmp/hdt_campaign.lock")


def _holder_pid() -> int:
    """PID in the lockfile, or 0 if absent/unreadable."""
    try:
        with open(LOCK_PATH) as f:
            return int(f.read().strip() or "0")
    except (OSError, ValueError):
        return 0


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def campaign_active() -> bool:
    """True while a live campaign process holds the lock."""
    pid = _holder_pid()
    if pid and not _pid_alive(pid):
        try:  # stale lock from a killed campaign: clean it up
            os.unlink(LOCK_PATH)
        except OSError:
            pass
        return False
    return bool(pid)


def acquire(pid: int | None = None) -> None:
    """Record this process as the running campaign (idempotent overwrite:
    campaigns are serialized by construction — one chip, one driver)."""
    try:
        with open(LOCK_PATH, "w") as f:
            f.write(str(pid or os.getpid()))
    except OSError:
        pass


def release() -> None:
    if _holder_pid() == os.getpid():
        try:
            os.unlink(LOCK_PATH)
        except OSError:
            pass


def wait_until_free(max_wait_s: float, poll_s: float = 10.0) -> bool:
    """Block until no campaign holds the lock, up to ``max_wait_s``.

    Returns the final contention state: True = still contended (caller
    should record that its numbers were taken beside a campaign)."""
    deadline = time.monotonic() + max_wait_s
    while campaign_active():
        if time.monotonic() >= deadline:
            return True
        time.sleep(poll_s)
    return False
