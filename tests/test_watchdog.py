"""Resume-path plumbing tests: the stall watchdog's checkpoint selection and
the rescue-restore flow every long run depends on (tools/train_watchdog.py,
tools/r3_full_run.sh).  Pure host logic — no device."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from train_watchdog import newest_checkpoint  # noqa: E402


def _touch(d, name):
    p = os.path.join(d, name)
    open(p, "w").close()
    return p


def test_newest_checkpoint_prefers_fine_over_coarse(tmp_path):
    d = str(tmp_path)
    _touch(d, "chkpnt_coarse_3000.npz")
    fine = _touch(d, "chkpnt_fine_1000.npz")
    # any fine checkpoint outranks every coarse one (the fine stage starts
    # only after coarse completes — train_4DGS.py stage ordering)
    assert newest_checkpoint(d) == fine


def test_newest_checkpoint_highest_iteration_wins(tmp_path):
    d = str(tmp_path)
    _touch(d, "chkpnt_fine_2000.npz")
    best = _touch(d, "chkpnt_fine_10000.npz")
    _touch(d, "chkpnt_fine_9000.npz")
    assert newest_checkpoint(d) == best


def test_newest_checkpoint_ignores_foreign_files(tmp_path):
    d = str(tmp_path)
    # dot-prefixed tmp names (atomic-write staging) must never be resumed
    _touch(d, ".chkpnt_fine_5000.npz.tmp")
    _touch(d, "chkpnt_fine_bad.npz")
    assert newest_checkpoint(d) is None
    only = _touch(d, "chkpnt_coarse_1000.npz")
    assert newest_checkpoint(d) == only
