"""Tests for the shell tooling around training (tools/supervise_train.sh).

The supervisor restarts train.py when the axon client wedges (metrics.jsonl
mtime goes stale while the process idles — see CLAUDE.md). These tests drive
it with stub commands; no JAX involved.
"""

import os
import pytest
import pathlib
import subprocess

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / 'tools' / 'supervise_train.sh'


def _run(tmp_path, target, stall_s, cmd, timeout=150):
    env = dict(os.environ,
               LOGDIR=str(tmp_path),
               TARGET_STEP=str(target),
               STALL_S=str(stall_s))
    return subprocess.run(
        ['bash', str(SCRIPT), 'bash', '-c', cmd],
        env=env, capture_output=True, text=True, timeout=timeout)


def test_clean_exit_at_target_stops_immediately(tmp_path):
    """A child that reaches TARGET_STEP and exits 0 must not be restarted,
    and the zombie child must not be mistaken for a live one (no spurious
    STALL wait before the exit is noticed)."""
    metrics = tmp_path / 'metrics.jsonl'
    r = _run(tmp_path, target=10, stall_s=600,
             cmd=f'echo \'{{"step": 12}}\' > {metrics}; exit 0')
    assert r.returncode == 0, r.stderr
    assert r.stdout.count('attempt') == 1
    assert 'STALL' not in r.stdout
    assert 'done (step 12' in r.stdout


def test_clean_exit_below_target_does_not_loop(tmp_path):
    """rc=0 below TARGET_STEP = the CLI finished its epoch budget; the
    supervisor must report and stop rather than relaunch forever."""
    metrics = tmp_path / 'metrics.jsonl'
    r = _run(tmp_path, target=100, stall_s=600,
             cmd=f'echo \'{{"step": 5}}\' > {metrics}; exit 0')
    assert r.returncode == 0, r.stderr
    assert 'exited rc=0 at step 5' in r.stdout


def test_stall_kill_reaches_wrapper_children(tmp_path):
    """The stalled command may be a wrapper script whose CHILD is the real
    (wedged) worker — e.g. tools/run_*.sh wrapping train.py. The kill must
    reach the whole process group: killing only the wrapper orphans the
    wedged python, which keeps the TPU, and the relaunch deadlocks behind
    it (single-TPU-process rule, CLAUDE.md)."""
    metrics = tmp_path / 'metrics.jsonl'
    flag = tmp_path / 'flag'
    sleeper = tmp_path / 'sleeper.pid'
    cmd = (f'if [ -f {flag} ]; then echo \'{{"step": 15}}\' > {metrics}; '
           f'exit 0; fi; touch {flag}; sleep 300 & echo $! > {sleeper}; wait')
    r = _run(tmp_path, target=10, stall_s=35, cmd=cmd)
    assert r.returncode == 0, r.stderr
    assert 'STALL' in r.stdout
    assert 'done (step 15' in r.stdout
    pid = sleeper.read_text().strip()
    assert pid and not pathlib.Path(f'/proc/{pid}').exists(), (
        f'grandchild sleeper {pid} survived the stall kill')


def test_stalled_child_is_killed_and_relaunched(tmp_path):
    """A child whose metrics file stops moving gets killed after STALL_S and
    the command is relaunched; the second attempt completes the run."""
    metrics = tmp_path / 'metrics.jsonl'
    flag = tmp_path / 'flag'
    # Attempt 1: hang without progress.  Attempt 2: finish.
    cmd = (f'if [ -f {flag} ]; then echo \'{{"step": 15}}\' > {metrics}; '
           f'exit 0; fi; touch {flag}; sleep 300')
    r = _run(tmp_path, target=10, stall_s=35, cmd=cmd)
    assert r.returncode == 0, r.stderr
    assert 'STALL' in r.stdout
    assert r.stdout.count('attempt') == 2
    assert 'done (step 15' in r.stdout
