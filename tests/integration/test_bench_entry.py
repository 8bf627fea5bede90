"""Gates on the two driver artifacts themselves: ``bench.py`` and
``__graft_entry__.py``.

The driver runs ``python bench.py`` (headline metric, BENCH_r{N}.json) and
``dryrun_multichip`` (MULTICHIP_r{N}.json) once per round; a syntax error or
a broken guard path in either costs the whole round's verdict, so they get
the same suite coverage as any other surface.  Both run as SUBPROCESSES:
bench.py's recovery logic must be exercised against real process semantics
(os._exit, env-driven re-exec), and the entry module pins the CPU platform
itself the way the driver's harness does.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(argv, env_extra, timeout):
    env = dict(os.environ, **env_extra)
    # the suite conftest pins JAX_PLATFORMS=cpu for THIS process; children
    # must decide for themselves (bench probes the default backend)
    return subprocess.run(
        argv, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def test_bench_guard_fails_fast_with_one_json_line():
    """VIDDET_BENCH_TUNNEL_WAIT_S=0 + a hung/failed init must produce ONE
    parseable JSON error line on stdout and rc=1 (the driver parses the
    last stdout line; any traceback or chatter there breaks BENCH_r{N})."""
    code = (
        "import bench\n"
        "bench._wait_for_tunnel_and_reexec()\n"
    )
    r = _run(
        [sys.executable, "-c", code],
        {"VIDDET_BENCH_TUNNEL_WAIT_S": "0", "JAX_PLATFORMS": "cpu"},
        timeout=120,
    )
    assert r.returncode == 1
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert "error" in payload and payload["metric"].startswith("frames_per_sec")


def test_bench_reexec_cap():
    """After MAX_REEXECS re-execs the recovery loop must stop re-execing
    (else a flapping tunnel could re-exec forever) and emit the error line."""
    code = (
        "import bench\n"
        "bench._wait_for_tunnel_and_reexec()\n"
    )
    r = _run(
        [sys.executable, "-c", code],
        {
            "VIDDET_BENCH_REEXEC": "2",
            "VIDDET_BENCH_TUNNEL_WAIT_S": "480",  # must NOT be honored at cap
            "JAX_PLATFORMS": "cpu",
        },
        timeout=120,
    )
    assert r.returncode == 1
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "reexecs=2" in payload["error"]


@pytest.mark.slow
def test_bench_cpu_smoke_prints_metric_json():
    """slow (~3 min on 1 CPU core, compile-bound): the full happy path at
    tiny shapes on the CPU backend — model build, warmup, timed windows,
    and the single JSON metric line the driver parses."""
    r = _run(
        [sys.executable, "bench.py", "--platform", "cpu"],
        {
            "VIDDET_BENCH_BATCH": "2",
            "VIDDET_BENCH_SHAPE": "64",
            "VIDDET_BENCH_TOPK": "50",
            "VIDDET_BENCH_POST_NMS": "20",
        },
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["value"] > 0 and payload["unit"] == "frames/s"
    assert payload["batch"] == 2 and "vs_baseline" not in payload  # 416-only


@pytest.mark.slow
def test_graft_entry_single_chip_traces():
    """The driver's single-chip GRAFT check calls ``entry()`` and jits fn
    on the real chip; gate the host-side half here (~30s on 1 CPU core —
    slow since the round-5 tail session: the driver itself exercises
    entry() every round, and the flagship forward it wraps is covered by
    the fast suite's model/NMS gates, so this is full-suite insurance):
    entry() must import, init its params, and TRACE (``jax.eval_shape``,
    no compile) with its own example_args, yielding the (scores, ids,
    boxes) triple at the static post-NMS width.  Pins the conftest
    pattern in-child: ``jax.config.update`` before backend init, since
    the environment re-exports JAX_PLATFORMS=axon to every subprocess."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.eval_shape(fn, *args)\n"
        "print([tuple(x.shape) for x in jax.tree.leaves(out)])\n"
    )
    r = _run([sys.executable, "-c", code], {}, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "(4, 100)" in r.stdout and "(4, 100, 4)" in r.stdout


@pytest.mark.slow
def test_graft_entry_dryrun_multichip_yolo():
    """slow (~60s): the driver's MULTICHIP artifact — one DP train step on
    an 8-virtual-device mesh from a clean subprocess (the all-family sweep
    runs in the driver; one family suffices to gate the module wiring)."""
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8, family='yolo')\n"
    )
    r = _run([sys.executable, "-c", code], {}, timeout=480)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip ok: 8 devices" in r.stdout
