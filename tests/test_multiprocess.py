"""REAL multi-process SPMD validation (2 jax.distributed processes x 4
virtual CPU devices): the piece-sharded corpus is constructed per host via
ShardedDevicePool.from_piece_loader — each process must load ONLY the
pieces its devices own — and a fused training epoch runs under the global
8-device mesh with Gloo cross-process collectives. This exercises the
process_index ownership logic, the dim allgather, and
make_array_from_single_device_arrays across process boundaries, which the
single-process virtual-mesh tests cannot."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_pool_and_epoch():
    child = os.path.join(os.path.dirname(__file__), "multiproc_child.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, child, str(pid), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"OK {pid}" in out, out[-2000:]

    # each process loaded a DISJOINT half of the 8 pieces, covering all
    loaded = []
    for pid, out in enumerate(outs):
        m = re.search(rf"LOADED {pid}: \[([0-9, ]*)\]", out)
        assert m, out[-2000:]
        loaded.append({int(x) for x in m.group(1).split(",")})
    assert loaded[0] & loaded[1] == set()
    assert loaded[0] | loaded[1] == set(range(8))
    assert len(loaded[0]) == 4 and len(loaded[1]) == 4

    # both processes observed the same global entity count and identical
    # per-step losses (SPMD consistency across hosts)
    shapes = [re.search(rf"SHAPE {p}: (\d+)", o).group(1)
              for p, o in enumerate(outs)]
    assert shapes[0] == shapes[1]
    losses = [re.search(rf"LOSSES {p}: (\[.*\])", o).group(1)
              for p, o in enumerate(outs)]
    assert losses[0] == losses[1]


def _run_fit_job(mode: str, outdir: str) -> list[str]:
    child = os.path.join(os.path.dirname(__file__), "multiproc_fit_child.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, child, str(pid), "2", port, mode, outdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{mode} proc {pid} failed:\n{out[-4000:]}"
        assert f"OK {pid}" in out, out[-2000:]
    return outs


def _epoch_lines(out: str, pid: int) -> list[str]:
    return re.findall(rf"EPOCH {pid} (\d+: \S+)", out)


@pytest.mark.slow
def test_two_process_kill_and_resume_matches_uninterrupted():
    """Pod restart path (VERDICT r3 #4): a 2-process SPMD fit stopped after
    epoch 2 and resumed on BOTH processes from the full fit-state snapshot
    must continue bit-identically to an uninterrupted 4-epoch run --
    train/valid losses and val MAP per epoch compared as float hex."""
    import tempfile

    with tempfile.TemporaryDirectory() as outdir:
        full = _run_fit_job("full", outdir)
        part1 = _run_fit_job("part1", outdir)
        snap = os.path.join(outdir, "fit_state.pkl")
        assert os.path.exists(snap), "part1 wrote no fit-state snapshot"
        part2 = _run_fit_job("part2", outdir)

    for pid in range(2):
        want = _epoch_lines(full[pid], pid)
        assert len(want) == 4
        got1 = _epoch_lines(part1[pid], pid)
        got2 = _epoch_lines(part2[pid], pid)
        assert got1 == want[:2], (
            f"pre-kill trajectory diverged (proc {pid}):\n"
            f"{got1}\nvs\n{want[:2]}")
        assert got2 == want[2:], (
            f"resumed trajectory diverged (proc {pid}):\n"
            f"{got2}\nvs\n{want[2:]}")
        # resumed-run processes observed the part1 snapshot
        assert "Resuming full fit state" not in part1[pid]
    # best MAP of the resumed run equals the uninterrupted run's
    for pid in range(2):
        bm_full = re.search(rf"BESTMAP {pid}: (\S+)", full[pid]).group(1)
        bm_part2 = re.search(rf"BESTMAP {pid}: (\S+)", part2[pid]).group(1)
        assert bm_full == bm_part2
