"""Multi-host launcher end-to-end: two REAL processes form a
jax.distributed group over localhost and train on a (2, 2) mesh — the
closest single-machine validation of the multi-host path (the reference's
spark-submit equivalent, SURVEY.md §2.4)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    from openkeonspark_tpu.data.dataset import save_dataset
    from openkeonspark_tpu.data.synth import random_kg
    kg_dir = str(tmp_path / "kg")
    save_dataset(random_kg(n_ent=80, n_rel=5, n_triples=800, n_valid=30,
                           n_test=30, seed=4), kg_dir)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # keep the repo importable but drop any site dir that forces another
    # backend
    env["PYTHONPATH"] = REPO

    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "openkeonspark_tpu.cli.launch",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--mesh_data", "-1", "--mesh_model", "2",
             "--input", kg_dir, "--output", str(tmp_path / "out"),
             "--model", "transe", "--hidden_size", "8",
             "--alpha", "0.1", "--margin", "1.0",
             "--train_times", "2", "--nbatches", "5",
             "--negative_ent", "1"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    # only process 0 echoes; it must report both epochs and the mesh
    assert "mesh=(2,2)" in outs[0], outs[0][-2000:]
    assert "epoch=1" in outs[0], outs[0][-2000:]

    # crash recovery across processes: re-launch with more epochs — the
    # group must restore the distributed checkpoint and train only the
    # remaining epochs (multi-process orbax restore + global re-sharding)
    port2 = _free_port()
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "openkeonspark_tpu.cli.launch",
             "--coordinator", f"localhost:{port2}",
             "--num_processes", "2", "--process_id", str(pid),
             "--mesh_data", "-1", "--mesh_model", "2",
             "--input", kg_dir, "--output", str(tmp_path / "out"),
             "--model", "transe", "--hidden_size", "8",
             "--alpha", "0.1", "--margin", "1.0",
             "--train_times", "4", "--nbatches", "5",
             "--negative_ent", "1"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "resumed from" in outs[0], outs[0][-2000:]
    assert "2 remaining" in outs[0], outs[0][-2000:]


@pytest.mark.slow
def test_four_process_2x2_mesh_uneven_triples(tmp_path):
    """(2,2) mesh formed from FOUR real processes (one device each) — the
    topology the 2-process test cannot exercise (there, each process holds
    2 devices, so cross-process traffic only crosses one boundary). The
    train count (947) divides into neither the device grid nor nbatches,
    so the batch is rounded to a grid multiple and the final exchange
    geometry must still hold (VERDICT r2 missing #4)."""
    from openkeonspark_tpu.data.dataset import save_dataset
    from openkeonspark_tpu.data.synth import random_kg
    kg_dir = str(tmp_path / "kg")
    save_dataset(random_kg(n_ent=90, n_rel=6, n_triples=947, n_valid=25,
                           n_test=25, seed=9), kg_dir)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO

    procs = []
    for pid in range(4):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "openkeonspark_tpu.cli.launch",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "4", "--process_id", str(pid),
             "--mesh_data", "-1", "--mesh_model", "2",
             "--input", kg_dir, "--output", str(tmp_path / "out"),
             "--model", "transe", "--hidden_size", "8",
             "--alpha", "0.1", "--margin", "1.0",
             "--train_times", "2", "--nbatches", "7",
             "--negative_ent", "1"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "mesh=(2,2)" in outs[0], outs[0][-2000:]
    assert "step=exchange" in outs[0], outs[0][-2000:]
    assert "epoch=1" in outs[0], outs[0][-2000:]


@pytest.mark.slow
def test_two_process_hierarchical_exchange(tmp_path):
    """Hierarchical two-stage relay exchange across a REAL process
    boundary: 2 processes × 4 local devices form the (2,2,2)
    (host, data, model) grid with the 'host' axis aligned EXACTLY with
    the process boundary — stage-1 relay a2as stay inside a process
    (the ICI analog), the stage-2 host a2a crosses the gloo transport
    (the DCN analog). The closest single-machine validation of the
    cross-host topology the step was built for (VERDICT r3 next #1).
    Round 5 adds hot-row replication + stats capacities to the same run,
    covering the multi-process ``sync_hot_cache`` refresh (jit with
    explicit replicated out-shardings across the process group)."""
    from openkeonspark_tpu.data.dataset import save_dataset
    from openkeonspark_tpu.data.synth import random_kg
    kg_dir = str(tmp_path / "kg")
    save_dataset(random_kg(n_ent=600, n_rel=5, n_triples=1600, n_valid=30,
                           n_test=30, seed=6), kg_dir)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO

    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "openkeonspark_tpu.cli.launch",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--mesh_data", "4", "--mesh_model", "2",
             "--chips_per_host", "4",
             "--input", kg_dir, "--output", str(tmp_path / "out"),
             "--model", "transe", "--hidden_size", "8",
             "--alpha", "0.1", "--margin", "1.0",
             "--train_times", "2", "--nbatches", "5",
             "--negative_ent", "1", "--valid_every", "1",
             "--exchange_hot_rows", "64", "--exchange_capacity", "stats",
             "--test_link_prediction"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "step=hier" in outs[0], outs[0][-2000:]
    assert "2 hosts" in outs[0], outs[0][-2000:]
    assert "epoch=1" in outs[0], outs[0][-2000:]
    # early-stop validation went through the sharded triple scorer
    assert "valid_accuracy" in outs[0], outs[0][-2000:]
    # end-of-training evaluation ran SHARDED across the two processes
    assert "sharded link-pred tail done" in outs[0], outs[0][-2000:]
    assert "averaged(filter)" in outs[0], outs[0][-2000:]
