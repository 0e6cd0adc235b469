"""Multi-host SPMD training: two REAL processes (4 virtual CPU devices each)
connected by jax.distributed over a loopback coordinator, one global 8-device
mesh, per-process data shards — training in lockstep through the train.py CLI.

Reference behaviour mirrored: ``rsuper_train/train_ddp.py:423-426`` CLI
(--dist_url/--world_size/--rank) and ``:623-668`` (process group + rank-sliced
samplers + checkpoint from a consistent state).
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.test_data import CLASSES, _make_mask_case

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp, port, pid, nproc):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import train; train.main(sys.argv[1:])" % str(REPO)
    )
    args = [
        sys.executable, "-c", code,
        "--preset", "abdomenatlas/resunet_3d",
        "--config", str(tmp / "small.yaml"),
        "--data_root", str(tmp / "masks"),
        "--batch_size", "8", "--iter_per_epoch", "2", "--epochs", "1",
        "--unique_name", "mh", "--cp_path", str(tmp / "exp"),
        "--all_train", "--max_steps", "2", "--loss", "dice",
        "--dist_coordinator", f"127.0.0.1:{port}",
        "--dist_num_processes", str(nproc),
        "--dist_process_id", str(pid),
    ]
    return subprocess.Popen(
        args, env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_training_lockstep(tmp_path):
    tmp = tmp_path
    mask_dir = tmp / "masks"
    mask_dir.mkdir()
    for cid in ["BDMAP_A", "BDMAP_B", "BDMAP_C", "BDMAP_D"]:
        _make_mask_case(mask_dir, cid)
    json.dump(list(CLASSES), open(mask_dir / "classes.json", "w"))
    yaml.safe_dump({
        "training_size": [16, 16, 16],
        "model_args": {"base_chan": 4, "block": "BasicBlock", "norm": "in"},
        "compute_dtype": "float32",
        "num_workers": 2,
        "report_volume_loss_basic": 0.0,
        "scale": [0.0, 0.0, 0.0],
        "rotate": [0.0, 0.0, 0.0],
        "nan_check_every": 1,
    }, open(tmp / "small.yaml", "w"))

    port = _free_port()
    procs = [_launch(tmp, port, pid, 2) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # lockstep: the two ranks logged IDENTICAL global losses every step
    m0 = [json.loads(l) for l in open(tmp / "exp/mh/metrics.rank0.jsonl")]
    m1 = [json.loads(l) for l in open(tmp / "exp/mh/metrics.rank1.jsonl")]
    assert len(m0) == len(m1) >= 1
    for a, b in zip(m0, m1):
        assert a["step"] == b["step"]
        np.testing.assert_allclose(
            a["train/overall"], b["train/overall"], rtol=0, atol=0,
            err_msg="ranks diverged: data-parallel all-reduce broken",
        )
    # the collective orbax checkpoint landed
    assert (tmp / "exp/mh/latest").exists()
