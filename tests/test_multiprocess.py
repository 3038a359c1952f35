"""TRUE multi-process distributed-DP test: 2 OS processes, jax.distributed
over localhost, one global mesh, per-process input shards — the rig the
reference used for its between-graph sync training
(ref: ron_net_multi_gpu_replica.py:186-189 localhost defaults, :319-448).

Asserts both processes end with IDENTICAL replicated parameters after N
sync-SGD steps on DIFFERENT per-process data (the gradient all-reduce is
real, not simulated), closing VERDICT r1 gap #4 (parallel/multihost.py had
never executed with process_count > 1).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tools" / "multiprocess_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sync_training():
    port, nproc, steps = _free_port(), 2, 3
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": str(REPO),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(i), str(nproc), str(steps)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        results.append(json.loads(out.strip().splitlines()[-1]))

    assert all(r["global_devices"] == nproc for r in results)
    assert all(r["step"] == steps for r in results)
    for r in results:
        assert all(np.isfinite(l) for l in r["losses"]), r["losses"]
    # Same replicated params on every process after synchronized updates.
    fps = [r["param_fingerprint"] for r in results]
    assert fps[0] == pytest.approx(fps[1], rel=0, abs=0), fps
    # And the same loss stream — both processes observed the same global batch.
    assert results[0]["losses"] == results[1]["losses"]


TRAINER_WORKER = REPO / "tools" / "multiprocess_trainer_worker.py"


def _write_mp_shards(data_dir, per_shard=8, shards=2):
    import io

    from PIL import Image

    from ron_tensorflow_tpu.data.convert import encode_voc_example
    from ron_tensorflow_tpu.data.tfrecord import TFRecordWriter
    from ron_tensorflow_tpu.data.voc import VocAnnotation, VocObject

    rng = np.random.default_rng(0)
    for s in range(shards):
        with TFRecordWriter(str(data_dir / f"mp_train_{s:03d}.tfrecord")) as w:
            for i in range(per_shard):
                arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                ann = VocAnnotation(
                    shape=(64, 64, 3),
                    objects=[
                        VocObject(1 + (s * per_shard + i) % 20, "x",
                                  (0.2, 0.2, 0.7, 0.7), 0, 0)
                    ],
                )
                w.write(encode_voc_example(buf.getvalue(), ann))


@pytest.mark.slow
def test_two_process_trainer_end_to_end(tmp_path):
    """The REAL Trainer across 2 jax.distributed processes: per-process file
    sharding, global batch assembly, sharded fused step, coordinated orbax
    checkpointing — then a single-process restore of the result."""
    port, nproc, steps = _free_port(), 2, 3
    _write_mp_shards(tmp_path)
    model_dir = tmp_path / "model"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": str(REPO),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(TRAINER_WORKER), str(port), str(i), str(nproc),
             str(steps), str(tmp_path), str(model_dir)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"trainer worker failed:\n{err[-3000:]}"
        results.append(json.loads(out.strip().splitlines()[-1]))

    assert all(r["global_devices"] == nproc for r in results)
    assert all(r["step"] == steps for r in results)
    fps = [r["param_fingerprint"] for r in results]
    assert fps[0] == pytest.approx(fps[1], rel=0, abs=0), fps

    # The coordinated checkpoint is restorable in a single process.
    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.train.checkpoint import CheckpointManager
    import jax
    import jax.numpy as jnp

    model, spec = get_network("ron_tiny_vgg")
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables, step = CheckpointManager(str(model_dir)).restore_eval(
        zeros["params"], zeros.get("batch_stats", {})
    )
    assert step == steps
    got = float(
        sum(np.abs(np.asarray(p, np.float64)).sum()
            for p in jax.tree.leaves(variables["params"]))
    )
    assert got == pytest.approx(fps[0], rel=1e-6)


TP_WORKER = REPO / "tools" / "multiprocess_tp_worker.py"


@pytest.mark.slow
def test_two_process_tp_checkpoint_roundtrip(tmp_path):
    """TP>1 across processes (VERDICT r2 #4): the Trainer on a (2,2) dp x tp
    mesh over 2 jax.distributed processes saves through the orbax
    global-array path; a mid-run save + resume reproduces the
    straight-through run bit-identically, and a genuinely non-addressable
    sharded tree (model axis spanning processes) round-trips exactly."""
    nproc = 2
    _write_mp_shards(tmp_path)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": str(REPO),
        # the GSPMD-partitioned step is a multi-minute CPU compile; share it
        # across the three runs below
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "jax_cache"),
    }

    def run(model_dir, max_steps, save_every, nonaddr_dir):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(TP_WORKER), str(port), str(i), str(nproc),
                 str(max_steps), str(save_every), str(tmp_path),
                 str(model_dir), str(nonaddr_dir)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(nproc)
        ]
        results = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"tp worker failed:\n{err[-3000:]}"
            results.append(json.loads(out.strip().splitlines()[-1]))
        return results

    dir_a, dir_b = tmp_path / "model_a", tmp_path / "model_b"
    res_a = run(dir_a, 4, 4, tmp_path / "na_a")  # straight through
    res_b1 = run(dir_b, 2, 2, tmp_path / "na_b1")  # save mid-run...
    res_b2 = run(dir_b, 4, 2, tmp_path / "na_b2")  # ...resume to the end
    for res in (res_a, res_b1, res_b2):
        assert all(r["nonaddr_ok"] for r in res), res
    assert all(r["step"] == 4 for r in res_a + res_b2)
    assert all(r["step"] == 2 for r in res_b1)

    # Both step-4 checkpoints must hold bit-identical parameters.
    import jax
    import jax.numpy as jnp

    from ron_tensorflow_tpu.models import get_network
    from ron_tensorflow_tpu.train.checkpoint import CheckpointManager, flatten_params

    model, spec = get_network("ron_tiny_vgg")
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    def load(d):
        variables, step = CheckpointManager(str(d)).restore_eval(
            zeros["params"], zeros.get("batch_stats", {})
        )
        assert step == 4
        return flatten_params(variables)

    flat_a, flat_b = load(dir_a), load(dir_b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=k
        )
