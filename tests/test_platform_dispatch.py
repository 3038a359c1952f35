"""Platform-dispatch regression tests (the MULTICHIP_r04 bug class).

Round-4 regression: Pallas interpret / nms_method='auto' / fused-block1
dispatch read the AMBIENT default platform (`jax.devices()[0].platform`)
instead of the platform the computation is placed on. On hosts where a site
customization registers a tunneled TPU as the default backend, a CPU-mesh
computation then lowered the Pallas kernel with interpret=False and died
with "Only interpret mode is supported on CPU backend".

Fix under test: every compute-path dispatch either derives the platform from
statically-known mesh devices or defers to XLA lowering time via
`jax.lax.platform_dependent` (which follows the actual placement).
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "ron_tensorflow_tpu"

# Host-level PERF heuristics (choose whether to enable the fused kernel at
# all) may consult the default platform: with interpret='auto' inside the
# kernel a wrong guess is slow, not wrong. Compute-path modules must not.
_ALLOWED_AMBIENT_READERS = {"cli.py", "train/trainer.py", "parallel/mesh.py"}


def test_no_ambient_platform_reads_in_compute_path():
    """No `jax.devices()...platform` / `jax.default_backend()` in modules
    that run inside (or decide the lowering of) jitted computations."""
    pattern = re.compile(r"jax\.devices\(\)\[0\]\.platform|jax\.default_backend\(\)")
    offenders = []
    for path in PKG.rglob("*.py"):
        rel = path.relative_to(PKG).as_posix()
        if rel in _ALLOWED_AMBIENT_READERS:
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pattern.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "ambient default-platform reads in compute-path modules (dispatch "
        "must follow the computation's placement, see MULTICHIP_r04):\n"
        + "\n".join(offenders)
    )


def test_detector_pallas_auto_interpret_on_cpu():
    """nms_method='pallas' with no interpret hint must lower for CPU via the
    platform_dependent interpret branch (exercises the lowering-time path)."""
    from ron_tensorflow_tpu.inference.detector import DetectionConfig, Detector
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    spec = RON_TINY_SPEC
    model = RON(spec=spec)
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, *spec.img_shape, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    cfg = DetectionConfig(
        top_k=64, keep_top_k=16, objectness_threshold=0.0,
        nms_method="pallas", approx_top_k=False,
    )
    s_p, b_p = Detector(model, spec, cfg)(variables, images)
    cfg_loop = DetectionConfig(
        top_k=64, keep_top_k=16, objectness_threshold=0.0,
        nms_method="loop", approx_top_k=False,
    )
    s_l, b_l = Detector(model, spec, cfg_loop)(variables, images)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_l), atol=1e-6)


def test_detector_auto_method_on_cpu_matches_loop():
    """'auto' without a mesh resolves per lowering platform; on CPU it must
    produce the loop keep set."""
    from ron_tensorflow_tpu.inference.detector import DetectionConfig, Detector
    from ron_tensorflow_tpu.models.ron import RON
    from ron_tensorflow_tpu.models.testing import RON_TINY_SPEC

    spec = RON_TINY_SPEC
    model = RON(spec=spec)
    images = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, *spec.img_shape, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    kw = dict(top_k=64, keep_top_k=16, objectness_threshold=0.0, approx_top_k=False)
    s_a, b_a = Detector(model, spec, DetectionConfig(nms_method="auto", **kw))(
        variables, images
    )
    s_l, b_l = Detector(model, spec, DetectionConfig(nms_method="loop", **kw))(
        variables, images
    )
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_a), np.asarray(b_l), atol=1e-6)


AXON_SITE = "/root/.axon_site"


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(AXON_SITE),
    reason="requires the axon site customization that pins a TPU as the "
    "ambient default platform",
)
def test_dryrun_multichip_under_ambient_tpu_default():
    """THE driver condition: axon site on PYTHONPATH pins the tunneled TPU
    as jax's default platform (even against JAX_PLATFORMS=cpu), while
    dryrun_multichip builds a CPU mesh. Run it in a subprocess exactly as
    the driver does — no JAX_PLATFORMS override."""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS",)}
    env["PYTHONPATH"] = f"{REPO}:{AXON_SITE}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    code = (
        "import jax, __graft_entry__;"
        "assert jax.devices()[0].platform != 'cpu', 'precondition: ambient default must be the TPU';"
        "__graft_entry__.dryrun_multichip(2)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, (
        f"dryrun failed under ambient-TPU default:\n{proc.stderr[-3000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout
