#!/usr/bin/env python
"""Long-run training supervisor: restart-on-EX_TEMPFAIL loop with a
device-wedge probe — makes the eventual 120k-step VOC run one command.

The framework's failure-containment contract (train/trainer.py):
  - exit 75 (EX_TEMPFAIL): the host-RSS guard checkpointed the current step
    and asked to be restarted (leaks OUTSIDE repo code — e.g. tunnel-client
    staging buffers — grow the host RSS over multi-hour runs; NOTES.md).
  - SIGKILL / crash: orbax auto-resume picks up from the last periodic save.
  - exit 0: max_number_of_steps reached — done.

After an abnormal exit the accelerator tunnel can wedge for up to ~30 min
(every new client hangs in its first dispatch); the supervisor probes with
a trivial computation in a SUBPROCESS (a wedged dispatch blocks forever, so
the probe must be killable) and waits until the device answers before
relaunching. Equivalent affordance in the reference: tf.train.Supervisor
auto-recovery, recovery_wait_secs=1 (ref: ron_net_multi_gpu_replica.py:
408-427) — there the PS runtime did the retrying; here the process loop
does.

Usage:
    python tools/train_supervised.py [--max-restarts N] [--probe-timeout S]
        -- <train command and args...>
e.g.
    python tools/train_supervised.py -- \
        python -m ron_tensorflow_tpu.cli train --preset ron_320 \
            --dataset-dir /data/voc --model-dir /models/ron320 \
            max_number_of_steps=120000

Any command is accepted after `--`; the supervisor only interprets exit
codes. Restarts happen on exit 75 (always) and on crash exits (up to
--max-restarts); exit 0 ends the loop.
"""

import argparse
import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "np.asarray(jnp.sum(jnp.ones((256, 256))));"
    "print('probe-ok')"
)


def device_ready(timeout: float, python: str) -> bool:
    """Run a trivial device computation in a killable subprocess."""
    try:
        out = subprocess.run(
            [python, "-c", PROBE],
            timeout=timeout,
            capture_output=True,
            text=True,
            env=os.environ,
        )
        return out.returncode == 0 and "probe-ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(timeout: float, interval: float, python: str) -> None:
    t0 = time.time()
    while not device_ready(timeout, python):
        waited = time.time() - t0
        print(
            f"[supervisor] device probe hung/failed after {waited:.0f}s total — "
            f"retrying in {interval:.0f}s (tunnel wedge recovers on its own)",
            flush=True,
        )
        time.sleep(interval)


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument(
        "--max-restarts",
        type=int,
        default=100,
        help="restart budget for CRASH exits (exit 75 restarts are free: "
        "they are the framework asking politely)",
    )
    ap.add_argument(
        "--probe-timeout",
        type=float,
        default=120.0,
        help="seconds before a hung device probe counts as wedged",
    )
    ap.add_argument(
        "--probe-interval", type=float, default=60.0, help="seconds between probes"
    )
    ap.add_argument(
        "--python", default=sys.executable, help="interpreter for the device probe"
    )
    ap.add_argument("command", nargs=argparse.REMAINDER, help="-- <train command>")
    args = ap.parse_args()

    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no training command given (put it after --)")

    crashes = 0
    attempt = 0
    while True:
        attempt += 1
        print(f"[supervisor] launch #{attempt}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = subprocess.call(cmd, env=os.environ)
        dt = time.time() - t0
        if rc == 0:
            print(f"[supervisor] run completed after {dt:.0f}s — done", flush=True)
            return 0
        if rc == 75:
            print(
                f"[supervisor] EX_TEMPFAIL after {dt:.0f}s (checkpointed restart "
                "point) — relaunching",
                flush=True,
            )
        else:
            crashes += 1
            print(
                f"[supervisor] abnormal exit {rc} after {dt:.0f}s "
                f"(crash {crashes}/{args.max_restarts})",
                flush=True,
            )
            if crashes > args.max_restarts:
                print("[supervisor] restart budget exhausted — giving up", flush=True)
                return rc
        wait_for_device(args.probe_timeout, args.probe_interval, args.python)


if __name__ == "__main__":
    sys.exit(main())
