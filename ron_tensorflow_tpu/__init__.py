"""RON-TPU: a TPU-native (JAX/XLA/Pallas) object-detection framework.

A ground-up re-design of the capabilities of HiKapok/RON_Tensorflow — the
RON-320 "Reverse Connection with Objectness Prior" detector (CVPR 2017) and
the SSD-300/512 family — built for TPUs:

- fixed-shape, fully vectorized box ops (`ron_tensorflow_tpu.ops`) replacing
  the reference's `tf.while_loop`/`boolean_mask` graph code,
- Flax models (`ron_tensorflow_tpu.models`) in NHWC/bfloat16 lowered to XLA,
- data-parallel + model-parallel training over a `jax.sharding.Mesh`
  (`ron_tensorflow_tpu.parallel`) replacing the TF1 parameter-server runtime,
- a jit-compiled augmentation pipeline (`ron_tensorflow_tpu.data`),
- streaming + offline VOC evaluation (`ron_tensorflow_tpu.eval`),
- Pallas kernels for hot paths (`ron_tensorflow_tpu.kernels`).

Reference parity map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
