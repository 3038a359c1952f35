"""Close the block-1/2 HBM lever (VERDICT r4 item 4) with bandwidth evidence.

Round-4 diagnosed block 1 as HBM-bound (~9 FLOP/byte) and hypothesized the
23.6 ms in-situ fwd+bwd time vs the ~8 ms traffic floor was saved-activation
round-tripping — suggesting remat (recompute blocks 1-2 in the backward)
as the fix. This experiment measures BOTH:

  1. the in-situ train-step A/B (base vs remat_blocks12), and
  2. the blocks-1-2 span STANDALONE fwd and fwd+bwd, against an explicit
     per-tensor HBM traffic model, reporting achieved GB/s

so the outcome is attributable from the artifact alone. The traffic model
(bf16, conv outputs materialized in HBM, pool fused with its producer):

  fwd:   read in + (write+read) conv1_1, conv1_2, pool1, conv2_1, conv2_2
         + write pool2
  bwd:   the mirror-image cotangent chain (same tensor sizes), plus one
         read of each saved activation needed by the conv/relu VJPs
         (conv inputs: in, a1, p1, b1  -- and relu masks a1, a2, b1, b2)
  remat: bwd first RERUNS the whole fwd chain (same traffic again), then
         runs the same cotangent chain -- on a bandwidth-bound span the
         recomputed tensors stream through HBM exactly like saved ones,
         so remat strictly ADDS a forward's worth of traffic. It trades
         FLOPs for memory *capacity*, not bandwidth.

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_remat12_bandwidth.py [bs]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(out):
    # fetch ONE element, sliced on device — np.asarray(whole array) would
    # drag the full output through the tunnel and dominate the timing
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, iters=20, warmup=3):
    out = fn()
    _barrier(out)
    for _ in range(warmup):
        out = fn()
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import flax.linen as nn

    from ron_tensorflow_tpu.models.layers import Conv
    from ron_tensorflow_tpu.models.vgg import max_pool_2x2

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, 320, 320, 3), dtype)

    class Span(nn.Module):
        """conv1_1..pool2 exactly as VGG16Backbone._blocks12 lays it out."""

        use_remat: bool = False

        def _chain(self, xx):
            conv = lambda f, name: Conv(features=f, dtype=dtype, name=name)
            xx = conv(64, "conv1_1")(xx)
            xx = conv(64, "conv1_2")(xx)
            xx = max_pool_2x2(xx)
            xx = conv(128, "conv2_1")(xx)
            xx = conv(128, "conv2_2")(xx)
            return max_pool_2x2(xx)

        @nn.compact
        def __call__(self, xx):
            if self.use_remat:
                return nn.remat(Span._chain)(self, xx)
            return self._chain(xx)

    plain, remat = Span(False), Span(True)
    variables = plain.init(key, x)

    # span-only fwd / fwd+bwd (sum-of-squares scalar loss isolates the span)
    def make(mod):
        f_jit = jax.jit(mod.apply)

        def loss(v, xx):
            y = mod.apply(v, xx)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g_jit = jax.jit(jax.grad(loss))
        return f_jit, g_jit

    f_plain, g_plain = make(plain)
    _, g_remat = make(remat)

    t_f = timeit(lambda: f_plain(variables, x))
    t_g = timeit(lambda: g_plain(variables, x))
    t_gr = timeit(lambda: g_remat(variables, x))

    # ---- traffic model (elements; bf16 = 2 bytes) ----
    e_in = 320 * 320 * 3
    a = 320 * 320 * 64   # conv1_1 / conv1_2 outputs
    p1 = 160 * 160 * 64
    b = 160 * 160 * 128  # conv2_1 / conv2_2 outputs
    p2 = 80 * 80 * 128
    fwd_elems = e_in + 2 * (a + a + p1 + b + b) + p2
    # cotangent chain mirrors fwd sizes; saved-activation reads: conv-input
    # tensors (in, a1, p1, b1) for the weight/input VJPs + relu masks
    # (a1, a2, b1, b2); pool VJP re-reads its input's argmax source (a2, b2)
    bwd_elems = fwd_elems + (e_in + a + p1 + b) + (a + a + b + b) + (a + b)
    to_gb = lambda e: e * 2 * bs / 1e9
    gb_f, gb_g = to_gb(fwd_elems), to_gb(fwd_elems + bwd_elems)
    gb_gr = to_gb(2 * fwd_elems + bwd_elems)  # remat: fwd again inside bwd

    flops_f = 2 * bs * (320 * 320 * (3 * 64 + 64 * 64) + 160 * 160 * (64 * 128 + 128 * 128)) * 9
    print(f"batch {bs}  (bf16; v5e peak ~197 TFLOP/s, HBM ~819 GB/s)")
    print(f"{'condition':28s} {'ms':>8s} {'model GB':>9s} {'GB/s':>7s} {'TFLOP/s':>8s}")
    for name, t, gb, fl in [
        ("span fwd", t_f, gb_f, flops_f),
        ("span fwd+bwd (saved acts)", t_g, gb_g, 3 * flops_f),
        ("span fwd+bwd (remat)", t_gr, gb_gr, 4 * flops_f),
    ]:
        print(
            f"{name:28s} {t * 1e3:8.2f} {gb:9.2f} {gb / t:7.0f} {fl / t / 1e12:8.1f}"
        )
    print(f"remat vs saved: {t_g / t_gr:.3f}x  (modelled traffic ratio {gb_g / gb_gr:.3f})")


if __name__ == "__main__":
    main()
