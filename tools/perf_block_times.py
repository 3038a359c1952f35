"""Per-module timing of the RON-320 forward/backward on one chip.

Locates the train-side MXU-efficiency deficit (VERDICT r2 weak #1) at
module granularity: each VGG block and each head type is timed standalone
(fwd and fwd+bwd), with its FLOP count, so the gap to roofline is
attributable. Timing uses a device->host fetch as the barrier (see
.claude/skills/verify/SKILL.md — block_until_ready can ack early through
the TPU tunnel).

Run: PYTHONPATH=.:/root/.axon_site python tools/perf_block_times.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=20, warmup=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def conv_flops(h, w, cin, cout, kh=3, kw=3):
    return 2 * h * w * cin * cout * kh * kw


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import flax.linen as nn

    from ron_tensorflow_tpu.models.layers import Conv
    from ron_tensorflow_tpu.models.ron import BoxHead, ClsHead, ObjectnessHead

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    class Block(nn.Module):
        convs: tuple  # ((cout, kernel, dilation), ...)

        @nn.compact
        def __call__(self, x):
            for i, (f, k, d) in enumerate(self.convs):
                x = Conv(f, (k, k), dilation=(d, d), dtype=dtype, name=f"c{i}")(x)
            return nn.max_pool(x, (2, 2), (2, 2), "SAME")

    # (name, input shape, module, train_mode)
    cases = [
        ("block1 320^2 3->64x2", (320, 320, 3), Block(((64, 3, 1), (64, 3, 1)))),
        ("block2 160^2 64->128x2", (160, 160, 64), Block(((128, 3, 1), (128, 3, 1)))),
        ("block3 80^2 128->256x3", (80, 80, 128), Block(((256, 3, 1),) + ((256, 3, 1),) * 2)),
        ("block4 40^2 256->512x3", (40, 40, 256), Block(((512, 3, 1),) * 3)),
        ("block5 20^2 512x3", (20, 20, 512), Block(((512, 3, 1),) * 3)),
        ("fc6/7 10^2 512->1024", (10, 10, 512), Block(((1024, 3, 3), (1024, 1, 1)))),
        ("cls_head 40^2", (40, 40, 512), ClsHead(10, 21, train=True, dtype=dtype)),
        ("cls_head 20^2", (20, 20, 512), ClsHead(10, 21, train=True, dtype=dtype)),
        ("obj_head 40^2", (40, 40, 512), ObjectnessHead(10, train=True, dtype=dtype)),
        ("box_head 40^2", (40, 40, 512), BoxHead(10, train=True, dtype=dtype)),
    ]

    peak_tf = float(sys.argv[2]) if len(sys.argv) > 2 else 197.0
    print(f"batch {bs}, assumed bf16 peak {peak_tf} TFLOP/s")
    print(f"{'module':24s} {'fwd ms':>8s} {'eff%':>5s}  {'fwd+bwd ms':>10s} {'eff%':>5s}")
    for name, ishape, mod in cases:
        x = jax.random.normal(key, (bs, *ishape), dtype)
        variables = mod.init(key, x)

        def fwd(v, xx):
            out = mod.apply(v, xx, mutable=["batch_stats"])
            return out[0] if isinstance(out, tuple) else out

        f_jit = jax.jit(fwd)

        def fwdbwd(v, xx):
            def loss(vv, xx):
                y = fwd({**vv, "batch_stats": v.get("batch_stats", {})}, xx)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return jax.grad(loss)({"params": v["params"]}, xx)

        g_jit = jax.jit(fwdbwd)

        t_f = timeit(lambda: f_jit(variables, x))
        t_g = timeit(lambda: g_jit(variables, x))

        # FLOP estimate from the conv shapes
        flops = 0
        h, w, cin = ishape
        if isinstance(mod, Block):
            for f, k, d in mod.convs:
                flops += conv_flops(h, w, cin, f, k, k)
                cin = f
        elif isinstance(mod, ClsHead):
            flops = (
                conv_flops(h, w, 512, 512) + conv_flops(h, w, 512, 512, 1, 1)
                + conv_flops(h, w, 1024, 512) + conv_flops(h, w, 1024, 512, 1, 1)
                + conv_flops(h, w, 1024, 210)
            )
        elif isinstance(mod, ObjectnessHead):
            flops = conv_flops(h, w, 512, 512) + conv_flops(h, w, 512, 20)
        elif isinstance(mod, BoxHead):
            flops = conv_flops(h, w, 512, 512) + conv_flops(h, w, 512, 40)
        flops *= bs
        eff_f = flops / t_f / 1e12 / peak_tf * 100
        eff_g = 3 * flops / t_g / 1e12 / peak_tf * 100
        print(
            f"{name:24s} {t_f * 1e3:8.2f} {eff_f:5.1f}  {t_g * 1e3:10.2f} {eff_g:5.1f}"
        )


if __name__ == "__main__":
    main()
